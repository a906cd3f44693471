"""Sweep the batch-folded xcorr hits kernel (bc, blk) vs the vmapped
1-capture kernel on the flagship workload.  In-program iteration loops
(immune to tunnel RTT).  argv: [iters]"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy import line_coding
from trackmaker_tpu.sync.pallas_xcorr import (
    pallas_xcorr_hits, pallas_xcorr_hits_batched)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
rng = np.random.default_rng(0)
cfg = PhyConfig()
n_frames, batch = 64, 32
frames = [Frame.new_data(i & 0xFF, 1, 2,
          rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
          for i in range(n_frames)]
wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
t = len(wave)
caps = np.stack([wave + rng.normal(0, 0.05, t).astype(np.float32)
                 for _ in range(batch)])
pre_np = line_coding.preamble_waveform(cfg)
print(f"t={t} batch={batch} iters={ITERS}", flush=True)
x = jnp.asarray(caps)
np.asarray(x[0, 0])
print("upload done", flush=True)

def sync1(r):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])

def timeit_fused(name, fn, x, iters=ITERS, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, i):
            r = fn(x + i.astype(jnp.float32) * 1e-30)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32))
        return out
    r = loop(x); sync1(r)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        r = loop(x)
        sync1(r)
        ts.append((time.time() - t0) / iters * 1000)
    print(f"{name:28s} {min(ts):8.3f} ms  (med {sorted(ts)[1]:.3f})",
          flush=True)
    return min(ts)

# sanity: batched == vmapped on-chip before timing anything
want = np.asarray(jax.vmap(lambda s: pallas_xcorr_hits(
    s, pre_np, cfg.correlation_threshold, blk=16384,
    emit_corr=False))(x)[1])
got = np.asarray(pallas_xcorr_hits_batched(
    x, pre_np, cfg.correlation_threshold, blk=16384, bc=8))
assert np.array_equal(want, got), "on-chip mismatch"
print("on-chip batched == vmapped OK", flush=True)

timeit_fused("vmapped blk=32768", lambda x: jax.vmap(
    lambda s: pallas_xcorr_hits(s, pre_np, cfg.correlation_threshold,
                                blk=32768, emit_corr=False))(x)[1], x)
for blk in (16384, 32768):
    for bc in (8, 16, 32):
        timeit_fused(
            f"batched blk={blk} bc={bc}",
            lambda x, blk=blk, bc=bc: pallas_xcorr_hits_batched(
                x, pre_np, cfg.correlation_threshold, blk=blk, bc=bc),
            x)
sys.stdout.flush(); os._exit(0)
