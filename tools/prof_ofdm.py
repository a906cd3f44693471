"""OFDM receiver stage profiler with in-program iteration loops
(immune to tunnel dispatch RTT — same discipline as prof_fused.py).
argv: [iters]"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy import ofdm

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
rng = np.random.default_rng(0)
n_frames, batch = 32, BATCH
payloads = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
            for _ in range(n_frames)]
frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
modem = ofdm.OfdmModem()
wave = modem.encode_frames(frames, gap_samples=400)
t = len(wave)
caps = np.stack([(wave + rng.normal(0, 0.01, t)).astype(np.float32)
                 for _ in range(batch)])
x = jnp.asarray(caps)
cfg = modem.cfg
n_bits = (7 + 64) * 8
print(f"ofdm t={t} batch={batch} total={batch*t/1e6:.1f}M iters={ITERS}",
      flush=True)

def sync1(r):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])

def timeit_fused(name, fn, x, iters=ITERS, repeats=3):
    @jax.jit
    def loop(x):
        def body(c, i):
            r = fn(x + i.astype(jnp.float32) * 1e-30)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(r))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(iters, dtype=jnp.int32))
        return c
    r = loop(x); sync1(r)
    ts = []
    for _ in range(repeats):
        sync1(loop(x))
        t0 = time.perf_counter()
        r = loop(x); sync1(r)
        ts.append((time.perf_counter() - t0) / iters)
    ms = min(ts) * 1e3
    print(f"{name:28s} {ms:6.2f} ms  (med {sorted(ts)[1]*1e3:.2f})",
          flush=True)

starts_fn = jax.vmap(lambda rx: ofdm.find_preambles(cfg, rx, n_frames))
starts = starts_fn(x)

timeit_fused("find_preambles", starts_fn, x)
timeit_fused("demod only (fixed starts)",
             lambda xx: jax.vmap(lambda rx, st: ofdm.demodulate_at(
                 cfg, rx, n_bits, st))(xx, starts), x)
timeit_fused("find+demod (bench row)",
             lambda xx: jax.vmap(lambda rx: ofdm.demodulate_at(
                 cfg, rx, n_bits, ofdm.find_preambles(cfg, rx, n_frames)))(xx),
             x)

sys.stdout.flush(); os._exit(0)
