"""A/B: old phase-A candidate extraction (dense bitmap + block peel)
vs the fused kernel epilogue, same process, flagship shapes (b=32)."""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
os.makedirs(".jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy import line_coding
from trackmaker_tpu.phy.pallas_decode import (_compact_hit_rows,
                                              _extract_candidates)
from trackmaker_tpu.sync import correlate
from trackmaker_tpu.sync.pallas_xcorr import (pallas_normalized_xcorr,
                                              pallas_xcorr_hits)


def measure(fn, *args, iters=10):
    r = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1] * 1e3


cfg = PhyConfig()
rng = np.random.default_rng(0)
n_frames, batch = 64, 32
frames = [Frame.new_data(i & 0xFF, 1, 2,
                         rng.integers(0, 256, 128, dtype=np.uint8)
                         .tobytes()) for i in range(n_frames)]
wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
t = len(wave)
caps = np.stack([wave + rng.normal(0, 0.05, t).astype(np.float32)
                 for _ in range(batch)])
x = jnp.asarray(caps)
pre_np = line_coding.preamble_waveform(cfg)
pre_energy = correlate.preamble_energy(pre_np)
print(f"t={t} batch={batch}", flush=True)


@jax.jit
def corr_only(x):
    return jax.vmap(lambda s: pallas_normalized_xcorr(
        s, pre_np))(x)


print(f"corr only (old kernel): {measure(corr_only, x):.2f}ms",
      flush=True)


@jax.jit
def old_extract(x):
    corr = jax.vmap(lambda s: pallas_normalized_xcorr(s, pre_np))(x)
    hits = corr >= cfg.correlation_threshold
    return _extract_candidates(hits, 128)


print(f"old corr+extract: {measure(old_extract, x):.2f}ms", flush=True)


@jax.jit
def fused(x):
    corr, rows = jax.vmap(lambda s: pallas_xcorr_hits(
        s, pre_np, cfg.correlation_threshold))(x)
    cand, nv, ov = _compact_hit_rows(rows, 128)
    return corr, cand, nv, ov


print(f"fused kernel+compact: {measure(fused, x):.2f}ms", flush=True)

# equality of extracted candidates
c_old = np.asarray(old_extract(x)[0])
c_new = np.asarray(fused(x)[1])
print("cand equal:", np.array_equal(c_old, c_new), flush=True)

for blk, bf16 in ((16384, False), (32768, False), (16384, True),
                  (8192, True)):
    @jax.jit
    def fused_v(x, _blk=blk, _bf=bf16):
        corr, rows = jax.vmap(lambda s: pallas_xcorr_hits(
            s, pre_np, cfg.correlation_threshold, blk=_blk,
            use_bf16=_bf))(x)
        cand, nv, ov = _compact_hit_rows(rows, 128)
        return corr, cand, nv, ov

    ms = measure(fused_v, x)
    cv = np.asarray(fused_v(x)[1])
    print(f"fused blk={blk} bf16={bf16}: {ms:.2f}ms "
          f"cand_equal={np.array_equal(c_old, cv)}", flush=True)

sys.stdout.flush()
os._exit(0)
