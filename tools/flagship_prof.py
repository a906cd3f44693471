"""Flagship decode phase split: full spec decode vs corr-only vs
corr+extract — how much do the dense hit/extract ops actually cost?"""
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
from trackmaker_tpu.phy.pallas_decode import (_extract_candidates,
                                              decode_capture_spec_jit)
from trackmaker_tpu.sync import correlate
from trackmaker_tpu import sync as sync_mod


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
print(f"t={t} batch={batch} total={batch*t/1e6:.1f}M samples", flush=True)

full = lambda x: decode_capture_spec_jit(cfg, x, 2, max_frames=72)
ms = measure(full, x)
print(f"full spec decode: {ms:.2f}ms -> {batch*t/48000/(ms/1e3):.0f}x",
      flush=True)

pre_np = line_coding.preamble_waveform(cfg)
pre_energy = correlate.preamble_energy(pre_np)


@jax.jit
def corr_only(x):
    return jax.vmap(lambda s: sync_mod.auto_xcorr(s, pre_np, pre_energy))(x)


ms_corr = measure(corr_only, x)
print(f"corr only: {ms_corr:.2f}ms", flush=True)


@jax.jit
def corr_extract(x):
    corr = jax.vmap(
        lambda s: sync_mod.auto_xcorr(s, pre_np, pre_energy))(x)
    hits = corr >= cfg.correlation_threshold
    return _extract_candidates(hits, 128)


ms_ce = measure(corr_extract, x)
print(f"corr+hits+extract: {ms_ce:.2f}ms (extract ~= "
      f"{ms_ce - ms_corr:.2f}ms)", flush=True)

sys.stdout.flush()
os._exit(0)
