"""End-to-end flagship decode timing (b=32), current code."""
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

from trackmaker_tpu.core.config import FOUR_B_FIVE_B, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy.pallas_decode import decode_capture_spec_jit


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


for coding in ("manchester", FOUR_B_FIVE_B):
    cfg = PhyConfig(line_coding=coding)
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
    res, ok = decode_capture_spec_jit(cfg, x, 2, max_frames=72)
    nv = int(np.asarray(res.valid).sum())
    assert nv == batch * n_frames, (coding, nv)
    ms = measure(lambda x: decode_capture_spec_jit(
        cfg, x, 2, max_frames=72), x)
    print(f"{coding}: {ms:.2f}ms -> {batch*t/48000/(ms/1e3):.0f}x "
          f"(t={t})", flush=True)

sys.stdout.flush()
os._exit(0)
