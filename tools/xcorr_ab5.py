"""A/B: pure-XLA row-matmul correlation vs the Pallas kernel.

corr lag (128k+l) = dot(x[128k+l : 128k+l+L], p) = row k of
[x_rows[k] ‖ x_rows[k+1]] @ pmat — one big [R,256]@[256,128] matmul
XLA can pipeline, vs the grid-stepped Pallas kernel."""
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
                                              _BIGI)
from trackmaker_tpu.sync.pallas_xcorr import (_banded_mats,
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
l = len(pre_np)
seg = 256
pmat_np, emat_np = _banded_mats(tuple(pre_np.tolist()), seg)
pe = float(np.sqrt(np.sum(pre_np.astype(np.float64) ** 2)))
thr = cfg.correlation_threshold
print(f"t={t} batch={batch} L={l}", flush=True)


def xla_corr_rows(s, precision):
    tt = s.shape[-1]
    r128 = -(-tt // 128)
    xp = jnp.pad(s, (0, r128 * 128 + 128 - tt))
    xr = xp.reshape(-1, 128)                       # (r128+1, 128)
    X = jnp.concatenate([xr[:r128], xr[1:r128 + 1]], axis=1)  # (R,256)
    dot = jnp.dot(X, jnp.asarray(pmat_np), precision=precision)
    energy = jnp.dot(X * X, jnp.asarray(emat_np), precision=precision)
    denom = jax.lax.rsqrt(jnp.maximum(energy, 1e-30)) / pe
    corr = jnp.where(energy < 1e-6, 0.0, dot * denom)   # (R, 128)
    return corr, r128


def xla_hits(corr, r128, tt):
    lanei = jnp.arange(128, dtype=jnp.int32)[None, :]
    rowb = jnp.arange(r128, dtype=jnp.int32)[:, None] * 128
    pos = rowb + lanei
    hit = (corr >= thr) & (pos < tt - l + 1)
    idxm = jnp.where(hit, lanei + rowb, _BIGI)
    cols = []
    m = None
    for _ in range(4):
        m = jnp.min(idxm, axis=1, keepdims=True)
        cols.append(m)
        idxm = jnp.where(idxm > m, idxm, _BIGI)
    rows = jnp.concatenate(
        cols + [jnp.sum(hit.astype(jnp.int32), 1, keepdims=True)]
        + [jnp.zeros((r128, 3), jnp.int32)], axis=1)
    return rows


for name, prec in (("default", None),
                   ("highest", jax.lax.Precision.HIGHEST)):
    @jax.jit
    def xla_fused(x, _p=prec):
        def one(s):
            corr, r128 = xla_corr_rows(s, _p)
            rows = xla_hits(corr, r128, t)
            return corr, rows
        corr, rows = jax.vmap(one)(x)
        cand, nv, ov = _compact_hit_rows(rows, 128)
        return corr, cand, nv, ov

    ms = measure(xla_fused, x)
    c = np.asarray(xla_fused(x)[1])
    print(f"xla rows-matmul ({name}): {ms:.2f}ms", flush=True)
    if name == "default":
        c_def = c
    else:
        print("cand default==highest:", np.array_equal(c_def, c),
              flush=True)


@jax.jit
def pallas_fused(x):
    corr, rows = jax.vmap(lambda s: pallas_xcorr_hits(
        s, pre_np, thr, blk=16384))(x)
    cand, nv, ov = _compact_hit_rows(rows, 128)
    return corr, cand, nv, ov


ms = measure(pallas_fused, x)
cp = np.asarray(pallas_fused(x)[1])
print(f"pallas blk=16384: {ms:.2f}ms  cand xla==pallas: "
      f"{np.array_equal(c_def, cp)}", flush=True)

sys.stdout.flush()
os._exit(0)
