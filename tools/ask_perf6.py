"""Subtractive bisect of the COMPOSED ask_spec phase B: which piece,
when removed, recovers the ~22ms gap between the composed cost and the
sum of its (individually ~free) parts."""
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

from trackmaker_tpu.phy import ask, ask_spec
from trackmaker_tpu.phy.pallas_decode import _extract_candidates

_BIGI = np.int32(2**30)


def measure(fn, *args, iters=20):
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


cfg = ask.AskConfig()
frames = ask.build_frames(b"the quick brown fox", cfg, num_frames=64)
wave = ask.build_track(cfg, frames, seed=7)
t = len(wave)
b = 8
x = jnp.asarray(np.stack([wave] * b))
chain_window = 1024
l_pre = cfg.preamble_len
n_cand = 96


@jax.jit
def prep(x):
    def one(row):
        power, sync, upd_ok = ask.dense_arrays(cfg, row)
        hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
        cand, _nv, _ov = _extract_candidates(hits, n_cand, rpb=8)
        virt = jnp.full((1,), -(cfg.frame_samples + 1), jnp.int32)
        return power, sync, upd_ok, jnp.concatenate([virt, cand])
    return jax.vmap(one)(x)


power, syncv, upd_ok, cand_full = prep(x)
print("prep done", flush=True)


def phase_b_variant(row, p, s, u, cf, *, use_warm, use_first, use_chain,
                    use_succ):
    pad = cfg.frame_samples + chain_window + 8
    rx_pad = jnp.concatenate([row, jnp.zeros(pad, jnp.float32)])
    sync_pad = jnp.concatenate(
        [s, jnp.full(chain_window + 8, -jnp.inf, jnp.float32)])
    upd_pad = jnp.concatenate([u, jnp.zeros(chain_window + 8, bool)])
    power_pad = jnp.concatenate([p, jnp.zeros(l_pre + 8, jnp.float32)])
    upd_tables = ask.upd_block_tables(u)
    w_band = jnp.asarray(ask._warmup_band_np(cfg))

    def one(pos):
        cursor = jnp.minimum(pos + cfg.frame_samples + 1, _BIGI)
        if use_warm:
            sync_w, ok_w = ask.warmup_sync_at(
                cfg, rx_pad, power_pad, w_band, cursor, t)
        else:
            sync_w = jnp.zeros(l_pre, jnp.float32)
            ok_w = jnp.zeros(l_pre, bool)
        warm_idx = cursor + jnp.arange(l_pre, dtype=jnp.int32)
        first_warm = jnp.min(jnp.where(ok_w, warm_idx, _BIGI))
        if use_first:
            first_dense, has_dense = ask.first_upd_from(
                upd_tables, cursor + l_pre)
            first_dense = jnp.where(has_dense, first_dense, _BIGI)
        else:
            first_dense = cursor + l_pre
        first = jnp.minimum(first_warm, first_dense)
        has = first < _BIGI
        i0 = jnp.clip(first, 0, t - 1)
        if use_chain:
            peak, fired = ask.run_chain(
                cfg, sync_pad, upd_pad, chain_window, i0, cursor,
                sync_w, ok_w)
        else:
            peak, fired = i0, has
        complete = (peak + cfg.frame_samples) < t
        return has, fired, complete, peak

    has, fired, complete, peak = jax.vmap(one)(cf)
    if use_succ:
        succ = jnp.searchsorted(cf, peak).astype(jnp.int32)
        c1 = cf.shape[0]
        found = (succ < c1) & (cf[jnp.clip(succ, 0, c1 - 1)] == peak)
        succ = jnp.where(found, succ, -1)
    else:
        succ = jnp.zeros_like(peak)
    nc = has & ~fired
    return jnp.stack([has.astype(jnp.int32), fired.astype(jnp.int32),
                      complete.astype(jnp.int32), peak, succ,
                      nc.astype(jnp.int32)])


VARIANTS = [
    ("full", dict(use_warm=True, use_first=True, use_chain=True,
                  use_succ=True)),
    ("no-chain", dict(use_warm=True, use_first=True, use_chain=False,
                      use_succ=True)),
    ("no-warm", dict(use_warm=False, use_first=True, use_chain=True,
                     use_succ=True)),
    ("no-first", dict(use_warm=True, use_first=False, use_chain=True,
                      use_succ=True)),
    ("chain-only", dict(use_warm=False, use_first=False, use_chain=True,
                        use_succ=False)),
]

import functools
for name, flags in VARIANTS:
    fn = jax.jit(lambda x, p, s, u, cf, _f=flags: jax.vmap(
        lambda row, pp, ss, uu, cc: phase_b_variant(
            row, pp, ss, uu, cc, **_f))(x, p, s, u, cf))
    ms = measure(fn, x, power, syncv, upd_ok, cand_full)
    print(f"{name}: {ms:.2f}ms", flush=True)

sys.stdout.flush()
os._exit(0)
