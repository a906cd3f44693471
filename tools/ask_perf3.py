"""Bisect phase B of the ASK spec receiver: warmup matmul vs first-upd
query vs run_chain (amortized timing)."""
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
    return sorted(ts)[1]


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cfg = ask.AskConfig()
    frames = ask.build_frames(b"the quick brown fox", cfg, num_frames=64)
    wave = ask.build_track(cfg, frames, seed=7)
    t = len(wave)
    b = 8
    x = jnp.asarray(np.stack([wave] * b))
    chain_window = 1024
    l_pre = cfg.preamble_len

    @jax.jit
    def prep(x):
        def one(row):
            power, sync, upd_ok = ask.dense_arrays(cfg, row)
            hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
            cand, _nv, _ov = _extract_candidates(hits, 96, rpb=8)
            virt = jnp.full((1,), -(cfg.frame_samples + 1), jnp.int32)
            cand_full = jnp.concatenate([virt, cand])
            pad = cfg.frame_samples + chain_window + 8
            rx_pad = jnp.concatenate([row, jnp.zeros(pad, jnp.float32)])
            sync_pad = jnp.concatenate(
                [sync, jnp.full(chain_window + 8, -jnp.inf, jnp.float32)])
            upd_pad = jnp.concatenate(
                [upd_ok, jnp.zeros(chain_window + 8, bool)])
            power_pad = jnp.concatenate(
                [power, jnp.zeros(l_pre + 8, jnp.float32)])
            return rx_pad, sync_pad, upd_pad, power_pad, upd_ok, cand_full
        return jax.vmap(one)(x)

    rx_pad, sync_pad, upd_pad, power_pad, upd_ok, cand_full = prep(x)
    w_band = jnp.asarray(ask._warmup_band_np(cfg))

    @jax.jit
    def warm_j(rx_pad, power_pad, cand_full):
        def one(rp, pp, cf):
            def per_c(pos):
                cursor = jnp.minimum(pos + cfg.frame_samples + 1, _BIGI)
                cursor = jnp.clip(cursor, 0, t)
                return ask.warmup_sync_at(cfg, rp, pp, w_band, cursor, t)
            return jax.vmap(per_c)(cf)
        return jax.vmap(one)(rx_pad, power_pad, cand_full)

    sync_w, ok_w = warm_j(rx_pad, power_pad, cand_full)
    print(f"warmup_sync: {measure(warm_j, rx_pad, power_pad, cand_full)*1e3:.2f}ms",
          flush=True)

    @jax.jit
    def firstupd_j(upd_ok, cand_full):
        def one(u, cf):
            tables = ask.upd_block_tables(u)
            def per_c(pos):
                cursor = jnp.minimum(pos + cfg.frame_samples + 1, _BIGI)
                return ask.first_upd_from(tables, cursor + l_pre)
            return jax.vmap(per_c)(cf)
        return jax.vmap(one)(upd_ok, cand_full)

    print(f"first_upd: {measure(firstupd_j, upd_ok, cand_full)*1e3:.2f}ms",
          flush=True)

    @jax.jit
    def chain_j(sync_pad, upd_pad, cand_full, sync_w, ok_w):
        def one(sp, up, cf, sw, okw):
            def per_c(pos, swc, okwc):
                cursor = jnp.clip(pos + cfg.frame_samples + 1, 0, t)
                i0 = jnp.clip(cursor, 0, t - 1)
                return ask.run_chain(cfg, sp, up, chain_window, i0,
                                     cursor, swc, okwc)
            return jax.vmap(per_c)(cf, sw, okw)
        return jax.vmap(one)(sync_pad, upd_pad, cand_full, sync_w, ok_w)

    print(f"run_chain: {measure(chain_j, sync_pad, upd_pad, cand_full, sync_w, ok_w)*1e3:.2f}ms",
          flush=True)

    # chain without the gathers: same scan math on a PRE-SLICED dense array
    win = jax.vmap(jax.vmap(
        lambda sp, i0: jax.lax.dynamic_slice(sp, (i0,), (chain_window,)),
        in_axes=(None, 0)))(sync_pad,
                            jnp.clip(cand_full + cfg.frame_samples + 1,
                                     0, t))

    @jax.jit
    def scan_only(win):
        def combine(a_, b_):
            av, ai = a_
            bv, bi = b_
            tk = bv > av
            return jnp.where(tk, bv, av), jnp.where(tk, bi, ai)
        idx = jnp.broadcast_to(
            jnp.arange(chain_window, dtype=jnp.int32), win.shape)
        m, r = jax.lax.associative_scan(combine, (win, idx), axis=-1)
        return m[..., -1], r[..., -1]

    print(f"assoc_scan only: {measure(scan_only, win)*1e3:.2f}ms",
          flush=True)

    @jax.jit
    def gather_only(sync_pad, cand_full):
        def one(sp, cf):
            return jax.vmap(lambda i0: jax.lax.dynamic_slice(
                sp, (jnp.clip(i0 + cfg.frame_samples + 1, 0, t),),
                (chain_window,)))(cf)
        return jax.vmap(one)(sync_pad, cand_full)

    print(f"gather [97x1024] only: {measure(gather_only, sync_pad, cand_full)*1e3:.2f}ms",
          flush=True)

    sys.stdout.flush()
    os._exit(0)


main()
