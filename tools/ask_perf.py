"""TPU perf probe for the speculative ASK receiver (round-3 item 3).

Measures the full spec path at several batch sizes plus a per-phase
breakdown, with readback before AND after each timing loop (see
CLAUDE.md timing note).  Run: timeout 580 python -u tools/ask_perf.py
"""
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


def measure(fn, *args, iters=5):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # sync + force transfer
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cfg = ask.AskConfig()
    n_frames = 64
    frames = ask.build_frames(b"the quick brown fox", cfg,
                              num_frames=n_frames)
    wave = ask.build_track(cfg, frames, seed=7)
    t = len(wave)
    dur = t / cfg.sample_rate
    print(f"t={t} dur={dur:.2f}s", flush=True)

    for b in (1, 8, 32):
        x = jnp.asarray(np.stack([wave] * b))
        t0 = time.perf_counter()
        res, ok = ask_spec.demodulate_spec_jit(cfg, x, max_frames=72)
        okh = np.asarray(ok)
        print(f"b={b} compile+run {time.perf_counter()-t0:.1f}s "
              f"ok={okh.sum()}/{b}", flush=True)
        nv = int(np.asarray(res.valid).sum())
        assert nv == b * n_frames, (nv, b * n_frames)
        med, ts = measure(
            lambda x: ask_spec.demodulate_spec_jit(cfg, x, max_frames=72),
            x, iters=7)
        rt = b * dur / med
        print(f"b={b} full: med={med*1e3:.1f}ms -> {rt:.0f}x realtime "
              f"ts={[f'{u*1e3:.1f}' for u in ts]}", flush=True)

    # ---- phase breakdown at b=8 ----
    b = 8
    x = jnp.asarray(np.stack([wave] * b))

    @jax.jit
    def phase_a(x):
        def one(row):
            power, sync, upd_ok = ask.dense_arrays(cfg, row)
            hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
            return power, sync, upd_ok, hits
        return jax.vmap(one)(x)

    @jax.jit
    def dense_only(x):
        return jax.vmap(lambda r: ask.dense_arrays(cfg, r))(x)

    @jax.jit
    def ema_only(x):
        return jax.vmap(lambda r: ask.ema_power(r, cfg.power_alpha))(x)

    @jax.jit
    def sync_only(x):
        from trackmaker_tpu import sync as sync_mod
        pre = ask._chirp_np(cfg)
        return jax.vmap(lambda r: sync_mod.auto_sliding_dot_scaled(
            r, pre, 1.0 / cfg.sync_divisor))(x)

    for name, fn in [("ema", ema_only), ("sync", sync_only),
                     ("dense", dense_only), ("phaseA+hits", phase_a)]:
        med, ts = measure(fn, x, iters=7)
        print(f"b=8 {name}: {med*1e3:.2f}ms "
              f"ts={[f'{u*1e3:.1f}' for u in ts]}", flush=True)

    # dispatch floor probe: trivial jitted op, same batch shape
    @jax.jit
    def triv(x):
        return jnp.sum(x, axis=-1)
    med, ts = measure(triv, x, iters=7)
    print(f"b=8 trivial-sum: {med*1e3:.2f}ms "
          f"ts={[f'{u*1e3:.1f}' for u in ts]}", flush=True)

    sys.stdout.flush()
    os._exit(0)


main()
