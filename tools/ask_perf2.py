"""Amortized per-phase timing of the ASK spec path (bench-style: loop
iters back-to-back, one tiny readback at the end)."""
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
    n_frames = 64
    frames = ask.build_frames(b"the quick brown fox", cfg,
                              num_frames=n_frames)
    wave = ask.build_track(cfg, frames, seed=7)
    t = len(wave)
    dur = t / cfg.sample_rate
    b = 8
    x = jnp.asarray(np.stack([wave] * b))

    full = lambda x: ask_spec.demodulate_spec_jit(cfg, x, max_frames=72)
    med = measure(full, x)
    print(f"b=8 full amortized: {med*1e3:.2f}ms -> "
          f"{b*dur/med:.0f}x", flush=True)

    n_cand, chain_window = 96, 1024
    from trackmaker_tpu.phy.pallas_decode import _extract_candidates

    @jax.jit
    def phase_a(x):
        def one(row):
            power, sync, upd_ok = ask.dense_arrays(cfg, row)
            hits = ask_spec.dense_fire_candidates(cfg, sync, upd_ok)
            cand, _nv, overflow = _extract_candidates(hits, n_cand, rpb=8)
            return power, sync, upd_ok, cand, overflow
        return jax.vmap(one)(x)

    power, syncv, upd_ok, cand, _ = phase_a(x)
    med = measure(phase_a, x)
    print(f"b=8 phaseA(dense+hits+extract): {med*1e3:.2f}ms", flush=True)

    @jax.jit
    def dense_j(x):
        return jax.vmap(lambda r: ask.dense_arrays(cfg, r))(x)
    med = measure(dense_j, x)
    print(f"b=8 dense only: {med*1e3:.2f}ms", flush=True)

    @jax.jit
    def phase_b_j(x, power, syncv, upd_ok, cand):
        def one(row, p, s, u, c):
            virt = jnp.full((1,), -(cfg.frame_samples + 1), jnp.int32)
            cand_full = jnp.concatenate([virt, c])
            return ask_spec._phase_b(cfg, row, p, s, u, cand_full,
                                     chain_window)
        return jax.vmap(one)(x, power, syncv, upd_ok, cand)

    fields, rx_pads = phase_b_j(x, power, syncv, upd_ok, cand)
    med = measure(phase_b_j, x, power, syncv, upd_ok, cand)
    print(f"b=8 phaseB: {med*1e3:.2f}ms", flush=True)

    walk_j = jax.jit(lambda f: ask_spec._walk(f, 72, False))
    peaks, fire_ok, bad = walk_j(fields)
    med = measure(walk_j, fields)
    print(f"b=8 walk: {med*1e3:.2f}ms", flush=True)

    car, bit_idx = ask.demod_tables(cfg)

    @jax.jit
    def demod_j(rx_pads, peaks, fire_ok):
        return jax.vmap(lambda rp, pk, ok: jax.vmap(
            lambda p, o: ask.demod_slot(cfg, rp, car, bit_idx, p, o)
        )(pk, ok))(rx_pads, peaks, fire_ok)
    med = measure(demod_j, rx_pads, peaks, fire_ok)
    print(f"b=8 demod: {med*1e3:.2f}ms", flush=True)

    sys.stdout.flush()
    os._exit(0)


main()
