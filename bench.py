"""Benchmark: batched PHY decode throughput on one chip, all flagship
workloads.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "workloads": {...}}

Headline metric: demodulated-samples/sec on the flagship workload
(batched Manchester correlation-sync frame decode of noisy multi-frame
captures) expressed as a multiple of 48 kHz real time per chip,
payload-verified.  `vs_baseline` is measured against the reference's
effective decode rate (1.0x real time: its decoder is an online loop
fed by a real-time audio callback — it cannot exceed real time in
production use; see BASELINE.md).  The BASELINE.json target gate is
>= 100x.

`workloads` adds the other first-class rows (each payload/decision
gated — a regression in any of them shows up here, not just prose):
  manchester_b32   flagship (also the headline)
  fourb5b_b32      4B5B+NRZI batch decode (optimistic two-pass)
  blocked_600s     one 600 s capture, blockwise single-chip decode
  ask              ASK/chirp modem demod (BASELINE config 1)
  ofdm             OFDM (DMT) round-trip decode
"""

import json
import os
import sys
import time

import numpy as np


def _sync1(r):
    import jax
    import jax.numpy as jnp
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])


def _timeit(fn, *a, iters=10):
    # NOTE: on the axon tunnel block_until_ready alone under-reports
    # until the process has done a device->host transfer; _sync1 forces
    # a readback (see CLAUDE.md).
    r = fn(*a)
    _sync1(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*a)
    _sync1(r)
    return (time.time() - t0) / iters


def bench_line_coded(cfg, rng):
    """Batched line-coded decode; returns (realtime_x, err|None)."""
    import jax.numpy as jnp
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.phy.decoder import decode_capture_fast
    from trackmaker_tpu.phy.encoder import PhyEncoder

    n_frames, batch = 64, 32
    frames = [
        Frame.new_data(i & 0xFF, 1, 2,
                       rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
        for i in range(n_frames)
    ]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
    t = len(wave)
    caps = np.stack([
        wave + rng.normal(0, 0.05, t).astype(np.float32)
        for _ in range(batch)
    ])
    x = jnp.asarray(caps)

    # gate once through the fallback-checking wrapper, then time the
    # underlying jitted computation: the wrapper's per-call host sync
    # costs one tunnel round trip here (~40 ms), which is remote-link
    # latency, not chip throughput
    res = decode_capture_fast(cfg, x, 2, max_frames=n_frames + 8)
    counts = np.asarray(res.count)
    if not (counts == n_frames).all():
        return 0.0, f"count gate failed: {sorted(set(counts.tolist()))}"
    fb = np.asarray(res.frame_bytes)
    valid = np.asarray(res.valid)
    for b in range(batch):
        ks = np.nonzero(valid[b])[0]
        for k, f in zip(ks, frames):
            if fb[b, k, 7:7 + 128].tobytes() != f.data:
                return 0.0, f"payload gate failed at b={b} k={k}"

    from trackmaker_tpu.core.config import MANCHESTER
    from trackmaker_tpu.phy.decoder import _batched_fn, _spec_supported
    if _spec_supported(cfg):
        from trackmaker_tpu.phy.pallas_decode import decode_capture_spec_jit
        fn = (lambda x: decode_capture_spec_jit(
            cfg, x, 2, max_frames=n_frames + 8))
    else:
        fn = (lambda x: _batched_fn(
            cfg, n_frames + 8, cfg.line_coding != MANCHESTER)(x, 2))
    dt = _timeit(fn, x)
    return batch * t / dt / 48_000.0, None


def bench_blocked_600s(cfg, rng):
    import jax.numpy as jnp
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.oracle.phy import OracleEncoder
    from trackmaker_tpu.parallel.stream import (
        _decode_blocked_jit, _decode_blocked_spec_jit,
        decode_blocked_single_chip)
    from trackmaker_tpu.phy.decoder import _spec_supported

    t = 600 * 48_000                       # 28.8 Msamples
    n_frames = 48
    enc = OracleEncoder(cfg)
    wave = np.zeros(t, np.float32)
    poss, seqs = [], []
    step = t // (n_frames + 1)
    for i in range(n_frames):
        w = enc.encode_frame(Frame.new_data(i, 1, 2, bytes([i]) * 64))
        p = (i + 1) * step
        wave[p:p + len(w)] = w
        poss.append(p)
        seqs.append(i)
    wave += rng.normal(0, 0.05, t).astype(np.float32)
    x = jnp.asarray(wave)

    n_blocks = 64
    # gate through the dispatching wrapper (spec path + ok-fallback
    # on TPU), then time the jitted computation it used
    res = decode_blocked_single_chip(
        cfg, x, 2, n_blocks=n_blocks, max_frames_per_block=8)
    valid = np.asarray(res.valid)
    got = sorted(np.asarray(res.sequence)[valid].tolist())
    if got != seqs:
        return 0.0, f"blocked gate failed: {len(got)}/{n_frames} frames"
    if _spec_supported(cfg):
        spec_res, spec_ok = _decode_blocked_spec_jit(
            cfg, x, 2, n_blocks, 8, t, 128)
        if bool(np.asarray(spec_ok)):
            fn = (lambda x: _decode_blocked_spec_jit(
                cfg, x, 2, n_blocks, 8, t, 128))
        else:
            fn = (lambda x: _decode_blocked_jit(cfg, x, 2, n_blocks, 8, t))
    else:
        fn = (lambda x: _decode_blocked_jit(cfg, x, 2, n_blocks, 8, t))
    dt = _timeit(fn, x, iters=3)
    return t / dt / 48_000.0, None


def bench_ask(rng):
    import jax.numpy as jnp
    from trackmaker_tpu.phy import ask

    cfg = ask.AskConfig()
    n_frames = 64
    frames = ask.build_frames(b"the quick brown fox", cfg,
                              num_frames=n_frames)
    wave = ask.build_track(cfg, frames, seed=7)
    x = jnp.asarray(wave)
    fn = (lambda x: ask.demodulate(cfg, x, max_frames=n_frames + 8))
    res = fn(x)
    ok = np.asarray(res.valid)
    if int(ok.sum()) != n_frames:
        return 0.0, f"ask gate failed: {int(ok.sum())}/{n_frames}"
    got = np.asarray(res.bits)[ok]
    if not np.array_equal(got, frames[:, 8:]):
        return 0.0, "ask payload gate failed"
    dt = _timeit(fn, x)
    return len(wave) / dt / 48_000.0, None


def bench_ofdm(rng):
    """Batched OFDM receiver throughput: 8 captures x 32 frames (a
    single 1.4 s capture measures launch latency, not throughput)."""
    import jax
    import jax.numpy as jnp
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.phy import ofdm

    n_frames, batch = 32, 8
    payloads = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
                for _ in range(n_frames)]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    modem = ofdm.OfdmModem()
    wave = modem.encode_frames(frames, gap_samples=400)
    t = len(wave)
    caps = np.stack([
        (wave + rng.normal(0, 0.01, t)).astype(np.float32)
        for _ in range(batch)
    ])

    got = [f.data for f in modem.decode(caps[0], 7 + 64,
                                        max_frames=n_frames)]
    if got != payloads:
        return 0.0, f"ofdm gate failed: {len(got)}/{n_frames}"

    cfg = modem.cfg
    n_bits = (7 + 64) * 8
    fn = jax.jit(jax.vmap(lambda rx: ofdm.demodulate_at(
        cfg, rx, n_bits, ofdm.find_preambles(cfg, rx, n_frames))))
    x = jnp.asarray(caps)
    # payload-gate the batched path itself: every row's demodulated
    # bits must reassemble into the exact transmitted frames
    bits = np.asarray(fn(x))
    for b in range(batch):
        for k in range(n_frames):
            f = Frame.from_bits(bits[b, k])
            if f is None or f.data != payloads[k]:
                return 0.0, f"ofdm batch gate failed at b={b} k={k}"
    dt = _timeit(fn, x)
    return batch * t / dt / 48_000.0, None


# Wall-clock budget: the driver runs bench under `timeout 590`, and the
# remote-TPU tunnel's speed varies a lot between windows (the same
# binary has measured 4-9 minutes end-to-end).  Rows run headline-first
# and later rows are SKIPPED (recorded as such) once the budget is
# nearly spent, so a slow tunnel degrades the artifact instead of
# truncating it to nothing.
_BUDGET_S = float(os.environ.get("TM_BENCH_BUDGET_S", "560"))


def main():
    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from trackmaker_tpu.core.config import FOUR_B_FIVE_B, PhyConfig

    rng = np.random.default_rng(0)
    workloads = {}
    errors = {}
    skipped = []
    t0 = time.time()

    # `timeout` sends SIGTERM: emit whatever completed instead of dying
    # silently (the tunnel can stall an in-flight device op for minutes;
    # this cannot fire while blocked inside such an op, but covers every
    # between-rows point)
    import signal

    def _emit_partial(_sig, _frm):
        out = {
            "metric": "demod_throughput_realtime_multiple_per_chip",
            "value": workloads.get("manchester_b32", 0.0),
            "unit": "x_realtime_48kHz",
            "vs_baseline": workloads.get("manchester_b32", 0.0),
            "workloads": workloads,
            "errors": {**errors, "_timeout": "SIGTERM mid-row"},
        }
        print(json.dumps(out))
        sys.stdout.flush()
        os._exit(1)

    signal.signal(signal.SIGTERM, _emit_partial)

    rows = [
        ("manchester_b32", lambda: bench_line_coded(PhyConfig(), rng)),
        ("fourb5b_b32", lambda: bench_line_coded(
            PhyConfig(line_coding=FOUR_B_FIVE_B), rng)),
        ("blocked_600s", lambda: bench_blocked_600s(PhyConfig(), rng)),
        ("ask", lambda: bench_ask(rng)),
        ("ofdm", lambda: bench_ofdm(rng)),
    ]
    # rough per-row cost floor; generous because compiles dominate cold
    reserve = {"manchester_b32": 0, "fourb5b_b32": 60,
               "blocked_600s": 90, "ask": 45, "ofdm": 45}
    for name, fn in rows:
        if name != "manchester_b32" and                 time.time() - t0 > _BUDGET_S - reserve[name]:
            skipped.append(name)
            continue
        try:
            x, err = fn()
        except Exception as e:      # noqa: BLE001 - report, don't die
            x, err = 0.0, repr(e)[:120]
        workloads[name] = round(x, 1)
        if err:
            errors[name] = err

    out = {
        "metric": "demod_throughput_realtime_multiple_per_chip",
        "value": workloads.get("manchester_b32", 0.0),
        "unit": "x_realtime_48kHz",
        "vs_baseline": workloads.get("manchester_b32", 0.0),
        "backend": jax.default_backend(),
        "workloads": workloads,
    }
    if skipped:
        out["skipped_budget"] = skipped
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    sys.stdout.flush()
    os._exit(1 if (errors or out["value"] <= 0) else 0)


if __name__ == "__main__":
    main()
