"""Benchmark: batched PHY frame decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: demodulated-samples/sec expressed as a multiple of 48 kHz
real time per chip, on the flagship workload (batched correlation-sync
frame decode of noisy multi-frame captures, payload-verified).
`vs_baseline` is measured against the reference's effective decode rate
(1.0x real time: its decoder is an online loop fed by a real-time audio
callback — it cannot exceed real time in production use; see
BASELINE.md).  The BASELINE.json target gate is >= 100x.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from trackmaker_tpu.core.config import PhyConfig
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.phy.decoder import decode_capture
    from trackmaker_tpu.phy.encoder import PhyEncoder

    cfg = PhyConfig()
    rng = np.random.default_rng(0)

    # workload: batch of noisy captures, 64 max-size frames each
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

    fn = jax.jit(jax.vmap(
        lambda s: decode_capture(cfg, s, 2, max_frames=n_frames + 8)))

    # warmup + correctness gate: every capture must yield every payload
    res = fn(x)
    counts = np.asarray(res.count)
    fb = np.asarray(res.frame_bytes)
    ok = bool((counts == n_frames).all())
    if ok:
        for b in range(batch):
            for k, f in enumerate(frames):
                if fb[b, k, 7:7 + 128].tobytes() != f.data:
                    ok = False
                    break
    if not ok:
        print(json.dumps({
            "metric": "demod_throughput_realtime_multiple_per_chip",
            "value": 0.0, "unit": "x_realtime_48kHz", "vs_baseline": 0.0,
            "error": f"correctness gate failed: counts={counts.tolist()}",
        }))
        sys.stdout.flush()
        os._exit(1)

    fn(x)[0].block_until_ready()
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        r = fn(x)
    r[0].block_until_ready()
    dt = (time.time() - t0) / iters

    samples_per_s = batch * t / dt
    realtime_x = samples_per_s / 48_000.0

    print(json.dumps({
        "metric": "demod_throughput_realtime_multiple_per_chip",
        "value": round(realtime_x, 1),
        "unit": "x_realtime_48kHz",
        "vs_baseline": round(realtime_x / 1.0, 1),
        "backend": jax.default_backend(),
        "samples_per_sec": round(samples_per_s),
        "frames_per_sec": round(batch * n_frames / dt),
        "batch": batch,
        "capture_samples": t,
    }))
    sys.stdout.flush()
    os._exit(0)  # axon tunnel teardown can hang the interpreter at exit


if __name__ == "__main__":
    main()
