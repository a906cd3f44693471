"""Robustness sweeps (config 4) + contended-channel MAC scenario."""

import numpy as np
import pytest

from trackmaker_tpu.bench import ber_sweep, clock_offset_sweep
from trackmaker_tpu.bench.sweep import contended_transfer
from trackmaker_tpu.core.config import PhyConfig


def test_ber_sweep_monotone_ish():
    res = ber_sweep(snr_dbs=(-5, 5, 20), n_frames=8, payload_len=32)
    loss = [r["frame_loss_pct"] for r in res]
    # clean at high SNR, degraded at very low SNR
    assert loss[-1] == 0.0
    assert loss[0] >= loss[-1]
    assert res[-1]["payload_bit_errors"] == 0


def test_clock_offset_sweep_tolerates_small_ppm():
    res = clock_offset_sweep(ppms=(0, 100, 20000), n_frames=8,
                             payload_len=32)
    assert res[0]["frame_loss_pct"] == 0.0
    assert res[1]["frame_loss_pct"] == 0.0  # 100 ppm: fine
    # 2% clock skew destroys line-coded frames (documents the limit)
    assert res[2]["frame_loss_pct"] > 50.0


def test_contended_2x2_transfer():
    """Two sender/receiver pairs sharing the channel: CSMA + ARQ must
    deliver both files exactly (the tools/test.py scenario)."""
    data = bytes(range(256))
    stats = contended_transfer(data, data[::-1], max_duration_s=600.0)
    assert stats["exact"], stats
