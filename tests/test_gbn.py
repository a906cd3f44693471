"""Go-Back-N sliding-window ARQ tests."""

import numpy as np
import pytest

from trackmaker_tpu.link.gbn import gbn_transfer
from trackmaker_tpu.link.transfer import transfer_over_bus


def test_gbn_clean_transfer():
    data = bytes(range(256)) * 4
    received, stats = gbn_transfer(data, window=8)
    assert received == data
    assert stats["retransmit_bursts"] == 0


def test_gbn_beats_stop_and_wait_throughput():
    """The whole point: window=8 cuts per-frame ACK round trips."""
    data = bytes(range(256)) * 8
    _, sw = transfer_over_bus(data, max_duration_s=120.0)
    _, gbn = gbn_transfer(data, window=8, max_duration_s=120.0)
    assert gbn["throughput_bps"] > 1.25 * sw["throughput_bps"], (
        sw["throughput_bps"], gbn["throughput_bps"])


def test_gbn_recovers_from_noise():
    data = bytes(range(200)) * 3
    received, stats = gbn_transfer(data, window=4, noise_std=0.12,
                                   max_duration_s=240.0, seed=3)
    assert received == data
