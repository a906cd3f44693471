"""Link-layer tests: simulated bus, CSMA/ARQ, file transfer."""

import numpy as np
import pytest

from trackmaker_tpu.core.config import MacConfig, PhyConfig
from trackmaker_tpu.link import (
    AppState, AudioEndpoint, SimulatedBus, is_channel_busy)
from trackmaker_tpu.link.transfer import transfer_over_bus


def test_is_channel_busy():
    mac = MacConfig()
    assert is_channel_busy(np.zeros(10, np.float32), mac) is None
    assert is_channel_busy(np.zeros(30, np.float32), mac) is False
    loud = np.zeros(30, np.float32)
    loud[13] = 0.9
    assert is_channel_busy(loud, mac) is True


def test_endpoint_half_duplex_playback_to_idle():
    ep = AudioEndpoint()
    ep.set_playback(np.ones(100, np.float32))
    ep.set_state(AppState.PLAYING)
    out1 = ep.pull_playback(128)
    assert out1[:100].sum() == 100 and out1[100:].sum() == 0
    assert ep.state == AppState.IDLE
    # while playing, nothing was recorded
    ep.push_record(np.ones(128, np.float32))
    assert ep.record_len() == 0


def test_bus_mixing_and_noise():
    bus = SimulatedBus(noise_std=0.0)
    a, b, c = AudioEndpoint("a"), AudioEndpoint("b"), AudioEndpoint("c")
    for ep in (a, b, c):
        bus.attach(ep)
    a.set_playback(np.full(128, 0.5, np.float32))
    a.set_state(AppState.PLAYING)
    b.set_playback(np.full(128, 0.25, np.float32))
    b.set_state(AppState.PLAYING)
    c.set_state(AppState.RECORDING)
    bus.step()
    rec = c.take_record()
    np.testing.assert_allclose(rec, 0.75)  # superposition of both
    # a heard nothing (was playing, half-duplex)
    assert a.record_len() == 0


def test_transfer_clean_channel():
    data = b"The quick brown fox jumps over the lazy dog. " * 8
    received, stats = transfer_over_bus(data, max_duration_s=60.0)
    assert received == data
    assert stats["retransmissions"] == 0
    assert stats["throughput_bps"] > 100


def test_transfer_with_noise_arq_recovers():
    """Moderate AWGN: CRC drops corrupted frames, ARQ retransmits, the
    file still arrives bit-exact (config-4 behavior)."""
    data = bytes(range(256)) * 2
    received, stats = transfer_over_bus(
        data, noise_std=0.12, max_duration_s=120.0, seed=5)
    assert received == data


def test_transfer_empty_file():
    received, stats = transfer_over_bus(b"", max_duration_s=1.0)
    assert received == b""
