"""Sharded long-capture OFDM decode (parallel/ofdm_stream.py) on the
virtual 8-device CPU mesh: boundary-straddling frames, adaptive-loading
configs, and the short-capture fallback."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.parallel import decode_ofdm_blocked_sharded, make_mesh
from trackmaker_tpu.parallel.ofdm_stream import ofdm_halo_size
from trackmaker_tpu.phy.ofdm_v2 import OfdmModemV2, OfdmV2Config


def _capture(modem, frames, gaps, lead=500, tail=900, sigma=0.006,
             seed=0):
    """Concatenate per-frame waveforms with per-slot gaps (so frame
    positions are controllable) + AWGN."""
    rng = np.random.default_rng(seed)
    parts = [np.zeros(lead, np.float32)]
    for f, g in zip(frames, gaps):
        parts.append(modem.encode_frames([f]))
        parts.append(np.zeros(g, np.float32))
    parts.append(np.zeros(tail, np.float32))
    wave = np.concatenate(parts)
    return (wave + rng.normal(0, sigma, len(wave))).astype(np.float32)


def test_sharded_ofdm_matches_single_device():
    cfg = OfdmV2Config()
    modem = OfdmModemV2(cfg)
    n = 12
    payload = 40
    frames = [Frame.new_data(i, 1, 2, bytes([i + 1]) * payload)
              for i in range(n)]
    rng = np.random.default_rng(1)
    gaps = [int(g) for g in rng.integers(200, 2500, n)]
    wave = _capture(modem, frames, gaps)
    fb_len = 7 + payload

    mesh = make_mesh(8, dp=2, sp=4)
    got = decode_ofdm_blocked_sharded(cfg, wave, fb_len, mesh,
                                      max_frames_per_block=8)
    single = modem.decode(wave, fb_len, max_frames=n + 4)
    assert [f.data for f in got] == [f.data for f in single]
    assert [f.data for f in got] == [f.data for f in frames]


def test_boundary_straddling_frames_decode_once():
    """Place frames so several straddle shard boundaries: each must be
    decoded exactly once (by the owner of its first sample)."""
    cfg = OfdmV2Config()
    modem = OfdmModemV2(cfg)
    payload = 40
    fb_len = 7 + payload
    flen = len(modem.encode_frames(
        [Frame.new_data(0, 1, 2, bytes(payload))]))
    n_shards = 8
    n = 10
    frames = [Frame.new_data(i, 1, 2, bytes([i + 1]) * payload)
              for i in range(n)]
    # capture long enough that block > halo, frames roughly evenly
    # spread -> most boundaries get a straddler
    t = n_shards * (ofdm_halo_size(cfg, fb_len * 8) + 4000)
    block = -(-t // n_shards)
    step = t // n
    parts = np.zeros(t + flen + 2000, np.float32)
    starts = []
    for i, f in enumerate(frames):
        pos = 700 + i * step
        w = modem.encode_frames([f])
        parts[pos:pos + len(w)] += w
        starts.append(pos)
    straddlers = sum(1 for p in starts
                     if (p % block) + flen > block)
    assert straddlers >= 2, (straddlers, block, flen)
    rng = np.random.default_rng(2)
    wave = (parts + rng.normal(0, 0.006, len(parts))).astype(np.float32)

    mesh = make_mesh(8, dp=1, sp=8)
    got = decode_ofdm_blocked_sharded(cfg, wave, fb_len, mesh,
                                      max_frames_per_block=6)
    assert [f.data for f in got] == [f.data for f in frames]


def test_sharded_adaptive_loading_decode():
    """The sharded path dispatches to the loading-aware demapper for
    adaptive configs (incl. a 64-QAM tier bin mix)."""
    from trackmaker_tpu.phy.ofdm_adaptive import (OfdmAdaptiveConfig,
                                                  OfdmAdaptiveModem)
    cfg0 = OfdmAdaptiveConfig()
    nd = len(cfg0.data_bin_idx)
    rng = np.random.default_rng(3)
    loading = tuple(int(v) for v in rng.choice(
        [1, 2, 4, 6], size=nd, p=[0.2, 0.4, 0.3, 0.1]))
    modem = OfdmAdaptiveModem(cfg0, loading=loading)
    cfg = modem.cfg
    payload = 40
    n = 8
    frames = [Frame.new_data(i, 1, 2, bytes([i + 9]) * payload)
              for i in range(n)]
    gaps = [int(g) for g in rng.integers(400, 3000, n)]
    wave = _capture(modem, frames, gaps, sigma=0.004, seed=3)
    mesh = make_mesh(8, dp=4, sp=2)
    got = decode_ofdm_blocked_sharded(cfg, wave, 7 + payload, mesh,
                                      max_frames_per_block=6)
    assert [f.data for f in got] == [f.data for f in frames]


def test_short_capture_falls_back_to_single_device():
    cfg = OfdmV2Config()
    modem = OfdmModemV2(cfg)
    payload = 40
    frames = [Frame.new_data(i, 1, 2, bytes([i + 1]) * payload)
              for i in range(2)]
    wave = _capture(modem, frames, [300, 300])
    mesh = make_mesh(8, dp=2, sp=4)  # block << halo for this length
    got = decode_ofdm_blocked_sharded(cfg, wave, 7 + payload, mesh)
    assert [f.data for f in got] == [f.data for f in frames]
