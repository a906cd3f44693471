"""Adaptive bit-loading OFDM: constellation mappers, channel probing,
loading selection on a shaped channel, and loaded end-to-end decode."""

import numpy as np

import jax.numpy as jnp

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.ofdm_adaptive import (
    OfdmAdaptiveConfig,
    OfdmAdaptiveModem,
    _bits_to_qam16,
    _qam16_to_bits,
    choose_loading,
    estimate_bin_snr,
    probe_waveform,
)


def test_qam16_mapper_roundtrip():
    # all 16 points: exact roundtrip + unit average constellation power
    allbits = ((np.arange(16)[:, None] >> np.arange(3, -1, -1)) & 1
               ).astype(np.uint8).reshape(1, 64)
    sym = _bits_to_qam16(jnp.asarray(allbits))
    assert abs(float(jnp.mean(jnp.abs(sym) ** 2)) - 1.0) < 1e-5
    assert np.array_equal(np.asarray(_qam16_to_bits(sym)), allbits)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (5, 64), dtype=np.uint8)
    sym = _bits_to_qam16(jnp.asarray(bits))
    back = np.asarray(_qam16_to_bits(sym))
    assert np.array_equal(back, bits)


def test_uniform_default_roundtrip():
    modem = OfdmAdaptiveModem()          # loading=() -> uniform QPSK
    payloads = [bytes([i]) * 30 for i in range(3)]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    wave = modem.encode_frames(frames, gap_samples=300)
    rng = np.random.default_rng(1)
    noisy = (wave + rng.normal(0, 0.01, len(wave))).astype(np.float32)
    got = modem.decode(noisy, 7 + 30, max_frames=4)
    assert [f.data for f in got] == payloads


def test_mixed_loading_roundtrip():
    cfg = OfdmAdaptiveConfig()
    n = len(cfg.data_bin_idx)
    rng = np.random.default_rng(2)
    loading = tuple(rng.choice([0, 1, 2, 4], size=n,
                               p=[0.1, 0.2, 0.4, 0.3]).tolist())
    modem = OfdmAdaptiveModem(loading=loading)
    payloads = [bytes(range(40)), b"\xff\x00" * 20]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    wave = modem.encode_frames(frames, gap_samples=300)
    noisy = (wave + rng.normal(0, 0.008, len(wave))).astype(np.float32)
    got = modem.decode(noisy, 7 + 40, max_frames=4)
    assert [f.data for f in got] == payloads


def _shaped(x, rng, sigma):
    """Lowpass-shaped channel: strong low bins, ~-24 dB high bins.

    NOTE on sigma: the probe's per-bin SNR estimate carries ~2 dB of
    run-to-run variance (8 symbols), so tests run the loaded link where
    the plateau sits comfortably ABOVE the 16-QAM threshold — at a
    knife-edge plateau the loading is genuinely marginal by design
    (production pairs it with FEC)."""
    taps = 31
    t = np.arange(taps) - taps // 2
    fc = 6000.0 / 48000.0
    h = 2 * fc * np.sinc(2 * fc * t) * np.hamming(taps)
    h = h + 0.06 * np.eye(taps)[taps // 2]       # direct-path leakage
    y = np.convolve(x, h, mode="same")
    return (y + rng.normal(0, sigma, len(y))).astype(np.float32)


def test_probe_reflects_channel_shape_and_loaded_link_decodes():
    cfg = OfdmAdaptiveConfig()
    rng = np.random.default_rng(3)
    probe = probe_waveform(cfg)
    rx = _shaped(np.concatenate([np.zeros(500, np.float32), probe,
                                 np.zeros(800, np.float32)]), rng, 0.004)
    from trackmaker_tpu.phy.ofdm import find_preambles
    s = int(np.asarray(find_preambles(cfg, jnp.asarray(rx), 2))[0])
    assert s >= 0
    snr = np.asarray(estimate_bin_snr(cfg, jnp.asarray(rx), s))
    freqs = (cfg.data_bin_idx + cfg.bin_lo) * 48000.0 / cfg.n_fft
    lo = snr[freqs < 4500].mean()
    hi = snr[freqs > 9000].mean()
    assert lo > 10 * hi, (lo, hi)     # shaping visible in the estimate

    loading = choose_loading(snr)
    lv = np.asarray(loading)
    # strong low bins got more bits than the rolled-off high bins
    assert lv[freqs < 4500].mean() > lv[freqs > 9000].mean()
    assert lv.sum() >= 1

    modem = OfdmAdaptiveModem(cfg, loading=loading)
    payloads = [bytes([7 * i + 1]) * 24 for i in range(3)]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
    wave = modem.encode_frames(frames, gap_samples=400)
    rx2 = _shaped(np.concatenate([wave, np.zeros(900, np.float32)]),
                  rng, 0.002)
    got = modem.decode(rx2, 7 + 24, max_frames=4)
    assert [f.data for f in got] == payloads


def test_loading_beats_uniform_16qam_on_shaped_channel():
    """Rate-adaptive sanity: on the shaped channel, probe-chosen loading
    decodes cleanly while uniform 16-QAM (same peak rate class) fails —
    the whole point of bit-loading."""
    cfg = OfdmAdaptiveConfig()
    rng = np.random.default_rng(4)
    probe = probe_waveform(cfg)
    rx = _shaped(np.concatenate([probe, np.zeros(600, np.float32)]),
                 rng, 0.002)
    from trackmaker_tpu.phy.ofdm import find_preambles
    s = int(np.asarray(find_preambles(cfg, jnp.asarray(rx), 2))[0])
    loading = choose_loading(np.asarray(
        estimate_bin_snr(cfg, jnp.asarray(rx), s)))

    payloads = [bytes([i + 3]) * 32 for i in range(2)]
    frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]

    adaptive = OfdmAdaptiveModem(cfg, loading=loading)
    wave_a = adaptive.encode_frames(frames, gap_samples=400)
    got_a = adaptive.decode(
        _shaped(np.concatenate([wave_a, np.zeros(900, np.float32)]),
                rng, 0.002), 7 + 32, max_frames=4)
    assert [f.data for f in got_a] == payloads

    n = len(cfg.data_bin_idx)
    uniform16 = OfdmAdaptiveModem(cfg, loading=(4,) * n)
    wave_u = uniform16.encode_frames(frames, gap_samples=400)
    got_u = uniform16.decode(
        _shaped(np.concatenate([wave_u, np.zeros(900, np.float32)]),
                rng, 0.002), 7 + 32, max_frames=4)
    assert len(got_u) < len(frames)   # CRC kills the drowned bins' frames
