"""OFDM v2 receiver (phy/ofdm_v2.py): Schmidl-Cox timing, smoothed
channel estimate, per-frame-fitted pilot phase tracking.

Measured context (CPU, 6 noise seeds x 8 frames, docs/BENCHMARKS.md):
the v1 receiver's frame-success cliff sits at sigma ~= 0.034; a genie
receiver (perfect channel, perfect timing) on the same waveform sits at
~= 0.043 — i.e. only ~2.0 dB was recoverable WITHOUT coding, and v2
reaches ~= 0.041-0.043 (within ~0.3 dB of the genie).  The round-1
verdict asked for ">= 3 dB"; that is infeasible uncoded, so the tests
pin what v2 actually delivers: >= 1.5 dB cliff improvement over v1 plus
clock-offset robustness v1 does not have.
"""

import numpy as np
import pytest

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.ofdm import OfdmModem
from trackmaker_tpu.phy.ofdm_v2 import OfdmModemV2, OfdmV2Config


@pytest.fixture(scope="module")
def payload_frames():
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
                for _ in range(6)]
    return payloads, [Frame.new_data(i, 1, 2, p)
                      for i, p in enumerate(payloads)]


def _rate(modem, wave, payloads, sigma, seeds=3):
    ok = tot = 0
    for s in range(seeds):
        r = np.random.default_rng(100 + s)
        noisy = (wave + r.normal(0, sigma, len(wave))).astype(np.float32)
        dec = [f.data for f in modem.decode(noisy, 71, max_frames=8)]
        ok += sum(1 for d in dec if d in payloads)
        tot += len(payloads)
    return ok / tot


def _resample(w, factor):
    xi = np.arange(int(len(w) / factor)) * factor
    return np.interp(xi, np.arange(len(w)), w).astype(np.float32)


def test_v2_clean_roundtrip(payload_frames):
    payloads, frames = payload_frames
    m2 = OfdmModemV2()
    w2 = m2.encode_frames(frames, gap_samples=300)
    assert [f.data for f in m2.decode(w2, 71, max_frames=8)] == payloads


def test_v2_cliff_beats_v1(payload_frames):
    """At sigma=0.04 (past v1's cliff, before v2's) v2 must decode a
    solid fraction while v1 nearly dies — >= 1.5 dB of cliff movement,
    most of the ~2.0 dB the genie bound allows."""
    payloads, frames = payload_frames
    m1, m2 = OfdmModem(), OfdmModemV2()
    w1 = m1.encode_frames(frames, gap_samples=300)
    w2 = m2.encode_frames(frames, gap_samples=300)
    r1 = _rate(m1, w1, payloads, 0.040)
    r2 = _rate(m2, w2, payloads, 0.040)
    assert r2 >= 0.3, r2
    assert r1 <= 0.3, r1
    assert r2 > r1
    # both clean at v1's comfortable operating point
    assert _rate(m2, w2, payloads, 0.02) == 1.0


@pytest.mark.parametrize("ppm", [20, 300])
def test_v2_clock_offset_robust(payload_frames, ppm):
    """+-20 ppm must be clean (the verdict's gate); +-300 ppm is where
    v1 measurably loses frames and v2 does not (the per-frame linear
    phase-trajectory fit tracks the drift ramp)."""
    payloads, frames = payload_frames
    m2 = OfdmModemV2()
    w2 = m2.encode_frames(frames, gap_samples=300)
    f = 1 + ppm * 1e-6
    for w in (_resample(w2, f), _resample(w2, 1 / f)):
        got = [x.data for x in m2.decode(w, 71, max_frames=8)]
        assert got == payloads, (ppm, len(got))


def test_v1_loses_frames_at_300ppm(payload_frames):
    payloads, frames = payload_frames
    m1 = OfdmModem()
    w1 = m1.encode_frames(frames, gap_samples=300)
    got = [x.data for x in m1.decode(_resample(w1, 1 + 300e-6), 71,
                                     max_frames=8)]
    assert len(got) < len(payloads)  # documents why v2 exists


def test_v2_pilot_overhead_accounting():
    cfg = OfdmV2Config()
    assert len(cfg.pilot_bin_idx) + len(cfg.data_bin_idx) == cfg.n_bins
    assert cfg.bits_per_symbol == len(cfg.data_bin_idx) * 2


def test_v2_sc_pilot_halves_identical():
    """The SC pilot symbol's body must be two identical halves (that is
    what the timing metric exploits)."""
    import jax.numpy as jnp
    from trackmaker_tpu.core import bitops
    from trackmaker_tpu.phy.ofdm_v2 import modulate_bits_v2
    cfg = OfdmV2Config()
    f = Frame.new_data(0, 1, 2, b"x" * 16)
    bits = bitops.bytes_to_bits_host(f.to_bytes())
    w = np.asarray(modulate_bits_v2(cfg, jnp.asarray(bits[None]),
                                    len(bits)))[0]
    body = w[cfg.preamble_len + cfg.guard_samples + cfg.cp_len:
             cfg.preamble_len + cfg.guard_samples + cfg.sym_len]
    half = cfg.n_fft // 2
    np.testing.assert_allclose(body[:half], body[half:], atol=1e-5)


def test_sc_refine_matches_direct_form():
    """The gather-free banded-matmul Schmidl-Cox refine must pick the
    same fine-timing positions as the direct per-frame window-stack
    form (the round-3 implementation, reproduced here in NumPy) on
    noisy multi-frame captures at random lead-ins."""
    import numpy as np
    import jax.numpy as jnp
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.phy.ofdm import find_preambles
    from trackmaker_tpu.phy.ofdm_v2 import (
        OfdmModemV2, OfdmV2Config, _sc_refine)

    cfg = OfdmV2Config()
    modem = OfdmModemV2(cfg)
    body_off = cfg.preamble_len + cfg.guard_samples
    half = cfg.n_fft // 2
    s = cfg.sc_search

    def direct(rx, starts):
        pad = np.concatenate(
            [rx, np.zeros(body_off + cfg.cp_len + 2 * s + cfg.n_fft + 8,
                          np.float32)]).astype(np.float32)
        out = []
        for st in starts:
            base = max(st + body_off + cfg.cp_len - s, 0)
            seg = pad[base: base + 2 * s + cfg.n_fft]
            m = np.empty(2 * s)
            for d in range(2 * s):
                a = seg[d: d + half]
                b = seg[d + half: d + 2 * half]
                p = np.sum(a * b, dtype=np.float32)
                r = np.sum(b * b, dtype=np.float32)
                m[d] = (p * p) / max(r * r, 1e-12)
            d_star = int(np.argmax(m))
            out.append(base + d_star - cfg.cp_len - body_off)
        return np.asarray(out)

    rng = np.random.default_rng(8)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 64) for i in range(4)]
    for lead in (0, 5, 31, 97, 200):
        wave = modem.encode_frames(frames, gap_samples=333)
        x = np.concatenate([np.zeros(lead, np.float32), wave])
        x = (x + rng.normal(0, 0.02, len(x))).astype(np.float32)
        starts = np.asarray(find_preambles(cfg, jnp.asarray(x), 4))
        starts = starts[starts >= 0]
        assert len(starts) == 4
        got = np.asarray(_sc_refine(cfg, jnp.asarray(x),
                                    jnp.asarray(starts, jnp.int32)))
        want = direct(x, starts)
        assert np.array_equal(got, want), (lead, got, want)
