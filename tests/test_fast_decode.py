"""decode_capture_fast: the optimistic 4B5B two-pass must always equal
the exact path — including when the conformance check trips and the
fallback engages."""

import numpy as np
import pytest

import jax.numpy as jnp

from trackmaker_tpu.core.config import FOUR_B_FIVE_B, MANCHESTER, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleDecoder, OracleEncoder
from trackmaker_tpu.phy.decoder import decode_capture, decode_capture_fast


def _cfg():
    return PhyConfig(line_coding=FOUR_B_FIVE_B)


def _eq(a, b):
    assert [f.to_bytes() for f in a.to_frames()] == \
        [f.to_bytes() for f in b.to_frames()]
    np.testing.assert_array_equal(
        np.asarray(a.start)[np.asarray(a.valid)],
        np.asarray(b.start)[np.asarray(b.valid)])


def test_fast_clean_capture_conformant():
    cfg = _cfg()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(0)
    parts = []
    for i in range(6):
        parts.append(rng.normal(0, 0.02, 500 + 200 * i).astype(np.float32))
        parts.append(enc.encode_frame(
            Frame.new_data(i, 1, 2, bytes([i]) * (3 + i))))
    wave = np.concatenate(parts + [np.zeros(2000, np.float32)])
    res, ok = decode_capture(cfg, wave, 2, max_frames=16, optimistic=True)
    assert bool(ok)
    _eq(res, decode_capture(cfg, wave, 2, max_frames=16))
    _eq(decode_capture_fast(cfg, wave, 2, max_frames=16),
        decode_capture(cfg, wave, 2, max_frames=16))


def test_fast_line_fail_trips_conformance_and_falls_back():
    cfg = _cfg()
    enc = OracleEncoder(cfg)
    f1 = Frame.new_data(1, 1, 2, b"0123456789abcdef")
    f2 = Frame.new_data(2, 1, 2, b"recovered-after")
    w1 = np.array(enc.encode_frame(f1), np.float32)
    # invalid 4B5B symbol inside f1's payload -> line-fail, partial
    # consume; the optimistic walk (full consume) diverges
    k = 20
    w1[cfg.preamble_len + k * 15: cfg.preamble_len + (k + 1) * 15] = 0.0
    wave = np.concatenate(
        [w1, np.zeros(300, np.float32), enc.encode_frame(f2)])
    _res, ok = decode_capture(cfg, wave, 2, max_frames=16, optimistic=True)
    assert not bool(ok)
    exact = decode_capture(cfg, wave, 2, max_frames=16)
    _eq(decode_capture_fast(cfg, wave, 2, max_frames=16), exact)
    # oracle agreement too
    want = OracleDecoder(cfg, 2).process_samples(wave)
    assert [g.to_bytes() for g in exact.to_frames()] == \
        [g.to_bytes() for g in want]


def test_fast_line_fail_on_foreign_dst_frame_still_exact():
    """The consumption of a dst-filtered frame also depends on
    line_fail — conformance must cover attempted-but-not-kept slots."""
    cfg = _cfg()
    enc = OracleEncoder(cfg)
    foreign = Frame.new_data(1, 1, 9, b"not-ours-corrupted")
    w1 = np.array(enc.encode_frame(foreign), np.float32)
    w1[cfg.preamble_len + 22 * 15: cfg.preamble_len + 23 * 15] = 0.0
    mine = Frame.new_data(2, 1, 2, b"mine")
    wave = np.concatenate(
        [w1, np.zeros(200, np.float32), enc.encode_frame(mine)])
    _res, ok = decode_capture(cfg, wave, 2, max_frames=16, optimistic=True)
    assert not bool(ok)
    _eq(decode_capture_fast(cfg, wave, 2, max_frames=16),
        decode_capture(cfg, wave, 2, max_frames=16))


def test_fast_batched_mixed_conformance():
    cfg = _cfg()
    enc = OracleEncoder(cfg)
    t = 20000
    waves = []
    for b in range(4):
        parts = [np.zeros(137 * (b + 1), np.float32)]
        for i in range(3):
            parts.append(enc.encode_frame(
                Frame.new_data(10 * b + i, 1, 2, bytes([b]) * (4 + i))))
            parts.append(np.zeros(400, np.float32))
        w = np.concatenate(parts)
        w = np.pad(w, (0, t - len(w)))
        if b == 2:  # corrupt one capture -> fallback for that row only
            w[200 + cfg.preamble_len + 18 * 15:
              200 + cfg.preamble_len + 19 * 15] = 0.0
            w[137 * 3: 137 * 3 + 60] = 0.0
        waves.append(w)
    batch = np.stack(waves)
    fast = decode_capture_fast(cfg, batch, 2, max_frames=8)
    import jax
    exact = jax.vmap(
        lambda s: decode_capture(cfg, s, 2, max_frames=8))(
            jnp.asarray(batch))
    for k in ("valid", "frame_bytes", "length", "sequence", "start"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, k)), np.asarray(getattr(exact, k)))


def test_fast_manchester_passthrough():
    cfg = PhyConfig(line_coding=MANCHESTER)
    enc = OracleEncoder(cfg)
    wave = enc.encode_frame(Frame.new_data(1, 1, 2, b"manchester"))
    _eq(decode_capture_fast(cfg, wave, 2, max_frames=8),
        decode_capture(cfg, wave, 2, max_frames=8))


@pytest.mark.parametrize("seed", range(6))
def test_fast_fuzz_differential(seed):
    """Seeded corruption fuzz: fast == exact == oracle, whatever the
    conformance outcome."""
    cfg = _cfg()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(100 + seed)
    parts = []
    for i in range(5):
        parts.append(rng.normal(0, 0.03, int(rng.integers(100, 2000)))
                     .astype(np.float32))
        parts.append(enc.encode_frame(Frame.new_data(
            i, 1, int(rng.integers(2, 4)),
            bytes(rng.integers(0, 256, rng.integers(1, 40),
                               dtype=np.uint8)))))
    wave = np.concatenate(parts + [np.zeros(1500, np.float32)])
    # random zero-outs simulate dropouts (invalid symbols)
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(0, len(wave) - 40))
        wave[p: p + int(rng.integers(5, 40))] = 0.0
    want = OracleDecoder(cfg, 2).process_samples(wave)
    fast = decode_capture_fast(cfg, wave, 2, max_frames=16)
    assert [g.to_bytes() for g in fast.to_frames()] == \
        [g.to_bytes() for g in want]
