"""Line-code tests (mirror reference src/phy/line_coding.rs:335-377)."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.phy import line_coding as lc


def test_manchester_roundtrip():
    bits = jnp.asarray([0, 1, 0, 1, 1, 0, 1, 0], dtype=jnp.uint8)
    samples = lc.manchester_encode(bits, 2)
    assert samples.shape == (8 * 2 * 2,)
    # bit 0 -> [1,1,-1,-1]
    assert np.asarray(samples[:4]).tolist() == [1, 1, -1, -1]
    decoded = lc.manchester_decode(samples, 2)
    assert np.asarray(decoded).tolist() == [0, 1, 0, 1, 1, 0, 1, 0]


def test_manchester_batched_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (5, 64)).astype(np.uint8)
    samples = lc.manchester_encode(jnp.asarray(bits), 3)
    decoded = lc.manchester_decode(samples, 3)
    assert (np.asarray(decoded) == bits).all()


def test_manchester_preamble_length():
    cfg = PhyConfig(samples_per_level=2, preamble_pattern_bytes=2)
    pre = lc.preamble_waveform(cfg)
    assert len(pre) == 64  # 16 bits * 2 levels * 2 spl


def test_4b5b_roundtrip():
    bits = jnp.asarray(
        [1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1], dtype=jnp.uint8)
    samples = lc.fourb5b_encode(bits, 4)
    assert samples.shape == (4 * 5 * 4,)
    decoded, ok = lc.fourb5b_decode(samples, 4)
    assert np.asarray(ok).all()
    assert np.asarray(decoded).tolist() == np.asarray(bits).tolist()


def test_4b5b_batched_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (7, 128)).astype(np.uint8)
    samples = lc.fourb5b_encode(jnp.asarray(bits), 3)
    decoded, ok = lc.fourb5b_decode(samples, 3)
    assert np.asarray(ok).all()
    assert (np.asarray(decoded) == bits).all()


def test_4b5b_preamble_length():
    cfg = PhyConfig(samples_per_level=4, preamble_pattern_bytes=2,
                    line_coding="4b5b")
    pre = lc.preamble_waveform(cfg)
    assert len(pre) == 80  # 16 bits -> 4 nibbles -> 20 coded bits * 4 spl


def test_4b5b_invalid_symbol_truncates():
    # All-zero samples decode to all-zero coded bits -> symbol 00000 invalid
    samples = jnp.zeros(5 * 3 * 4, dtype=jnp.float32)
    _, ok = lc.fourb5b_decode(samples, 3)
    assert not np.asarray(ok).any()


def test_4b5b_nrzi_zero_gap_carry():
    """Silence inside a stream must not flip the NRZI reference level
    (the |avg|<=1e-6 carry, line_coding.rs:265-269)."""
    cfg_spl = 3
    bits = jnp.asarray([0, 0, 0, 1], dtype=jnp.uint8)  # one nibble
    samples = np.asarray(lc.fourb5b_encode(bits, cfg_spl))
    # splice 2 symbols of silence into symbol boundary -> decoder sees
    # zero-avg levels; last_avg carries across them
    spliced = np.concatenate(
        [samples, np.zeros(2 * cfg_spl, np.float32), samples])
    decoded, ok = lc.fourb5b_decode(jnp.asarray(spliced), cfg_spl)
    decoded = np.asarray(decoded)
    # decode with the oracle scalar path for equivalence
    from trackmaker_tpu.oracle.phy import _decode_bits
    from trackmaker_tpu.core.config import PhyConfig
    cfg = PhyConfig(samples_per_level=cfg_spl, line_coding="4b5b")
    want = _decode_bits(cfg, spliced)
    ok = np.asarray(ok)
    got = decoded[: len(want)]
    assert (got[ok[: len(want)]] == want[ok[: len(want)]]).all()


def test_jax_vs_oracle_encode_equivalence():
    from trackmaker_tpu.oracle.phy import _encode_bits
    from trackmaker_tpu.core.config import PhyConfig
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 96).astype(np.uint8)
    for coding in ["manchester", "4b5b"]:
        cfg = PhyConfig(samples_per_level=3, line_coding=coding)
        got = np.asarray(lc.encode(cfg, jnp.asarray(bits)))
        want = _encode_bits(cfg, bits)
        assert np.array_equal(got, want), coding
