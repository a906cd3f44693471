"""Convolutional code + Viterbi tests."""

import numpy as np
import jax
import jax.numpy as jnp

from trackmaker_tpu.core.convcode import conv_encode, viterbi_decode


def test_conv_encode_known_vector():
    # all-zero input -> all-zero output
    out = np.asarray(conv_encode(jnp.zeros(8, jnp.uint8)))
    assert out.sum() == 0
    # single 1 produces the generator impulse response
    imp = np.asarray(conv_encode(
        jnp.asarray([1, 0, 0, 0, 0, 0, 0, 0], dtype=jnp.uint8)))
    assert imp[:2].tolist() == [1, 1]  # both streams tap the newest bit


def test_viterbi_clean_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 200).astype(np.uint8)
    coded = conv_encode(jnp.asarray(bits))
    dec = viterbi_decode(coded, 200)
    assert np.array_equal(np.asarray(dec), bits)


def test_viterbi_corrects_hard_errors():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 300).astype(np.uint8)
    coded = np.array(conv_encode(jnp.asarray(bits)))
    # flip ~4% of coded bits, spread out
    n_flip = len(coded) // 25
    pos = rng.choice(len(coded), n_flip, replace=False)
    coded[pos] ^= 1
    dec = viterbi_decode(jnp.asarray(coded), 300)
    assert np.array_equal(np.asarray(dec), bits)


def test_viterbi_soft_beats_hard():
    """Soft-decision decoding survives noise levels that break hard
    decisions."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    coded = np.asarray(conv_encode(jnp.asarray(bits))).astype(np.float32)
    tx = 2.0 * coded - 1.0
    noisy = tx + rng.normal(0, 0.7, len(tx)).astype(np.float32)
    soft = viterbi_decode(jnp.asarray(noisy), 400, soft=True)
    hard_in = (noisy > 0).astype(np.uint8)
    hard = viterbi_decode(jnp.asarray(hard_in), 400)
    err_soft = int((np.asarray(soft) != bits).sum())
    err_hard = int((np.asarray(hard) != bits).sum())
    assert err_soft <= err_hard
    assert err_soft <= 2


def test_viterbi_radix_equality():
    """Radix-2/4/8 fused ACS must be decision-identical to radix 1 —
    including tie cases (hard inputs give small-integer metrics, and
    heavy corruption forces many exact path-metric ties) and every
    remainder length (n_steps % radix in {0..7})."""
    rng = np.random.default_rng(3)
    for n_bits in (61, 62, 63, 64, 200):
        bits = rng.integers(0, 2, n_bits).astype(np.uint8)
        coded = np.array(conv_encode(jnp.asarray(bits)))
        # tie-rich: hard bits with 30% flips
        pos = rng.choice(len(coded), len(coded) * 3 // 10, replace=False)
        hard = coded.copy()
        hard[pos] ^= 1
        soft = (2.0 * coded - 1.0
                + rng.normal(0, 0.8, len(coded))).astype(np.float32)
        for rx, is_soft in ((hard, False), (soft, True)):
            ref = np.asarray(viterbi_decode(
                jnp.asarray(rx), n_bits, soft=is_soft, radix=1))
            for k in (2, 4, 8):
                got = np.asarray(viterbi_decode(
                    jnp.asarray(rx), n_bits, soft=is_soft, radix=k))
                assert np.array_equal(got, ref), (n_bits, k, is_soft)


def test_viterbi_radix_equality_vmapped():
    """Same equality under vmap (how phy/coded.py uses it)."""
    rng = np.random.default_rng(4)
    n_bits = 120
    batch = []
    for _ in range(8):
        bits = rng.integers(0, 2, n_bits).astype(np.uint8)
        tx = 2.0 * np.array(conv_encode(jnp.asarray(bits))) - 1.0
        batch.append(tx + rng.normal(0, 0.6, len(tx)))
    xb = jnp.asarray(np.stack(batch), jnp.float32)
    outs = {}
    for k in (1, 4):
        fn = jax.vmap(lambda r: viterbi_decode(r, n_bits, soft=True,
                                               radix=k))
        outs[k] = np.asarray(fn(xb))
    assert np.array_equal(outs[1], outs[4])


def test_viterbi_unroll_invariance():
    """TM_VITERBI_UNROLL is a pure scheduling knob (r5): decodes are
    bit-identical for any unroll, soft and hard, at tie-rich inputs."""
    from trackmaker_tpu.core import convcode
    rng = np.random.default_rng(9)
    n_bits = 150
    bits = rng.integers(0, 2, n_bits).astype(np.uint8)
    coded = np.array(conv_encode(jnp.asarray(bits)))
    soft = (2.0 * coded - 1.0
            + rng.normal(0, 0.9, len(coded))).astype(np.float32)
    saved = convcode.VITERBI_UNROLL
    try:
        convcode.VITERBI_UNROLL = 0
        ref = np.asarray(viterbi_decode(jnp.asarray(soft), n_bits,
                                        soft=True))
        for u in (1, 3, 8, 16, 200):
            convcode.VITERBI_UNROLL = u
            got = np.asarray(viterbi_decode(jnp.asarray(soft), n_bits,
                                            soft=True))
            assert np.array_equal(got, ref), u
    finally:
        convcode.VITERBI_UNROLL = saved
