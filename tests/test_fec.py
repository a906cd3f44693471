"""FEC tests: Hamming(7,4) + interleaving, and the OFDM gain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core import fec
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp import channel
from trackmaker_tpu.phy.ofdm import OfdmModem


def test_hamming_roundtrip_clean():
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (5, 64)), dtype=jnp.uint8)
    coded = fec.hamming74_encode(bits)
    assert coded.shape == (5, 112)
    back = fec.hamming74_decode(coded)
    assert np.array_equal(np.asarray(back)[:, :64], np.asarray(bits))


def test_hamming_corrects_single_errors():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, 400), dtype=jnp.uint8)
    coded = np.array(fec.hamming74_encode(bits))  # writable copy
    # flip exactly one bit in every 7-bit codeword
    for k in range(len(coded) // 7):
        coded[7 * k + rng.integers(0, 7)] ^= 1
    back = fec.hamming74_decode(jnp.asarray(coded))
    assert np.array_equal(np.asarray(back)[:400], np.asarray(bits))


def test_interleaver_roundtrip():
    bits = jnp.asarray(np.arange(100) % 2, dtype=jnp.uint8)
    inter = fec.interleave(bits, 16)
    back = fec.deinterleave(inter, 16, 100)
    assert np.array_equal(np.asarray(back), np.asarray(bits))


def test_ofdm_fec_roundtrip_clean():
    modem = OfdmModem(fec=True)
    frame = Frame.new_data(1, 1, 2, b"forward error corrected" * 3)
    wave = modem.encode_frames([frame])
    got = modem.decode(wave, len(frame.to_bytes()))
    assert len(got) == 1 and got[0].data == frame.data


def test_ofdm_viterbi_soft_decision_gain():
    """Soft-decision Viterbi (rate-1/2 K=7) decodes cleanly ~6 dB below
    the Hamming cliff (measured: plain fails <16 dB, hamming works at
    15 dB, viterbi at 10 dB)."""
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 64) for i in range(8)]
    key = jax.random.PRNGKey(4)
    m = OfdmModem(fec="conv")
    w = m.encode_frames(frames, gap_samples=400)
    noisy = np.asarray(channel.awgn(key, jnp.asarray(w), 10.0))
    got = m.decode(noisy, len(frames[0].to_bytes()))
    assert len(got) == 8
    assert [f.data for f in got] == [f.data for f in frames]


def test_ofdm_fec_beats_uncoded_at_low_snr():
    """At an SNR where uncoded OFDM collapses, FEC recovers frames."""
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 64) for i in range(8)]
    key = jax.random.PRNGKey(4)
    snr = 15.0
    plain = OfdmModem(fec=False)
    coded = OfdmModem(fec=True)
    w_plain = plain.encode_frames(frames, gap_samples=400)
    w_coded = coded.encode_frames(frames, gap_samples=400)
    n_plain = len(plain.decode(
        np.asarray(channel.awgn(key, jnp.asarray(w_plain), snr)),
        len(frames[0].to_bytes())))
    n_coded = len(coded.decode(
        np.asarray(channel.awgn(key, jnp.asarray(w_coded), snr)),
        len(frames[0].to_bytes())))
    assert n_coded > n_plain
    assert n_coded >= 6
