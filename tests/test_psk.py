"""PSK modem tests (BPSK + QPSK, pilot-aided coherent demod)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp import channel
from trackmaker_tpu.phy.psk import PskConfig, PskModem


@pytest.mark.parametrize("bps", [1, 2])
def test_psk_roundtrip(bps):
    modem = PskModem(PskConfig(bits_per_symbol=bps))
    frame = Frame.new_data(2, 1, 2, b"phase shift keying rules")
    wave = modem.encode_frames([frame])
    got = modem.decode(wave, len(frame.to_bytes()))
    assert len(got) == 1 and got[0].data == frame.data


def test_psk_phase_rotation_recovered():
    """A constant channel phase rotation (e.g. propagation delay) is
    absorbed by the pilot-based estimate."""
    modem = PskModem()
    frames = [Frame.new_data(i, 1, 2, bytes([65 + i]) * 24)
              for i in range(3)]
    wave = modem.encode_frames(frames, gap_samples=300)
    # delay by non-integer carrier cycles -> phase offset at the carrier
    delayed = np.concatenate([np.zeros(5, np.float32), wave])[:len(wave)]
    # give sync slack: delay shifts the chirp too, peak moves with it
    got = modem.decode(np.concatenate(
        [np.zeros(5, np.float32), wave]), len(frames[0].to_bytes()))
    assert [f.data for f in got] == [f.data for f in frames]


def test_psk_noise_robustness():
    modem = PskModem()
    frames = [Frame.new_data(i, 1, 2, bytes(range(32))) for i in range(4)]
    wave = modem.encode_frames(frames, gap_samples=400)
    noisy = np.asarray(channel.awgn(
        jax.random.PRNGKey(7), jnp.asarray(wave), snr_db=8.0))
    got = modem.decode(noisy, len(frames[0].to_bytes()))
    assert [f.data for f in got] == [f.data for f in frames]
