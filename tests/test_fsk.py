"""Binary FSK modem tests."""

import numpy as np
import jax
import jax.numpy as jnp

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp import channel
from trackmaker_tpu.phy.fsk import FskModem


def test_fsk_single_frame_roundtrip():
    modem = FskModem()
    frame = Frame.new_data(1, 1, 2, b"frequency shift keying")
    wave = modem.encode_frames([frame])
    got = modem.decode(wave, len(frame.to_bytes()))
    assert len(got) == 1 and got[0].data == frame.data


def test_fsk_noise_robustness():
    """Noncoherent FSK should survive much lower SNR than the OFDM QPSK."""
    modem = FskModem()
    frames = [Frame.new_data(i, 1, 2, bytes([65 + i]) * 32)
              for i in range(4)]
    wave = modem.encode_frames(frames, gap_samples=400)
    noisy = np.asarray(channel.awgn(
        jax.random.PRNGKey(3), jnp.asarray(wave), snr_db=6.0))
    got = modem.decode(noisy, len(frames[0].to_bytes()))
    assert [f.data for f in got] == [f.data for f in frames]
