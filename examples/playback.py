"""Channel passthrough (reference examples/playback.rs: JACK in->out
passthrough; here: WAV in -> simulated channel -> WAV out)."""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trackmaker_tpu.dsp import channel  # noqa: E402
from trackmaker_tpu.io import load_audio, write_wav  # noqa: E402


def main(src="tmp/tune.wav", dst="tmp/passthrough.wav",
         snr_db=20.0, ppm=100.0):
    samples, sr = load_audio(src)
    x = jnp.asarray(samples)
    y = channel.clock_offset(x, float(ppm))
    y = channel.awgn(jax.random.PRNGKey(0), y, float(snr_db))
    y = channel.multipath(y, jnp.asarray([1.0, 0.0, 0.2, 0.0, -0.05]))
    write_wav(dst, np.asarray(y), sr)
    print(f"{src} -> channel(snr={snr_db}dB, {ppm}ppm, echo) -> {dst}")


if __name__ == "__main__":
    main(*sys.argv[1:])
