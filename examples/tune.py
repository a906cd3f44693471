"""Two-tone sine generator -> WAV (reference examples/tune.rs: the
hardware bring-up / calibration tone, minus the sound card)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from trackmaker_tpu.dsp.osc import carrier_np  # noqa: E402
from trackmaker_tpu.io import write_wav  # noqa: E402


def main(out="tmp/tune.wav", f1=1000.0, f2=10000.0, seconds=2.0,
         sample_rate=48000):
    n = int(seconds * sample_rate)
    tone = 0.5 * (carrier_np(n, f1, sample_rate)
                  + carrier_np(n, f2, sample_rate))
    write_wav(out, tone.astype(np.float32), sample_rate)
    print(f"wrote {out}: {f1:.0f} Hz + {f2:.0f} Hz, {seconds}s")


if __name__ == "__main__":
    main(*sys.argv[1:])
