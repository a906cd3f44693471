"""Record-from-bus -> WAV (reference examples/waverec.rs: capture the
channel to a WAV file; here the "microphone" is a recording endpoint on
the simulated bus while another node transmits)."""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from trackmaker_tpu.core.config import MacConfig, PhyConfig  # noqa: E402
from trackmaker_tpu.core.framing import Frame  # noqa: E402
from trackmaker_tpu.io import write_wav  # noqa: E402
from trackmaker_tpu.link.audio import AppState, AudioEndpoint  # noqa: E402
from trackmaker_tpu.link.bus import SimulatedBus  # noqa: E402
from trackmaker_tpu.phy.encoder import PhyEncoder  # noqa: E402


def main(out="tmp/waverec.wav", seconds=3.0):
    cfg = PhyConfig()
    bus = SimulatedBus(noise_std=0.01)
    tx, mic = AudioEndpoint("tx"), AudioEndpoint("mic")
    bus.attach(tx)
    bus.attach(mic)

    frames = [Frame.new_data(i, 1, 2, f"recording {i}".encode() * 4)
              for i in range(6)]
    track = PhyEncoder(cfg).encode_frames(frames, gap_samples=8000)
    tx.set_playback(track)
    tx.set_state(AppState.PLAYING)
    mic.set_state(AppState.RECORDING)

    bus.run(int(seconds * bus.sample_rate))
    capture = mic.take_record()
    write_wav(out, capture, bus.sample_rate)
    print(f"recorded {len(capture)} samples -> {out}")
    print("decode it back with: python -m trackmaker_tpu.cli decode", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
