"""ASK/chirp modem loopback demo (reference examples/ask.rs test mode):
modulate think-different.txt into 100 frames, dump the track to
WAV+JSON, demodulate, compare."""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from trackmaker_tpu.io import AudioData, dump_to_json, dump_to_wav  # noqa: E402
from trackmaker_tpu.phy import ask  # noqa: E402


def main():
    text = open("assets/think-different.txt", "rb").read()
    cfg = ask.AskConfig()
    frames = ask.build_frames(text)
    track = ask.build_track(cfg, frames, seed=1)

    dump_to_wav("tmp/ask_output.wav", AudioData(cfg.sample_rate, track))
    dump_to_json("tmp/ask_output.json", AudioData(cfg.sample_rate, track))
    print(f"track: {len(track)} samples "
          f"({len(track) / cfg.sample_rate:.1f}s) -> tmp/ask_output.*")

    res = ask.demodulate(cfg, jnp.asarray(track), max_frames=110)
    decoded = ask.assemble_text(res)
    ok = decoded[: len(text)] == text
    print(f"decoded {int(res.count)}/100 frames, prefix exact: {ok}")
    print(decoded[:200].decode("ascii", "replace"))


if __name__ == "__main__":
    main()
