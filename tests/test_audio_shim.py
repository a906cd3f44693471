"""C++ audio shim (runtime/csrc/tm_audio.cc): loopback virtual cable +
the record.py bring-up loop.  The ALSA path needs real hardware (it
dlopen()s libasound at runtime) — here we exercise everything up to the
device boundary: ring plumbing, the pump thread, pacing, and PHY
frames decoded off the captured stream."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _runtime():
    return pytest.importorskip("trackmaker_tpu.runtime")


def test_loopback_moves_samples_exactly():
    rt = _runtime()
    d = rt.AudioDuplex(backend=rt.BACKEND_LOOPBACK_FAST)
    try:
        x = np.sin(np.arange(30000) * 0.01).astype(np.float32)
        d.play(x)
        got = np.zeros(0, np.float32)
        deadline = time.time() + 10
        while len(got) < len(x) and time.time() < deadline:
            got = np.concatenate([got, d.capture(8192)])
        np.testing.assert_array_equal(got[: len(x)], x)
    finally:
        d.close()


def test_paced_loopback_roughly_realtime():
    rt = _runtime()
    d = rt.AudioDuplex(backend=rt.BACKEND_LOOPBACK, rate=48_000)
    try:
        d.play(np.ones(48_000, np.float32))
        time.sleep(0.25)
        moved = d.pending_capture()
        # paced at 48 kHz: ~12k samples in 0.25 s (generous bounds for
        # a loaded CI box)
        assert 2_000 <= moved <= 48_000, moved
    finally:
        d.close()


def test_phy_frames_over_loopback_decode():
    rt = _runtime()
    from trackmaker_tpu.core.config import PhyConfig
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.link.stream import StreamingDecodePipeline
    from trackmaker_tpu.phy.encoder import PhyEncoder

    cfg = PhyConfig()
    frames = [Frame.new_data(i, 1, 2, bytes([65 + i]) * (5 + i))
              for i in range(3)]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=1500)
    d = rt.AudioDuplex(backend=rt.BACKEND_LOOPBACK_FAST)
    try:
        d.play(wave.astype(np.float32))
        got = np.zeros(0, np.float32)
        deadline = time.time() + 15
        while len(got) < len(wave) and time.time() < deadline:
            got = np.concatenate([got, d.capture(8192)])
    finally:
        d.close()
    pipe = StreamingDecodePipeline(cfg, local_addr=2)
    decoded = pipe.push(got) + pipe.flush()
    assert [f.data for f in decoded] == [f.data for f in frames]


def test_alsa_backend_fails_cleanly_without_hardware():
    rt = _runtime()
    if rt.alsa_available():
        pytest.skip("host actually has ALSA")
    with pytest.raises(RuntimeError):
        rt.AudioDuplex(backend=rt.BACKEND_ALSA)


def test_jack_backend_roundtrip_or_clean_failure():
    """With a JACK/PipeWire server: full duplex client comes up (and the
    RT callback feeds the rings).  Without: clean RuntimeError, never a
    crash or hang."""
    rt = _runtime()
    if not rt.jack_available():
        assert isinstance(rt.jack_available(), bool)
        with pytest.raises(RuntimeError):
            rt.AudioDuplex(backend=rt.BACKEND_JACK)
        return
    try:
        d = rt.AudioDuplex(backend=rt.BACKEND_JACK)
    except RuntimeError:
        return  # libjack present but no server running — clean failure
    try:
        import numpy as np
        d.play(np.zeros(256, np.float32))
    finally:
        d.close()


def test_portaudio_backend_roundtrip_or_clean_failure():
    """With libportaudio + a duplex device: stream comes up.  Without:
    clean RuntimeError (availability probe false on bare containers),
    never a crash or hang."""
    rt = _runtime()
    if not rt.portaudio_available():
        assert isinstance(rt.portaudio_available(), bool)
        with pytest.raises(RuntimeError):
            rt.AudioDuplex(backend=rt.BACKEND_PORTAUDIO)
        return
    try:
        d = rt.AudioDuplex(backend=rt.BACKEND_PORTAUDIO)
    except RuntimeError:
        return  # library present but no duplex device — clean failure
    try:
        import numpy as np
        d.play(np.zeros(256, np.float32))
    finally:
        d.close()


def test_record_example_end_to_end():
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "record.py"),
         "--seconds", "0.3", "--fast"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "payloads exact: True" in out.stdout
    assert "replay round-trip exact: True" in out.stdout
