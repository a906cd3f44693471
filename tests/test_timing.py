"""Clock-offset recovery tests."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.dsp.channel import clock_offset
from trackmaker_tpu.dsp.timing import (
    decode_with_clock_search, estimate_clock_ppm)
from trackmaker_tpu.phy.decoder import decode_capture
from trackmaker_tpu.phy.encoder import PhyEncoder


def _skewed_capture(ppm, n_frames=8, seed=0):
    cfg = PhyConfig()
    rng = np.random.default_rng(seed)
    frames = [Frame.new_data(i, 1, 2,
                             rng.integers(0, 256, 64,
                                          dtype=np.uint8).tobytes())
              for i in range(n_frames)]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=240)
    return cfg, frames, np.asarray(clock_offset(jnp.asarray(wave),
                                                float(ppm)))


def test_clock_search_recovers_1000ppm():
    cfg, frames, skewed = _skewed_capture(1000.0)
    # plain decode collapses at 1000 ppm
    plain = decode_capture(cfg, jnp.asarray(skewed), 2, max_frames=12)
    assert int(plain.count) < len(frames)
    res, ppm = decode_with_clock_search(cfg, skewed, 2, max_frames=12)
    assert int(res.count) == len(frames)
    assert abs(ppm - 1000.0) <= 500.0
    got = res.to_frames()
    assert [f.data for f in got] == [f.data for f in frames]


def test_clock_search_neutral_on_clean_capture():
    cfg, frames, wave = _skewed_capture(0.0, n_frames=4, seed=2)
    res, ppm = decode_with_clock_search(cfg, wave, 2, max_frames=8)
    assert int(res.count) == 4
    assert ppm == 0.0


def test_estimate_clock_ppm():
    starts = np.asarray([0, 10010, 20020, 30030])
    est = estimate_clock_ppm(starts, 10000.0)
    assert abs(est - 1000.0) < 1.0
