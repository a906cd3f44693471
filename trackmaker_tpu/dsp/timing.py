"""Sample-clock offset recovery.

Cheap sound cards disagree by 10s-to-1000s of ppm; the line-coded PHY
tolerates only ~100 ppm over a max-size frame (no in-frame timing
tracking — same as the reference).  Two batched strategies:

* :func:`decode_with_clock_search` — resample the capture at a grid of
  candidate ratios (one batched resample + one vmapped decode) and keep
  the ratio that yields the most CRC-valid frames.  Robust, brute-force,
  embarrassingly parallel: exactly the kind of search a TPU makes free.
* :func:`estimate_clock_ppm` — closed-form estimate from detected
  preamble spacing vs the nominal frame pitch, for telemetry or to
  center a narrow search grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.dsp.channel import clock_offset
from trackmaker_tpu.phy.decoder import DecodedFrames, decode_capture


def decode_with_clock_search(
    cfg: PhyConfig,
    samples,                       # f32[T]
    local_addr: int,
    ppm_grid=(-2000.0, -1000.0, -500.0, 0.0, 500.0, 1000.0, 2000.0),
    max_frames: int = 64,
) -> tuple[DecodedFrames, float]:
    """-> (best decode, chosen_ppm).  Resampling by -ppm undoes a +ppm
    transmitter-fast clock."""
    x = jnp.asarray(samples, jnp.float32)
    grid = jnp.asarray(ppm_grid, jnp.float32)

    @jax.jit
    def run(xx):
        def one(ppm):
            y = clock_offset(xx, -ppm)
            return decode_capture(cfg, y, local_addr,
                                  max_frames=max_frames)
        return jax.vmap(one)(grid)

    res = run(x)
    counts = np.asarray(res.count)
    best = int(np.argmax(counts))
    pick = jax.tree_util.tree_map(lambda a: a[best], res)
    return pick, float(ppm_grid[best])


def estimate_clock_ppm(starts: np.ndarray, nominal_pitch: float) -> float:
    """Estimate ppm from detected preamble start positions of a regular
    frame train: observed pitch / nominal - 1, in ppm."""
    starts = np.asarray(starts, np.float64)
    starts = starts[starts >= 0]
    if len(starts) < 2:
        return 0.0
    observed = np.median(np.diff(starts))
    return (observed / nominal_pitch - 1.0) * 1e6
