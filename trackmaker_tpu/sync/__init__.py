from trackmaker_tpu.sync.correlate import (  # noqa: F401
    normalized_xcorr,
    sliding_dot,
    sliding_energy,
)
from trackmaker_tpu.sync.pallas_xcorr import pallas_normalized_xcorr  # noqa: F401

import os

import jax
import numpy as _np


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def bf16_enabled() -> bool:
    """Whether the Pallas xcorr kernel may use bf16 multiplicands.

    Default OFF: decode_capture's invariant is decision-for-decision
    oracle equality, and single-pass bf16 is not provably equal to the
    f32 3-pass matmul at the corr>=0.9 threshold boundary.  bf16 was
    *measured* bit-identical on v5e (and is ~20% faster on the kernel),
    so callers that run their own correctness gate on real hardware —
    bench.py payload-verifies every decode — opt in via
    TM_XCORR_BF16=1.
    """
    return os.environ.get("TM_XCORR_BF16", "0") == "1"


def auto_xcorr(samples, pattern_np, pattern_energy=None, eps: float = 1e-6):
    """Normalized sliding correlation, dispatched by backend.

    On TPU the fused Pallas kernel is both ~18x faster than the XLA conv
    lowering and compiles in ~1s instead of minutes (measured on v5e via
    remote compile); on CPU the conv path is used (Pallas interpret mode
    would be slower and the conv compiles instantly there).
    """
    if _on_tpu():
        return pallas_normalized_xcorr(samples, _np.asarray(pattern_np),
                                       eps=eps, use_bf16=bf16_enabled())
    import jax.numpy as jnp
    return normalized_xcorr(samples, jnp.asarray(pattern_np),
                            pattern_energy, eps)


def auto_sliding_dot_scaled(samples, pattern_np, scale: float):
    """Raw sliding dot(x[i-L+1..i], p)*scale aligned so lag i ends at
    sample i (left zero-history), length == len(samples).  The ASK
    receiver's sync correlator."""
    import jax.numpy as jnp
    l = len(pattern_np)
    padded = jnp.concatenate(
        [jnp.zeros(l - 1, jnp.float32), samples.astype(jnp.float32)])
    if _on_tpu():
        return pallas_normalized_xcorr(
            padded, _np.asarray(pattern_np), normalize=False, scale=scale,
            use_bf16=bf16_enabled())
    out = sliding_dot(padded, jnp.asarray(pattern_np, jnp.float32)) * scale
    return out
