"""Correlation-based preamble synchronization (XLA path).

The reference scans one window at a time with an AVX dot product and an
incrementally-updated window energy (``src/phy/decoder.rs:123-238,358-417``).
On TPU the whole scan is a dense, parallel program: the sliding dot product
is a 1-D convolution (lowered onto the MXU by XLA), the window energy is a
convolution of the squared signal with a box kernel, and the normalized
correlation is a fused elementwise epilogue.

``trackmaker_tpu.sync.pallas_xcorr`` provides a hand-fused Pallas kernel for
the same contract; this module is the portable reference path and the
numerical oracle for that kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv_valid(x: jax.Array, k: jax.Array) -> jax.Array:
    """Valid-mode sliding correlation of x[..., T] with k[L] -> [..., T-L+1]."""
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    xl = x.reshape(-1, 1, t)                       # (B, C=1, T)
    kl = k.reshape(1, 1, -1)                       # (O=1, I=1, L)
    out = jax.lax.conv_general_dilated(
        xl, kl,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out.reshape(*batch_shape, out.shape[-1])


def sliding_dot(samples: jax.Array, pattern: jax.Array) -> jax.Array:
    """dot(samples[i:i+L], pattern) for every lag i (VALID)."""
    return _conv_valid(samples, pattern.astype(samples.dtype))


def sliding_energy(samples: jax.Array, window: int) -> jax.Array:
    """sum(samples[i:i+window]**2) for every lag i (VALID)."""
    ones = jnp.ones((window,), dtype=samples.dtype)
    return _conv_valid(samples * samples, ones)


def normalized_xcorr(
    samples: jax.Array,
    pattern: jax.Array,
    pattern_energy: float | jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Normalized sliding cross-correlation.

    corr[i] = dot(x[i:i+L], p) / (||x[i:i+L]|| * ||p||), with windows whose
    energy is below `eps` forced to 0 (the reference's low-energy skip,
    src/phy/decoder.rs:142-147).
    """
    l = pattern.shape[-1]
    if pattern_energy is None:
        pattern_energy = jnp.sqrt(jnp.sum(pattern.astype(jnp.float32) ** 2))
    dot = sliding_dot(samples, pattern)
    energy = sliding_energy(samples, l)
    denom = jnp.sqrt(jnp.maximum(energy, 0.0)) * pattern_energy
    corr = jnp.where(energy < eps, 0.0, dot / jnp.maximum(denom, 1e-30))
    return corr


def preamble_energy(pattern: np.ndarray) -> float:
    return float(np.sqrt(np.sum(np.asarray(pattern, np.float64) ** 2)))
