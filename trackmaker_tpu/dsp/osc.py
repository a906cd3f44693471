"""Oscillators and chirp synthesis.

Reference: the ASK example's carrier and chirp preamble
(``examples/ask.rs:151-185``, itself a port of ``docs/public/SamplePHY.m``).
The chirp's cumulative trapezoidal phase integration becomes a ``cumsum``.
Host (NumPy) variants are provided for baking constants into jitted
programs; JAX variants for on-device synthesis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def carrier(num_samples: int, freq_hz: float, sample_rate: int) -> jax.Array:
    """sin(2π f t) for t = i/fs (examples/ask.rs:155-160)."""
    t = jnp.arange(num_samples, dtype=jnp.float32) / sample_rate
    return jnp.sin(2.0 * jnp.pi * freq_hz * t)


def carrier_np(num_samples: int, freq_hz: float, sample_rate: int) -> np.ndarray:
    t = np.arange(num_samples, dtype=np.float32) / np.float32(sample_rate)
    return np.sin(np.float32(2.0 * np.pi * freq_hz) * t).astype(np.float32)


def chirp_freq_profile(
    num_samples: int, f_lo: float, f_hi: float
) -> np.ndarray:
    """Symmetric up-down linear sweep (ask.rs:166-174): first half
    f_lo -> f_hi, second half f_hi -> f_lo, each endpoint-inclusive with
    denominator (half-1)."""
    half = num_samples // 2
    i = np.arange(half, dtype=np.float32)
    up = f_lo + (f_hi - f_lo) * i / np.float32(half - 1)
    down = f_hi - (f_hi - f_lo) * i / np.float32(half - 1)
    return np.concatenate([up, down]).astype(np.float32)


def chirp_np(
    num_samples: int = 440,
    f_lo: float = 2000.0,
    f_hi: float = 10000.0,
    sample_rate: int = 48000,
) -> np.ndarray:
    """Chirp via cumulative trapezoidal phase integration
    (ask.rs:177-185): omega_i = omega_{i-1} + π (f_i + f_{i-1}) dt,
    sample_i = sin(omega_i); sample_0 = sin(2π f_0 t_0) = 0.

    Accumulation is done in float32 to match the reference bit-for-bit in
    decision-relevant ways (it used f32 throughout).
    """
    f = chirp_freq_profile(num_samples, f_lo, f_hi)
    dt = np.float32(1.0 / sample_rate)
    incr = (np.float32(np.pi) * (f[1:] + f[:-1]) * dt).astype(np.float32)
    omega = np.zeros(num_samples, dtype=np.float32)
    # sequential f32 accumulation (order matters for exactness)
    acc = np.float32(0.0)
    for i in range(1, num_samples):
        acc = np.float32(acc + incr[i - 1])
        omega[i] = acc
    out = np.sin(omega, dtype=np.float32)
    out[0] = np.float32(0.0)
    return out


@functools.lru_cache(maxsize=8)
def chirp_cached(
    num_samples: int = 440,
    f_lo: float = 2000.0,
    f_hi: float = 10000.0,
    sample_rate: int = 48000,
) -> np.ndarray:
    return chirp_np(num_samples, f_lo, f_hi, sample_rate)


def chirp(
    num_samples: int = 440,
    f_lo: float = 2000.0,
    f_hi: float = 10000.0,
    sample_rate: int = 48000,
) -> jax.Array:
    """On-device chirp synthesis (cumsum phase integration)."""
    f = jnp.asarray(chirp_freq_profile(num_samples, f_lo, f_hi))
    dt = 1.0 / sample_rate
    incr = jnp.pi * (f[1:] + f[:-1]) * dt
    omega = jnp.concatenate([jnp.zeros(1), jnp.cumsum(incr)])
    return jnp.sin(omega).at[0].set(0.0)
