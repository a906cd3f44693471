"""Simulated acoustic channel models, on-device.

The reference's "channel" is real air between laptops; its only fault
injector is physics.  Here the channel is explicit and parameterized so
robustness sweeps (BASELINE config 4: AWGN + clock offset) run as batched
array ops inside the same XLA program as the modem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn(key: jax.Array, x: jax.Array, snr_db: jax.Array | float) -> jax.Array:
    """Add white Gaussian noise at the given SNR (dB, vs signal power)."""
    power = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    snr = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    sigma = jnp.sqrt(power / jnp.maximum(snr, 1e-12))
    noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
    return x + sigma * noise


def gain(x: jax.Array, g: jax.Array | float) -> jax.Array:
    return x * jnp.asarray(g, x.dtype)


def clock_offset(x: jax.Array, ppm: jax.Array | float) -> jax.Array:
    """Resample by (1 + ppm*1e-6) with linear interpolation — models
    sample-clock mismatch between sender and receiver sound cards."""
    t = x.shape[-1]
    ratio = 1.0 + jnp.asarray(ppm, jnp.float32) * 1e-6
    pos = jnp.arange(t, dtype=jnp.float32) * ratio
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    i1 = jnp.clip(i0 + 1, 0, t - 1)
    frac = pos - i0.astype(jnp.float32)
    return x[..., i0] * (1.0 - frac) + x[..., i1] * frac


def delay(x: jax.Array, num_samples: int) -> jax.Array:
    """Integer-sample propagation delay (zero-prefix, same length)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(num_samples, 0)])[
        ..., : x.shape[-1]]


def multipath(x: jax.Array, taps: jax.Array) -> jax.Array:
    """Convolve with a small echo impulse response: y[n] = sum_k
    taps[k] x[n-k], so taps[0] is the direct path and taps[d] an echo
    at delay d.  (fir_filter is XLA cross-correlation — no kernel flip
    — hence the explicit reverse to get true convolution semantics.)"""
    from trackmaker_tpu.dsp.filters import fir_filter
    y = fir_filter(x, taps[::-1], mode="full")
    return y[..., : x.shape[-1]]


def mix(signals: jax.Array) -> jax.Array:
    """Superpose concurrent transmissions (shared-medium model): sum over
    the leading axis."""
    return jnp.sum(signals, axis=0)
