"""Mosaic layout experiment: which merged-matmul epilogues compile?

The attempt-kernel matmul merge wants ONE (rows, 384) @ (384, 256)
matmul whose two 128-lane output halves are then combined with a
row-shifted add:  d = out[0:n, 0:128] + out[1:n+1, 128:256].
The slice out[1:n+1, :] carries sublane offset 1; jnp.concatenate of
such a slice is "Not implemented" in Mosaic (r4 finding), but an
elementwise ADD may be fine.  This probes, on the real TPU compiler:

  A. offset-1 sliding add      d = o[0:34, 0:128] + o[1:35, 128:256]
  B. mask + row-sum (2 rows)   s = sum(where(rowmask, o, 0), axis=0)
  C. iota-built (128,256) one-hot matmul + offset-1 add

Each variant is checked against a NumPy oracle.
"""
import sys, os
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_a(x_ref, t_ref, o_ref):
    out = jnp.dot(x_ref[...], t_ref[...],
                  preferred_element_type=jnp.float32)      # (40, 256)
    o_ref[...] = out[0:32, 0:128] + out[1:33, 128:256]


def kernel_b(x_ref, t_ref, o_ref):
    out = jnp.dot(x_ref[0:2, :], t_ref[...],
                  preferred_element_type=jnp.float32)      # (2, 256)
    row = jax.lax.broadcasted_iota(jnp.int32, (2, 256), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (2, 256), 1)
    keep = ((row == 0) & (lane < 128)) | ((row == 1) & (lane >= 128))
    s = jnp.sum(jnp.where(keep, out, 0.0), axis=0, keepdims=True)
    d = s[:, 0:128] + s[:, 128:256]                        # (1, 128)
    o_ref[...] = jnp.broadcast_to(d, o_ref.shape)


def kernel_c(x_ref, t_ref, o_ref):
    ql = jnp.sum(x_ref[0, 0:8].astype(jnp.int32)) % 64     # dynamic-ish
    ar = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    ac = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    s12 = (ar == (ac % 128) + ql - 128 * (ac // 128)).astype(jnp.float32)
    lsel = jnp.dot(x_ref[...], t_ref[...],
                   preferred_element_type=jnp.float32)[:, 0:128]  # (40,128)
    out = jnp.dot(lsel[0:33, :], s12,
                  preferred_element_type=jnp.float32)      # (33, 256)
    o_ref[...] = out[0:32, 0:128] + out[1:33, 128:256]


def run(name, kernel, oracle):
    rng = np.random.default_rng(0)
    # small integers: bf16 MXU passes are exact, so any mismatch is a
    # LAYOUT bug, not precision noise
    x = rng.integers(-2, 3, (40, 384)).astype(np.float32)
    t = (rng.integers(0, 4, (384, 256)) == 0).astype(np.float32)
    try:
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        )(jnp.asarray(x), jnp.asarray(t))
        got = np.asarray(got)
        want = oracle(x, t)
        err = np.abs(got - want)
        rel = err / np.maximum(np.abs(want), 1e-6)
        print(f"{name}: COMPILED, max_abs={err.max():.3e} "
              f"max_rel={rel.max():.3e} "
              f"frac_bad={float((rel > 1e-3).mean()):.3f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED {type(e).__name__}: {msg}")


def oa(x, t):
    out = x @ t
    return out[0:32, 0:128] + out[1:33, 128:256]


def ob(x, t):
    out = x[0:2] @ t
    d = out[0:1, 0:128] + out[1:2, 128:256]
    return np.broadcast_to(d, (32, 128))


def oc(x, t):
    ql = int(x[0, 0:8].astype(np.int32).sum()) % 64
    ar = np.arange(128)[:, None]
    ac = np.arange(256)[None, :]
    s12 = (ar == (ac % 128) + ql - 128 * (ac // 128)).astype(np.float32)
    lsel = (x @ t)[:, 0:128]
    out = lsel[0:33] @ s12
    return out[0:32, 0:128] + out[1:33, 128:256]


if __name__ == "__main__":
    run("A(sliding offset-1 add)", kernel_a, oa)
    run("B(mask+rowsum 2-row)", kernel_b, ob)
    run("C(iota one-hot + add)", kernel_c, oc)
    sys.stdout.flush()
    os._exit(0)
