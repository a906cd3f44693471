"""Confirm: does a large closed-over CONSTANT in a jitted program cost
per-call upload time on the axon tunnel (vs passing it as an arg)?"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
os.makedirs(".jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp


def measure(fn, *args, iters=30):
    r = fn(*args)
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1] * 1e3


rng = np.random.default_rng(0)
w_np = rng.normal(0, 1, (440, 440)).astype(np.float32)
x = jnp.asarray(rng.normal(0, 1, (8, 97, 440)).astype(np.float32))
w_dev = jnp.asarray(w_np)


@jax.jit
def with_const(x):
    return jnp.einsum("bcl,lm->bcm", x, jnp.asarray(w_np))


@jax.jit
def with_arg(x, w):
    return jnp.einsum("bcl,lm->bcm", x, w)


print(f"const 774KB: {measure(with_const, x):.2f}ms", flush=True)
print(f"arg   774KB: {measure(with_arg, x, w_dev):.2f}ms", flush=True)

big_np = rng.normal(0, 1, (1024, 1024)).astype(np.float32)  # 4MB


@jax.jit
def with_const4(x):
    s = jnp.sum(jnp.asarray(big_np)) * 0 + 1.0
    return x * s


print(f"const 4MB elementwise: {measure(with_const4, x):.2f}ms", flush=True)
sys.stdout.flush()
os._exit(0)
