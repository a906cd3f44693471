"""Primitive-level probe: which phase-B access pattern is pathological
on TPU?  Tiny standalone jit programs (fast remote compiles)."""
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


B, C, T, W, L = 8, 97, 344_000, 1024, 440
rng = np.random.default_rng(0)
sync_pad = jnp.asarray(rng.normal(0, 1, (B, T + 6000)).astype(np.float32))
starts = jnp.asarray(rng.integers(0, T, (B, C)).astype(np.int32))
wmat = jnp.asarray(rng.normal(0, 1, (L, L)).astype(np.float32))
print("data up", flush=True)


@jax.jit
def g_slice(sp, st):
    def one(row, ss):
        return jax.vmap(lambda i: jax.lax.dynamic_slice(row, (i,), (W,)))(ss)
    return jax.vmap(one)(sp, st)


print(f"1 vmap-dyn-slice [B,C,{W}]: {measure(g_slice, sync_pad, starts):.2f}ms",
      flush=True)


@jax.jit
def g_take(sp, st):
    blocks = sp[:, : (T // 512) * 512].reshape(B, T // 512, 512)
    jb = st // 512                                    # [B, C]
    idx = jb[..., None] + jnp.arange(3)               # [B, C, 3]
    def one(bl, ix):
        return jnp.take(bl, ix, axis=0)               # [C, 3, 512]
    return jax.vmap(one)(blocks, jnp.clip(idx, 0, T // 512 - 1))


print(f"2 block-take [B,C,3,512]: {measure(g_take, sync_pad, starts):.2f}ms",
      flush=True)


@jax.jit
def g_onehot(sp, st):
    # gather via one-hot matmul on the block axis (MXU instead of gather)
    nb = T // 512
    blocks = sp[:, : nb * 512].reshape(B, nb, 512)
    jb = st // 512
    idx = jnp.clip(jb[..., None] + jnp.arange(3), 0, nb - 1)  # [B,C,3]
    oh = jax.nn.one_hot(idx.reshape(B, C * 3), nb, dtype=jnp.float32)
    return jnp.einsum("bkn,bns->bks", oh, blocks)


print(f"3 one-hot-matmul [B,C,3,512]: {measure(g_onehot, sync_pad, starts):.2f}ms",
      flush=True)

slabs = jnp.asarray(rng.normal(0, 1, (B, C, L)).astype(np.float32))


@jax.jit
def mm(sl, w):
    return jnp.einsum("bcl,lm->bcm", sl, w)


print(f"4 warmup matmul [B,C,{L}]@[{L},{L}]: {measure(mm, slabs, wmat):.2f}ms",
      flush=True)

win = jnp.asarray(rng.normal(0, 1, (B, C, W)).astype(np.float32))


@jax.jit
def ascan(w):
    idx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), w.shape)
    def comb(a, b):
        av, ai = a
        bv, bi = b
        tk = bv > av
        return jnp.where(tk, bv, av), jnp.where(tk, bi, ai)
    m, r = jax.lax.associative_scan(comb, (w, idx), axis=-1)
    return m[..., -1], r[..., -1]


print(f"5 assoc-scan [B,C,{W}] pairs: {measure(ascan, win):.2f}ms", flush=True)

ub = jnp.asarray(rng.random((B, T // 512, 512)) < 0.01)


@jax.jit
def rowgather(u, st):
    jb = jnp.clip(st // 512, 0, T // 512 - 1)
    return jax.vmap(lambda uu, ss: jnp.take(uu, ss, axis=0))(u, jb)


print(f"6 bool row-take [B,C,512]: {measure(rowgather, ub, starts):.2f}ms",
      flush=True)


@jax.jit
def argmax_blocks(u, st):
    any_b = jnp.any(u, axis=-1)                       # [B, nb]
    nb = any_b.shape[-1]
    def one(ab, ss):
        jb = ss // 512
        m = ab[None, :] & (jnp.arange(nb)[None, :] > jb[:, None])
        return jnp.argmax(m, axis=-1)
    return jax.vmap(one)(any_b, st)


print(f"7 per-cand block argmax [B,C,nb]: {measure(argmax_blocks, ub, starts):.2f}ms",
      flush=True)

sys.stdout.flush()
os._exit(0)
