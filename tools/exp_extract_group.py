"""On-chip A/B of _compact_hit_rows stage sizes (group, s1):
timing via the fused in-program loop on the flagship hit-rows shape.
Run: python tools/exp_extract_group.py [iters]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
from trackmaker_tpu.phy.pallas_decode import _compact_hit_rows, _BIGI

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
B, R = 32, 3387          # flagship: ceil(433464+pad / 128) rows
rng = np.random.default_rng(0)
rows = np.full((B, R, 16), 0, np.int32)
rows[..., :4] = _BIGI
# ~65 hits per capture at realistic spacing
for b in range(B):
    pos = rng.choice(R, 65, replace=False)
    for p in pos:
        rows[b, p, 0] = int(p) * 128 + int(rng.integers(0, 128))
        rows[b, p, 4] = 1
        rows[b, p, 5] = np.float32(0.9).view(np.int32)
xrows = jnp.asarray(rows)


def timeit(name, fn):
    @jax.jit
    def loop(x):
        def body(c, i):
            r = fn(x + i)          # i=0-safe: keeps iterations distinct
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32) * 0)
        return out
    np.asarray(loop(xrows))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(xrows))
        best = min(best, (time.time() - t0) / ITERS * 1000)
    print(f"{name:20s} {best:7.3f} ms", flush=True)


for group, s1 in ((16, 8), (32, 8), (64, 8), (32, 16), (128, 8)):
    timeit(f"group={group} s1={s1}",
           lambda x, g=group, s=s1: _compact_hit_rows(x, 128, group=g,
                                                      s1=s))
sys.stdout.flush()
os._exit(0)
