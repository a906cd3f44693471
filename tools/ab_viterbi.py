"""One-process Viterbi radix A/B: the (133,171) trellis ACS fused k
steps per scan iteration (core/convcode.py, r5 item 4).  Times
batch-64 frame decodes per radix with the in-program loop discipline
(tools/prof_fused.py), after a decision-equality gate between every
radix and radix 1 on the same inputs.  Run when the tunnel is up:

    timeout 900 python -u tools/ab_viterbi.py [iters] > /tmp/ab_vit.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
if os.environ.get("TM_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from trackmaker_tpu.core.convcode import conv_encode, viterbi_decode

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
REPEATS = 3
BATCH = int(os.environ.get("TM_AB_BATCH", "64"))
N_BITS = int(os.environ.get("TM_AB_BITS", "512"))


def main():
    print(f"backend={jax.default_backend()} iters={ITERS} "
          f"batch={BATCH} n_bits={N_BITS}", flush=True)
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(BATCH):
        bits = rng.integers(0, 2, N_BITS).astype(np.uint8)
        tx = 2.0 * np.array(conv_encode(jnp.asarray(bits))) - 1.0
        rows.append(tx + rng.normal(0, 0.5, len(tx)))
    xb = jnp.asarray(np.stack(rows), jnp.float32)

    def batch_fn(k):
        return jax.jit(jax.vmap(
            lambda r: viterbi_decode(r, N_BITS, soft=True, radix=k)))

    ref = np.asarray(batch_fn(1)(xb))
    for k in (1, 2, 4, 8):
        fn = batch_fn(k)
        got = np.asarray(fn(xb))
        assert np.array_equal(got, ref), f"radix {k} decision mismatch"

        @jax.jit
        def loop(xx, fn=fn):
            def body(c, i):
                r = fn(xx + i.astype(jnp.float32) * 1e-30)
                return c + jnp.sum(r.astype(jnp.float32)), None
            out, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(ITERS, dtype=jnp.int32))
            return out

        np.asarray(loop(xb))
        ts = []
        for _ in range(REPEATS):
            t0 = time.time()
            np.asarray(loop(xb))
            ts.append((time.time() - t0) / ITERS * 1e6)
        us_frame = min(ts) / BATCH
        print(f"radix {k}: {min(ts):9.1f} us/batch  "
              f"{us_frame:7.2f} us/frame", flush=True)

    # r5: unroll sweep at the winning radix (while-loop overhead
    # hypothesis -- at radix 4 the auto unroll is only 2 fused blocks,
    # leaving ~65 loop iterations per decode)
    from trackmaker_tpu.core import convcode
    for u in (2, 4, 8, 16, 33):
        convcode.VITERBI_UNROLL = u
        fn = batch_fn(4)
        got = np.asarray(fn(xb))
        assert np.array_equal(got, ref), f"unroll {u} decision mismatch"

        @jax.jit
        def loop(xx, fn=fn):
            def body(c, i):
                r = fn(xx + i.astype(jnp.float32) * 1e-30)
                return c + jnp.sum(r.astype(jnp.float32)), None
            out, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(ITERS, dtype=jnp.int32))
            return out

        np.asarray(loop(xb))
        ts = []
        for _ in range(REPEATS):
            t0 = time.time()
            np.asarray(loop(xb))
            ts.append((time.time() - t0) / ITERS * 1e6)
        print(f"radix 4 unroll {u:2d}: {min(ts):9.1f} us/batch  "
              f"{min(ts) / BATCH:7.2f} us/frame", flush=True)
    convcode.VITERBI_UNROLL = 0
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
