"""Coded-Manchester bench-row stage split (fused in-program timing):
sync, soft demod, header Viterbi, payload Viterbi, full — where does
the 1.4 ms (27.5k x) go?  argv: [iters]

    timeout 900 python -u tools/prof_coded.py 100 > /tmp/prof_coded.log
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

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.core import convcode
from trackmaker_tpu.phy.coded import CodedManchesterPhy, block_interleaver
from trackmaker_tpu.sync import find_pattern_starts

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
rng = np.random.default_rng(0)
n_frames, batch, plen = 32, 8, 64
phy = CodedManchesterPhy(PhyConfig(), local_addr=2)
frames = [Frame.new_data(i, 1, 2,
          rng.integers(0, 256, plen, dtype=np.uint8).tobytes())
          for i in range(n_frames)]
wave = phy.encode_frames(frames, gap_samples=300)
t = len(wave)
caps = np.stack([(wave + rng.normal(0, 0.05, t)).astype(np.float32)
                 for _ in range(batch)])
x = jnp.asarray(caps)
cfg = phy.cfg
kept_h, kept_p = phy.hdr_kept, phy._kept_payload(plen)
hdr_wire = phy._wire_samples(kept_h)
pay_coded = phy._payload_coded(plen)
inv_h = np.argsort(block_interleaver(kept_h))
inv_p = np.argsort(block_interleaver(kept_p))
pre_np = np.asarray(phy.pre)
tail = (phy.preamble_len + hdr_wire + phy._wire_samples(kept_p)
        + 16 * cfg.samples_per_level + 64)
frame_len = phy.frame_samples(plen)
print(f"t={t} batch={batch} frames={n_frames} kept_h={kept_h} "
      f"kept_p={kept_p} iters={ITERS} radix={convcode.VITERBI_RADIX}",
      flush=True)


def timeit(name, fn):
    @jax.jit
    def loop(xx):
        def body(c, i):
            r = fn(xx + i.astype(jnp.float32) * 1e-30)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(r):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out
    r = loop(x); np.asarray(r)
    ts = []
    for _ in range(3):
        t0 = time.time(); r = loop(x); np.asarray(r)
        ts.append((time.time() - t0) / ITERS * 1000)
    ts.sort()
    print(f"{name:22s} {ts[0]:7.3f} ms  (med {ts[1]:.3f})", flush=True)
    return ts[0]


def starts_of(rx):
    return find_pattern_starts(rx, pre_np, cfg.correlation_threshold,
                               n_frames, min_sep=frame_len)


def sync_only(xx):
    return jax.vmap(starts_of)(xx)


def _bodies(rx):
    starts = starts_of(rx)
    pad = jnp.concatenate([rx.astype(jnp.float32),
                           jnp.zeros(tail, jnp.float32)])
    return pad, jnp.maximum(starts, 0) + phy.preamble_len


def demod_only(xx):
    def one(rx):
        pad, body = _bodies(rx)
        def fr(b):
            sh = phy._soft_kept_traced(pad, kept_h, b)
            sp = phy._soft_kept_traced(pad, kept_p, b + hdr_wire)
            return sh, sp
        return jax.vmap(fr)(body)
    return jax.vmap(one)(xx)


def hdr_vit(xx):
    def one(rx):
        pad, body = _bodies(rx)
        def fr(b):
            sh = phy._soft_kept_traced(pad, kept_h, b)
            deint = sh[:kept_h][jnp.asarray(inv_h)]
            return convcode.viterbi_decode(deint, phy.HDR_BITS, soft=True)
        return jax.vmap(fr)(body)
    return jax.vmap(one)(xx)


def full(xx):
    return phy.batched_decode_fn(n_frames, plen)(xx)


timeit("sync", sync_only)
timeit("sync+demod", demod_only)
timeit("sync+demod+hdr_vit", hdr_vit)
timeit("full", full)
# payload viterbi share = full - (sync+demod+hdr_vit) approximately
sys.stdout.flush()
os._exit(0)
