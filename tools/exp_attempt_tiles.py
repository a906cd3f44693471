"""On-chip A/B of attempt-kernel matmul skeletons (timing only, no
correctness): which restructure actually cuts the per-candidate cost —
fewer MXU issues, fewer 128x128 tiles (narrower N), or bf16 passes?

Variants (each kernel loops NV candidates with the real DMA pipeline):
  base   today's sequence: rowsel2, o_d, o_e (N=256), rowsel35,
         body (N=256), pack (K=128)
  n128   body table packed to N=128 ([A|B] in 64-lane halves),
         pack K=64
  sync1  sync refine as ONE matmul vs a N=128 [A|B|A2|B2] 32-lane
         group table (+ lane-offset adds)
  both   n128 + sync1
  bf16b  base but body matmul in bf16
  noop   DMA + one tiny matmul (the loop floor)

Run: python tools/exp_attempt_tiles.py [iters]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
B, NV, NR, DROW, BROWS = 32, 65, 48, 384, 34
PIPE = int(os.environ.get('TM_EXP_PIPE', '4'))


def make_kernel(variant):
    def kern(x384_ref, ts_ref, tsc_ref, tb_ref, tbn_ref, w_ref, wn_ref,
             out_ref, xw, sem):
        b = pl.program_id(0)

        def dma(c, slot):
            start8 = pl.multiple_of((c % 8) * 8, 8)
            return pltpu.make_async_copy(
                x384_ref.at[b, pl.ds(start8, NR), :],
                xw.at[slot], sem.at[slot])

        use_dma = not variant.endswith("_nodma")
        if use_dma:
            for i in range(PIPE - 1):
                dma(i, i).start()

        def body_fn(c, acc, nv_cap=NV):
            slot = c % PIPE

            if use_dma:
                @pl.when(c + PIPE - 1 < nv_cap)
                def _():
                    dma(c + PIPE - 1, (c + PIPE - 1) % PIPE).start()

                dma(c, slot).wait()
            ro = c % 8

            def rowsel(kk, height):
                ri = jax.lax.broadcasted_iota(jnp.int32, (height, NR), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (height, NR), 1)
                sel = (ci == ri + kk).astype(jnp.float32)
                return jnp.dot(sel, xw[slot],
                               preferred_element_type=jnp.float32)

            if variant.startswith("noop"):
                x01 = rowsel(ro, 2)
                return acc + jnp.sum(x01[0:1, 0:8])
            variant_base = variant.split("_")[0]

            # ---- sync refine
            x01 = rowsel(ro, 2)
            q = (c * 37) % 384
            v = q % 8
            idx = pl.multiple_of(q - v, 8)
            if variant_base in ("sync1", "both"):
                tsc = tsc_ref[v, pl.ds(idx, DROW), :]       # (384,128)
                x4 = jnp.concatenate([x01, x01 * x01], axis=0)
                o4 = jnp.dot(x4, tsc, preferred_element_type=jnp.float32)
                dot = o4[0:1, 0:32] + o4[1:2, 32:64]
                en = o4[2:3, 64:96] + o4[3:4, 96:128]
                cc = dot * jax.lax.rsqrt(jnp.maximum(en, 1e-6))
                best = jnp.argmax(
                    jnp.where(jax.lax.broadcasted_iota(
                        jnp.int32, (1, 32), 1) < 13, cc, -jnp.inf)
                ).astype(jnp.int32)
            else:
                ts = ts_ref[v, pl.ds(idx, DROW), :]         # (384,256)
                o_d = jnp.dot(x01, ts, preferred_element_type=jnp.float32)
                o_e = jnp.dot(x01 * x01, ts * ts,
                              preferred_element_type=jnp.float32)
                dot = o_d[0:1, 0:128] + o_d[1:2, 128:256]
                en = o_e[0:1, 0:128] + o_e[1:2, 128:256]
                cc = dot * jax.lax.rsqrt(jnp.maximum(en, 1e-6))
                best = jnp.argmax(
                    jnp.where(jax.lax.broadcasted_iota(
                        jnp.int32, (1, 128), 1) < 13, cc, -jnp.inf)
                ).astype(jnp.int32)

            # ---- body decode
            o2 = (c * 53 + best) % 384
            v2 = o2 % 8
            idx2 = pl.multiple_of(o2 - v2, 8)
            xsh = rowsel(ro + (c % 2), BROWS + 1)           # (35, 384)
            if variant_base in ("n128", "both"):
                tb = tbn_ref[v2, pl.ds(idx2, DROW), :]      # (384,128)
                o_b = jnp.dot(xsh, tb, preferred_element_type=jnp.float32)
                d = o_b[0:BROWS, 0:64] + o_b[1:BROWS + 1, 64:128]
                bits = (d <= 0.0).astype(jnp.float32)       # (34, 64)
                byte_blk = jnp.dot(bits, wn_ref[:, :],
                                   preferred_element_type=jnp.float32)
            elif variant_base == "bf16b":
                tb = tb_ref[v2, pl.ds(idx2, DROW), :]       # (384,256)
                o_b = jnp.dot(xsh.astype(jnp.bfloat16),
                              tb.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                d = o_b[0:BROWS, 0:128] + o_b[1:BROWS + 1, 128:256]
                bits = (d <= 0.0).astype(jnp.float32)
                byte_blk = jnp.dot(bits, w_ref[:, :],
                                   preferred_element_type=jnp.float32)
            else:
                tb = tb_ref[v2, pl.ds(idx2, DROW), :]       # (384,256)
                o_b = jnp.dot(xsh, tb, preferred_element_type=jnp.float32)
                d = o_b[0:BROWS, 0:128] + o_b[1:BROWS + 1, 128:256]
                bits = (d <= 0.0).astype(jnp.float32)
                byte_blk = jnp.dot(bits, w_ref[:, :],
                                   preferred_element_type=jnp.float32)
            bb128 = byte_blk[:, 0:128] if byte_blk.shape[1] > 128 \
                else byte_blk
            if "_nostore" in variant:
                return acc + dot[0, 0] + bb128[0, 0]
            out_ref[0, c] = bb128
            return acc + dot[0, 0]

        if "_u" in variant:
            u = int(variant.split("_u")[1])
            nv_u = (NV // u) * u    # starts must balance waits exactly

            def body_u(j, acc):
                for k in range(u):
                    acc = body_fn(j * u + k, acc, nv_u)
                return acc
            acc = jax.lax.fori_loop(0, NV // u, body_u, jnp.float32(0.0))
        else:
            acc = jax.lax.fori_loop(0, NV, body_fn, jnp.float32(0.0))
        out_ref[0, 0] = out_ref[0, 0] + acc

    return kern


def run(variant):
    rng = np.random.default_rng(0)
    rows = 1200
    x384 = jnp.asarray(rng.normal(0, 1, (B, rows, DROW)).astype(np.float32))
    ts = jnp.asarray(rng.integers(-1, 2, (8, 768, 256)).astype(np.float32))
    tsc = jnp.asarray(rng.integers(-1, 2, (8, 768, 128)).astype(np.float32))
    tb = ts
    tbn = tsc
    w = jnp.asarray(rng.integers(0, 2, (128, 128)).astype(np.float32))
    wn = jnp.asarray(rng.integers(0, 2, (64, 128)).astype(np.float32))

    call = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((B, NV, BROWS, 128), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, NV, BROWS, 128),
                               lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((PIPE, NR, DROW), jnp.float32),
                        pltpu.SemaphoreType.DMA((PIPE,))],
    )

    @jax.jit
    def loop(x):
        def body(cacc, i):
            r = call(x + i.astype(jnp.float32) * 1e-30, ts, tsc, tb,
                     tbn, w, wn)
            return cacc + jnp.sum(r[:, 0, 0, 0]), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(ITERS, dtype=jnp.int32))
        return out

    r = loop(x384); np.asarray(r)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x384))
        best = min(best, (time.time() - t0) / ITERS * 1000)
    per_cand = best * 1e3 / (B * NV)
    print(f"{variant:8s} {best:7.3f} ms  ({per_cand:6.3f} us/cand)",
          flush=True)


for v in (sys.argv[2].split(",") if len(sys.argv) > 2 else
          ("noop", "base", "n128", "sync1", "both", "bf16b")):
    try:
        run(v)
    except Exception as e:
        print(f"{v:8s} FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)
sys.stdout.flush()
os._exit(0)
