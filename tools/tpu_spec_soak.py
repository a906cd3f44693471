"""TPU differential soak: speculative decoder vs exact scan on random
(seed base / noise / amplitude ranges configurable via argv:
  python tools/tpu_spec_soak.py [seed_base] [sigma])
adversarial captures (noise, evil payloads, truncation, zero-gaps),
both codings, plus blocked-spec vs flat decode."""
import os, sys, time
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
os.makedirs(".jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import jax.numpy as jnp
from trackmaker_tpu.core import bitops
from trackmaker_tpu.core.config import FOUR_B_FIVE_B, MANCHESTER, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.oracle.phy import OracleEncoder
from trackmaker_tpu.phy.decoder import decode_capture, _batched_fn
from trackmaker_tpu.phy.pallas_decode import decode_capture_spec_jit
from trackmaker_tpu.parallel.stream import (_decode_blocked_spec_jit,
                                            decode_blocked_single_chip)

def masked(res, b=None):
    sel = (lambda a: a) if b is None else (lambda a: a[b])
    v = np.asarray(sel(res.valid))
    return sorted((int(s), int(q), bytes(fb[:7+int(ln)]))
                  for s, q, ln, fb, ok in zip(
                      np.asarray(sel(res.start)), np.asarray(sel(res.sequence)),
                      np.asarray(sel(res.length)), np.asarray(sel(res.frame_bytes)), v)
                  if ok)

def raw(data, seq=0, src=1, dst=2, ftype=1):
    n = len(data)
    return bytes([n >> 8, n & 0xFF, bitops.crc8_host(data), ftype, seq, src, dst]) + data

T = 120_000
SEED_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
SIGMA = float(sys.argv[2]) if len(sys.argv) > 2 else 0.04
def build(rng, enc, cfg):
    wave = np.zeros(T, np.float32)
    pos = int(rng.integers(0, 2000))
    k = 0
    while pos < T - 20000 and k < 12:
        kind = rng.integers(0, 5)
        if kind == 0:    # evil embedded
            f = Frame.new_data(k, 1, 2, bytes([0x33, 0x5A]) + raw(bytes(rng.integers(0,256,int(rng.integers(1,30)))), seq=99))
        elif kind == 1:  # foreign dst
            f = Frame.new_data(k, 1, 9, bytes(rng.integers(0,256,int(rng.integers(1,60)))))
        else:
            f = Frame.new_data(k, 1, 2, bytes(rng.integers(0,256,int(rng.integers(1,128)))))
        w = np.array(enc.encode_frame(f), np.float32)
        w *= float(rng.uniform(0.4, 1.0))
        if kind == 2 and len(w) > 100:  # corrupt a bit
            j = int(rng.integers(cfg.preamble_len, len(w)-10))
            w[j:j+6] *= -1.0
        end = min(pos+len(w), T)
        wave[pos:end] = w[:end-pos]
        pos = end + int(rng.integers(0, 900))
        k += 1
    wave += rng.normal(0, SIGMA, T).astype(np.float32)
    return wave

mismatch = 0
fallbacks = 0
trials = 0
t0 = time.time()
for coding in (MANCHESTER, FOUR_B_FIVE_B):
    cfg = PhyConfig(line_coding=coding)
    enc = OracleEncoder(cfg)
    exact_fn = _batched_fn(cfg, 24, False)
    for seed in range(60):
        rng = np.random.default_rng(SEED_BASE + seed)
        batch = np.stack([build(rng, enc, cfg) for _ in range(4)])
        x = jnp.asarray(batch)
        spec, ok = decode_capture_spec_jit(cfg, x, 2, max_frames=24)
        exact = exact_fn(x, 2)
        okh = np.asarray(ok)
        for b in range(4):
            trials += 1
            if not okh[b]:
                fallbacks += 1
                continue
            if masked(spec, b) != masked(exact, b):
                mismatch += 1
                print("MISMATCH", coding, seed, b)
        if time.time() - t0 > 380: break
print(f"spec-vs-exact: {trials} captures, {fallbacks} conformance fallbacks, {mismatch} mismatches")

# blocked-spec vs flat
bl_mis = 0; bl_trials = 0
cfg = PhyConfig()
enc = OracleEncoder(cfg)
for seed in range(25):
    rng = np.random.default_rng(SEED_BASE + 6000 + seed)
    wave = build(rng, enc, cfg)
    seq = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=24)
    res, ok = _decode_blocked_spec_jit(cfg, jnp.asarray(wave), 2, 6, 8, T, 64)
    bl_trials += 1
    if not bool(np.asarray(ok)):
        continue
    if masked(res) != masked(seq):
        bl_mis += 1
        print("BLOCKED MISMATCH", seed)
    if time.time() - t0 > 520: break
print(f"blocked-spec-vs-flat: {bl_trials} captures, {bl_mis} mismatches")
sys.stdout.flush(); os._exit(1 if (mismatch or bl_mis) else 0)
