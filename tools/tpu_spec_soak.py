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
        exact = exact_fn(x, 2, jnp.full(x.shape[:1], x.shape[-1], jnp.int32))
        okh = np.asarray(ok)
        for b in range(4):
            trials += 1
            if not okh[b]:
                fallbacks += 1
                continue
            if masked(spec, b) != masked(exact, b):
                mismatch += 1
                print("MISMATCH", coding, seed, b)
        if time.time() - t0 > float(os.environ.get(
                "TM_SOAK_BUDGET", "380")): break
print(f"spec-vs-exact: {trials} captures, {fallbacks} conformance fallbacks, {mismatch} mismatches")

# forced-fallback campaign: zero out one body level per frame so the
# 4B5B conformance flag MUST fire on-chip (near-zero level average ->
# the optimistic transition rule cannot replay the reference's
# skip-carry, line_coding.rs:265-269) and the exact fallback result
# must equal the NumPy oracle decoder frame-for-frame.
from trackmaker_tpu.oracle.phy import OracleDecoder
ff_trials = ff_fired = ff_mis = 0
cfg4 = PhyConfig(line_coding=FOUR_B_FIVE_B)
enc4 = OracleEncoder(cfg4)
exact4 = _batched_fn(cfg4, 8, False)
for seed in range(10):
    rng = np.random.default_rng(SEED_BASE + 9000 + seed)
    payload = bytes(rng.integers(0, 256, int(rng.integers(8, 64))))
    w = np.array(enc4.encode_frame(Frame.new_data(seed, 1, 2, payload)),
                 np.float32)
    # zero one random level inside the body (symbol 14+ is past the
    # header); levels are 3 samples at spl=3
    sym = int(rng.integers(14, 30))
    lvl = int(rng.integers(0, 5))
    p = cfg4.preamble_len + sym * 15 + lvl * 3
    w[p:p + 3] = 0.0
    wave = np.concatenate([np.zeros(int(rng.integers(0, 400)), np.float32),
                           w, np.zeros(600, np.float32)])
    x = jnp.asarray(wave[None])
    _spec, ok = decode_capture_spec_jit(cfg4, x, 2, max_frames=8)
    ff_trials += 1
    if not bool(np.asarray(ok)[0]):
        ff_fired += 1
    exact = exact4(x, 2, jnp.full(x.shape[:1], x.shape[-1], jnp.int32))
    got = masked(exact, 0)
    dec = OracleDecoder(cfg4, local_addr=2)
    want = sorted((-1, int(f.sequence),
                   bytes(f.to_bytes()[:7 + len(f.data)]))
                  for f in dec.process_samples(wave))
    got_cmp = sorted((-1, s, fb) for _p, s, fb in got)
    if got_cmp != want:
        ff_mis += 1
        print("FORCED-FALLBACK ORACLE MISMATCH", seed)
print(f"forced-fallback: {ff_trials} captures, {ff_fired} conformance "
      f"fires, {ff_mis} oracle mismatches")

# ASK: speculative receiver vs exact scan, adversarial tracks
from trackmaker_tpu.phy import ask as ask_mod
from trackmaker_tpu.phy import ask_spec
ask_trials = ask_fb = ask_mis = 0
acfg = ask_mod.AskConfig()
for seed in range(12):
    rng = np.random.default_rng(SEED_BASE + 12000 + seed)
    nf = int(rng.integers(4, 24))
    fr = ask_mod.build_frames(bytes(rng.integers(32, 127, 40)), acfg,
                              num_frames=nf)
    trk = ask_mod.build_track(acfg, fr, seed=int(seed + 1))
    kind = seed % 4
    if kind == 1:
        trk = trk + rng.normal(0, 0.12, len(trk)).astype(np.float32)
    elif kind == 2:
        trk = trk[: int(len(trk) * 0.8)]          # truncated mid-frame
    elif kind == 3:
        trk = np.concatenate([trk, 0.5 * trk])    # quieter replay
    xb = jnp.asarray(np.stack([trk, trk * 0.7]))
    spec, oks = ask_spec.demodulate_spec_jit(acfg, xb, max_frames=64)
    okh = np.asarray(oks)
    for b in range(2):
        ask_trials += 1
        if not okh[b]:
            ask_fb += 1
            continue
        scan = ask_mod.demodulate(acfg, xb[b], max_frames=64)
        for name in ("valid", "frame_id", "bits", "start"):
            if not np.array_equal(np.asarray(getattr(scan, name)),
                                  np.asarray(getattr(spec, name))[b]):
                ask_mis += 1
                print("ASK MISMATCH", seed, b, name)
                break
print(f"ask spec-vs-scan: {ask_trials} captures, {ask_fb} fallbacks, "
      f"{ask_mis} mismatches")

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

# legacy delta-stash exactness past 2^24 (r5): frames placed around and
# beyond the f32 integer boundary must decode payload-exactly on the
# legacy (in-attempt refine) path — the old absolute-fs stash rounded
# there and forced fold mode
lg_mis = 0
Tl = (1 << 24) + 1_500_000
rng = np.random.default_rng(SEED_BASE + 7000)
wave_l = np.zeros(Tl, np.float32)
placed = []
pos = (1 << 24) - 400_000
for k in range(8):
    data = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    w = np.asarray(enc.encode_frame(
        Frame.new_data(sequence=k, src=1, dst=2, data=data)), np.float32)
    wave_l[pos: pos + len(w)] = w
    placed.append((k, data, pos))
    pos += len(w) + 200_000
wave_l += rng.normal(0, 0.05, Tl).astype(np.float32)
res, ok = _decode_blocked_spec_jit(cfg, jnp.asarray(wave_l), 2,
                                   max(2, Tl // 450_000), 8, Tl, 64)
fb_l = np.asarray(res.frame_bytes); va_l = np.asarray(res.valid)
st_l = np.asarray(res.start); sq_l = np.asarray(res.sequence)
if not bool(np.asarray(ok)):
    print("LEGACY-2^24: spec nonconformant (counts as mismatch)")
    lg_mis += 1
else:
    got = {int(s): (fb_l[i][7:7 + 64].tobytes(), int(st_l[i]))
           for i, s in enumerate(sq_l) if va_l[i]}
    for k, data, p in placed:
        if k not in got or got[k][0] != data or abs(got[k][1] - p) > 200:
            print(f"LEGACY-2^24 MISMATCH at frame {k} (pos {p})")
            lg_mis += 1
print(f"legacy-past-2^24: {len(placed)} frames, {lg_mis} mismatches")
fail = (mismatch or bl_mis or ff_mis or ask_mis or lg_mis
        or ff_fired == 0)
if ff_fired == 0:
    print("FORCED-FALLBACK CAMPAIGN NEVER FIRED — soak is not exercising "
          "the exact-path fallback")
sys.stdout.flush(); os._exit(1 if fail else 0)
