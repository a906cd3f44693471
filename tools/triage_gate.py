"""On-chip triage for the r5 ab_quick payload-gate failure: localize
WHICH failure mode each flag combo hits on the flagship shape, cheaply
(batch 4, one compile per combo, per-frame detail), so one short tunnel
window attributes the breakage.

Failure modes it separates:
  A. ok=False rows            -> candidate overflow / 4B5B skip-carry
                                 (spec path declares itself unusable)
  B. valid count < n_frames   -> frames missed (sync or CRC drop);
                                 prints which slots and their seq ids
  C. payload mismatch         -> decoded-but-wrong bytes (precision
                                 corruption); prints first bad frame +
                                 byte position
Also cross-checks the EXACT (non-spec) path on the same capture: if
exact also fails, the problem is upstream of the spec machinery.

    timeout 600 python -u tools/triage_gate.py > /tmp/triage.log 2>&1
"""
import os
import sys

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
from trackmaker_tpu.phy.encoder import PhyEncoder
from trackmaker_tpu.phy import pallas_decode as pd
from trackmaker_tpu.phy.decoder import decode_capture

INTERPRET = os.environ.get("TM_CPU", "0") == "1"
BATCH = 4
N_FRAMES = 64

COMBOS = [("fold", {"SYNC_FOLD": True}),
          ("legacy", {"SYNC_FOLD": False})]


def build(enc_name, rng):
    cfg = PhyConfig(line_coding=enc_name)
    payloads = [rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
                for _ in range(N_FRAMES)]
    frames = [Frame.new_data(i & 0xFF, 1, 2, payloads[i])
              for i in range(N_FRAMES)]
    wave = PhyEncoder(cfg).encode_frames(frames, gap_samples=200)
    t = len(wave)
    caps = np.stack([wave + rng.normal(0, 0.05, t).astype(np.float32)
                     for _ in range(BATCH)])
    return cfg, jnp.asarray(caps), payloads


def report(tag, res, ok, payloads):
    valid = np.asarray(res.valid)
    seq = np.asarray(res.sequence)
    fb = np.asarray(res.frame_bytes)
    okh = np.asarray(ok)
    vc = valid.sum(axis=1)
    print(f"  {tag}: ok={okh.tolist()} valid_counts={vc.tolist()}")
    for b in range(valid.shape[0]):
        if not okh[b]:
            print(f"    row {b}: ok=False (overflow/skip-carry bail)")
        missing = sorted(set(range(N_FRAMES)) - set(seq[b][valid[b]].tolist()))
        if missing and vc[b] < N_FRAMES:
            print(f"    row {b}: missing seqs {missing[:10]}"
                  f"{'...' if len(missing) > 10 else ''}")
        # payload equality for the frames that did decode
        bad = 0
        for k in range(valid.shape[1]):
            if not valid[b, k]:
                continue
            s = int(seq[b, k])
            if s >= N_FRAMES:
                print(f"    row {b} slot {k}: bogus seq {s}")
                bad += 1
                continue
            want = np.frombuffer(payloads[s], dtype=np.uint8)
            got = fb[b, k, 7:7 + len(want)]
            if not np.array_equal(got, want):
                d = int(np.argmax(got != want))
                if bad == 0:
                    print(f"    row {b} slot {k} (seq {s}): payload "
                          f"mismatch first at byte {d}: "
                          f"got {got[d]} want {want[d]}")
                bad += 1
        if bad:
            print(f"    row {b}: {bad} frames with wrong payload")
    sys.stdout.flush()


def main():
    print(f"backend={jax.default_backend()} interpret={INTERPRET}",
          flush=True)
    for enc_name in ("manchester", "4b5b"):
        cfg, x, payloads = build(enc_name, np.random.default_rng(0))
        print(f"== {enc_name} ==", flush=True)
        # exact-path cross-check first: upstream sanity
        rese = jax.tree_util.tree_map(
            np.asarray,
            jax.vmap(lambda r: decode_capture(
                cfg, r, 2, max_frames=N_FRAMES))(x))
        report("exact", rese, np.ones(BATCH, bool), payloads)
        saved = {k: getattr(pd, k) for c in COMBOS for k in c[1]}
        try:
            for name, flags in COMBOS:
                for k, v in flags.items():
                    setattr(pd, k, v)
                res, ok = jax.tree_util.tree_map(
                    np.asarray,
                    pd.decode_capture_spec(cfg, x, 2, max_frames=N_FRAMES,
                                           n_cand=128,
                                           interpret=INTERPRET))
                report(f"spec/{name}", res, ok, payloads)
        finally:
            for k, v in saved.items():
                setattr(pd, k, v)
    print("done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
