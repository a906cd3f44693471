"""Debug the ofdm_v2 gather-free regression: compare _sc_refine against
a NumPy transliteration of the round-3 SC metric, then isolate
_windows_spectrum by demodulating at the oracle timings both ways."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.ofdm import find_preambles, _windows_spectrum
from trackmaker_tpu.phy import ofdm_v2 as o2

cfg = o2.OfdmV2Config()
print("cfg: n_fft", cfg.n_fft, "cp_len", cfg.cp_len, "sym_len",
      cfg.sym_len, "preamble_len", cfg.preamble_len,
      "guard", cfg.guard_samples, "sc_search", cfg.sc_search)

rng = np.random.default_rng(0)
payloads = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
            for _ in range(6)]
frames = [Frame.new_data(i, 1, 2, p) for i, p in enumerate(payloads)]
m2 = o2.OfdmModemV2()
w2 = m2.encode_frames(frames, gap_samples=300)
n_bits = 71 * 8

starts = np.asarray(find_preambles(cfg, jnp.asarray(w2), 8))
starts = starts[starts >= 0]
print("find_preambles starts:", starts)

# true starts from construction
fs = cfg.frame_samples(n_bits)
true_starts = np.array([(fs + 300) * i for i in range(6)])
print("true starts:        ", true_starts, "frame_samples:", fs)

fine = np.asarray(o2._sc_refine(cfg, jnp.asarray(w2),
                                jnp.asarray(starts, np.int32)))
print("_sc_refine fine:    ", fine)

# NumPy transliteration of the round-3 SC refine
half = cfg.n_fft // 2
s = cfg.sc_search
body_off = cfg.preamble_len + cfg.guard_samples
pad = np.concatenate([w2, np.zeros(8 * cfg.sym_len + body_off
                                   + 2 * s + cfg.n_fft + 8, np.float32)])
ref = []
for st in starts:
    pilot_body = st + body_off + cfg.cp_len
    base = max(pilot_body - s, 0)
    seg = pad[base: base + 2 * s + cfg.n_fft]
    p = np.array([np.sum(seg[d:d + half] * seg[d + half:d + 2 * half])
                  for d in range(2 * s)])
    r = np.array([np.sum(seg[d + half:d + 2 * half] ** 2)
                  for d in range(2 * s)])
    m = (p * p) / np.maximum(r * r, 1e-12)
    ref.append(base + int(np.argmax(m)) - cfg.cp_len - body_off)
print("numpy r3 fine:      ", np.array(ref))

# demod with each timing
for name, st in [("raw starts", starts), ("sc fine", fine),
                 ("numpy fine", np.array(ref)),
                 ("true", true_starts)]:
    bits = np.asarray(o2.demodulate_at_v2(
        cfg, jnp.asarray(w2), n_bits, jnp.asarray(st, np.int32)))
    got = [Frame.from_bits(row) for row in bits]
    ok = sum(1 for i, f in enumerate(got)
             if f is not None and f.data == payloads[i])
    print(f"demod@{name}: {ok}/6")
sys.stdout.flush(); os._exit(0)
