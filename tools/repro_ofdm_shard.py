"""Repro: sharded OFDM dryrun step-3 regression (14/16 frames)."""
import sys, os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.parallel import decode_ofdm_blocked_sharded, make_mesh
from trackmaker_tpu.parallel.ofdm_stream import ofdm_halo_size
from trackmaker_tpu.phy.ofdm_v2 import (
    OfdmModemV2, OfdmV2Config, find_preambles_v2, decode_equal_frames_v2)

n_devices = 8
ocfg = OfdmV2Config()
omodem = OfdmModemV2(ocfg)
payload = 24
oframes = [Frame.new_data(i, 1, 2, bytes([i + 1]) * payload)
           for i in range(2 * n_devices)]
halo = ofdm_halo_size(ocfg, (7 + payload) * 8)
rng = np.random.default_rng(0)
parts = []
fstarts = []
pos = 0
for f in oframes:
    w = omodem.encode_frames([f])
    fstarts.append(pos)
    parts.append(w)
    pos += len(w)
    g = int(rng.integers(200, halo // 2))
    parts.append(np.zeros(g, np.float32))
    pos += g
owave = np.concatenate(parts + [np.zeros(900, np.float32)])
pad = n_devices * halo + len(owave)
owave = np.concatenate([owave, np.zeros(pad - len(owave), np.float32)])
t = len(owave)
block = -(-t // n_devices)
print(f"t={t} halo={halo} block={block}")
print("frame starts:", fstarts)
print("seams:", [i * block for i in range(1, n_devices)])

sp = 1
while sp * 2 <= n_devices // 2 and n_devices % (sp * 2) == 0:
    sp *= 2
dp = n_devices // sp
mesh = make_mesh(n_devices, dp=dp, sp=sp)
got = decode_ofdm_blocked_sharded(ocfg, owave, 7 + payload, mesh,
                                  max_frames_per_block=8)
print(f"sharded: {len(got)}/{len(oframes)}")
gseq = [f.sequence for f in got]
print("got seqs:", gseq)
missing = [f.sequence for f in oframes if f.sequence not in gseq]
print("missing:", missing,
      "their starts:", [fstarts[m] for m in missing],
      "start mod block:", [fstarts[m] % block for m in missing])

# unsharded reference on the same capture
st = np.asarray(find_preambles_v2(ocfg, owave, 32))
st = st[st >= 0]
print("unsharded find_preambles count:", len(st))
seq = decode_equal_frames_v2(ocfg, owave, 7 + payload, st)
print("unsharded decode count:", len(seq))
sys.stdout.flush(); os._exit(0)
