"""Round-2 hardening regression tests.

Covers the advisor/judge findings from round 1:
* streaming facade drains the searched prefix on frame-less input
  (decoder.rs:89-109 overlap-preserving drain) — bounded buffer on a
  noise-only stream;
* IpReassembler tolerates duplicate fragments and expires stale
  partial reassemblies;
* the native FLAC loader rejects malformed metadata/subframes instead
  of reading/writing out of bounds.
"""

import time

import numpy as np
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.net.fragmentation import IpFragmenter, IpReassembler
from trackmaker_tpu.phy.decoder import PhyDecoder
from trackmaker_tpu.phy.encoder import PhyEncoder


def _cfg():
    return PhyConfig()


# ---------------------------------------------------------------------------
# streaming drain


def test_noise_only_stream_keeps_buffer_bounded():
    cfg = _cfg()
    dec = PhyDecoder(cfg, local_addr=2, max_frames_per_call=8)
    rng = np.random.default_rng(0)
    chunk = 4096
    # ~2 s of pure noise fed in chunks: the buffer must stay bounded by
    # one chunk + the preamble-1 overlap (plus the min_need gate), not
    # grow linearly as before the round-2 fix.
    bound = chunk + cfg.preamble_len + cfg.header_samples + 16
    for _ in range(24):
        got = dec.process_samples(
            rng.normal(0, 0.05, chunk).astype(np.float32))
        assert got == []
        assert len(dec._buf) <= bound, len(dec._buf)


def test_foreign_dst_stream_keeps_buffer_bounded():
    cfg = _cfg()
    dec = PhyDecoder(cfg, local_addr=2, max_frames_per_call=8)
    wave = PhyEncoder(cfg).encode_frames(
        [Frame.new_data(0, 1, 9, b"not for us")])
    wave = np.concatenate([wave] * 6)
    bound = 4096 + cfg.preamble_len + cfg.max_frame_samples + 16
    for i in range(0, len(wave), 4096):
        got = dec.process_samples(wave[i:i + 4096])
        assert got == []
        assert len(dec._buf) <= bound, len(dec._buf)


def test_stream_decisions_unchanged_after_drain_fix():
    """Noise gaps + frames straddling chunk boundaries still decode
    exactly once each, in order."""
    cfg = _cfg()
    rng = np.random.default_rng(1)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * (3 + i))
              for i in range(5)]
    parts = []
    for f in frames:
        parts.append(rng.normal(0, 0.02, rng.integers(100, 9000))
                     .astype(np.float32))
        parts.append(PhyEncoder(cfg).encode_frames([f]))
    parts.append(rng.normal(0, 0.02, 5000).astype(np.float32))
    wave = np.concatenate(parts)

    for chunk in (1024, 4096):
        dec = PhyDecoder(cfg, local_addr=2, max_frames_per_call=8)
        got = []
        for i in range(0, len(wave), chunk):
            got.extend(dec.process_samples(wave[i:i + chunk]))
        assert [g.data for g in got] == [f.data for f in frames]


# ---------------------------------------------------------------------------
# reassembler hardening


def _ip_packet(payload: bytes, ident: int = 0, src=b"\xc0\xa8\x01\x01",
               dst=b"\xc0\xa8\x01\x02") -> bytes:
    hdr = bytearray(20)
    hdr[0] = 0x45
    total = 20 + len(payload)
    hdr[2:4] = total.to_bytes(2, "big")
    hdr[4:6] = ident.to_bytes(2, "big")
    hdr[8] = 64
    hdr[9] = 1
    hdr[12:16] = src
    hdr[16:20] = dst
    return bytes(hdr) + payload


def test_duplicate_fragment_does_not_wedge_reassembly():
    frag = IpFragmenter(mtu=60)
    reasm = IpReassembler()
    pkt = _ip_packet(bytes(range(120)))
    frags = frag.fragment_packet(pkt)
    assert len(frags) > 2
    # duplicate fragments (retransmissions) interleaved before completion
    feed = [frags[0], frags[0], frags[1], frags[1]] + frags[1:]
    out = None
    for f in feed:
        got = reasm.process_fragment(f)
        if got is not None:
            out = got
    assert out is not None
    assert out[20:] == pkt[20:]
    # tables fully cleaned up
    assert not reasm._fragments and not reasm._born


def test_stale_partial_reassembly_expires():
    frag = IpFragmenter(mtu=60)
    reasm = IpReassembler(timeout_s=0.02)
    frags = frag.fragment_packet(_ip_packet(bytes(120), ident=7))
    assert reasm.process_fragment(frags[0]) is None  # partial
    assert len(reasm._born) == 1
    time.sleep(0.05)
    # any later traffic purges the stale key
    pkt2 = _ip_packet(b"x" * 8, ident=8)
    assert reasm.process_fragment(pkt2) == pkt2
    assert len(reasm._born) == 0


def test_duplicate_first_copy_wins():
    reasm = IpReassembler()
    base = _ip_packet(b"A" * 8, ident=3)
    f0 = bytearray(base)
    f0[6:8] = (0x2000).to_bytes(2, "big")  # more_fragments, offset 0
    f0_dup = bytearray(f0)
    f0_dup[20:28] = b"B" * 8  # conflicting retransmission
    f1 = bytearray(_ip_packet(b"C" * 8, ident=3))
    f1[6:8] = (1).to_bytes(2, "big")  # offset 8 bytes, last
    assert reasm.process_fragment(bytes(f0)) is None
    assert reasm.process_fragment(bytes(f0_dup)) is None
    out = reasm.process_fragment(bytes(f1))
    assert out is not None
    assert out[20:28] == b"A" * 8  # first-seen copy kept


# ---------------------------------------------------------------------------
# native FLAC loader bounds


def _runtime():
    return pytest.importorskip("trackmaker_tpu.runtime")


def test_flac_truncated_streaminfo_rejected():
    rt = _runtime()
    # STREAMINFO block header claims 34 bytes but the file ends early:
    # must return an error, not read out of bounds.
    bad = b"fLaC" + bytes([0x80, 0, 0, 34]) + b"\x00" * 10
    with pytest.raises(ValueError):
        rt.flac_info(bad)


def test_flac_block_length_overrun_rejected():
    rt = _runtime()
    # a non-STREAMINFO block whose declared length runs past EOF
    bad = b"fLaC" + bytes([0x04, 0x00, 0xFF, 0xFF]) + b"\x00" * 8
    with pytest.raises(ValueError):
        rt.flac_info(bad)


def test_flac_tiny_max_block_does_not_crash():
    rt = _runtime()
    # STREAMINFO with max_block=1: any FIXED/LPC subframe with
    # order > blocksize must be rejected cleanly.  Build a minimal
    # stream: STREAMINFO (last block) + one frame header with a
    # fixed-order-4 subframe over blocksize 1.
    si = bytearray(34)
    si[0:2] = (1).to_bytes(2, "big")   # min_block
    si[2:4] = (1).to_bytes(2, "big")   # max_block = 1 (hostile)
    bits = (48000 << 44) | (0 << 41) | ((16 - 1) << 36) | 16
    si[10:18] = bits.to_bytes(8, "big")
    hdr = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    # frame: sync 0x3FFE, blocking=fixed, bs_code=6 (8-bit blocksize-1),
    # sr_code=0, ch=mono, ss=16-bit
    frame = bytearray()
    frame += bytes([0xFF, 0xF8])          # sync + reserved + blocking
    frame += bytes([0x69, 0x08])          # bs_code=6, sr=9?, ch=0, ss=4
    frame += bytes([0x00])                # coded number (frame 0)
    frame += bytes([0x00])                # 8-bit blocksize-1 => blocksize 1
    frame += bytes([0x00])                # header CRC (unchecked)
    # subframe header: 0 + 001100 + 0 => FIXED order 4
    frame += bytes([0x18])
    frame += bytes(32)                    # would-be warmup samples
    data = hdr + bytes(frame)
    # must not crash; either an error or zero/partial samples is fine
    try:
        pcm, _sr = rt.flac_decode(data, as_float=False)
        assert pcm.size <= 16
    except ValueError:
        pass
