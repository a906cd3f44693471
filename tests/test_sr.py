"""Selective-Repeat sliding-window ARQ tests."""

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.link.sr import decode_sack, encode_sack, sr_transfer


def test_sack_codec_roundtrip():
    f = encode_sack(7, {9, 12, 7 + 64}, 2, 1)
    assert f.sequence == 7
    # survives the wire: serialize through the frame codec
    f2 = Frame.from_bytes(f.to_bytes())
    expected, have = decode_sack(f2)
    assert expected == 7
    assert have == {9, 12, 7 + 64}


def test_sack_codec_wraps_sequence_space():
    f = encode_sack(250, {251, 253, (250 + 60) % 256}, 2, 1)
    expected, have = decode_sack(f)
    assert expected == 250
    assert have == {251, 253, 54}


def test_sr_clean_transfer():
    data = bytes(range(256)) * 4
    received, stats = sr_transfer(data, window=8)
    assert received == data
    assert stats["retransmit_bursts"] == 0


def test_sr_recovers_from_noise():
    data = bytes(range(200)) * 3
    received, stats = sr_transfer(data, window=4, noise_std=0.12,
                                  max_duration_s=240.0, seed=3)
    assert received == data


def test_sr_retransmits_fewer_frames_than_gbn():
    """The whole point: per-frame SACKs resend only the holes, while
    Go-Back-N resends the entire remaining window per loss.  Noise is
    set where individual frames actually drop (sigma 0.45 ~ 7 dB SNR:
    measured 30-40% frame loss on 128 B frames), with the carrier-sense
    threshold lifted above the noise (the coded-PHY suite's pattern)."""
    from trackmaker_tpu.core.config import MacConfig
    from trackmaker_tpu.link.gbn import gbn_transfer

    data = bytes(range(256)) * 16
    kw = dict(window=8, noise_std=0.45, max_duration_s=300.0, seed=5,
              mac_cfg=MacConfig(energy_threshold=3.0))
    got_sr, sr = sr_transfer(data, **kw)
    got_gbn, gbn = gbn_transfer(data, **kw)
    assert got_sr == data and got_gbn == data
    # losses must actually have occurred for this to mean anything
    assert sr["retransmit_bursts"] > 0 and gbn["retransmit_bursts"] > 0
    # GBN has no per-frame count; its retransmitted volume is bursts x
    # (remaining window ~ window); compare conservatively at 1 burst =
    # window/2 frames
    gbn_frames = gbn["retransmit_bursts"] * (kw["window"] // 2)
    assert sr["frames_retransmitted"] < gbn_frames, (sr, gbn)
    assert sr["throughput_bps"] > 1.2 * gbn["throughput_bps"], (sr, gbn)


def test_contended_window_transfer_completes():
    """Two SR pairs on one shared channel: carrier sense + randomized
    timeout backoff must let both complete bit-exact (beyond the
    reference: its contended scenario is stop-and-wait only)."""
    from trackmaker_tpu.bench.sweep import contended_window_transfer

    a = bytes(range(256)) * 2
    c = bytes(reversed(range(256))) * 2
    st = contended_window_transfer(a, c, arq="sr", window=4,
                                   max_duration_s=120.0, seed=2)
    assert st["exact"], st
