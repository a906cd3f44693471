"""Viterbi-coded Manchester PHY (phy/coded.py): roundtrip, streaming,
the >=4 dB frame-loss cliff shift vs the uncoded decoder, and fewer ARQ
retransmissions at equal SNR.

Motivation anchor: the reference's report measured 5-15% frame loss
recovered purely by ARQ (docs/proj/report.md:532)."""

import numpy as np
import pytest

from trackmaker_tpu.core.config import MacConfig, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.coded import CodedManchesterPhy

# Detection must outlive demod noise for the comparison to measure
# CODING, not the correlator: normalized preamble correlation decays as
# 1/sqrt(1+sigma^2) under AWGN, so the default 0.9 threshold fails at
# sigma~0.48 where bit errors are still ~0.  Both PHYs get the same
# lowered threshold.
CFG = PhyConfig(correlation_threshold=0.45)


def test_roundtrip_clean_and_streaming():
    phy = CodedManchesterPhy(CFG, local_addr=2)
    frames = [Frame.new_data(0, 1, 2, b"coded manchester"),
              Frame.new_ack(0, 1, 2),
              Frame.new_data(1, 1, 2, bytes(range(100)))]
    wave = phy.encode_frames(frames, gap_samples=300)
    got = []
    for i in range(0, len(wave), 1500):
        got.extend(phy.process_samples(wave[i:i + 1500]))
    assert [(f.frame_type, f.data) for f in got] == [
        (f.frame_type, f.data) for f in frames]


def test_dst_filter_and_noise_rejection():
    phy = CodedManchesterPhy(CFG, local_addr=2)
    assert phy.process_samples(
        np.random.default_rng(0).normal(0, 0.05, 6000)
        .astype(np.float32)) == []
    wave = phy.encode_frames([Frame.new_data(0, 1, 9, b"not yours")])
    assert phy.process_samples(np.concatenate(
        [wave, np.zeros(3000, np.float32)])) == []


def _loss_uncoded(sigma: float, frames, rng) -> float:
    import jax.numpy as jnp
    from trackmaker_tpu.phy.decoder import decode_capture
    from trackmaker_tpu.phy.encoder import PhyEncoder

    wave = PhyEncoder(CFG).encode_frames(frames, gap_samples=300)
    t = 60_000
    cap = np.zeros(t, np.float32)
    cap[:len(wave)] = wave
    cap += rng.normal(0, sigma, t).astype(np.float32)
    res = decode_capture(CFG, jnp.asarray(cap), 2,
                         max_frames=len(frames) + 4)
    valid = np.asarray(res.valid)
    fb = np.asarray(res.frame_bytes)
    ok = 0
    for w in frames:
        for j in np.nonzero(valid)[0]:
            if fb[j, 7:7 + len(w.data)].tobytes() == w.data:
                ok += 1
                break
    return 1.0 - ok / len(frames)


def _loss_coded(sigma: float, frames, rng) -> float:
    phy = CodedManchesterPhy(CFG, local_addr=2)
    wave = phy.encode_frames(frames, gap_samples=300)
    cap = np.concatenate([wave, np.zeros(4000, np.float32)])
    cap = cap + rng.normal(0, sigma, len(cap)).astype(np.float32)
    got = phy.process_samples(cap)
    ok = sum(1 for w in frames
             if any(f.data == w.data and f.sequence == w.sequence
                    for f in got))
    return 1.0 - ok / len(frames)


def _cliff(loss_fn, frames, sigmas, rng) -> float:
    """First sigma whose loss >= 0.5 (the grid is ordered)."""
    for s in sigmas:
        if loss_fn(float(s), frames, rng) >= 0.5:
            return float(s)
    return float(sigmas[-1])


def test_frame_loss_cliff_at_least_4db_left():
    rng = np.random.default_rng(42)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 64) for i in range(6)]
    sigmas = np.arange(0.45, 2.5, 0.15)
    cliff_u = _cliff(_loss_uncoded, frames, sigmas, rng)
    cliff_c = _cliff(_loss_coded, frames, sigmas, rng)
    gain_db = 20.0 * np.log10(cliff_c / cliff_u)
    assert gain_db >= 4.0, (cliff_u, cliff_c, gain_db)


def test_fewer_retransmissions_at_equal_snr():
    """Same noisy bus, same MAC, same data: the coded PHY completes the
    ARQ transfer with fewer retransmissions than the uncoded one."""
    from trackmaker_tpu.link.audio import AudioEndpoint
    from trackmaker_tpu.link.bus import SimulatedBus
    from trackmaker_tpu.link.csma import CsmaReceiver, CsmaSender
    from trackmaker_tpu.link.transfer import chunk_payload

    # carrier sense is |s| > energy_threshold: at this noise level the
    # default threshold reads permanently busy, so disable it (same for
    # both runs; a single pair has no contention to sense anyway)
    mac_cfg = MacConfig(energy_threshold=3.0)
    data = b"retransmission comparison payload " * 25
    sigma = 0.9    # uncoded loses most frames here; coded ~0%

    def run(phy_factory):
        bus = SimulatedBus(noise_std=sigma, seed=9)
        ep_tx, ep_rx = AudioEndpoint("tx"), AudioEndpoint("rx")
        kw_tx = {"phy": phy_factory(1)} if phy_factory else {}
        kw_rx = {"phy": phy_factory(2)} if phy_factory else {}
        sender = CsmaSender(ep_tx, CFG, mac_cfg, 1, 2, **kw_tx)
        receiver = CsmaReceiver(ep_rx, CFG, mac_cfg, 2, 1, **kw_rx)
        bus.attach(ep_tx, sender)
        bus.attach(ep_rx, receiver)
        chunks = chunk_payload(data, CFG.max_frame_data_size)
        for c in chunks:
            sender.send(c)
        bus.run(400 * bus.sample_rate,
                until=lambda: sender.finished
                and len(receiver.received) >= len(chunks))
        ok = b"".join(receiver.received) == data
        return sender.retransmissions, ok

    retx_coded, ok_coded = run(
        lambda addr: CodedManchesterPhy(CFG, local_addr=addr))
    retx_uncoded, _ok_uncoded = run(None)
    # the coded link must deliver intact; the uncoded one at this SNR
    # sometimes corrupts payload (CRC8 + CRC-unprotected header at a
    # ~40% frame-error rate) — either way it retransmits heavily
    assert ok_coded
    assert retx_coded < retx_uncoded, (retx_coded, retx_uncoded)
    assert retx_uncoded >= 10, retx_uncoded
