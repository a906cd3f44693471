"""Adaptive-loading coded OFDM as a usable PHY: MAC duck type, the
fixed-loading handshake over the robust default mode, and the
coded-vs-uncoded win at equal net throughput on shaped channels.

Capability anchor: SURVEY §7 config-2/4 (OFDM data modes) + the FEC
ideas in the reference's vendored assets/psk.cxx; the reference itself
never shipped an adaptive or coded PHY."""

import numpy as np
import pytest

from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.ofdm_adaptive import (
    OfdmAdaptiveConfig,
    OfdmAdaptiveStreamPhy,
    choose_loading,
    estimate_bin_snr,
    pack_loading,
    probe_waveform,
    unpack_loading,
)


def _shaped(wave: np.ndarray, rng, sigma: float,
            cut_rel: float = 0.55, floor: float = 0.02) -> np.ndarray:
    """Frequency-selective 'speaker roll-off' channel: bins above
    `cut_rel` of the used band are attenuated to `floor`, plus AWGN.
    Applied in the frequency domain on the whole capture (a long FIR
    equivalent; fine for tests)."""
    n = len(wave)
    spec = np.fft.rfft(wave)
    f = np.fft.rfftfreq(n, 1.0 / 48_000)
    lo, hi = 2_062.0, 10_031.0          # the OFDM band edges
    cut = lo + cut_rel * (hi - lo)
    gain = np.ones_like(f)
    width = 600.0
    gain = np.where(f > cut, floor + (1 - floor) / (
        1 + np.exp((f - cut - width / 2) / (width / 6))), gain)
    out = np.fft.irfft(spec * gain, n=n).astype(np.float32)
    return out + rng.normal(0, sigma, n).astype(np.float32)


def test_stream_phy_duck_type_variable_lengths():
    phy = OfdmAdaptiveStreamPhy(local_addr=2)
    frames = [Frame.new_data(0, 1, 2, b"variable"),
              Frame.new_ack(0, 1, 2),
              Frame.new_data(1, 1, 2, b"coded adaptive phy frames!")]
    wave = phy.encode_frames(frames, gap_samples=300)
    got = []
    for i in range(0, len(wave), 2000):
        got.extend(phy.process_samples(wave[i:i + 2000]))
    assert [(f.frame_type, f.data) for f in got] == [
        (f.frame_type, f.data) for f in frames]


def test_stream_phy_dst_filter_and_noise_rejection():
    phy = OfdmAdaptiveStreamPhy(local_addr=2)
    assert phy.process_samples(
        np.random.default_rng(0).normal(0, 0.01, 8000)
        .astype(np.float32)) == []
    wave = phy.encode_frames([Frame.new_data(0, 1, 9, b"not yours")])
    assert phy.process_samples(np.concatenate(
        [wave, np.zeros(4000, np.float32)])) == []


def test_loading_pack_roundtrip():
    lv = (0, 1, 2, 4, 4, 2, 1, 0, 4)
    assert unpack_loading(pack_loading(lv), len(lv)) == lv


def test_handshake_over_shaped_channel():
    """Full ADSL-style handshake: probe through the shaped channel,
    choose a loading, ship it back over the robust uniform-QPSK default
    mode THROUGH THE SAME CHANNEL, then exchange loaded coded frames."""
    rng = np.random.default_rng(11)
    cfg = OfdmAdaptiveConfig()

    # 1. receiver probes the channel
    probe = probe_waveform(cfg)
    rx_probe = _shaped(np.concatenate(
        [probe, np.zeros(1000, np.float32)]), rng, sigma=0.004)
    from trackmaker_tpu.phy.ofdm import find_preambles
    import jax.numpy as jnp
    s = int(np.asarray(find_preambles(cfg, jnp.asarray(rx_probe), 1))[0])
    assert s >= 0
    snr = np.asarray(estimate_bin_snr(cfg, jnp.asarray(rx_probe), s))
    loading = choose_loading(snr)
    assert sum(loading) >= 1, "shaped channel killed every bin"
    assert 0 in loading, "roll-off bins should be unloaded"
    assert 4 in loading, "strong bins should carry 16-QAM"

    # 2. loading travels back inside a regular frame over the
    #    HANDSHAKE mode (coded BPSK on the low quarter of the band, an
    #    a-priori convention) — robust on the unprobed shaped channel
    robust = OfdmAdaptiveStreamPhy.handshake_mode(cfg, local_addr=1)
    hs = robust.encode_frames(
        [Frame.new_data(0, 2, 1, pack_loading(loading))])
    got = OfdmAdaptiveStreamPhy.handshake_mode(
        cfg, local_addr=1).process_samples(
        _shaped(np.concatenate([hs, np.zeros(4000, np.float32)]),
                rng, sigma=0.004))
    assert len(got) == 1
    negotiated = unpack_loading(got[0].data, len(cfg.data_bin_idx))
    assert negotiated == loading

    # 3. both ends switch to the loaded mode and exchange data
    tx = OfdmAdaptiveStreamPhy(cfg, loading=negotiated, local_addr=2)
    rx = OfdmAdaptiveStreamPhy(cfg, loading=negotiated, local_addr=2)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 48) for i in range(3)]
    wave = tx.encode_frames(frames, gap_samples=400)
    got = rx.process_samples(_shaped(np.concatenate(
        [wave, np.zeros(4000, np.float32)]), rng, sigma=0.004))
    assert [f.data for f in got] == [f.data for f in frames]


def test_loaded_coded_goodput_beats_uncoded_qpsk_on_shaped_channel():
    """GOODPUT on the shaped channel (delivered payload bits/sec): the
    uncoded uniform-QPSK v2 mode puts 2 bits on every bin including the
    rolled-off ones, so every frame carries deterministic bit errors
    and dies at the CRC — goodput 0.  The probe-loaded coded mode skips
    the dead bins and Viterbi-cleans the rest, delivering its full net
    rate, which must also be a non-trivial fraction of the uncoded
    nominal rate (no cheating by shrinking to a sliver of the band).

    (A flat equal-rate comparison — uniform coded 16-QAM vs uncoded
    QPSK — is deliberately NOT the claim: rate-1/2 coding halves the
    rate and loading can recoup at most 2x, a textbook wash on flat
    AWGN; frequency-selective channels are where loading + coding earn
    their keep, and are the acoustic reality.)"""
    import jax.numpy as jnp

    from trackmaker_tpu.phy.ofdm import find_preambles
    from trackmaker_tpu.phy.ofdm_v2 import OfdmStreamPhyV2

    rng = np.random.default_rng(5)
    cfg = OfdmAdaptiveConfig()
    sigma = 0.006

    # probe -> loading (same channel as the data will see)
    probe = probe_waveform(cfg)
    rx_probe = _shaped(np.concatenate(
        [probe, np.zeros(1000, np.float32)]), rng, sigma=sigma)
    s = int(np.asarray(find_preambles(cfg, jnp.asarray(rx_probe), 1))[0])
    loading = choose_loading(
        np.asarray(estimate_bin_snr(cfg, jnp.asarray(rx_probe), s)))

    coded = OfdmAdaptiveStreamPhy(cfg, loading=loading, local_addr=2)
    uncoded = OfdmStreamPhyV2(local_addr=2)

    frames = [Frame.new_data(
        i, 1, 2, rng.integers(0, 256, 40, dtype=np.uint8).tobytes())
        for i in range(6)]

    def delivered(phy):
        wave = phy.encode_frames(frames, gap_samples=400)
        ch = _shaped(np.concatenate([wave, np.zeros(4000, np.float32)]),
                     rng, sigma=sigma)
        got = phy.process_samples(ch)
        ok = sum(1 for f in got
                 if any(f.data == w.data and f.sequence == w.sequence
                        for w in frames))
        # payload bits delivered per second of airtime
        air_s = len(wave) / 48_000.0
        return ok * 40 * 8 / air_s

    g_coded = delivered(coded)
    g_uncoded = delivered(uncoded)
    assert g_uncoded == 0.0, g_uncoded        # dead bins kill every frame
    assert g_coded > 0.0, (g_coded, loading)
    # the loaded mode keeps a useful fraction of the uncoded NOMINAL
    # rate despite the rate-1/2 code and the dead bins
    assert (coded.net_bits_per_symbol
            >= 0.4 * uncoded.cfg.bits_per_symbol), loading


def test_csma_transfer_over_coded_adaptive_phy():
    """The MAC stack (CSMA + stop-and-wait ARQ) runs unchanged over the
    loaded coded PHY — the VERDICT's 'usable PHY mode' bar."""
    from trackmaker_tpu.core.config import MacConfig, PhyConfig
    from trackmaker_tpu.link.audio import AudioEndpoint
    from trackmaker_tpu.link.bus import SimulatedBus
    from trackmaker_tpu.link.csma import CsmaReceiver, CsmaSender
    from trackmaker_tpu.link.transfer import chunk_payload

    cfg, mac_cfg = PhyConfig(), MacConfig()
    n_data = len(OfdmAdaptiveConfig().data_bin_idx)
    # a realistic negotiated loading: 16-QAM low band, QPSK mid, BPSK top
    loading = tuple([4] * (n_data // 3) + [2] * (n_data // 3)
                    + [1] * (n_data - 2 * (n_data // 3)))
    bus = SimulatedBus()
    ep_tx, ep_rx = AudioEndpoint("tx"), AudioEndpoint("rx")
    sender = CsmaSender(
        ep_tx, cfg, mac_cfg, 1, 2,
        phy=OfdmAdaptiveStreamPhy(loading=loading, local_addr=1))
    receiver = CsmaReceiver(
        ep_rx, cfg, mac_cfg, 2, 1,
        phy=OfdmAdaptiveStreamPhy(loading=loading, local_addr=2))
    bus.attach(ep_tx, sender)
    bus.attach(ep_rx, receiver)

    data = b"coded adaptive ofdm carrying mac traffic " * 8
    chunks = chunk_payload(data, cfg.max_frame_data_size)
    for c in chunks:
        sender.send(c)
    bus.run(120 * bus.sample_rate,
            until=lambda: sender.finished
            and len(receiver.received) >= len(chunks))
    assert b"".join(receiver.received) == data


def test_live_retrain_on_degradation():
    """Mid-session loading refresh: the pre-FEC BER monitor notices the
    channel worsened, the receiver re-probes and renegotiates, and the
    link runs clean on the derated loading — without tearing down."""
    import jax.numpy as jnp
    from trackmaker_tpu.phy.ofdm import find_preambles
    from trackmaker_tpu.phy.ofdm_adaptive import (
        make_loading_frame, make_reprobe_frame, parse_control)

    rng = np.random.default_rng(23)
    cfg = OfdmAdaptiveConfig()
    nd = len(cfg.data_bin_idx)

    def mild(w):
        return _shaped(w, rng, sigma=0.004, cut_rel=0.95, floor=0.5)

    def bad(w):
        return _shaped(w, rng, sigma=0.01, cut_rel=0.45, floor=0.01)

    def pad(w):
        return np.concatenate([w, np.zeros(4000, np.float32)])

    # 1. initial negotiation on the mild channel -> aggressive loading
    probe = probe_waveform(cfg)
    rxp = mild(pad(probe))
    s = int(np.asarray(find_preambles(cfg, jnp.asarray(rxp), 1))[0])
    load0 = choose_loading(np.asarray(estimate_bin_snr(cfg, rxp, s)))
    assert sum(load0) > nd  # better than uniform BPSK

    tx = OfdmAdaptiveStreamPhy(cfg, loading=load0, local_addr=1)
    rx = OfdmAdaptiveStreamPhy(cfg, loading=load0, local_addr=2)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 40) for i in range(4)]

    # clean traffic on the mild channel: monitor stays calm
    got = rx.process_samples(mild(pad(tx.encode_frames(frames, 400))))
    assert len(got) == 4
    assert not rx.link_degraded(window=4)
    calm = rx.prefec_ber(4)

    # 2. the channel worsens; the same loading now takes heavy pre-FEC
    # hits and the monitor fires
    rx.process_samples(bad(pad(tx.encode_frames(frames, 400))))
    assert rx.link_degraded(window=4), rx.frame_prefec
    assert rx.prefec_ber(4) > calm + 0.03

    # 3. retrain over the robust handshake mode: REPROBE -> probe ->
    # LOADING, all through the BAD channel
    hs_rx = OfdmAdaptiveStreamPhy.handshake_mode(cfg, local_addr=1)
    hs_tx = OfdmAdaptiveStreamPhy.handshake_mode(cfg, local_addr=1)
    req = hs_rx.encode_frames([make_reprobe_frame(9, 2, 1)])
    got_req = hs_tx.process_samples(bad(pad(req)))
    assert parse_control(got_req[0], nd) == ("reprobe", None, None)

    rxp2 = bad(pad(probe_waveform(cfg)))
    s2 = int(np.asarray(find_preambles(cfg, jnp.asarray(rxp2), 1))[0])
    load1 = choose_loading(np.asarray(estimate_bin_snr(cfg, rxp2, s2)))
    assert sum(load1) < sum(load0)   # derated for the worse channel

    from trackmaker_tpu.phy.ofdm_adaptive import choose_gains
    snr1 = np.asarray(estimate_bin_snr(cfg, rxp2, s2))
    gains1 = choose_gains(snr1, load1)
    upd = hs_rx.encode_frames(
        [make_loading_frame(10, 2, 1, load1, gains1)])
    got_upd = hs_tx.process_samples(bad(pad(upd)))
    kind, negotiated, ngains = parse_control(got_upd[0], nd)
    assert kind == "loading" and negotiated == load1
    assert ngains == gains1    # water-filling rides the update

    # 4. both ends switch; traffic runs clean on the bad channel
    tx2 = OfdmAdaptiveStreamPhy(cfg, loading=negotiated,
                                gains=ngains, local_addr=1)
    rx2 = OfdmAdaptiveStreamPhy(cfg, loading=negotiated,
                                gains=ngains, local_addr=2)
    got2 = rx2.process_samples(bad(pad(tx2.encode_frames(frames, 400))))
    assert [(f.sequence, f.data) for f in got2] == [
        (f.sequence, f.data) for f in frames]
    assert not rx2.link_degraded(window=4)
