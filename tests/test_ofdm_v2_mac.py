"""MAC over the OFDM v2 PHY (OfdmStreamPhyV2): the duck-typed layering
with the Schmidl-Cox / pilot-tracking receiver, incl. variable-length
frames (masked pilot-trajectory fits) and clock-offset robustness."""

import numpy as np

from trackmaker_tpu.core.config import MacConfig, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.link.audio import AudioEndpoint
from trackmaker_tpu.link.bus import SimulatedBus
from trackmaker_tpu.link.csma import CsmaReceiver, CsmaSender
from trackmaker_tpu.link.transfer import chunk_payload
from trackmaker_tpu.phy.ofdm_v2 import OfdmStreamPhyV2


def test_ofdm_v2_stream_phy_duck_type():
    phy = OfdmStreamPhyV2(local_addr=2)
    frames = [Frame.new_data(0, 1, 2, b"variable"),
              Frame.new_ack(0, 1, 2),
              Frame.new_data(1, 1, 2, b"lengths differ between frames!")]
    wave = phy.encode_frames(frames, gap_samples=300)
    got = []
    for i in range(0, len(wave), 2000):
        got.extend(phy.process_samples(wave[i:i + 2000]))
    assert [(f.frame_type, f.data) for f in got] == [
        (f.frame_type, f.data) for f in frames]


def test_ofdm_v2_phy_dst_filter_and_noise():
    phy = OfdmStreamPhyV2(local_addr=2)
    assert phy.process_samples(
        np.random.default_rng(0).normal(0, 0.01, 8000)
        .astype(np.float32)) == []
    wave = phy.encode_frames([Frame.new_data(0, 1, 9, b"not yours")])
    assert phy.process_samples(wave) == []


def test_ofdm_v2_variable_length_with_awgn():
    """The vsyms mask must keep long+short frames clean under noise —
    an unmasked fit over the max-size tail would drag the short frame's
    phase trajectory through noise symbols."""
    rng = np.random.default_rng(3)
    phy = OfdmStreamPhyV2(local_addr=2)
    frames = [Frame.new_data(0, 1, 2, b"x"),
              Frame.new_data(1, 1, 2, bytes(range(128)) * 2),
              Frame.new_data(2, 1, 2, b"mid-size frame here")]
    wave = phy.encode_frames(frames, gap_samples=400)
    noisy = (wave + rng.normal(0, 0.02, len(wave))).astype(np.float32)
    got = phy.process_samples(np.concatenate(
        [noisy, np.zeros(2000, np.float32)]))
    assert [f.data for f in got] == [f.data for f in frames]


def test_ofdm_v2_clock_offset_stream():
    """+-200 ppm clock offset through the stream facade (the v2
    receiver's pilot tracking carries this; v1 loses frames here)."""
    from trackmaker_tpu.dsp.channel import clock_offset

    phy = OfdmStreamPhyV2(local_addr=2)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 40) for i in range(3)]
    wave = phy.encode_frames(frames, gap_samples=500)
    for ppm in (-200.0, 200.0):
        phy.reset()
        skewed = np.asarray(clock_offset(
            np.concatenate([wave, np.zeros(3000, np.float32)]), ppm))
        got = phy.process_samples(skewed.astype(np.float32))
        assert [f.data for f in got] == [f.data for f in frames], ppm


def test_csma_transfer_over_ofdm_v2_phy():
    cfg, mac_cfg = PhyConfig(), MacConfig()
    bus = SimulatedBus()
    ep_tx, ep_rx = AudioEndpoint("tx"), AudioEndpoint("rx")
    sender = CsmaSender(ep_tx, cfg, mac_cfg, 1, 2,
                        phy=OfdmStreamPhyV2(local_addr=1))
    receiver = CsmaReceiver(ep_rx, cfg, mac_cfg, 2, 1,
                            phy=OfdmStreamPhyV2(local_addr=2))
    bus.attach(ep_tx, sender)
    bus.attach(ep_rx, receiver)

    data = b"ip over sound over ofdm v2 " * 12
    chunks = chunk_payload(data, cfg.max_frame_data_size)
    for c in chunks:
        sender.send(c)
    bus.run(120 * bus.sample_rate,
            until=lambda: sender.finished
            and len(receiver.received) >= len(chunks))
    assert b"".join(receiver.received) == data
