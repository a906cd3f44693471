"""MAC over the single-carrier modems (FSK, PSK) via the shared stream
duck type — every waveform family carries MAC traffic unchanged."""

import numpy as np
import pytest

from trackmaker_tpu.core.config import MacConfig, PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.link.audio import AudioEndpoint
from trackmaker_tpu.link.bus import SimulatedBus
from trackmaker_tpu.link.csma import CsmaReceiver, CsmaSender
from trackmaker_tpu.link.transfer import chunk_payload
from trackmaker_tpu.phy.stream_sc import FskStreamPhy, PskStreamPhy


@pytest.mark.parametrize("mk", [FskStreamPhy, PskStreamPhy])
def test_stream_phy_duck_type(mk):
    phy = mk(local_addr=2)
    frames = [Frame.new_data(0, 1, 2, b"variable"),
              Frame.new_ack(0, 1, 2),
              Frame.new_data(1, 1, 2, b"lengths differ between frames!")]
    wave = phy.encode_frames(frames, gap_samples=300)
    got = []
    for i in range(0, len(wave), 2000):
        got.extend(phy.process_samples(wave[i:i + 2000]))
    assert [(f.frame_type, f.data) for f in got] == [
        (f.frame_type, f.data) for f in frames]


@pytest.mark.parametrize("mk", [FskStreamPhy, PskStreamPhy])
def test_stream_phy_dst_filter(mk):
    phy = mk(local_addr=2)
    wave = phy.encode_frames([Frame.new_data(0, 1, 9, b"not yours")])
    assert phy.process_samples(wave) == []


def test_stream_phy_noise_robust():
    phy = FskStreamPhy(local_addr=2)
    frames = [Frame.new_data(i, 1, 2, bytes([i]) * 24) for i in range(3)]
    wave = phy.encode_frames(frames, gap_samples=400)
    rng = np.random.default_rng(0)
    noisy = wave + rng.normal(0, 0.05, len(wave)).astype(np.float32)
    got = phy.process_samples(noisy)
    assert [f.sequence for f in got] == [0, 1, 2]


def test_csma_transfer_over_psk_phy():
    """Full CSMA/ARQ file transfer with coherent PSK as the physical
    layer — the MAC code is untouched, only the PHY object differs."""
    cfg, mac_cfg = PhyConfig(), MacConfig()
    bus = SimulatedBus()
    ep_tx, ep_rx = AudioEndpoint("tx"), AudioEndpoint("rx")
    sender = CsmaSender(ep_tx, cfg, mac_cfg, 1, 2,
                        phy=PskStreamPhy(local_addr=1))
    receiver = CsmaReceiver(ep_rx, cfg, mac_cfg, 2, 1,
                            phy=PskStreamPhy(local_addr=2))
    bus.attach(ep_tx, sender)
    bus.attach(ep_rx, receiver)

    data = b"ip over sound over psk " * 12
    chunks = chunk_payload(data, cfg.max_frame_data_size)
    for c in chunks:
        sender.send(c)
    bus.run(120 * bus.sample_rate,
            until=lambda: sender.finished
            and len(receiver.received) >= len(chunks))
    assert b"".join(receiver.received) == data
