"""Air-capture + offline forensic decode: a passive microphone records a
live CSMA transfer; the capture is then batch-decoded offline in
promiscuous mode, recovering both the data frames and the ACKs — the
"decode recorded captures offline" workflow the framework is built
around, applied to its own MAC traffic."""

import numpy as np
import jax.numpy as jnp

from trackmaker_tpu.core.config import (
    FRAME_TYPE_ACK, FRAME_TYPE_DATA, MacConfig, PhyConfig)
from trackmaker_tpu.link.audio import AppState, AudioEndpoint
from trackmaker_tpu.link.bus import SimulatedBus
from trackmaker_tpu.link.csma import CsmaReceiver, CsmaSender
from trackmaker_tpu.link.transfer import chunk_payload
from trackmaker_tpu.phy.decoder import decode_capture


def test_sniff_and_forensic_decode():
    cfg, mac_cfg = PhyConfig(), MacConfig()
    data = b"packets out of thin air " * 12
    bus = SimulatedBus()
    ep_tx, ep_rx, ep_mic = (AudioEndpoint("tx"), AudioEndpoint("rx"),
                            AudioEndpoint("mic"))
    sender = CsmaSender(ep_tx, cfg, mac_cfg, 1, 2)
    receiver = CsmaReceiver(ep_rx, cfg, mac_cfg, 2, 1)
    bus.attach(ep_tx, sender)
    bus.attach(ep_rx, receiver)
    bus.attach(ep_mic)          # passive observer
    ep_mic.set_state(AppState.RECORDING)

    chunks = chunk_payload(data, cfg.max_frame_data_size)
    for c in chunks:
        sender.send(c)
    bus.run(60 * bus.sample_rate,
            until=lambda: sender.finished
            and len(receiver.received) >= len(chunks))
    assert b"".join(receiver.received) == data

    capture = ep_mic.take_record()
    res = decode_capture(cfg, jnp.asarray(capture), -1,  # promiscuous
                         max_frames=4 * len(chunks) + 8)
    frames = res.to_frames()
    datas = [f for f in frames if f.frame_type == FRAME_TYPE_DATA]
    acks = [f for f in frames if f.frame_type == FRAME_TYPE_ACK]
    # every transmitted chunk and every ACK is visible in the air capture
    assert b"".join(f.data for f in datas) == data
    assert len(acks) == len(chunks)
    assert [a.sequence for a in acks] == [d.sequence for d in datas]
    # directionality is preserved
    assert all(d.src == 1 and d.dst == 2 for d in datas)
    assert all(a.src == 2 and a.dst == 1 for a in acks)
