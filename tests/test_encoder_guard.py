"""PhyEncoder rejects payloads no conforming decoder can return.

A payload over max_frame_data_size encodes fine (the length header is
16-bit) but the decoder's body cap (decoder.rs:61 — 2x max payload of
the line-coded body) drops it on the air; the encoder must fail loudly
at the producer instead."""

import numpy as np
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.encoder import PhyEncoder


def test_oversize_payload_rejected():
    cfg = PhyConfig()
    enc = PhyEncoder(cfg)
    big = Frame.new_data(0, 1, 2, bytes(cfg.max_frame_data_size + 1))
    with pytest.raises(ValueError, match="max_frame_data_size"):
        enc.encode_frame(big)
    ok = Frame.new_data(1, 1, 2, bytes(4))
    with pytest.raises(ValueError, match="max_frame_data_size"):
        enc.encode_frames([ok, big])


def test_max_size_payload_round_trips():
    """The boundary payload itself must still encode AND decode."""
    import jax.numpy as jnp
    from trackmaker_tpu.phy.decoder import decode_capture

    cfg = PhyConfig()
    enc = PhyEncoder(cfg)
    f = Frame.new_data(3, 1, 2, bytes(range(256)) * (
        cfg.max_frame_data_size // 256) + bytes(
            range(cfg.max_frame_data_size % 256)))
    assert len(f.data) == cfg.max_frame_data_size
    wave = np.concatenate([enc.encode_frame(f),
                           np.zeros(600, np.float32)])
    res = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=4)
    frames = res.to_frames()
    assert len(frames) == 1 and frames[0].data == f.data
