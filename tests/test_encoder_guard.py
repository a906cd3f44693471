"""PhyEncoder rejects payloads no conforming decoder can return.

A payload over the DECODER body cap (max_frame_bytes, decoder.rs:61 —
2x max payload of the line-coded body) encodes fine (the length header
is 16-bit) but is dropped on the air; the encoder must fail loudly at
the producer instead.

The cap is NOT max_frame_data_size: the reference's IP path fragments
at DEFAULT_MTU = 200 > MAX_FRAME_DATA_SIZE = 128 (utils/consts.rs:37,
68; acoustic_interface.rs:45) and those frames round-trip because the
decoder accepts bodies up to the 2x cap — the ping / fragmentation
flow (tests/test_ping.py) depends on this quirk."""

import numpy as np
import pytest

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.core.framing import Frame
from trackmaker_tpu.phy.encoder import PhyEncoder


def test_oversize_payload_rejected():
    cfg = PhyConfig()
    enc = PhyEncoder(cfg)
    big = Frame.new_data(0, 1, 2, bytes(cfg.max_frame_bytes + 1))
    with pytest.raises(ValueError, match="max_frame_bytes"):
        enc.encode_frame(big)
    ok = Frame.new_data(1, 1, 2, bytes(4))
    with pytest.raises(ValueError, match="max_frame_bytes"):
        enc.encode_frames([ok, big])


def _roundtrip(cfg, payload: bytes):
    import jax.numpy as jnp
    from trackmaker_tpu.phy.decoder import decode_capture

    enc = PhyEncoder(cfg)
    f = Frame.new_data(3, 1, 2, payload)
    wave = np.concatenate([enc.encode_frame(f),
                           np.zeros(600, np.float32)])
    res = decode_capture(cfg, jnp.asarray(wave), 2, max_frames=4)
    frames = res.to_frames()
    assert len(frames) == 1 and frames[0].data == payload


def test_body_cap_payload_round_trips():
    """The boundary payload (= the decoder body cap) must still encode
    AND decode."""
    cfg = PhyConfig()
    pat = bytes(range(256))
    n = cfg.max_frame_bytes
    _roundtrip(cfg, (pat * (n // 256 + 1))[:n])


def test_mtu_sized_fragment_round_trips():
    """A DEFAULT_MTU-sized (200 B > max_frame_data_size = 128) payload
    round-trips — the reference quirk the IP fragmentation path
    depends on."""
    cfg = PhyConfig()
    assert cfg.max_frame_data_size < 200 <= cfg.max_frame_bytes
    _roundtrip(cfg, bytes(range(200)))
