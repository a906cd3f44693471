from trackmaker_tpu.parallel.mesh import make_mesh, batch_sharded_decode
from trackmaker_tpu.parallel.stream import decode_blocked_sharded
from trackmaker_tpu.parallel.ofdm_stream import decode_ofdm_blocked_sharded

__all__ = ["make_mesh", "batch_sharded_decode", "decode_blocked_sharded",
           "decode_ofdm_blocked_sharded"]
