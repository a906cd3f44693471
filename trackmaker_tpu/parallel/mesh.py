"""Device-mesh scaling for batched decode.

The reference is a single-process system; its only "scale axis" is
running more OS processes against one audio loop (tools/test.py).  Here
scaling is native: a ``jax.sharding.Mesh`` with a data-parallel axis over
recordings (`dp`) and a sequence-parallel axis over capture time (`sp`,
see ``trackmaker_tpu.parallel.stream``).  XLA inserts the collectives;
decode results come back per-shard and concatenate on host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trackmaker_tpu.core.config import PhyConfig
from trackmaker_tpu.phy.decoder import DecodedFrames, decode_capture


def make_mesh(n_devices: int | None = None,
              dp: int | None = None, sp: int = 1) -> Mesh:
    """Build a (dp, sp) mesh from the first dp*sp visible devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if dp is None:
        dp = n_devices // sp
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharded_decode(
    cfg: PhyConfig,
    captures,                   # f32[B, T], B divisible by mesh dp
    local_addr: int,
    mesh: Mesh,
    max_frames: int = 64,
) -> DecodedFrames:
    """Pure data-parallel decode: shard the recording batch over `dp`."""
    import jax.numpy as jnp

    sharding = NamedSharding(mesh, P("dp", None))
    x = jax.device_put(jnp.asarray(captures), sharding)

    @jax.jit
    def run(xs):
        return jax.vmap(
            lambda s: decode_capture(cfg, s, local_addr,
                                     max_frames=max_frames))(xs)

    return run(x)
