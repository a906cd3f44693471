"""Two-process DCN dry-run: dp-sharded batch decode across hosts.

Usage (run once per process):
    python tools/multihost_dryrun.py <coordinator> <num_procs> <pid>

Each process simulates one host with 4 virtual CPU devices; the global
mesh is dp=4*num_procs.  Every host encodes its own captures, decodes
its shard of the global batch, and verifies its local payloads —
proving the mesh/sharding code is host-count agnostic (ROADMAP
"Systems").
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")


def main() -> None:
    coordinator, nproc, pid = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]))
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # initialize BEFORE importing the package: trackmaker_tpu's import
    # graph builds device constants (jnp.asarray at module scope),
    # which would initialize the backend first
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    from trackmaker_tpu.parallel.multihost import decode_captures_multihost
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import numpy as np
    from trackmaker_tpu.core.config import PhyConfig
    from trackmaker_tpu.core.framing import Frame
    from trackmaker_tpu.oracle.phy import OracleEncoder

    cfg = PhyConfig()
    enc = OracleEncoder(cfg)
    rng = np.random.default_rng(pid)
    b_local, t = 4, 20000
    caps, want = [], []
    for i in range(b_local):
        payload = bytes([pid * 16 + i]) * (6 + i)
        w = enc.encode_frame(Frame.new_data(i, 1, 2, payload))
        cap = np.zeros(t, np.float32)
        off = 137 * (i + 1)
        cap[off:off + len(w)] = w
        cap += rng.normal(0, 0.02, t).astype(np.float32)
        caps.append(cap)
        want.append(payload)

    res = decode_captures_multihost(cfg, np.stack(caps), 2, max_frames=4)
    fb = np.asarray(res.frame_bytes)
    ln = np.asarray(res.length)
    valid = np.asarray(res.valid)
    got = []
    for i in range(b_local):
        ks = np.nonzero(valid[i])[0]
        assert len(ks) == 1, (pid, i, ks)
        k = ks[0]
        got.append(fb[i, k, 7:7 + ln[i, k]].tobytes())
    assert got == want, (pid, got, want)
    # sync before exit: without a final barrier the leader can tear
    # down the coordination service while a slower worker still polls
    # it, killing the worker with a fatal UNAVAILABLE (observed under
    # loaded CI) — the standard all-hosts sync makes shutdown orderly
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("dryrun-done")
    print(f"MULTIHOST-OK pid={pid} devices={len(jax.devices())}")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
