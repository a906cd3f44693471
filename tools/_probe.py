import sys, os, threading, time
import numpy as np
def main():
    import jax, jax.numpy as jnp
    t0 = time.time()
    x = np.asarray(jnp.asarray(np.ones(4)) + 1.0)
    t1 = time.time()
    # RTT probe: tiny jit dispatch round-trips
    f = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros(8); np.asarray(f(v))
    ts = time.time()
    for _ in range(10):
        v = f(v)
    np.asarray(v)
    rtt = (time.time() - ts) / 10 * 1000
    print(f"TUNNEL_OK init={t1-t0:.2f}s rtt_ms={rtt:.1f} dev={jax.devices()}")
    sys.stdout.flush(); os._exit(0)
res = [False]
def run():
    main(); res[0] = True
th = threading.Thread(target=run, daemon=True)
th.start(); th.join(25)
if th.is_alive():
    print("TUNNEL_DOWN (25s timeout)"); sys.stdout.flush(); os._exit(1)
