"""Network-namespace TUN integration — the reference's `elinks.sh` flow
(netns around the TUN device so unmodified apps run over sound from an
isolated namespace), automated: create tm_ns, move the TUN in,
configure 192.168.1.2/24 + default route via .1 exactly like
elinks.sh:1-10, then ping 192.168.1.3 FROM INSIDE the namespace while
the root namespace drives the acoustic simulation.

Requires /dev/net/tun + CAP_NET_ADMIN + `ip netns` (CI container has
all three); skipped otherwise."""

import os
import pathlib
import subprocess
import sys
import textwrap

import pytest


def _netns_available() -> bool:
    if not pathlib.Path("/dev/net/tun").exists() or os.geteuid() != 0:
        return False
    try:
        subprocess.run(["ip", "netns", "add", "tm_probe_ns"],
                       capture_output=True, check=True)
        subprocess.run(["ip", "netns", "del", "tm_probe_ns"],
                       capture_output=True, check=True)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _netns_available(),
                                reason="netns/CAP_NET_ADMIN unavailable")

NS = "tm_test_ns"

# raw-socket ICMP pinger that runs INSIDE the namespace (the container
# ships no `ping` binary); retries until the acoustic RTT completes
_PINGER = textwrap.dedent("""
    import socket, struct, sys, time
    s = socket.socket(socket.AF_INET, socket.SOCK_RAW,
                      socket.IPPROTO_ICMP)
    s.setblocking(False)
    ident = 0x4242
    def req(seq):
        h = struct.pack("!BBHHH", 8, 0, 0, ident, seq) + b"ns-ping!"
        c = 0
        for i in range(0, len(h), 2):
            c += (h[i] << 8) + h[i+1]
        c = ~((c & 0xFFFF) + (c >> 16)) & 0xFFFF
        return h[:2] + struct.pack("!H", c) + h[4:]
    deadline = time.time() + 25.0
    seq = 0
    last_tx = 0.0
    while time.time() < deadline:
        if time.time() - last_tx > 2.0:
            s.sendto(req(seq), ("192.168.1.3", 0))
            seq += 1
            last_tx = time.time()
        try:
            data = s.recv(65535)
        except BlockingIOError:
            time.sleep(0.01)
            continue
        ihl = (data[0] & 0xF) * 4
        if len(data) >= ihl + 8 and data[ihl] == 0:
            rid = struct.unpack("!H", data[ihl+4:ihl+6])[0]
            if rid == ident:
                sys.exit(0)
    sys.exit(1)
""")


def _ns(*args, check=True):
    return subprocess.run(["ip", "netns", "exec", NS, *args],
                          capture_output=True, check=check)


def test_netns_ping_over_sound():
    from trackmaker_tpu.core.config import MacConfig, NetConfig, PhyConfig
    from trackmaker_tpu.link.audio import AudioEndpoint
    from trackmaker_tpu.link.bus import SimulatedBus
    from trackmaker_tpu.link.interface import AcousticInterface
    from trackmaker_tpu.net.ports import TunPort
    from trackmaker_tpu.net.tools import IpHostApp
    from trackmaker_tpu.net.tun_bridge import TunBridge

    subprocess.run(["ip", "netns", "del", NS], capture_output=True)
    tun = TunPort("tmns0")          # fd stays valid across the move
    proc = None
    try:
        subprocess.run(["ip", "netns", "add", NS], check=True)
        subprocess.run(["ip", "link", "set", "tmns0", "netns", NS],
                       check=True)
        # elinks.sh:5-7 verbatim (addressing + route)
        _ns("ip", "addr", "add", "192.168.1.2/24", "dev", "tmns0")
        _ns("ip", "link", "set", "tmns0", "up")
        _ns("ip", "link", "set", "lo", "up")
        _ns("ip", "route", "add", "default", "via", "192.168.1.1",
            "dev", "tmns0")

        cfg, mac, net = PhyConfig(), MacConfig(), NetConfig()
        bus = SimulatedBus()
        ep_a, ep_b = AudioEndpoint("ns-tun"), AudioEndpoint("ip-host")
        if_a = AcousticInterface(ep_a, cfg, mac, net, local_mac=2)
        if_b = AcousticInterface(ep_b, cfg, mac, net, local_mac=3)
        bridge = TunBridge(if_a, tun, "192.168.1.2")
        host = IpHostApp(if_b, "192.168.1.3")
        bus.attach(ep_a, bridge)
        bus.attach(ep_b, host)

        proc = subprocess.Popen(
            ["ip", "netns", "exec", NS, sys.executable, "-c", _PINGER])
        replied = False
        for _ in range(60 * 48_000 // bus.chunk):
            bus.step()
            rc = proc.poll()
            if rc is not None:
                replied = rc == 0
                break
        assert bridge.tx_packets >= 1, \
            "namespaced ping never entered the bridge"
        assert host.responded >= 1, "far node never saw the request"
        assert replied, "namespace never received the echo reply"
    finally:
        if proc is not None and proc.poll() is None:
            proc.kill()
            proc.wait()
        tun.close()
        subprocess.run(["ip", "netns", "del", NS], capture_output=True)
