"""Kernel TUN integration: a real `ping` over the acoustic stack.

Requires /dev/net/tun + CAP_NET_ADMIN (available in the CI container);
skipped otherwise.
"""

import os
import pathlib
import subprocess
import time

import pytest

from trackmaker_tpu.net.icmp import IcmpPacket
from trackmaker_tpu.net.ip import Ipv4Header, build_ipv4_packet


def _tun_available() -> bool:
    if not pathlib.Path("/dev/net/tun").exists() or os.geteuid() != 0:
        return False
    try:
        subprocess.run(["ip", "link"], capture_output=True, check=True)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tun_available(),
                                reason="TUN/CAP_NET_ADMIN unavailable")


class KernelPinger:
    """Raw-socket ICMP echo client (the container has no `ping` binary);
    the kernel still routes the packet through the TUN device."""

    def __init__(self, dst: str, ident: int = 0x5151):
        import socket
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_RAW,
                                  socket.IPPROTO_ICMP)
        self.sock.setblocking(False)
        self.dst = dst
        self.ident = ident

    def send(self, seq: int = 0) -> None:
        req = IcmpPacket.echo_request(self.ident, seq, b"tunping!")
        self.sock.sendto(req.to_bytes(), (self.dst, 0))

    def poll_reply(self) -> bool:
        try:
            data = self.sock.recv(65535)
        except BlockingIOError:
            return False
        if len(data) < 28:
            return False
        icmp = IcmpPacket.from_bytes(data[(data[0] & 0xF) * 4:])
        return icmp.icmp_type == 0 and icmp.identifier == self.ident

    def close(self) -> None:
        self.sock.close()


def test_kernel_ping_over_tun_echo():
    """The OS pings 10.77.0.2; we terminate the echo at the TUN fd (the
    role the far acoustic node would play) and the kernel ping must
    report success — a real tun.rs-style round trip."""
    from trackmaker_tpu.net.ports import TunPort

    tun = TunPort("tmtest0", ip="10.77.0.1", netmask_bits=24)
    pinger = KernelPinger("10.77.0.2")
    try:
        pinger.send()
        deadline = time.time() + 3.0
        replied = False
        got_request = False
        while time.time() < deadline and not replied:
            pkt = tun.recv()
            if pkt is not None and len(pkt) >= 28 and (pkt[0] >> 4) == 4 \
                    and pkt[9] == 1:
                hdr = Ipv4Header.from_bytes(pkt)
                icmp = IcmpPacket.from_bytes(pkt[hdr.ihl_bytes:])
                if icmp.icmp_type == 8:
                    got_request = True
                    reply = IcmpPacket.echo_reply(icmp.identifier,
                                                  icmp.sequence_number,
                                                  icmp.payload)
                    out = build_ipv4_packet(
                        1, hdr.dest_ip, hdr.source_ip, reply.to_bytes(),
                        identification=hdr.identification)
                    tun.send(out)
            replied = pinger.poll_reply()
            if pkt is None and not replied:
                time.sleep(0.005)
        assert got_request, "no echo request arrived on the TUN fd"
        assert replied, "kernel never saw the echo reply"
    finally:
        pinger.close()
        tun.close()
        subprocess.run(["ip", "link", "del", "tmtest0"],
                       capture_output=True)


def test_tun_bridge_over_simulated_acoustic():
    """Full path: kernel ping -> TUN -> acoustic sim bus -> far node
    replies -> TUN -> kernel."""
    from trackmaker_tpu.core.config import MacConfig, NetConfig, PhyConfig
    from trackmaker_tpu.link.audio import AudioEndpoint
    from trackmaker_tpu.link.bus import SimulatedBus
    from trackmaker_tpu.link.interface import AcousticInterface
    from trackmaker_tpu.net.ports import TunPort
    from trackmaker_tpu.net.tools import IpHostApp
    from trackmaker_tpu.net.tun_bridge import TunBridge

    cfg, mac, net = PhyConfig(), MacConfig(), NetConfig()
    bus = SimulatedBus()
    ep_a, ep_b = AudioEndpoint("tun-side"), AudioEndpoint("host-side")
    if_a = AcousticInterface(ep_a, cfg, mac, net, local_mac=1)
    if_b = AcousticInterface(ep_b, cfg, mac, net, local_mac=2)

    tun = TunPort("tmtest1", ip="10.78.0.1", netmask_bits=24)
    try:
        bridge = TunBridge(if_a, tun, "10.78.0.1")
        host = IpHostApp(if_b, "10.78.0.2")
        bus.attach(ep_a, bridge)
        bus.attach(ep_b, host)

        pinger = KernelPinger("10.78.0.2")
        pinger.send()
        replied = False
        # drive the bus until the kernel sees the reply (<=30 sim seconds)
        for _ in range(30 * 48000 // bus.chunk):
            bus.step()
            if pinger.poll_reply():
                replied = True
                break
        pinger.close()
        assert bridge.tx_packets >= 1, "kernel packet never entered bridge"
        assert host.responded >= 1, "far node never saw the request"
        assert replied, "kernel never saw the echo reply over sound"
    finally:
        tun.close()
        subprocess.run(["ip", "link", "del", "tmtest1"],
                       capture_output=True)
