"""Full-stack routing scenario (SURVEY §3.4): an acoustic node pings a
host on the router's WiFi segment; the packet crosses the simulated
audio bus, the router's ARP/forwarding machinery, and comes back."""

import ipaddress

import numpy as np

from trackmaker_tpu.core.config import (
    FRAME_TYPE_DATA, MacConfig, NetConfig, PhyConfig)
from trackmaker_tpu.link.audio import AudioEndpoint
from trackmaker_tpu.link.bus import SimulatedBus
from trackmaker_tpu.link.interface import AcousticInterface
from trackmaker_tpu.net.ethernet import (
    ETHERTYPE_ARP, ETHERTYPE_IPV4, ArpPacket, EthernetFrame)
from trackmaker_tpu.net.icmp import IcmpPacket
from trackmaker_tpu.net.ip import Ipv4Header, build_ipv4_packet
from trackmaker_tpu.net.ports import AcousticRouterPort, LoopbackPort
from trackmaker_tpu.net.router import InterfaceType, Router, RouterConfig


class WifiHost:
    """Fake node3 on the WiFi loopback: answers ARP and echoes ICMP."""

    def __init__(self, port: LoopbackPort, ip: str, mac: bytes):
        self.port = port
        self.ip = ipaddress.IPv4Address(ip).packed
        self.mac = mac
        self.pings_seen = 0

    def poll(self):
        while (raw := self.port.recv()) is not None:
            frame = EthernetFrame.from_bytes(raw)
            if frame.ethertype == ETHERTYPE_ARP:
                arp = ArpPacket.from_bytes(frame.payload)
                if arp.opcode == 1 and bytes(arp.target_ip) == self.ip:
                    reply = ArpPacket.reply(self.mac, self.ip,
                                            arp.sender_mac, arp.sender_ip)
                    self.port.send(reply.to_ethernet())
            elif frame.ethertype == ETHERTYPE_IPV4:
                pkt = frame.payload
                hdr = Ipv4Header.from_bytes(pkt)
                if hdr.protocol != 1:
                    continue
                icmp = IcmpPacket.from_bytes(pkt[hdr.ihl_bytes:])
                if icmp.icmp_type != 8:
                    continue
                self.pings_seen += 1
                reply = IcmpPacket.echo_reply(
                    icmp.identifier, icmp.sequence_number, icmp.payload)
                out = build_ipv4_packet(1, hdr.dest_ip, hdr.source_ip,
                                        reply.to_bytes())
                self.port.send(EthernetFrame(
                    frame.src_mac, self.mac, ETHERTYPE_IPV4,
                    out).to_bytes())


def test_acoustic_node_pings_wifi_host_via_router():
    cfg, mac_cfg, net_cfg = PhyConfig(), MacConfig(), NetConfig()
    bus = SimulatedBus()

    # node1 on the acoustic segment (192.168.1.2, MAC 2)
    ep_node = AudioEndpoint("node1")
    if_node = AcousticInterface(ep_node, cfg, mac_cfg, net_cfg,
                                local_mac=2)

    # router: acoustic side 192.168.1.1 (MAC 1) + wifi loopback
    ep_router = AudioEndpoint("router")
    if_router = AcousticInterface(ep_router, cfg, mac_cfg, net_cfg,
                                  local_mac=1)
    router = Router(RouterConfig(acoustic_mac=1))
    router.register_port(InterfaceType.ACOUSTIC,
                         AcousticRouterPort(if_router))
    wifi_mine, wifi_theirs = LoopbackPort.pair()
    router.register_port(InterfaceType.WIFI, wifi_mine)
    host = WifiHost(wifi_theirs, "192.168.2.2",
                    bytes([0, 0, 0, 0, 0, 3]))

    class RouterNode:
        def on_tick(self, now):
            if_router.on_tick(now)
            router.poll()
            host.poll()

    bus.attach(ep_node, type("N", (), {
        "on_tick": staticmethod(if_node.on_tick)})())
    bus.attach(ep_router, RouterNode())

    # node1 -> ping 192.168.2.2, next hop = router's acoustic MAC (1)
    echo = IcmpPacket.echo_request(0x99, 1, b"crossing segments")
    pkt = build_ipv4_packet(1, bytes([192, 168, 1, 2]),
                            bytes([192, 168, 2, 2]), echo.to_bytes(),
                            ttl=64)
    if_node.send_packet(pkt, dest_mac=1, frame_type=FRAME_TYPE_DATA)

    reply = None
    for _ in range(int(30 * bus.sample_rate / bus.chunk)):
        bus.step()
        r = if_node.recv_packet()
        if r is not None:
            reply = r
            break
    assert host.pings_seen == 1, "request never reached the wifi host"
    assert reply is not None, "echo reply never returned over sound"
    packet, _ftype, src_mac = reply
    hdr = Ipv4Header.from_bytes(packet)
    assert bytes(hdr.source_ip) == bytes([192, 168, 2, 2])
    assert bytes(hdr.dest_ip) == bytes([192, 168, 1, 2])
    icmp = IcmpPacket.from_bytes(packet[hdr.ihl_bytes:])
    assert icmp.icmp_type == 0
    assert icmp.payload == b"crossing segments"
    # TTL was decremented by the forwarding path
    assert hdr.ttl < 64
