"""Router tests (reference src/net/router.rs behaviors)."""

import ipaddress

import pytest

from trackmaker_tpu.net import dns as dns_mod
from trackmaker_tpu.net.ethernet import (
    ARP_REPLY, ETHERTYPE_ARP, ETHERTYPE_IPV4, ArpPacket, EthernetFrame)
from trackmaker_tpu.net.icmp import IcmpPacket
from trackmaker_tpu.net.ip import build_ipv4_packet, ones_complement_sum
from trackmaker_tpu.net.ports import LoopbackPort
from trackmaker_tpu.net.router import (
    InterfaceType, Router, RouterConfig, RoutingTable, decrement_ttl)

ICMP = 1
UDP = 17


def make_router():
    r = Router(RouterConfig())
    ports = {}
    for itype in (InterfaceType.ACOUSTIC, InterfaceType.WIFI,
                  InterfaceType.ETHERNET, InterfaceType.TUN):
        mine, theirs = LoopbackPort.pair()
        r.register_port(itype, mine)
        ports[itype] = theirs
    return r, ports


def test_routing_table_prefix_and_default():
    rt = RoutingTable()
    rt.add_direct_network("192.168.1.0", "255.255.255.0",
                          InterfaceType.ACOUSTIC)
    rt.add_network("0.0.0.0", "0.0.0.0", InterfaceType.ETHERNET,
                   "192.168.2.254")
    nh, iface = rt.lookup(ipaddress.IPv4Address("192.168.1.7").packed)
    assert iface == InterfaceType.ACOUSTIC and nh is None
    nh, iface = rt.lookup(ipaddress.IPv4Address("8.8.8.8").packed)
    assert iface == InterfaceType.ETHERNET
    assert nh == ipaddress.IPv4Address("192.168.2.254").packed


def test_ttl_decrement_and_checksum():
    pkt = bytearray(build_ipv4_packet(UDP, bytes([10, 0, 0, 1]),
                                      bytes([10, 0, 0, 2]), b"x" * 8,
                                      ttl=5))
    assert decrement_ttl(pkt)
    assert pkt[8] == 4
    assert ones_complement_sum(bytes(pkt[:20])) == 0xFFFF
    pkt[8] = 1
    assert not decrement_ttl(pkt)


def test_forward_acoustic_to_wifi_with_ttl():
    """Packet from the acoustic subnet to the wifi subnet is routed,
    TTL-decremented, and ARP-resolved (pending + request + reply)."""
    r, ports = make_router()
    pkt = build_ipv4_packet(
        ICMP, bytes([192, 168, 1, 2]), bytes([192, 168, 2, 2]),
        IcmpPacket.echo_request(7, 0, b"hi").to_bytes(), ttl=64)
    ports[InterfaceType.ACOUSTIC].send(pkt)
    r.poll()
    # no ARP entry for 192.168.2.2 yet -> broadcast request went out
    raw = ports[InterfaceType.WIFI].recv()
    frame = EthernetFrame.from_bytes(raw)
    assert frame.ethertype == ETHERTYPE_ARP
    arp = ArpPacket.from_bytes(frame.payload)
    assert bytes(arp.target_ip) == bytes([192, 168, 2, 2])
    # reply; pending packet must flush
    node3_mac = bytes([0, 0, 0, 0, 0, 3])
    reply = ArpPacket.reply(node3_mac, bytes([192, 168, 2, 2]),
                            frame.src_mac, bytes([192, 168, 2, 1]))
    ports[InterfaceType.WIFI].send(reply.to_ethernet())
    r.poll()
    raw = ports[InterfaceType.WIFI].recv()
    out = EthernetFrame.from_bytes(raw)
    assert out.ethertype == ETHERTYPE_IPV4
    assert out.dst_mac == node3_mac
    assert out.payload[8] == 63  # TTL decremented
    assert ones_complement_sum(out.payload[:20]) == 0xFFFF


def test_snat_masquerade_and_inbound_dnat_icmp():
    """Acoustic node pings an internet host: source is rewritten to the
    router's eth IP on egress; the reply is DNAT'd back."""
    r, ports = make_router()
    r.arp_table.update(ipaddress.IPv4Address("192.168.2.254").packed,
                       b"\xaa" * 6, InterfaceType.ETHERNET)
    echo = IcmpPacket.echo_request(0x42, 1, b"ping!")
    pkt = build_ipv4_packet(ICMP, bytes([192, 168, 1, 2]),
                            bytes([8, 8, 8, 8]), echo.to_bytes())
    ports[InterfaceType.ACOUSTIC].send(pkt)
    r.poll()
    raw = ports[InterfaceType.ETHERNET].recv()
    out = EthernetFrame.from_bytes(raw)
    assert out.payload[12:16] == bytes([10, 20, 0, 1])  # SNAT to eth ip
    assert ones_complement_sum(out.payload[:20]) == 0xFFFF
    icmp_out = IcmpPacket.from_bytes(out.payload[20:])
    assert icmp_out.verify_checksum()

    # reply comes back addressed to the router's eth ip
    reply = IcmpPacket.echo_reply(0x42, 1, b"ping!")
    rpkt = build_ipv4_packet(ICMP, bytes([8, 8, 8, 8]),
                             bytes([10, 20, 0, 1]), reply.to_bytes())
    ports[InterfaceType.ETHERNET].send(EthernetFrame(
        r.cfg.eth_mac, b"\xaa" * 6, ETHERTYPE_IPV4, rpkt).to_bytes())
    r.poll()
    # DNAT back to 192.168.1.2 -> acoustic egress, fragmented API
    frag = ports[InterfaceType.ACOUSTIC].recv()
    assert frag is not None
    assert frag[16:20] == bytes([192, 168, 1, 2])


def test_acoustic_egress_fragments_at_mtu():
    r, ports = make_router()
    big = build_ipv4_packet(UDP, bytes([192, 168, 2, 2]),
                            bytes([192, 168, 1, 2]), bytes(400))
    ports[InterfaceType.WIFI].send(EthernetFrame(
        r.cfg.wifi_mac, b"\x02" * 6, ETHERTYPE_IPV4, big).to_bytes())
    r.poll()
    frags = []
    while (f := ports[InterfaceType.ACOUSTIC].recv()) is not None:
        frags.append(f)
    assert len(frags) >= 3
    assert all(len(f) <= 140 for f in frags)
    from trackmaker_tpu.net.fragmentation import IpReassembler
    ra = IpReassembler()
    out = None
    for f in frags:
        out = ra.process_fragment(f) or out
    assert out is not None and out[20:] == bytes(400)


def test_router_answers_ping_to_itself():
    r, ports = make_router()
    echo = IcmpPacket.echo_request(9, 3, b"router?")
    pkt = build_ipv4_packet(ICMP, bytes([192, 168, 1, 2]),
                            bytes([192, 168, 1, 1]), echo.to_bytes())
    ports[InterfaceType.ACOUSTIC].send(pkt)
    r.poll()
    reply = ports[InterfaceType.ACOUSTIC].recv()
    assert reply is not None
    icmp = IcmpPacket.from_bytes(reply[20:])
    assert icmp.icmp_type == 0 and icmp.payload == b"router?"
    assert icmp.verify_checksum()


def test_dns_service_on_udp53():
    r, ports = make_router()
    r.dns_table.add_entry("aether.local", "192.168.2.2")
    query = dns_mod.build_query(0x1234, "aether.local")
    udp = ((40000).to_bytes(2, "big") + (53).to_bytes(2, "big")
           + (8 + len(query)).to_bytes(2, "big") + b"\x00\x00" + query)
    pkt = build_ipv4_packet(UDP, bytes([192, 168, 1, 2]),
                            bytes([192, 168, 1, 1]), udp)
    ports[InterfaceType.ACOUSTIC].send(pkt)
    r.poll()
    out = ports[InterfaceType.ACOUSTIC].recv()
    assert out is not None
    resp = out[28:]
    assert dns_mod.parse_response_ip(resp) == bytes([192, 168, 2, 2])


def test_icmp_traversal_dnat_magic():
    """Echo request with 0xAA payload magic is redirected to node3 and
    the reply finds its way back to the originator
    (router.rs:1706-1779)."""
    r, ports = make_router()
    node3_mac = bytes([0, 0, 0, 0, 0, 3])
    r.arp_table.update(ipaddress.IPv4Address("192.168.2.2").packed,
                       node3_mac, InterfaceType.WIFI)
    echo = IcmpPacket.echo_request(0x77, 0, bytes([0xAA]) + b"trav")
    pkt = build_ipv4_packet(ICMP, bytes([192, 168, 1, 2]),
                            bytes([192, 168, 1, 1]), echo.to_bytes())
    ports[InterfaceType.ACOUSTIC].send(pkt)
    r.poll()
    raw = ports[InterfaceType.WIFI].recv()
    out = EthernetFrame.from_bytes(raw)
    assert out.payload[16:20] == bytes([192, 168, 2, 2])  # DNAT to node3
    # node3 replies to the router's wifi ip
    reply = IcmpPacket.echo_reply(0x77, 0, bytes([0xAA]) + b"trav")
    rpkt = build_ipv4_packet(ICMP, bytes([192, 168, 2, 2]),
                             out.payload[12:16], reply.to_bytes())
    ports[InterfaceType.WIFI].send(EthernetFrame(
        r.cfg.wifi_mac, node3_mac, ETHERTYPE_IPV4, rpkt).to_bytes())
    r.poll()
    back = ports[InterfaceType.ACOUSTIC].recv()
    assert back is not None
    assert back[16:20] == bytes([192, 168, 1, 2])  # back to originator


def test_ttl_expiry_drops():
    r, ports = make_router()
    pkt = build_ipv4_packet(UDP, bytes([192, 168, 1, 2]),
                            bytes([192, 168, 2, 2]), b"x" * 8, ttl=1)
    ports[InterfaceType.ACOUSTIC].send(pkt)
    dropped_before = r.dropped
    r.poll()
    assert r.dropped == dropped_before + 1
    assert ports[InterfaceType.WIFI].recv() is None
