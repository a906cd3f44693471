"""Conntrack NAT (RouterConfig(conntrack=True)): collision-safe
5-tuple sessions with port rewriting and idle expiry — the production
upgrade over the reference's port-keyed 1:1 maps, which the default
router keeps for parity."""

import ipaddress

from trackmaker_tpu.net.conntrack import ConntrackTable
from trackmaker_tpu.net.ethernet import ETHERTYPE_IPV4, EthernetFrame
from trackmaker_tpu.net.icmp import IcmpPacket
from trackmaker_tpu.net.ip import build_ipv4_packet, ones_complement_sum
from trackmaker_tpu.net.ports import LoopbackPort
from trackmaker_tpu.net.router import InterfaceType, Router, RouterConfig

ICMP, TCP, UDP = 1, 6, 17
RATE = 48_000


def make_router(**cfg):
    r = Router(RouterConfig(conntrack=True, **cfg))
    ports = {}
    for itype in (InterfaceType.ACOUSTIC, InterfaceType.WIFI,
                  InterfaceType.ETHERNET, InterfaceType.TUN):
        mine, theirs = LoopbackPort.pair()
        r.register_port(itype, mine)
        ports[itype] = theirs
    r.arp_table.update(ipaddress.IPv4Address("192.168.2.254").packed,
                       b"\xaa" * 6, InterfaceType.ETHERNET)
    return r, ports


def _udp(sport, dport, payload=b"x" * 8):
    seg = bytearray(sport.to_bytes(2, "big") + dport.to_bytes(2, "big")
                    + (8 + len(payload)).to_bytes(2, "big") + b"\x00\x00"
                    + payload)
    return bytes(seg)


def _from_eth(r, ports, pkt):
    ports[InterfaceType.ETHERNET].send(EthernetFrame(
        r.cfg.eth_mac, b"\xaa" * 6, ETHERTYPE_IPV4, pkt).to_bytes())


def test_table_port_collision_and_expiry():
    ct = ConntrackTable(sample_rate=RATE, udp_timeout_s=1.0)
    a, b = bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2])
    remote = bytes([8, 8, 8, 8])
    p1 = ct.snat(UDP, a, 5000, remote, 53, now=0)
    p2 = ct.snat(UDP, b, 5000, remote, 53, now=0)
    assert p1 == 5000 and p2 != 5000          # collision got a new port
    assert ct.dnat(UDP, p1, remote, 53, now=0) == (a, 5000)
    assert ct.dnat(UDP, p2, remote, 53, now=0) == (b, 5000)
    # stable on re-send
    assert ct.snat(UDP, a, 5000, remote, 53, now=100) == p1
    # idle expiry after 1s of silence
    ct.expire(now=3 * RATE)
    assert ct.dnat(UDP, p1, remote, 53, now=3 * RATE) is None
    assert len(ct) == 0


def test_tcp_fin_collapses_timeout():
    ct = ConntrackTable(sample_rate=RATE, tcp_timeout_s=300.0,
                        tcp_closing_timeout_s=1.0)
    a = bytes([10, 0, 0, 1])
    remote = bytes([1, 1, 1, 1])
    p = ct.snat(TCP, a, 4000, remote, 80, now=0)
    ct.expire(now=100 * RATE)                  # inside the long timeout
    assert ct.dnat(TCP, p, remote, 80, now=100 * RATE) is not None
    ct.note_tcp_flags(TCP, p, remote, 80, flags=0x11)   # FIN|ACK
    ct.expire(now=103 * RATE)                  # > closing timeout idle
    assert ct.dnat(TCP, p, remote, 80, now=103 * RATE) is None


def test_router_udp_collision_demultiplexes_correctly():
    """Two inside hosts use the SAME source port to the same remote —
    the reference's map would cross-deliver the replies; conntrack
    rewrites the second session's port and demultiplexes both."""
    r, ports = make_router()
    for src in ([192, 168, 1, 2], [192, 168, 1, 3]):
        pkt = build_ipv4_packet(UDP, bytes(src), bytes([8, 8, 8, 8]),
                                _udp(7777, 9999))
        ports[InterfaceType.ACOUSTIC].send(pkt)
        r.poll()
    out1 = EthernetFrame.from_bytes(
        ports[InterfaceType.ETHERNET].recv()).payload
    out2 = EthernetFrame.from_bytes(
        ports[InterfaceType.ETHERNET].recv()).payload
    sp1 = int.from_bytes(out1[20:22], "big")
    sp2 = int.from_bytes(out2[20:22], "big")
    assert sp1 == 7777 and sp2 != 7777 and sp1 != sp2
    assert out1[12:16] == out2[12:16] == bytes([10, 20, 0, 1])
    assert ones_complement_sum(out1[:20]) == 0xFFFF

    # replies to the two external ports route back to the right hosts
    for ext, inside in ((sp1, bytes([192, 168, 1, 2])),
                        (sp2, bytes([192, 168, 1, 3]))):
        reply = build_ipv4_packet(UDP, bytes([8, 8, 8, 8]),
                                  bytes([10, 20, 0, 1]),
                                  _udp(9999, ext))
        _from_eth(r, ports, reply)
        r.poll()
        got = ports[InterfaceType.ACOUSTIC].recv()
        assert got is not None
        assert got[16:20] == inside
        # the inside destination port is restored to the original
        assert int.from_bytes(got[22:24], "big") == 7777


def test_router_icmp_ident_collision():
    r, ports = make_router()
    for src in ([192, 168, 1, 2], [192, 168, 1, 3]):
        echo = IcmpPacket.echo_request(0x42, 1, b"ping!")
        pkt = build_ipv4_packet(ICMP, bytes(src), bytes([8, 8, 8, 8]),
                                echo.to_bytes())
        ports[InterfaceType.ACOUSTIC].send(pkt)
        r.poll()
    out1 = EthernetFrame.from_bytes(
        ports[InterfaceType.ETHERNET].recv()).payload
    out2 = EthernetFrame.from_bytes(
        ports[InterfaceType.ETHERNET].recv()).payload
    id1 = int.from_bytes(out1[24:26], "big")
    id2 = int.from_bytes(out2[24:26], "big")
    assert id1 == 0x42 and id2 != 0x42
    # reply to the REWRITTEN ident reaches the second host with the
    # original ident restored
    reply = IcmpPacket.echo_reply(id2, 1, b"ping!")
    rpkt = build_ipv4_packet(ICMP, bytes([8, 8, 8, 8]),
                             bytes([10, 20, 0, 1]), reply.to_bytes())
    _from_eth(r, ports, rpkt)
    r.poll()
    got = ports[InterfaceType.ACOUSTIC].recv()
    assert got is not None
    assert got[16:20] == bytes([192, 168, 1, 3])
    assert int.from_bytes(got[24:26], "big") == 0x42


def test_router_session_expiry_drops_stale_reply():
    r, ports = make_router()
    r.ct._timeouts[UDP] = 1 * RATE             # 1s idle timeout
    pkt = build_ipv4_packet(UDP, bytes([192, 168, 1, 2]),
                            bytes([8, 8, 8, 8]), _udp(6000, 53))
    ports[InterfaceType.ACOUSTIC].send(pkt)
    r.on_tick(0)
    assert ports[InterfaceType.ETHERNET].recv() is not None
    r.on_tick(5 * RATE)                        # idle past the timeout
    reply = build_ipv4_packet(UDP, bytes([8, 8, 8, 8]),
                              bytes([10, 20, 0, 1]), _udp(53, 6000))
    _from_eth(r, ports, reply)
    dropped0 = r.dropped
    r.poll()
    assert ports[InterfaceType.ACOUSTIC].recv() is None
    assert r.dropped == dropped0 + 1


def test_default_router_keeps_reference_nat():
    """conntrack=False (default) keeps the quirk-for-quirk maps."""
    r = Router(RouterConfig())
    assert r.ct is None
