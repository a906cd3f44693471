"""NET layer tests (mirror reference src/net/{ip,icmp,fragmentation}.rs)."""

import pytest

from trackmaker_tpu.net import (
    FragmentationInfo, IcmpPacket, IpFragmenter, IpReassembler, Ipv4Header,
    ArpTable, NatTable, PROTO_UDP)
from trackmaker_tpu.net.ip import build_ipv4_packet, recompute_header_checksum


def test_ipv4_header_roundtrip():
    h = Ipv4Header.new(20, 12345, 64, 17, bytes([192, 168, 1, 1]),
                       bytes([192, 168, 1, 2]))
    raw = h.to_bytes()
    assert len(raw) == 20
    g = Ipv4Header.from_bytes(raw)
    assert g == h
    assert g.checksum == h.calculate_checksum()


def test_ipv4_checksum_validates():
    h = Ipv4Header.new(40, 7, 64, 1, bytes([10, 0, 0, 1]), bytes([10, 0, 0, 2]))
    # ones-complement sum over a header with a correct checksum is 0xFFFF
    from trackmaker_tpu.net.ip import ones_complement_sum
    assert ones_complement_sum(h.to_bytes()) == 0xFFFF


def test_icmp_roundtrip_and_odd_length_padding():
    p = IcmpPacket.new(8, 0, 123, 456, bytes([1, 2, 3, 4]))
    raw = p.to_bytes()
    g = IcmpPacket.from_bytes(raw)
    assert g == p
    assert g.verify_checksum()
    # odd payload length exercises the zero-pad rule (icmp.rs:107-113)
    q = IcmpPacket.new(0, 0, 1, 2, b"\xff")
    assert IcmpPacket.from_bytes(q.to_bytes()).verify_checksum()


def test_fragmentation_info_encode_decode():
    info = FragmentationInfo(12345, True, 100)
    enc = info.to_u16()
    assert enc & 0x2000 == 0x2000
    assert enc & 0x1FFF == 100
    dec = FragmentationInfo.from_u16(enc)
    assert dec.more_fragments and dec.fragment_offset == 100


def test_no_fragmentation_needed():
    f = IpFragmenter(500)
    pkt = bytes(100)
    assert f.fragment_packet(pkt) == [pkt]


def test_fragmentation_sizes_respect_mtu():
    f = IpFragmenter(100)
    pkt = bytes([0x45] * 20) + bytes(300)
    frags = f.fragment_packet(pkt)
    assert len(frags) > 1
    assert all(len(fr) <= 100 for fr in frags)


def test_fragment_reassemble_roundtrip():
    f = IpFragmenter(60)
    r = IpReassembler()
    payload = bytes(range(100))
    pkt = build_ipv4_packet(PROTO_UDP, bytes([192, 168, 1, 1]),
                            bytes([192, 168, 1, 2]), payload)
    frags = f.fragment_packet(pkt)
    assert len(frags) > 1
    result = None
    for fr in frags:
        result = r.process_fragment(fr)
    assert result is not None
    assert result[20:] == payload


def test_fragment_reassemble_out_of_order_and_gap():
    f = IpFragmenter(60)
    r = IpReassembler()
    pkt = build_ipv4_packet(PROTO_UDP, bytes([10, 0, 0, 1]),
                            bytes([10, 0, 0, 2]), bytes(200))
    frags = f.fragment_packet(pkt)
    assert len(frags) >= 4
    # deliver out of order, withholding frags[1] -> never reassembles
    for fr in [frags[2], frags[-1], frags[0]] + frags[3:-1]:
        assert r.process_fragment(fr) is None
    # the withheld fragment completes it
    result = r.process_fragment(frags[1])
    assert result is not None
    assert result[20:] == bytes(200)


def test_recompute_header_checksum():
    pkt = bytearray(build_ipv4_packet(1, bytes([1, 2, 3, 4]),
                                      bytes([5, 6, 7, 8]), b"xyz"))
    pkt[8] = 63  # decrement TTL -> stale checksum
    fixed = recompute_header_checksum(bytes(pkt))
    from trackmaker_tpu.net.ip import ones_complement_sum
    assert ones_complement_sum(fixed[:20]) == 0xFFFF


def test_arp_table_defaults():
    t = ArpTable()
    assert t.get_mac("192.168.1.2") == 2
    assert str(t.get_ip(3)) == "192.168.1.3"
    assert t.get_mac("10.0.0.1") is None


def test_nat_table():
    n = NatTable()
    n.register_echo_request(42, "192.168.1.2")
    assert str(n.translate_echo_reply(42)) == "192.168.1.2"
    assert n.translate_echo_reply(43) is None
    n.register_dnat_session(7)
    assert n.is_dnat_session(7) and not n.is_dnat_session(8)
