"""In-kernel BPF protocol filter on the raw Ethernet port.

The reference's WiFi capture thread opens pcap with the compiled filter
"icmp or arp or tcp or udp" (src/net/router.rs:1140-1183,
src/net/pcap_utils.rs:32-42) so non-matching frames never reach the
router loop.  RawEthernetPort attaches the same filter as a classic-BPF
program via SO_ATTACH_FILTER — this test proves the kernel (not host
code) does the dropping, over a real veth pair.

Requires CAP_NET_RAW/CAP_NET_ADMIN (root CI container); skipped
otherwise."""

import struct
import subprocess
import time

import pytest

from trackmaker_tpu.net.ports import RawEthernetPort, bpf_protocol_filter


def _root() -> bool:
    import os
    if os.geteuid() != 0:
        return False
    try:
        subprocess.run(["ip", "link", "add", "tm_bpf_p0", "type",
                        "veth", "peer", "name", "tm_bpf_p1"],
                       capture_output=True, check=True)
        subprocess.run(["ip", "link", "del", "tm_bpf_p0"],
                       capture_output=True, check=True)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _root(),
                                reason="needs root + ip link")

V0, V1 = "tmbpf0", "tmbpf1"


def _eth(ethertype: int, payload: bytes) -> bytes:
    return (b"\xff" * 6 + b"\x02\x00\x00\x00\x00\x01"
            + struct.pack("!H", ethertype) + payload)


def _ipv4(proto: int, marker: bytes) -> bytes:
    total = 20 + len(marker)
    hdr = struct.pack("!BBHHHBBH4s4s", 0x45, 0, total, 1, 0, 64,
                      proto, 0, b"\x0a\x00\x00\x01", b"\x0a\x00\x00\x02")
    return _eth(0x0800, hdr + marker)


@pytest.fixture
def veth():
    subprocess.run(["ip", "link", "del", V0], capture_output=True)
    subprocess.run(["ip", "link", "add", V0, "type", "veth", "peer",
                    "name", V1], check=True)
    for dev in (V0, V1):
        subprocess.run(["ip", "link", "set", dev, "up"], check=True)
    time.sleep(0.2)
    yield
    subprocess.run(["ip", "link", "del", V0], capture_output=True)


def _collect(port, deadline_s=1.5):
    got = []
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        f = port.recv()
        if f is None:
            time.sleep(0.02)
            continue
        got.append(f)
    return got


def _send_corpus(tx):
    frames = {
        "udp": _ipv4(17, b"TMUDP"),
        "icmp": _ipv4(1, b"TMICMP"),
        "tcp": _ipv4(6, b"TMTCP"),
        "arp": _eth(0x0806, b"\x00\x01\x08\x00\x06\x04\x00\x01TMARP"),
        "ospf": _ipv4(89, b"TMOSPF"),          # filtered out
        "ipv6": _eth(0x86DD, b"TMSIX"),        # filtered out
    }
    for f in frames.values():
        tx.send(f)
    return frames


def test_kernel_filter_drops_other_protocols(veth):
    import socket
    rx = RawEthernetPort(V0)                    # default reference filter
    tx = socket.socket(socket.AF_PACKET, socket.SOCK_RAW)
    tx.bind((V1, 0))
    try:
        frames = _send_corpus(tx)
        got = _collect(rx)
        def seen(marker):
            return any(marker in f for f in got)
        assert seen(b"TMUDP") and seen(b"TMICMP") and seen(b"TMTCP")
        assert seen(b"TMARP")
        # the kernel dropped these before userspace ever saw them
        assert not seen(b"TMOSPF")
        assert not seen(b"TMSIX")
    finally:
        rx.close()
        tx.close()


def test_unfiltered_port_sees_everything(veth):
    import socket
    rx = RawEthernetPort(V0, kernel_filter=None)
    tx = socket.socket(socket.AF_PACKET, socket.SOCK_RAW)
    tx.bind((V1, 0))
    try:
        _send_corpus(tx)
        got = _collect(rx)
        assert any(b"TMOSPF" in f for f in got)
        assert any(b"TMSIX" in f for f in got)
        assert any(b"TMUDP" in f for f in got)
    finally:
        rx.close()
        tx.close()


def test_filter_subsets():
    """Program assembly: jump offsets for every subset stay in range
    and the packed size is 8 bytes per instruction."""
    for protos in (("arp",), ("udp",), ("icmp", "tcp"),
                   ("icmp", "arp", "tcp", "udp")):
        prog = bpf_protocol_filter(protos)
        assert len(prog) % 8 == 0
        n = len(prog) // 8
        for pc in range(n):
            code, jt, jf, _k = struct.unpack_from("HBBI", prog, pc * 8)
            if code == 0x15:                   # jeq
                assert pc + 1 + jt < n and pc + 1 + jf < n
    with pytest.raises(AssertionError):
        bpf_protocol_filter(("dns",))
