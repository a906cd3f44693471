"""Router port implementations.

The reference binds its router to libpcap captures, the acoustic
interface, and a kernel TUN device through dedicated threads
(src/net/router.rs:1008-1323).  Here ports are synchronous duck-typed
objects (``send``/``recv``); in-memory pairs serve tests and the
simulated bus, and real TUN / AF_PACKET ports plug in for kernel
integration.
"""

from __future__ import annotations

from collections import deque

from trackmaker_tpu.core.config import FRAME_TYPE_DATA


class LoopbackPort:
    """One end of an in-memory duplex pipe (ethernet-frame or raw-IP)."""

    def __init__(self):
        self._rx: deque[bytes] = deque()
        self.peer: "LoopbackPort | None" = None

    @classmethod
    def pair(cls) -> tuple["LoopbackPort", "LoopbackPort"]:
        a, b = cls(), cls()
        a.peer, b.peer = b, a
        return a, b

    def send(self, data: bytes, **_kw) -> None:
        assert self.peer is not None
        self.peer._rx.append(bytes(data))

    def recv(self) -> bytes | None:
        return self._rx.popleft() if self._rx else None


class AcousticRouterPort:
    """Adapts :class:`trackmaker_tpu.link.interface.AcousticInterface`
    (1-byte MACs, built-in CSMA) to the router port protocol."""

    def __init__(self, iface):
        self.iface = iface

    def send(self, packet: bytes, dst_mac: int = 0, **_kw) -> None:
        self.iface.send_packet(packet, dst_mac, FRAME_TYPE_DATA)

    def recv(self):
        r = self.iface.recv_packet()
        return None if r is None else r[0]


class TunPort:
    """Kernel TUN device (reference src/net/tun.rs).  Requires
    CAP_NET_ADMIN and /dev/net/tun; raises OSError otherwise."""

    IFF_TUN = 0x0001
    IFF_NO_PI = 0x1000
    TUNSETIFF = 0x400454CA

    def __init__(self, name: str = "tm0", ip: str | None = None,
                 netmask_bits: int = 24, mtu: int | None = None):
        import fcntl
        import os
        import struct
        import subprocess

        self.fd = os.open("/dev/net/tun", os.O_RDWR | os.O_NONBLOCK)
        ifr = struct.pack("16sH22x", name.encode(),
                          self.IFF_TUN | self.IFF_NO_PI)
        fcntl.ioctl(self.fd, self.TUNSETIFF, ifr)
        self.name = name
        if ip is not None:
            subprocess.run(["ip", "addr", "add", f"{ip}/{netmask_bits}",
                            "dev", name], check=True)
        if mtu is not None:
            subprocess.run(["ip", "link", "set", name, "mtu", str(mtu)],
                           check=True)
        subprocess.run(["ip", "link", "set", name, "up"], check=True)

    def send(self, packet: bytes, **_kw) -> None:
        import os
        os.write(self.fd, packet)

    def recv(self) -> bytes | None:
        import os
        try:
            return os.read(self.fd, 65535)
        except BlockingIOError:
            return None

    def close(self) -> None:
        import os
        try:
            os.close(self.fd)
        except OSError:
            pass


class RawEthernetPort:
    """AF_PACKET raw socket (the libpcap-wrapper equivalent,
    reference src/net/pcap_utils.rs).  Requires CAP_NET_RAW."""

    def __init__(self, interface: str):
        import socket
        self.sock = socket.socket(socket.AF_PACKET, socket.SOCK_RAW,
                                  socket.htons(0x0003))
        self.sock.bind((interface, 0))
        self.sock.setblocking(False)
        self.interface = interface

    def send(self, frame: bytes, **_kw) -> None:
        self.sock.send(frame)

    def recv(self) -> bytes | None:
        try:
            return self.sock.recv(65535)
        except BlockingIOError:
            return None

    def close(self) -> None:
        self.sock.close()
