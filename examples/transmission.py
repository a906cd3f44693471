"""Standalone CSMA file transfer over the simulated shared channel
(reference examples/transmission.rs: the pre-refactor tx/rx pair that
tools/test.py drives)."""

import sys

sys.path.insert(0, ".")

from trackmaker_tpu.bench.sweep import contended_transfer  # noqa: E402
from trackmaker_tpu.link.transfer import transfer_over_bus  # noqa: E402


def main():
    data = open("assets/think-different.txt", "rb").read()

    print("== single transfer ==")
    rx, stats = transfer_over_bus(data)
    print(f"exact={rx == data} airtime={stats['airtime_s']:.2f}s "
          f"throughput={stats['throughput_bps']:.0f} bps "
          f"retx={stats['retransmissions']}")

    print("== 2x2 contended (the tools/test.py scenario) ==")
    stats = contended_transfer(data, data[::-1])
    print(f"exact={stats['exact']} airtime={stats['airtime_s']:.2f}s "
          f"aggregate={stats['aggregate_throughput_bps']:.0f} bps "
          f"retx={stats['retransmissions']}")


if __name__ == "__main__":
    main()
