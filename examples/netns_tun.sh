#!/bin/sh
# Network-namespace wrapper for the acoustic TUN bridge — the
# counterpart of the reference's elinks.sh: isolate the TUN device in
# its own namespace so unmodified applications (elinks, curl, ping)
# run over the sound link without touching the host's routing.
#
# Run the bridge first (root namespace):
#   python -m trackmaker_tpu.cli tun --name tun1 --ip 192.168.1.2
# then this script, then e.g.:
#   sudo ip netns exec ns_tun ping 192.168.1.3
#   sudo ip netns exec ns_tun elinks http://192.168.1.1
#
# tests/test_tun_netns.py runs this flow end-to-end in CI (automated
# raw-socket ping instead of elinks).

set -e

sudo ip netns add ns_tun

sudo ip link set tun1 netns ns_tun

sudo ip netns exec ns_tun ip addr add 192.168.1.2/24 dev tun1
sudo ip netns exec ns_tun ip link set tun1 up
sudo ip netns exec ns_tun ip link set lo up
sudo ip netns exec ns_tun ip route add default via 192.168.1.1 dev tun1

sudo ip netns exec ns_tun sh -c 'echo "nameserver 192.168.1.1" > /etc/resolv.conf'

echo 'Use: sudo ip netns exec ns_tun elinks http://example.com'
