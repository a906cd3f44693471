"""IP-over-sound ping round trip (BASELINE config 5)."""

from trackmaker_tpu.net.tools import run_ping_simulation


def test_ping_round_trip_clean():
    stats = run_ping_simulation(count=3, max_duration_s=30.0)
    assert stats["sent"] == 3
    assert stats["received"] == 3
    assert stats["loss_pct"] == 0.0
    assert stats["responded"] == 3
    assert 0 < stats["rtt_avg_ms"] < 2000


def test_ping_large_payload_fragments():
    """300-byte payload exceeds the 200-byte MTU -> fragmentation path."""
    stats = run_ping_simulation(count=2, payload_size=300,
                                max_duration_s=60.0)
    assert stats["received"] == 2
    assert stats["loss_pct"] == 0.0


def test_ping_over_ofdm_phy():
    """The IP stack is modem-agnostic: the same ICMP round trip runs
    with OFDM stream PHYs under the acoustic interfaces."""
    from trackmaker_tpu.phy.ofdm_v2 import OfdmStreamPhyV2
    stats = run_ping_simulation(
        count=2, noise_std=0.003, max_duration_s=60.0,
        phy_factory=lambda a: OfdmStreamPhyV2(local_addr=a))
    assert stats["received"] == 2
    assert stats["loss_pct"] == 0.0
