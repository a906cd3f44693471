"""Adaptive coded acoustic link, end to end: probe the channel, choose
a per-bin loading, negotiate it over the robust handshake mode, then
carry MAC traffic on the loaded coded PHY — the full ADSL-style
workflow (phy/ofdm_adaptive.py), with the Viterbi-coded Manchester
mode (phy/coded.py) shown as the narrowband alternative.

Run: python examples/adaptive_link.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from trackmaker_tpu.core.framing import Frame  # noqa: E402
from trackmaker_tpu.phy.ofdm import find_preambles  # noqa: E402
from trackmaker_tpu.phy.ofdm_adaptive import (  # noqa: E402
    OfdmAdaptiveConfig,
    OfdmAdaptiveStreamPhy,
    choose_loading,
    estimate_bin_snr,
    pack_loading,
    probe_waveform,
    unpack_loading,
)


def shaped_channel(wave, rng, sigma=0.005, cut_hz=6500.0):
    """A 'cheap speakers' channel: strong roll-off above `cut_hz`."""
    n = len(wave)
    spec = np.fft.rfft(wave)
    f = np.fft.rfftfreq(n, 1.0 / 48_000)
    gain = np.where(f > cut_hz, 0.05, 1.0)
    out = np.fft.irfft(spec * gain, n=n).astype(np.float32)
    return out + rng.normal(0, sigma, n).astype(np.float32)


def main():
    rng = np.random.default_rng(7)
    cfg = OfdmAdaptiveConfig()

    # 1. probe
    probe = probe_waveform(cfg)
    rx = shaped_channel(np.concatenate(
        [probe, np.zeros(800, np.float32)]), rng)
    s = int(np.asarray(find_preambles(cfg, jnp.asarray(rx), 1))[0])
    snr = np.asarray(estimate_bin_snr(cfg, jnp.asarray(rx), s))
    loading = choose_loading(snr)
    kinds = {0: "off", 1: "BPSK", 2: "QPSK", 4: "16QAM"}
    hist = {k: sum(1 for v in loading if v == b)
            for b, k in kinds.items()}
    print(f"probe -> loading: {hist}  "
          f"({sum(loading)} coded bits/symbol)")

    # 2. handshake over the a-priori robust mode
    hs_tx = OfdmAdaptiveStreamPhy.handshake_mode(cfg, local_addr=1)
    hs_rx = OfdmAdaptiveStreamPhy.handshake_mode(cfg, local_addr=1)
    frame = Frame.new_data(0, 2, 1, pack_loading(loading))
    got = hs_rx.process_samples(shaped_channel(np.concatenate(
        [hs_tx.encode_frames([frame]), np.zeros(3000, np.float32)]),
        rng))
    negotiated = unpack_loading(got[0].data, len(cfg.data_bin_idx))
    print(f"handshake ok: negotiated == chosen: "
          f"{negotiated == loading}")

    # 3. data on the loaded coded PHY
    tx = OfdmAdaptiveStreamPhy(cfg, loading=negotiated, local_addr=2)
    rx_phy = OfdmAdaptiveStreamPhy(cfg, loading=negotiated, local_addr=2)
    msg = b"adaptive coded acoustic link delivering over a hostile channel"
    frames = [Frame.new_data(i, 1, 2, msg[i * 20:(i + 1) * 20])
              for i in range(3)]
    wave = tx.encode_frames(frames, gap_samples=400)
    got = rx_phy.process_samples(shaped_channel(np.concatenate(
        [wave, np.zeros(3000, np.float32)]), rng))
    data = b"".join(f.data for f in got)
    print(f"delivered {len(got)}/3 frames, payload exact: "
          f"{data == msg[:60]}")
    rate = tx.net_bits_per_symbol / (cfg.sym_len / 48_000)
    print(f"net PHY rate on this channel: {rate:.0f} bps")

    # 4. live retrain: the channel worsens mid-session; the pre-FEC BER
    # monitor fires, and the link renegotiates a derated loading
    # without tearing down (phy/ofdm_adaptive.py retrain protocol)
    from trackmaker_tpu.phy.ofdm_adaptive import (
        choose_gains, make_loading_frame, parse_control)

    def worse_channel(wave):
        # the roll-off knee drops into the middle of the loaded band
        return shaped_channel(wave, rng, sigma=0.01, cut_hz=4200.0)

    rx_phy.process_samples(worse_channel(np.concatenate(
        [tx.encode_frames(frames, gap_samples=400),
         np.zeros(3000, np.float32)])))
    print(f"channel worsened: pre-FEC BER {rx_phy.prefec_ber(3):.1%}, "
          f"degraded={rx_phy.link_degraded(window=3)}")
    rx2 = worse_channel(np.concatenate(
        [probe_waveform(cfg), np.zeros(800, np.float32)]))
    s2 = int(np.asarray(find_preambles(cfg, jnp.asarray(rx2), 1))[0])
    snr2 = np.asarray(estimate_bin_snr(cfg, jnp.asarray(rx2), s2))
    load2 = choose_loading(snr2)
    gains2 = choose_gains(snr2, load2)   # water-filling rides along
    upd = hs_tx.encode_frames(
        [make_loading_frame(1, 2, 1, load2, gains2)])
    kind, negotiated2, ngains2 = parse_control(
        hs_rx.process_samples(worse_channel(np.concatenate(
            [upd, np.zeros(3000, np.float32)])))[0],
        len(cfg.data_bin_idx))
    tx2 = OfdmAdaptiveStreamPhy(cfg, loading=negotiated2,
                                gains=ngains2, local_addr=2)
    rx_new = OfdmAdaptiveStreamPhy(cfg, loading=negotiated2,
                                   gains=ngains2, local_addr=2)
    got2 = rx_new.process_samples(worse_channel(np.concatenate(
        [tx2.encode_frames(frames, gap_samples=400),
         np.zeros(3000, np.float32)])))
    rate2 = tx2.net_bits_per_symbol / (cfg.sym_len / 48_000)
    print(f"retrained ({kind}): {sum(load2)} coded bits/symbol, "
          f"delivered {len(got2)}/3 clean at {rate2:.0f} bps")


if __name__ == "__main__":
    main()
