"""CLI smoke tests (the reference's clap subcommands, main.rs:37-203)."""

import numpy as np
import pytest

from trackmaker_tpu.cli.main import main


def run_cli(argv):
    with pytest.raises(SystemExit) as e:
        main(argv)
    return e.value.code


def test_cli_test_manchester(capsys):
    assert run_cli(["test"]) == 0
    out = capsys.readouterr().out
    assert "exact: True" in out


def test_cli_test_4b5b(capsys):
    assert run_cli(["test", "--encoding", "4b5b"]) == 0


def test_cli_encode_decode_roundtrip(tmp_path, capsys):
    data = bytes(range(256)) * 2
    inp = tmp_path / "in.bin"
    inp.write_bytes(data)
    wav = tmp_path / "t.wav"
    out = tmp_path / "out.bin"
    assert run_cli(["encode", "--input", str(inp), "--wav", str(wav)]) == 0
    assert run_cli(["decode", str(wav), "--output", str(out)]) == 0
    assert out.read_bytes() == data


def test_cli_ping(capsys):
    assert run_cli(["ping", "--count", "2"]) == 0
    assert "0% loss" in capsys.readouterr().out


def test_cli_tx(tmp_path, capsys):
    inp = tmp_path / "INPUT1to2.bin"
    inp.write_bytes(b"hello acoustic world" * 10)
    out = tmp_path / "OUTPUT1to2.bin"
    assert run_cli(["tx", "--input", str(inp), "--output", str(out)]) == 0
    assert out.read_bytes() == inp.read_bytes()


def test_cli_ofdm_adapt(capsys):
    assert run_cli(["ofdm-adapt"]) == 0
    out = capsys.readouterr().out
    assert "bits/sym" in out and "exact: True" in out


def test_cli_decode_many_batched(tmp_path, capsys):
    """N capture files decode through ONE batched call, per-file exact."""
    d1 = bytes(range(200))
    d2 = bytes(reversed(range(128)))
    paths = []
    for i, d in enumerate((d1, d2)):
        inp = tmp_path / f"in{i}.bin"
        inp.write_bytes(d)
        wav = tmp_path / f"c{i}.wav"
        assert run_cli(["encode", "--input", str(inp),
                        "--wav", str(wav)]) == 0
        paths.append(str(wav))
    out = tmp_path / "all.bin"
    assert run_cli(["decode", *paths, "--output", str(out)]) == 0
    assert out.read_bytes() == d1 + d2
    text = capsys.readouterr().out
    assert "2 captures" in text


def test_cli_tx_sr(tmp_path, capsys):
    inp = tmp_path / "in.bin"
    inp.write_bytes(b"selective repeat payload " * 12)
    out = tmp_path / "out.bin"
    assert run_cli(["tx", "--input", str(inp), "--output", str(out),
                    "--arq", "sr", "--window", "4"]) == 0
    assert out.read_bytes() == inp.read_bytes()


def test_cli_tx_phy_families(tmp_path):
    """`tm tx --phy` swaps the waveform under the unchanged MAC: the
    same file transfer runs over OFDM and FSK stream PHYs (adaptive
    OFDM and PSK are covered by their own MAC suites)."""
    inp = tmp_path / "in.bin"
    inp.write_bytes(bytes(range(256)) * 0 + b"phy swap under the mac" * 7)
    for phy in ("ofdm", "fsk"):
        out = tmp_path / f"out_{phy}.bin"
        assert run_cli(["tx", "--input", str(inp), "--output", str(out),
                        "--phy", phy, "--noise", "0.003"]) == 0
        assert out.read_bytes() == inp.read_bytes()


def test_cli_tx_window_arq_over_ofdm(tmp_path):
    """The window ARQs are modem-agnostic too: Go-Back-N over the OFDM
    stream PHY round-trips exactly."""
    inp = tmp_path / "in.bin"
    inp.write_bytes(b"window arq over ofdm " * 8)
    out = tmp_path / "out.bin"
    assert run_cli(["tx", "--input", str(inp), "--output", str(out),
                    "--phy", "ofdm", "--arq", "gbn",
                    "--noise", "0.003"]) == 0
    assert out.read_bytes() == inp.read_bytes()
