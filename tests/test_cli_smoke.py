"""Smoke tests for round-2 CLI surfaces: global --timings/--profile flags,
xc enc --device, and run-contest (exercised in-process elsewhere; here the
argparse wiring itself)."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
FIXTURES = Path(__file__).parent / "fixtures"


def _xc(*args, timeout=240):
    return subprocess.run([sys.executable, "-m", "alfalfa_tpu.cli.xc",
                           *args], cwd=REPO, capture_output=True,
                          text=True, timeout=timeout)


def test_timings_flag(tmp_path):
    r = _xc("--timings", "decode", str(FIXTURES / "kf_64x48_q40.ivf"),
            str(tmp_path / "out.y4m"))
    assert r.returncode == 0, r.stderr
    assert "stage timings" in r.stderr
    assert "decode.parse" in r.stderr


def test_enc_device_flag_roundtrips(tmp_path):
    import numpy as np
    sys.path.insert(0, str(FIXTURES))
    from gen_inputs import gen_clip, write_y4m
    clip = gen_clip(64, 48, 1, seed=31)
    y4m = tmp_path / "in.y4m"
    write_y4m(str(y4m), clip, 64, 48)
    host = _xc("enc", "-i", "y4m", "-o", str(tmp_path / "h.ivf"),
               "--y-ac-qi", "40", str(y4m), timeout=600)
    assert host.returncode == 0, host.stderr
    dev = _xc("enc", "--device", "-i", "y4m", "-o", str(tmp_path / "d.ivf"),
              "--y-ac-qi", "40", str(y4m), timeout=600)
    assert dev.returncode == 0, dev.stderr
    assert (tmp_path / "h.ivf").read_bytes() == \
        (tmp_path / "d.ivf").read_bytes()


def test_run_contest_help():
    r = _xc("run-contest", "--help")
    assert r.returncode == 0
    assert "--trace" in r.stdout
