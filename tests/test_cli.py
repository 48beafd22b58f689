"""CLI surface (python -m rodio_tpu): probe / render / devices."""
import os
import subprocess
import sys

import numpy as np
import pytest

ASSET = "/root/reference/assets/beep.wav"


def _run(*argv):
    env = {**os.environ, "RODIO_TPU_PLATFORM": "cpu"}
    return subprocess.run(
        [sys.executable, "-m", "rodio_tpu", *argv],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


@pytest.mark.skipif(not os.path.exists(ASSET), reason="no assets")
def test_cli_probe():
    r = _run("probe", ASSET)
    assert r.returncode == 0, r.stderr
    assert "channels:" in r.stdout and "rate:" in r.stdout


@pytest.mark.skipif(not os.path.exists(ASSET), reason="no assets")
def test_cli_render(tmp_path):
    out = str(tmp_path / "out.wav")
    r = _run("render", ASSET, out, "--rate", "48000", "--limit",
             "--seconds", "0.25")
    assert r.returncode == 0, r.stderr
    from rodio_tpu.io.wav import read_wav

    pcm, rate = read_wav(out)
    assert rate == 48000
    # 0.25 s +- the resampler's block-tail rounding
    assert abs(pcm.shape[1] - 12000) < 32
    assert np.isfinite(pcm).all()


def test_cli_devices():
    r = _run("devices")
    assert r.returncode == 0, r.stderr
    assert "null/file/callback" in r.stdout
