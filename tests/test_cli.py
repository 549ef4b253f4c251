"""CLI end-to-end tests (reference UX parity: gui/cmd.zig exit codes)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "turbomesh_tpu.cli", *args],
        capture_output=True, text=True, env=ENV, timeout=300,
    )


def test_missing_config_exit_66():
    r = run_cli("/nonexistent/config.json")
    assert r.returncode == 66
    assert "cannot open" in r.stderr


def test_invalid_config_exit_64(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"nothing": True}))
    r = run_cli(str(p))
    assert r.returncode == 64
    assert "invalid config" in r.stderr


def test_version():
    r = run_cli("--version")
    assert r.returncode == 0
    assert "turbomesh-tpu" in r.stdout


def test_end_to_end_with_smoothing(tmp_path):
    out = tmp_path / "t106.npz"
    ckpt = tmp_path / "ckpt.npz"
    r = run_cli("/root/repo/examples/T106/T106.json",
                "--iterations", "2", "--output", str(out),
                "--checkpoint", str(ckpt), "--target-residual", "1e-30")
    assert r.returncode == 0, r.stderr
    assert "blocking: 8 blocks" in r.stdout
    assert "elapsed time for smoothing" in r.stdout
    assert out.exists()
    from turbomesh_tpu.io.npz import read_npz

    names, blocks = read_npz(str(out))
    assert len(blocks) == 8
    assert all(np.isfinite(b).all() for b in blocks)
