"""Golden-file regression tests for node placement.

Node coordinates are the framework's primary output; these fingerprints
(downsampled point samples + block corners) pin the exact placement of the
TFI blocking and the smoothed T106 mesh. Blocking must match bitwise
(pure deterministic f64 host arithmetic); smoothing to solver tolerance.
"""

import numpy as np
import pytest

from turbomesh_tpu import input as input_mod
from turbomesh_tpu.smoothing import smooth_mesh

GOLDEN = "tests/golden"


def fingerprint(mesh, step=13):
    out = {}
    for name, blk in zip(mesh.names, mesh.blocks):
        p = blk.points
        out[f"{name}_sample"] = p[::step, ::step]
        out[f"{name}_corners"] = np.stack([p[0, 0], p[0, -1], p[-1, 0], p[-1, -1]])
    return out


def check(mesh, golden_path, atol):
    got = fingerprint(mesh)
    want = np.load(golden_path)
    assert set(got) == set(want.files)
    for k in want.files:
        np.testing.assert_allclose(got[k], want[k], atol=atol, err_msg=k)


@pytest.mark.parametrize("label,config", [
    ("t106", "/root/repo/examples/T106/T106.json"),
    ("ls89", "/root/repo/examples/LS89/LS89.json"),
])
def test_blocking_golden(label, config):
    inp = input_mod.load(config, base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    check(mesh, f"{GOLDEN}/{label}_tfi.npz", atol=0.0)  # bitwise


def test_smoothed_golden():
    inp = input_mod.load("/root/repo/examples/T106/T106.json",
                         base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    smooth_mesh(mesh, iterations=3, solver="direct",
                wall_control_function=inp.smoothing.wall_control_function)
    check(mesh, f"{GOLDEN}/t106_smoothed3.npz", atol=1e-10)
