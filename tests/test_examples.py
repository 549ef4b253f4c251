"""Repo-local examples stay byte-identical to the reference's.

The repo carries its own copies of the LS89/T106 example configs and blade
data (reference examples/LS89/LS89.json, examples/T106/*) so it is runnable
standalone; this test pins them against the reference tree when present
(the configs are the compatibility surface — SURVEY.md §5.6).
"""

import os

import pytest

REPO = "/root/repo/examples"
REF = "/root/reference/examples"

FILES = [
    "LS89/LS89.json",
    "T106/T106.json",
    "T106/T106_ps.dat",
    "T106/T106_ss.dat",
]


@pytest.mark.parametrize("rel", FILES)
def test_example_matches_reference(rel):
    ref_path = os.path.join(REF, rel)
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not available")
    with open(os.path.join(REPO, rel), "rb") as f:
        ours = f.read()
    with open(ref_path, "rb") as f:
        theirs = f.read()
    assert ours == theirs, f"{rel} diverged from the reference copy"


def test_examples_run_standalone():
    """`turbomesh examples/T106/T106.json`-style load works from the repo
    tree alone (VERDICT round 1, Missing #7)."""
    from turbomesh_tpu import input as input_mod

    inp = input_mod.load(os.path.join(REPO, "T106/T106.json"),
                         base_dir="/root/repo/examples/T106")
    mesh = inp.template.run(inp.geometry)
    assert len(mesh.blocks) == 8
