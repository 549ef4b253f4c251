"""Front-end parity tests: the browser service (WASM-bindings equivalent,
wasm/lib.zig:57-125) and the interactive viewer (gui/lib.zig)."""

import json
import urllib.request

import numpy as np

TINY_CFG = {
    "template": {"O4H": {
        "inlet_distance": 0.05, "outlet_distance": 0.02,
        "blade_clustering": {"roberts": {"alpha": 0.5, "beta": 1.1}},
        "num_cells": {
            "o_grid": 4, "middle_i": 8, "in_up_j": 4, "in_down_j": 4,
            "in_i": 4, "out_up_j": 4, "out_down_j": 4, "out_i": 4,
            "down_j": 4, "bulge": 4, "upstream_i": 4, "downstream_i": 4,
        },
    }},
    "smoothing": {},
    "geometry": {
        "pitch": 0.08836,
        "profile": {"csv": {
            "down_csv_path": "examples/T106/T106_ps.dat",
            "up_csv_path": "examples/T106/T106_ss.dat",
        }},
    },
}


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def test_web_service_roundtrip():
    from turbomesh_tpu.web import serve

    httpd = serve(port=0, base_dir="/root/repo")
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        # run the pipeline through the service (wasm run() parity)
        req = urllib.request.Request(
            f"{base}/run", data=json.dumps(TINY_CFG).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert out["blocks"] == 8

        assert json.loads(_get(f"{base}/blocks"))["count"] == 8

        # block points match a direct pipeline run bit-for-bit
        from turbomesh_tpu import input as input_mod

        inp = input_mod.load(TINY_CFG, base_dir="/root/repo")
        mesh = inp.template.run(inp.geometry)
        for b in (0, 7):
            size = json.loads(_get(f"{base}/block/{b}/size"))
            ni, nj = mesh.blocks[b].size
            assert (size["i"], size["j"]) == (ni, nj)
            raw = _get(f"{base}/block/{b}/points")
            vals = np.frombuffer(raw, dtype="<f8").reshape(ni, nj, 2)
            np.testing.assert_array_equal(vals, mesh.blocks[b].points)

        # free (freeMesh parity) + error path
        req = urllib.request.Request(f"{base}/free", data=b"", method="POST")
        urllib.request.urlopen(req, timeout=30)
        assert json.loads(_get(f"{base}/blocks"))["count"] == 0
        try:
            _get(f"{base}/block/0/size")
            raise AssertionError("expected 404 on freed mesh")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_web_service_run_with_smoothing():
    """POST /run with smoothing.iterations > 0 (the bundled example
    configs' shape) must run the smoother, not 500 — regression for the
    smooth_mesh(mesh, SmoothingConfig) TypeError."""
    from turbomesh_tpu.web import serve

    cfg = dict(TINY_CFG)
    cfg["smoothing"] = {"iterations": 2,
                        "solver": {"gmres": {"preconditioner": "ilu0"}},
                        "wall_control_function": {
                            "white": {"ds_target": 1e-4}}}
    httpd = serve(port=0, base_dir="/root/repo")
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/run", data=json.dumps(cfg).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert out["blocks"] == 8
        assert any("residual" in line for line in out["log"]), out["log"][:5]

        # smoothing actually moved points vs the unsmoothed TFI mesh
        from turbomesh_tpu import input as input_mod

        inp = input_mod.load(TINY_CFG, base_dir="/root/repo")
        tfi_mesh = inp.template.run(inp.geometry)
        raw = _get(f"{base}/block/0/points")
        ni, nj = tfi_mesh.blocks[0].size
        vals = np.frombuffer(raw, dtype="<f8").reshape(ni, nj, 2)
        assert np.abs(vals - tfi_mesh.blocks[0].points).max() > 0
    finally:
        httpd.shutdown()


def test_gui_viewer_headless():
    import matplotlib

    matplotlib.use("Agg", force=True)
    from turbomesh_tpu import input as input_mod
    from turbomesh_tpu.gui import view_mesh

    inp = input_mod.load(TINY_CFG, base_dir="/root/repo")
    mesh = inp.template.run(inp.geometry)
    fig = view_mesh(mesh, block=False)
    assert fig.axes, "viewer produced no axes"
    # camera covers the mesh bbox
    (xl, xh), (yl, yh) = fig.axes[0].get_xlim(), fig.axes[0].get_ylim()
    pts = np.concatenate([b.points.reshape(-1, 2) for b in mesh.blocks])
    assert xl <= pts[:, 0].min() and xh >= pts[:, 0].max()
    assert yl <= pts[:, 1].min() and yh >= pts[:, 1].max()
