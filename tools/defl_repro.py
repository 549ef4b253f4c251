"""Repro: deflation-induced FGMRES stall in run() vs solve()."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_device_solver import _o4h_mesh  # noqa: E402

from turbomesh_tpu.smoothing.classify import classify  # noqa: E402
from turbomesh_tpu.smoothing.control_function import White  # noqa: E402
from turbomesh_tpu.smoothing.device import DeviceSmoother  # noqa: E402

mesh = _o4h_mesh()
info = classify(mesh)
white = White(ds_target=1e-4)

dev = DeviceSmoother(mesh, info)
cf0 = white.init(mesh)
coords0 = mesh.flat_coords()

c = coords0.copy()
cf = cf0.copy()
for n in range(3):
    if n > 0:
        mesh.set_flat_coords(c)
        white.update(cf, mesh)
    new = dev.solve(c, cf)
    print("solve iter", n, "done")
    c = new

c_run, cf_run, _, _ = dev.run(coords0.copy(), cf0.copy(), 3, algorithm=white)
print("run done; run-vs-solve max diff:", np.abs(c_run - c).max(),
      "cf diff:", np.abs(cf_run - cf).max())
