"""Diagnose the deflation Galerkin matrix on the White-stalled system."""
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
import jax.numpy as jnp  # noqa: E402

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

# reach iteration 2's system (the stalled one)
c = coords0.copy()
cf = cf0.copy()
for n in range(2):
    if n > 0:
        mesh.set_flat_coords(c)
        white.update(cf, mesh)
    c = dev.solve(c, cf)
mesh.set_flat_coords(c)
white.update(cf, mesh)

p = dev.plan
X = jnp.asarray(p.pad_coords(c).reshape(p.B, p.N, p.M, 2))
C = jnp.asarray(p.pad_cf(cf).reshape(p.B, p.N, p.M, 2))
base, b = dev._stage_base(X.reshape(-1, 2).reshape(p.B, p.N, p.M, 2).reshape(-1, 2), C) \
    if False else dev._stage_base(X.reshape(-1, 2), C)
# _stage_base expects Xpad flat? check signature: _stage_base(Xpad, cf_pad) -> _stage_sub(Xpad.reshape(-1,2))
ctx = dev._stage_prepare32(base, C)

dG = np.asarray(ctx["dG"], dtype=np.float64)
dD = np.asarray(ctx["dD"], dtype=np.float64)
print("K =", dG.shape[0])
s = np.linalg.svd(dG, compute_uv=False)
print("Gs singular values: max %.3e min %.3e cond %.3e" % (
    s.max(), s.min(), s.max() / s.min()))
print("smallest 6:", s[-6:])

# amplification on the actual stalled residual: solve once, get residual
b64 = np.asarray(b)
rhs = np.asarray(dev._defl_Wt(dev._jnp_plan32,
                              jnp.asarray(b64, jnp.float32))).astype(np.float64)
rhs_s = rhs * dD
alpha = dD * np.linalg.solve(dG, rhs_s)
print("||rhs||", np.linalg.norm(rhs), "||alpha||", np.linalg.norm(alpha))
z0 = np.asarray(dev._defl_W(dev._jnp_plan32, jnp.asarray(alpha, jnp.float32)))
Az0 = np.asarray(dev._stage_A32(ctx, jnp.asarray(z0, jnp.float32)))
print("||b||", np.linalg.norm(b64), "||z0||", np.linalg.norm(z0),
      "||A z0||", np.linalg.norm(Az0),
      "||b - A z0||/||b||",
      np.linalg.norm(b64 - Az0) / np.linalg.norm(b64))
# coarse component of b after deflation
res_c = np.asarray(dev._defl_Wt(
    dev._jnp_plan32, jnp.asarray(b64 - Az0, jnp.float32)))
print("coarse comp before:", np.linalg.norm(rhs),
      "after:", np.linalg.norm(res_c))

# --- least-squares deflation validation: alpha = argmin ||D(b - AW a)|| ---
K = dG.shape[0]
p32 = dev._jnp_plan32
import jax as _jax
eye = np.eye(K, dtype=np.float32)
AW = []
for k in range(K):
    w = dev._defl_W(p32, jnp.asarray(eye[k]))
    AW.append(np.asarray(dev._stage_A32(ctx, w)).reshape(-1))
AW = np.array(AW, dtype=np.float64).T  # (P2, K)
Dw = (1.0 / np.abs(np.asarray(ctx["diag"], np.float64).reshape(-1)))
bf = b64.reshape(-1)
a_ls, *_ = np.linalg.lstsq(Dw[:, None] * AW, Dw * bf, rcond=1e-10)
r_ls = bf - AW @ a_ls
print("LS: ||alpha||", np.linalg.norm(a_ls),
      "||b - AW a||/||b||", np.linalg.norm(r_ls) / np.linalg.norm(bf),
      "weighted:", np.linalg.norm(Dw * r_ls) / np.linalg.norm(Dw * bf))
N = (Dw[:, None] * AW).T @ (Dw[:, None] * AW)
sN = np.linalg.svd(N, compute_uv=False)
print("normal matrix cond:", sN.max() / sN.min())
dN = 1.0 / np.sqrt(np.abs(np.diag(N)))
Ns = N * dN[:, None] * dN[None, :]
sNs = np.linalg.svd(Ns, compute_uv=False)
print("equilibrated normal matrix cond:", sNs.max() / sNs.min())
