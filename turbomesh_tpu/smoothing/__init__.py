"""Elliptic (Winslow/Poisson) multi-block smoothing.

Reference parity: src/core/smoothing/ (smooth.zig, wall_control_function.zig,
solver.zig + Krylov backends).

Two interchangeable solver paths produce the same smoothed mesh:

- ``system`` — host-side sparse assembly of the exact reference
  discretization, solved with a scipy direct factorization. This is the
  correctness oracle and the small-mesh fallback (replaces the reference's
  UMFPACK/PETSc direct paths).
- ``device`` — the TPU path: dense per-block stencil operators with halo
  exchange, relaxation + Krylov iterations fully on device, shard_map
  multi-chip parallelism.
"""

from .smooth import smooth_mesh, SmoothOptions

__all__ = ["smooth_mesh", "SmoothOptions"]
