"""Elliptic (Winslow/Poisson) multi-block smoothing.

Reference parity: src/core/smoothing/ (smooth.zig, wall_control_function.zig,
solver.zig + Krylov backends).

Interchangeable solver paths produce the same smoothed mesh:

- ``system`` — host-side sparse assembly of the exact reference
  discretization; solved direct (scipy LU — replaces the reference's
  UMFPACK/PETSc paths and serves as the correctness oracle) or with the
  host GMRES/BiCGStab Krylov backends + diagonal/ilu0 preconditioning
  (the reference's gmres/bicgstab options).
- ``device`` — the TPU path: matrix-free stencil operators on the padded
  block stack, one fused f64-FGMRES program per solve preconditioned by
  an f32 glued multigrid V-cycle (zebra line relaxation, inter-block
  ghost halos at every level); ``parallel.ShardedSmoother`` adds
  shard_map multi-chip parallelism with ppermute halo exchange.
"""

from .smooth import smooth_mesh, SmoothOptions

__all__ = ["smooth_mesh", "SmoothOptions"]
