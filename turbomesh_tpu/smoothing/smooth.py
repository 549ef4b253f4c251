"""Outer smoothing loop (Picard iteration over the nonlinear Winslow system).

Reference parity: smooth.zig:74-166 (mesh()): per iteration — update the
control function (n > 0), freeze stencil coefficients at the current
coordinates, solve the linearized system for new coordinates (x-system then
y-system), log the displacement-norm residual, copy the solution back.

Solver selection: the reference's JSON options {gmres, bicgstab, umfpack,
petsc} all converge the same linear systems to tight tolerance; here they
map to the host direct factorization ("direct", the oracle) or the TPU
matrix-free path ("device"). Fixed points of the Picard iteration agree to
solver tolerance ("tolerance-matched", SURVEY.md §7.1).
"""

from __future__ import annotations

import dataclasses
import logging
import time

import numpy as np

from ..check import check_connections
from .classify import classify, Kind
from .control_function import from_config as cf_from_config
from .system import SparseSystem

log = logging.getLogger("turbomesh.smoothing")


@dataclasses.dataclass
class SmoothOptions:
    iterations: int = 10
    solver: str | dict = "direct"
    wall_control_function: object = "laplace"


def _solver_name(option) -> str:
    """Map reference JSON solver options onto our backends."""
    if isinstance(option, dict):
        (tag, _), = option.items()
        option = tag
    if option in ("direct", "umfpack", "petsc", "gmres", "bicgstab"):
        return "direct"
    if option in ("device", "jacobi_cg", "sor"):
        return "device"
    raise ValueError(f"unknown solver option {option!r}")


def smooth_mesh(mesh, iterations: int, solver="direct",
                wall_control_function="laplace",
                residual_history: list | None = None) -> None:
    """Smooth `mesh` in place for `iterations` Picard steps."""
    t0 = time.perf_counter()
    check_connections(mesh)

    info = classify(mesh)
    algorithm = cf_from_config(wall_control_function)
    backend = _solver_name(solver)

    if backend == "device":
        from .device import DeviceSmoother

        smoother = DeviceSmoother(mesh, info)
    else:
        smoother = SparseSystem(mesh, info)

    cf = algorithm.init(mesh)
    coords = mesh.flat_coords()

    for n in range(iterations):
        log.info("iteration: %d", n)
        if n > 0:
            algorithm.update(cf, mesh)
        new = smoother.solve(coords, cf)

        dx = coords[:, 0] - new[:, 0]
        dy = coords[:, 1] - new[:, 1]
        norm = (dx @ dx + dy @ dy) ** 2  # reference residual (smooth.zig:136)
        log.info("\tresidual: %.6e", norm)
        if residual_history is not None:
            residual_history.append(norm)

        coords = new
        mesh.set_flat_coords(coords)

    log.info("elapsed time for smoothing: %.2f s", time.perf_counter() - t0)
