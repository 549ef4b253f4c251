"""turbomesh_tpu — TPU-native structured mesh generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of turbomesh
(2-D block-structured elliptic mesh generation for turbomachinery CFD):

- blade-profile fitting splines with arc-length parameterization
- clustering laws (uniform / Roberts / Vinokur hyperbolic-tangent)
- transfinite interpolation (TFI) with boundary-blended control functions
  as batched vectorized JAX ops
- automated O4H multi-block blocking templates
- elliptic (Winslow/Poisson) multi-block smoothing with inter-block
  boundary coupling, periodic boundaries, sliding inlet/outlet boundaries
  and junction points — formulated matrix-free on dense per-block arrays
  with halo exchange, solved by relaxation/Krylov on TPU
- CGNS (HDF5 layout) and legacy-VTK structured output

f64 is enabled globally: the correctness bar is 1e-10 node-for-node
agreement with the reference discretization.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# persistent compilation cache: f64-emulation compiles are expensive on TPU;
# cache them across processes
_cache_dir = os.environ.get("TURBOMESH_JAX_CACHE",
                            os.path.expanduser("~/.cache/turbomesh_jax"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # pragma: no cover — cache is best-effort
    pass

from . import types  # noqa: E402
from . import clustering  # noqa: E402
from . import spline  # noqa: E402
from . import geometry  # noqa: E402
from . import edge  # noqa: E402
from . import tfi  # noqa: E402
from . import boundary  # noqa: E402
from . import mesh  # noqa: E402
from . import machine  # noqa: E402

__version__ = "0.1.0"
