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

import jax

jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache is configured lazily at smoother
# construction (smoothing.device.ensure_compilation_cache), NOT at import:
# importing the library must not mutate global JAX config beyond the
# documented f64 requirement, and an application-configured cache dir is
# always respected.

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
