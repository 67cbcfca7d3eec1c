"""ScaNeRF-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of ScaNeRF.

Scalable Bundle-Adjusting Neural Radiance Fields for Large-Scale Scene
Rendering (SIGGRAPH Asia 2023), re-designed TPU-first:

- one SPMD program over a ``tiles`` device-mesh axis instead of one OS
  process per GPU,
- the ADMM pose consensus is a masked weighted ``psum`` collective instead
  of a master process with shared-memory spin waits,
- hash encoding / ray sampling / compositing are jitted JAX ops with Pallas
  kernels on the hot paths instead of hand-written CUDA.

Reference behavior is documented per-module with citations into the
upstream repo (``file:line``) so parity can be audited.
"""

__version__ = "0.1.0"

from scanerf_tpu import config as config
