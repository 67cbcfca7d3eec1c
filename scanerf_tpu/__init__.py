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

# The axon TPU plugin in this image registers itself regardless of the
# JAX_PLATFORMS env var (and hangs backend init when its tunnel is
# down). Honor an explicit platform request the way stock JAX would:
# config-update before the first backend init. No-op when unset.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update(
            "jax_platforms", _os.environ["JAX_PLATFORMS"].lower())
    except Exception:
        pass

from scanerf_tpu import config as config
