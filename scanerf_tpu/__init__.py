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
# down). Honor an explicit NON-axon platform request (JAX_PLATFORMS=cpu
# for dryruns/probes) the way stock JAX would: config-update before the
# first backend init. Values naming axon are skipped — that is the
# plugin's (and this image's baked env) default anyway, and applying it
# here would clobber an earlier explicit jax.config.update("cpu") such
# as tests/conftest.py's, re-enabling axon inside the test runner.
import os as _os

_plat = _os.environ.get("JAX_PLATFORMS", "").lower()
if _plat and "axon" not in _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
del _plat

from scanerf_tpu import config as config
