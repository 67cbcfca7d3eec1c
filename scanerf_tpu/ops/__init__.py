from scanerf_tpu.ops import integrate as integrate
from scanerf_tpu.ops import intersect as intersect
