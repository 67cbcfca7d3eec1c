from scanerf_tpu.models import decoder as decoder
from scanerf_tpu.models import field as field
