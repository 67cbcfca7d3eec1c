from scanerf_tpu.utils import lie as lie
from scanerf_tpu.utils import rays as rays
from scanerf_tpu.utils import sh as sh
