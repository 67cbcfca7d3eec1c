from scanerf_tpu.parallel import consensus as consensus
