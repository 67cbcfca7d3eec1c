#!/usr/bin/env python
"""Training CLI: ``python train.py config/[SCENE].yaml``.

Rebuild of the reference entrypoint ``python admm_trainer.py config.yaml``
(admm_trainer.py:339-352). ADMM consensus is enabled when the config's
RHO > 0; otherwise tiles train independently, exactly as the reference
gates its two process types (:352).
"""

import sys


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    from scanerf_tpu.config import parse_yaml
    from scanerf_tpu.train.trainer import Trainer

    cfg = parse_yaml(sys.argv[1])
    Trainer(cfg).run()


if __name__ == "__main__":
    main()
