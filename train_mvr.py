#!/usr/bin/env python
"""Train CLI shim: python train_mvr.py --config configs/dss.yml
(mirrors the reference's repo-root entry point, /root/reference/train_mvr.py)."""
from dss_tpu.apps.train_mvr import main

if __name__ == "__main__":
    main()
