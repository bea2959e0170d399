#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python train_trajnet.py --config=..."""
from rohm_tpu.cli.train_trajnet import main

if __name__ == "__main__":
    main()
