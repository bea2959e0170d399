#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python train_posenet.py --config=..."""
from rohm_tpu.cli.train_posenet import main

if __name__ == "__main__":
    main()
