#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python test_posenet.py --config=..."""
from rohm_tpu.cli.test_posenet import main

if __name__ == "__main__":
    main()
