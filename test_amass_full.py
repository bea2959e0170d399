#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python test_amass_full.py --config=..."""
from rohm_tpu.cli.test_amass_full import main

if __name__ == "__main__":
    main()
