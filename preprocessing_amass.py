#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python preprocessing_amass.py --config=..."""
from rohm_tpu.cli.preprocessing_amass import main

if __name__ == "__main__":
    main()
