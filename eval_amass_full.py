#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python eval_amass_full.py --config=..."""
from rohm_tpu.cli.eval_amass_full import main

if __name__ == "__main__":
    main()
