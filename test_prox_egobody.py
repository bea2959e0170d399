#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python test_prox_egobody.py --config=..."""
from rohm_tpu.cli.test_prox_egobody import main

if __name__ == "__main__":
    main()
