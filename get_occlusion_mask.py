#!/usr/bin/env python
"""Entry point matching the reference tool: python get_occlusion_mask.py --seq_name=..."""
from rohm_tpu.cli.get_occlusion_mask import main

if __name__ == "__main__":
    main()
