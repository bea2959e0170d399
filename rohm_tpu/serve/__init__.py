"""Resident inference server: keep one warm process holding the TPU, its
compiled executables, and initialized model params, so repeat CLI runs skip
the per-process startup tax (executable load over a tunneled device measured
at 40-100 s per run — BASELINE.md).

The reference has no serving story (every run pays full torch startup); this
subsystem is a TPU-native addition for production/serving use:

  python -m rohm_tpu.serve            # run the daemon in the foreground
  python test_amass_full.py --via_server=True ...   # route through it
  python -m rohm_tpu.serve stop       # shut it down

Clients auto-start the daemon when absent (first run pays the warm-up) and
the daemon exits after --idle_timeout seconds without requests, releasing
the device for other processes.
"""

import os

DEFAULT_SOCKET = os.environ.get("ROHM_SERVER_SOCKET", "/tmp/rohm_tpu_server.sock")

from rohm_tpu.serve.client import run_cli, server_alive, stop_server  # noqa: E402,F401
