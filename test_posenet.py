#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python test_posenet.py --config=..."""

if __name__ == "__main__":
    # --via_server fast path: relay to the resident server before paying the
    # jax/flax import tax (rohm_tpu/serve/client.py is import-light)
    from rohm_tpu.serve.client import maybe_relay_light

    if not maybe_relay_light("test_posenet"):
        from rohm_tpu.cli.test_posenet import main

        main()
