#!/usr/bin/env python
"""Entry point matching the reference CLI surface: python eval_amass_full.py --config=..."""

if __name__ == "__main__":
    # --via_server fast path: relay to the resident server before paying the
    # jax/flax import tax (rohm_tpu/serve/client.py is import-light)
    from rohm_tpu.serve.client import maybe_relay_light

    if not maybe_relay_light("eval_amass_full"):
        from rohm_tpu.cli.eval_amass_full import main

        main()
