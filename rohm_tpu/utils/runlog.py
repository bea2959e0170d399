"""Run directories, file loggers, config dumps (reference utils/other_utils.py:101-117)."""

from __future__ import annotations

import json
import logging
import os
import time


def make_logdir(root: str = "runs", seed=None) -> str:
    """runs/<random 1..100000> like the reference (train_trajnet.py:197-198)."""
    import random

    rng = random.Random(seed)
    while True:
        run_id = rng.randint(1, 100000)
        path = os.path.join(root, str(run_id))
        if not os.path.exists(path):
            os.makedirs(path)
            return path


def setup_logger(logdir: str) -> logging.Logger:
    logger = logging.getLogger(f"rohm_tpu.{os.path.basename(logdir)}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        handler = logging.FileHandler(
            os.path.join(logdir, f"run_{time.strftime('%Y%m%d_%H%M%S')}.log")
        )
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(handler)
        logger.addHandler(logging.StreamHandler())
    return logger


def save_params_json(logdir: str, args) -> None:
    """Dump the resolved config as params.json (reference other_utils.py:113-117)."""
    with open(os.path.join(logdir, "params.json"), "w") as f:
        json.dump({k: v for k, v in sorted(vars(args).items())}, f, indent=2, default=str)


def enable_compilation_cache(path: str = "/tmp/jax_cache") -> None:
    """Entry-point JAX setup: honor JAX_PLATFORMS (site plugins may override
    the env var with their own platform registration) and enable the
    persistent XLA compilation cache (compiles on the tunneled v5e take
    1-2 min per program, so cache hits across runs matter a lot)."""
    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def fixseed(seed: int):
    """Seed python/numpy RNGs and return a jax PRNG key (reference
    utils/fixseed.py:6-10; cudnn flags have no TPU equivalent)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
