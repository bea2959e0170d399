"""Support utilities: config/CLI surface, logging, run dirs."""

from rohm_tpu.utils.config import ConfigParser, str2bool
from rohm_tpu.utils.runlog import (
    enable_compilation_cache,
    fixseed,
    make_logdir,
    save_params_json,
    setup_logger,
)

__all__ = [
    "ConfigParser",
    "str2bool",
    "make_logdir",
    "save_params_json",
    "setup_logger",
    "enable_compilation_cache",
    "fixseed",
]
