"""Visualization / rendering (L7) — optional extras.

open3d / pyrender / trimesh are not part of the core TPU stack; every entry
point here degrades to a clear error message when they're absent. Parity
targets: reference utils/vis_util.py, utils/render_util.py, and the
visualization branches of the eval scripts.
"""

from rohm_tpu.viz.skeleton import LIMBS_BODY_SMPL
from rohm_tpu.viz.results import (
    animate_skeletons,
    render_amass_results,
    render_prox_overlay,
    visualize_amass_results,
)

__all__ = [
    "LIMBS_BODY_SMPL",
    "visualize_amass_results",
    "render_amass_results",
    "render_prox_overlay",
    "animate_skeletons",
]
