"""Result-pickle visualization entry (reference eval_amass_full.py:150-396)."""

from __future__ import annotations

import numpy as np

from rohm_tpu.viz.skeleton import (
    COLOR_GT,
    COLOR_VIS,
    LIMBS_BODY_SMPL,
    vis_foot_contact,
    vis_skeleton,
)


def visualize_amass_results(saved_data: dict, render: bool = False,
                            vis_interval: int = 100, fps: int = 30) -> None:
    """Open3d animation of clean vs reconstructed skeletons (+ contact
    spheres), one clip every vis_interval. Offscreen rendering requires
    pyrender (render=True path, eval_amass_full.py:278-396)."""
    if render:
        raise NotImplementedError(
            "offscreen rendering of AMASS results needs SMPL-X vertices; run "
            "test_amass_full with a real body model and use rohm_tpu.viz.render"
        )
    import time

    import open3d as o3d

    clean = saved_data["rec_ric_data_clean_list"]
    rec = saved_data["rec_ric_data_rec_list_from_smpl"]
    contact = saved_data["motion_repr_rec_list"][:, :, -4:]
    for idx in range(0, len(clean), max(vis_interval, 1)):
        vis = o3d.visualization.Visualizer()
        vis.create_window()
        for t in range(clean.shape[1]):
            vis.clear_geometries()
            for g in vis_skeleton(clean[idx, t], LIMBS_BODY_SMPL, color_vis=COLOR_GT):
                vis.add_geometry(g)
            for g in vis_skeleton(rec[idx, t], LIMBS_BODY_SMPL, add_trans=np.array([1.5, 0, 0]),
                                  color_vis=COLOR_VIS):
                vis.add_geometry(g)
            for g in vis_foot_contact(rec[idx, t], contact[idx, t], add_trans=np.array([1.5, 0, 0])):
                vis.add_geometry(g)
            vis.poll_events()
            vis.update_renderer()
            time.sleep(1.0 / fps)
        vis.destroy_window()
