"""The full RoHM iterative inference pipeline as ONE jitted device program.

Reference: test_amass_full.py:200-385 / test_prox_egobody.py:185-324. The
reference alternates TrajNet and PoseNet with a host-side numpy per-sequence
re-encoding bridge in the middle (test_amass_full.py:282-311 — SURVEY.md's
"hard part #1"). Here the whole thing — TrajNet 100-step scan, the bridge
(decode -> SMPL-X FK -> re-encode -> renormalize, pure JAX), the guided
PoseNet 1000-step scan, and the second iteration through TrajControl — is one
XLA program with zero host round-trips.

Per-batch flow (sample_iter static, default 2):
  iter 0: vanilla TrajNet sample -> bridge -> PoseNet guided sample
  iter 1: TrajControl TrajNet (control_cond = PoseNet output pose dims,
          last frame duplicated) -> bridge -> PoseNet guided sample
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.body import SmplxModel, forward_joints
from rohm_tpu.diffusion import DiffusionSchedule, p_sample_loop
from rohm_tpu.geometry import rot6d_to_rotmat
from rohm_tpu.models.guidance import amass_guidance
from rohm_tpu.models.losses import merge_traj_output
from rohm_tpu.reprs import get_repr, split_repr
from rohm_tpu.reprs.schema import TRAJ_FEAT_DIM_FULL
from rohm_tpu.train.masking import UPPER_BODY_JOINTS, joint_mask_to_vec, lower_body_mask


def traj_to_pose_bridge(
    val_output_traj: jnp.ndarray,  # [B, T, 13|22] normalized TrajNet output
    motion_repr_clean: jnp.ndarray,  # [B, T, 294] normalized (pose part source)
    mean: jnp.ndarray,
    std: jnp.ndarray,
    body_model: SmplxModel,
    repr_abs_only: bool = True,
) -> jnp.ndarray:
    """Rebuild the full 22-d trajectory (abs + velocities) from TrajNet output.

    Scatter -> denormalize -> SMPL-X decode -> re-encode through get_repr ->
    renormalize -> first 22 dims. Output has T-1 frames (re-encoding drops the
    last frame, which is why the full pipeline runs PoseNet at 143 frames;
    reference test_amass_full.py:282-311).
    """
    full = merge_traj_output(motion_repr_clean, val_output_traj, repr_abs_only)
    dn = full * std + mean
    d = split_repr(dn)

    global_orient_mat = rot6d_to_rotmat(d["smplx_rot_6d"])  # [B, T, 3, 3]
    pose6d = d["smplx_body_pose_6d"]
    body_pose_mat = rot6d_to_rotmat(pose6d.reshape(pose6d.shape[:-1] + (21, 6)))

    joints = forward_joints(
        body_model,
        d["smplx_betas"],
        # aa params unused when mats are passed; keep FK on the same rotmats
        jnp.zeros(d["smplx_trans"].shape[:-1] + (3,), dn.dtype),
        jnp.zeros(d["smplx_trans"].shape[:-1] + (63,), dn.dtype),
        d["smplx_trans"],
        num_joints=22,
        global_orient_mat=global_orient_mat,
        body_pose_mat=body_pose_mat,
    )

    re_repr = get_repr(
        joints,
        transl=d["smplx_trans"],
        betas=d["smplx_betas"],
        global_orient_mat=global_orient_mat,
        body_pose_mat=body_pose_mat,
    )  # [B, T-1, 294]
    re_norm = (re_repr - mean) / std
    return re_norm[..., :TRAJ_FEAT_DIM_FULL]


def amass_eval_pose_mask(
    mask_scheme: str,
    batch_size: int,
    clip_len: int,
    window_start: np.ndarray | None = None,
    window_len: int = 30,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Test-time occlusion mask [bs, T, 294] for the PoseNet condition
    (reference test_amass_full.py:336-368). 'full' masks a window per sample:
    fixed window_start (traj-infill setup: start 65, len ratio*145) or random
    start with window_len=30 otherwise."""
    if mask_scheme == "lower":
        vis = joint_mask_to_vec(lower_body_mask(batch_size))
        vis = np.broadcast_to(vis[:, None, :], (batch_size, clip_len, vis.shape[-1])).copy()
    elif mask_scheme == "upper":
        masked = np.zeros((batch_size, 22), bool)
        masked[:, UPPER_BODY_JOINTS] = True
        vis = joint_mask_to_vec(masked)
        vis = np.broadcast_to(vis[:, None, :], (batch_size, clip_len, vis.shape[-1])).copy()
    elif mask_scheme == "full":
        if window_start is not None:
            start = np.broadcast_to(np.asarray(window_start), (batch_size,))
        elif rng is not None:
            start = rng.integers(0, clip_len - 1, size=batch_size)
        else:
            start = np.full(batch_size, 65)
        end = np.minimum(start + window_len, clip_len)
        t = np.arange(clip_len)
        inside = (t[None] >= start[:, None]) & (t[None] < end[:, None])
        vis = np.ones((batch_size, clip_len, 294), np.float32)
        vis[..., TRAJ_FEAT_DIM_FULL:] *= (~inside)[..., None]
    else:
        raise ValueError(f"bad mask_scheme {mask_scheme}")
    vis[..., -4:] = 0.0
    return vis.astype(np.float32)


@dataclass
class RohmPipeline:
    """Bundles the three models + schedules + stats into one jitted runner."""

    trajnet: Any  # TrajNet flax module (trajcontrol=False)
    trajnet_params: Any
    trajcontrol: Any  # TrajNet flax module (trajcontrol=True); may be None
    trajcontrol_params: Any
    posenet: Any
    posenet_params: Any
    sched_traj: DiffusionSchedule
    sched_pose: DiffusionSchedule
    body_model: SmplxModel
    mean: jnp.ndarray  # [294]
    std: jnp.ndarray  # [294]
    repr_abs_only: bool = True
    traj_feat_dim: int = 13
    sample_iter: int = 2
    early_stop: bool = False
    early_stop_steps: int = 20
    grad_type: str | None = "amass"  # None disables guidance
    mask_scheme: str = "lower"
    input_noise: bool = True
    iter2_cond_noisy_pose: bool = False
    iter2_cond_noisy_traj: bool = False
    infill_traj: bool = False
    guidance_override: tuple = field(default=None)
    mesh: Any = None  # optional jax.sharding.Mesh: shard the batch on 'data'
    # Pallas fused encoder layers for PoseNet: False = flax, True/"bf16" =
    # bf16 kernel (accuracy mode; ~0.4% mean repr deviation vs flax),
    # "int8" = W8A8 kernel (throughput mode; ~2% mean deviation, ~1.3x
    # faster chain), "f32" = round-1 f32 kernel
    fused_posenet: Any = False
    _jitted: Any = field(default=None, init=False, repr=False)
    _prepared_posenet: Any = field(default=None, init=False, repr=False)

    def __post_init__(self):
        if self.fused_posenet not in (False, True, "bf16", "int8", "int8qa", "f32"):
            raise ValueError(
                f"fused_posenet={self.fused_posenet!r}: expected False, True, "
                "'bf16', 'int8', 'int8qa' or 'f32' (an unknown value would "
                "silently run the plain flax path)"
            )
        if self.mesh is not None and self.fused_posenet == "f32":
            # the legacy f32 kernel path takes raw params, not a prepared
            # tree; only the prepared bf16/int8 paths carry the shard_map
            # wrapper (below) that Pallas needs under a mesh
            raise ValueError(
                "fused_posenet='f32' does not support a mesh; use 'bf16'/'int8'"
            )

    def _ensure_prepared(self):
        """One-time cast/quantize of PoseNet params (outside the scan)."""
        if self._prepared_posenet is None:
            from rohm_tpu.ops import prepare_posenet_fused, prepare_posenet_int8

            if self.fused_posenet == "int8":
                prep = prepare_posenet_int8(
                    self.posenet_params, num_layers=self.posenet.num_layers
                )
            elif self.fused_posenet == "int8qa":
                prep = prepare_posenet_int8(
                    self.posenet_params, num_layers=self.posenet.num_layers,
                    qattn=True,
                )
            else:
                prep = prepare_posenet_fused(
                    self.posenet_params, num_layers=self.posenet.num_layers
                )
            object.__setattr__(self, "_prepared_posenet", prep)
        return self._prepared_posenet

    def _weights(self) -> dict:
        """Model params + stats as ONE pytree passed through jit as an
        ARGUMENT. Closing over them instead would bake the values into the
        HLO as literal constants, so every fresh process (new random init /
        different checkpoint) would miss the persistent compilation cache —
        measured at ~125 s of recompile per test_amass_full run."""
        w = {
            "trajnet": self.trajnet_params,
            "trajcontrol": self.trajcontrol_params,
            "posenet": self.posenet_params,
            "mean": self.mean,
            "std": self.std,
        }
        if self.fused_posenet in (True, "bf16", "int8", "int8qa"):
            w["prep"] = self._ensure_prepared()
        return w

    def _guidance(self, guidance_data: dict, mean, std):
        if self.guidance_override is not None:
            return self.guidance_override
        if self.grad_type == "amass":
            return amass_guidance(mean, std, self.body_model)
        if self.grad_type == "prox":
            from rohm_tpu.models.guidance import prox_guidance

            return prox_guidance(
                mean, std, self.body_model,
                guidance_data["transf_matrix"], guidance_data["cam_r"],
                guidance_data["cam_t"], guidance_data["focal_length"],
                guidance_data["camera_center"], guidance_data["keypoints_2d"],
            )
        return ()

    def _run(
        self,
        weights: dict,  # _weights() pytree (params + stats [+ fused prep])
        traj_cond: jnp.ndarray,  # [B, 144, traj_feat_dim] (infill mask pre-applied)
        traj_clean: jnp.ndarray,  # [B, 144, 294] normalized (noisy repr on video data)
        pose_noisy: jnp.ndarray,  # [B, 144, 294] normalized (clean traj dims)
        pose_mask: jnp.ndarray,  # [B, 143, 294] visibility for PoseNet cond
        traj_mask: jnp.ndarray,  # [B, 144] 1 = visible (infill)
        key: jax.Array,
        guidance_data: dict,
        preset_noise: dict,
    ):
        """The fused pipeline. Returns (posenet output [B,143,294],
        traj output [B,144,traj_feat_dim]).

        preset_noise ({} = sample from `key`): deterministic replay /
        cross-implementation parity. Any subset of these keys is valid
        (absent ones sample from `key`; I = sample_iter, S = chain steps):
          traj_init [I,B,144,tf], traj_step [I,S_traj,B,144,tf],
          pose_init [I,B,143,294], pose_step [I,S_pose,B,143,294].
        """
        mean, std = weights["mean"], weights["std"]
        guidance = self._guidance(guidance_data, mean, std)
        early = self.early_stop_steps if self.early_stop else 0
        b, t_traj = traj_cond.shape[0], traj_cond.shape[1]
        t_pose = t_traj - 1

        val_output_pose = None
        val_output_traj = None
        cur_traj_cond = traj_cond
        for iter_idx in range(self.sample_iter):
            key, k_traj, k_pose = jax.random.split(key, 3)
            pn = {
                k: v[iter_idx] for k, v in preset_noise.items()
            } if preset_noise else {}
            # partial dicts are valid (e.g. replaying only the PoseNet chain):
            # absent keys fall back to key-derived sampling per chain
            _kw_map = {"noise": "_init", "step_noise": "_step"}
            traj_noise_kw = {
                kw: pn["traj" + sfx] for kw, sfx in _kw_map.items()
                if "traj" + sfx in pn
            }
            pose_noise_kw = {
                kw: pn["pose" + sfx] for kw, sfx in _kw_map.items()
                if "pose" + sfx in pn
            }
            if iter_idx == 0:
                def model_fn(x, tt):
                    return self.trajnet.apply(weights["trajnet"], x, cur_traj_cond, tt)

                val_output_traj = p_sample_loop(
                    model_fn, self.sched_traj, (b, t_traj, self.traj_feat_dim), k_traj,
                    **traj_noise_kw,
                )
            else:
                if self.iter2_cond_noisy_traj and self.infill_traj:
                    # visible noisy + predicted for occluded (test_amass_full.py:233-237)
                    cur_traj_cond = traj_cond * traj_mask[..., None] + val_output_traj * (
                        1.0 - traj_mask[..., None]
                    )
                elif not self.iter2_cond_noisy_traj:
                    # condition on the previous iteration's prediction
                    # (test_amass_full.py:281 / test_prox_egobody.py:224)
                    cur_traj_cond = val_output_traj
                # control_cond: PoseNet pose dims, last frame duplicated
                # (test_amass_full.py:256-260)
                cc = val_output_pose[..., -272:]
                control_cond = jnp.concatenate([cc, cc[:, -1:, :]], axis=1)  # [B,144,272]

                def model_fn(x, tt):
                    return self.trajcontrol.apply(
                        weights["trajcontrol"], x, cur_traj_cond, tt, control_cond=control_cond
                    )

                val_output_traj = p_sample_loop(
                    model_fn, self.sched_traj, (b, t_traj, self.traj_feat_dim), k_traj,
                    **traj_noise_kw,
                )

            traj_rec_full = traj_to_pose_bridge(
                val_output_traj, traj_clean, mean, std,
                self.body_model, self.repr_abs_only,
            )  # [B, 143, 22]

            # PoseNet condition assembly (test_amass_full.py:318-333)
            if self.input_noise:
                if self.iter2_cond_noisy_pose or iter_idx == 0:
                    cond = pose_noisy[:, :t_pose]
                else:
                    cond = val_output_pose
            else:
                cond = pose_noisy[:, :t_pose]  # = clean when input_noise False
            if not (self.mask_scheme == "lower" and not self.input_noise):
                cond = jnp.concatenate([traj_rec_full, cond[..., TRAJ_FEAT_DIM_FULL:]], axis=-1)
            mask_iter_num = self.sample_iter if self.iter2_cond_noisy_pose else 1
            if iter_idx < mask_iter_num:
                # pose_mask carries one mask PER ITERATION ([I, B, T, 294]):
                # the reference redraws the random 30-frame full-body window
                # inside each iteration (test_amass_full.py:360-368), so
                # iteration 2 hides a different window than iteration 1
                cond = cond * pose_mask[iter_idx]

            if self.fused_posenet in (True, "bf16", "int8", "int8qa"):
                from rohm_tpu.ops import embed_cond, posenet_apply_prepared

                prep = weights["prep"]
                cond_emb = embed_cond(prep, cond)

                def _apply_prepared(prep, x, cond, tt, cond_emb):
                    return posenet_apply_prepared(
                        prep, x, cond, tt,
                        num_heads=self.posenet.num_heads,
                        traj_feat_dim=self.posenet.traj_feat_dim,
                        cond_emb=cond_emb,
                    )

                if self.mesh is not None:
                    # Mosaic custom calls have no GSPMD partitioning rule —
                    # under a sharded jit XLA would replicate the kernel on
                    # every chip. shard_map runs the kernel per-shard on the
                    # local batch instead: prep replicated, batch-leading
                    # args split on 'data', timestep scalar replicated.
                    from jax.sharding import PartitionSpec as P

                    # check_vma=False: pallas_call's out_shape carries no
                    # varying-mesh-axes annotation
                    sharded_apply = jax.shard_map(
                        _apply_prepared, mesh=self.mesh,
                        in_specs=(P(), P("data"), P("data"), P(), P("data")),
                        out_specs=P("data"), check_vma=False,
                    )

                    def pose_model_fn(x, tt, cond=cond, cond_emb=cond_emb):
                        return sharded_apply(prep, x, cond, tt, cond_emb)
                else:
                    def pose_model_fn(x, tt, cond=cond, cond_emb=cond_emb):
                        return _apply_prepared(prep, x, cond, tt, cond_emb)
            elif self.fused_posenet == "f32":
                from rohm_tpu.ops import posenet_apply_fused

                def pose_model_fn(x, tt, cond=cond):
                    return posenet_apply_fused(
                        weights["posenet"], x, cond, tt,
                        num_layers=self.posenet.num_layers,
                        num_heads=self.posenet.num_heads,
                        traj_feat_dim=self.posenet.traj_feat_dim,
                    )
            else:
                def pose_model_fn(x, tt, cond=cond):
                    return self.posenet.apply(weights["posenet"], x, cond, tt)

            val_output_pose = p_sample_loop(
                pose_model_fn, self.sched_pose, (b, t_pose, cond.shape[-1]), k_pose,
                guidance=guidance, early_stop_steps=early, **pose_noise_kw,
            )
        return val_output_pose, val_output_traj

    def run_batch(self, traj_cond, traj_clean, pose_noisy, pose_mask, traj_mask, key,
                  guidance_data: dict | None = None, preset_noise: dict | None = None):
        """Jit-cached entry; all args device-ready arrays. guidance_data
        carries per-batch guidance inputs (cameras/keypoints for 'prox').
        preset_noise (see _run) replays a fixed noise realization.
        With a mesh set, batch-leading args are split over the 'data' axis
        (params replicated) so eval scales across chips."""
        if self._jitted is None:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                data = NamedSharding(self.mesh, P("data"))
                rep = NamedSharding(self.mesh, P())
                # pose_mask is [sample_iter, B, T, 294]: batch on axis 1
                mask_sh = NamedSharding(self.mesh, P(None, "data"))
                object.__setattr__(
                    self,
                    "_jitted",
                    jax.jit(
                        self._run,
                        in_shardings=(rep, data, data, data, mask_sh, data, rep, rep, rep),
                        out_shardings=(data, data),
                    ),
                )
            else:
                object.__setattr__(self, "_jitted", jax.jit(self._run))
        gd = {k: jnp.asarray(v) for k, v in (guidance_data or {}).items()}
        pn = {k: jnp.asarray(v) for k, v in (preset_noise or {}).items()}
        known = {"traj_init", "traj_step", "pose_init", "pose_step"}
        if not set(pn) <= known:
            raise ValueError(
                f"unknown preset_noise key(s) {sorted(set(pn) - known)}; "
                f"valid keys: {sorted(known)} (any subset — absent keys "
                "fall back to key-derived sampling)"
            )
        pm = jnp.asarray(pose_mask)
        if pm.ndim == 3:  # one mask for every iteration
            pm = jnp.broadcast_to(pm[None], (self.sample_iter,) + pm.shape)
        return self._jitted(
            self._weights(),
            jnp.asarray(traj_cond), jnp.asarray(traj_clean), jnp.asarray(pose_noisy),
            pm, jnp.asarray(traj_mask), key, gd, pn,
        )
