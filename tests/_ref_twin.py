"""A differentiable torch twin of the SMPL-X body model, exposing the call
surface the reference code expects from the `smplx` pip package.

The reference stack (/root/reference) calls ``smplx_model(**params)`` and
reads ``.joints`` / ``.vertices`` (data_loaders/motion_representation.py:
383-395, model/posenet.py:57-58, test_amass_full.py:190-191). The real
package's license-gated weights are absent here, so parity harnesses inject
this twin via a patched ``smplx.create``; it consumes the SAME parameter
arrays as `rohm_tpu.body.SmplxModel` (synthetic or real npz) and implements
standard SMPL-X linear blend skinning in torch:

- joints: regress the rest skeleton from the *shaped* template, pose it
  through the kinematic chain (the `smplx` package's lbs() returns these
  posed skeleton joints as the first 55 entries of `.joints`)
- vertices: shape blendshapes + pose blendshapes + LBS skinning

Everything is plain torch ops, so torch autograd flows through it — the
reference's test-time guidance differentiates recover_from_repr_smpl through
the body model (model/posenet.py:196-258).

This file is an independent reimplementation from the published SMPL-X
formulation (Pavlakos et al., CVPR 2019): it shares no code with
rohm_tpu/body/model.py's JAX version (different language, different
decomposition), which is exactly what makes tests/test_torch_twin.py a real
cross-check of the LBS math rather than a tautology.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import torch


def _aa_to_rotmat(aa: torch.Tensor) -> torch.Tensor:
    """Rodrigues formula, axis-angle [..., 3] -> [..., 3, 3], grad-safe at 0."""
    theta_sq = (aa * aa).sum(-1)[..., None, None]
    safe = theta_sq > 1e-12
    theta_sq_safe = torch.where(safe, theta_sq, torch.ones_like(theta_sq))
    theta = torch.sqrt(theta_sq_safe)

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = torch.zeros_like(x)
    k = torch.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros], dim=-1).reshape(
        aa.shape[:-1] + (3, 3)
    )
    k2 = k @ k
    a = torch.where(safe, torch.sin(theta) / theta, 1.0 - theta_sq / 6.0)
    b = torch.where(
        safe, (1.0 - torch.cos(theta)) / theta_sq_safe, 0.5 - theta_sq / 24.0
    )
    eye = torch.eye(3, dtype=aa.dtype, device=aa.device).expand(k.shape)
    return eye + a * k + b * k2


class TorchSmplxTwin(torch.nn.Module):
    """smplx-package-compatible forward over rohm_tpu SmplxModel arrays."""

    NUM_JOINTS = 55

    def __init__(self, body_model, dtype=torch.float32):
        """body_model: rohm_tpu.body.SmplxModel (synthetic or npz-loaded)."""
        super().__init__()

        def t(x):
            return torch.as_tensor(np.array(x, copy=True), dtype=dtype)

        self.register_buffer("v_template", t(body_model.v_template))  # [V, 3]
        self.register_buffer("shapedirs", t(body_model.shapedirs))  # [V, 3, 10]
        # rohm_tpu stores posedirs pre-flattened as [(J-1)*9, V*3]
        self.register_buffer("posedirs", t(body_model.posedirs))
        self.register_buffer("j_regressor", t(body_model.j_regressor))  # [J, V]
        self.register_buffer("lbs_weights", t(body_model.lbs_weights))  # [V, J]
        self.parents = list(body_model.parents)
        self.faces = body_model.faces

    def forward(
        self,
        transl: torch.Tensor,  # [N, 3]
        global_orient: torch.Tensor,  # [N, 3] axis-angle
        body_pose: torch.Tensor,  # [N, 63] axis-angle
        betas: torch.Tensor,  # [N, 10]
        **zeroed_extras,  # jaw/eyes/hands/expression: RoHM always passes zeros
    ) -> SimpleNamespace:
        for name, val in zeroed_extras.items():
            if torch.is_tensor(val) and val.abs().max() > 0:
                raise NotImplementedError(
                    f"twin only supports zeroed {name} (RoHM semantics)"
                )
        n = transl.shape[0]
        nj = self.NUM_JOINTS

        # shaped template + rest skeleton
        v_shaped = self.v_template + torch.einsum(
            "nk,vck->nvc", betas, self.shapedirs
        )  # [N, V, 3]
        j_rest = torch.einsum("jv,nvc->njc", self.j_regressor, v_shaped)  # [N, J, 3]

        # per-joint rotations: root + 21 body joints; jaw/eyes/hands identity
        aa = torch.cat([global_orient[:, None], body_pose.reshape(n, 21, 3)], dim=1)
        rots = _aa_to_rotmat(aa)  # [N, 22, 3, 3]
        eye = torch.eye(3, dtype=rots.dtype, device=rots.device)
        rots = torch.cat([rots, eye.expand(n, nj - 22, 3, 3)], dim=1)  # [N, J, 3, 3]

        # kinematic chain: accumulate world 4x4 transforms root -> leaves
        rel = j_rest.clone()
        rel[:, 1:] = j_rest[:, 1:] - j_rest[:, self.parents[1:]]
        world = [None] * nj
        world[0] = self._tf(rots[:, 0], rel[:, 0])
        for j in range(1, nj):
            world[j] = world[self.parents[j]] @ self._tf(rots[:, j], rel[:, j])
        world = torch.stack(world, dim=1)  # [N, J, 4, 4]
        joints_posed = world[:, :, :3, 3]

        # skinning matrices: remove the rest-pose joint contribution
        a_rel = world.clone()
        a_rel[:, :, :3, 3] = world[:, :, :3, 3] - torch.einsum(
            "njab,njb->nja", world[:, :, :3, :3], j_rest
        )

        # pose blendshapes from non-root rotations
        pose_feature = (rots[:, 1:] - eye).reshape(n, (nj - 1) * 9)
        v_posed = v_shaped + (pose_feature @ self.posedirs).reshape(v_shaped.shape)

        # LBS
        tf = torch.einsum("vj,njab->nvab", self.lbs_weights, a_rel)  # [N, V, 4, 4]
        verts = (
            torch.einsum("nvab,nvb->nva", tf[:, :, :3, :3], v_posed)
            + tf[:, :, :3, 3]
        )

        return SimpleNamespace(
            joints=joints_posed + transl[:, None],
            vertices=verts + transl[:, None],
        )

    @staticmethod
    def _tf(rot: torch.Tensor, pos: torch.Tensor) -> torch.Tensor:
        """Assemble [N, 4, 4] homogeneous transforms from [N,3,3] + [N,3]."""
        n = rot.shape[0]
        out = torch.zeros(n, 4, 4, dtype=rot.dtype, device=rot.device)
        out[:, :3, :3] = rot
        out[:, :3, 3] = pos
        out[:, 3, 3] = 1.0
        return out


def make_smplx_create_stub(body_model):
    """A `smplx.create`-shaped factory returning the twin (ignores paths)."""
    twin = TorchSmplxTwin(body_model)

    def create(*args, **kwargs):
        return twin

    return create, twin
