"""Cross-framework validation of the SMPL-X body model (SURVEY §7 build-order
#2). The `smplx` pip package cannot be installed here (no egress), so the
oracle is tests/_ref_twin.py: an independent torch reimplementation of the
published SMPL-X LBS math that exposes the smplx package's call surface
(``model(**params).joints/.vertices``). Two implementations, two frameworks,
two decompositions of the math — agreement to <1e-5 m on random params
validates shape blendshapes, pose blendshapes, the kinematic chain, the joint
regressor fast path, and skinning. The same twin is injected into the REAL
reference pipeline by tests/test_e2e_reference_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from rohm_tpu.body import forward_joints, forward_vertices, synthetic_model  # noqa: E402
from rohm_tpu.body.model import NUM_JOINTS  # noqa: E402

from _ref_twin import TorchSmplxTwin  # noqa: E402

N = 6  # frames


@pytest.fixture(scope="module")
def body():
    return synthetic_model(num_verts=256, seed=3)


@pytest.fixture(scope="module")
def twin(body):
    return TorchSmplxTwin(body).eval()


def _random_params(rng, n=N):
    return {
        "transl": rng.normal(scale=0.5, size=(n, 3)).astype(np.float32),
        "global_orient": rng.normal(scale=0.8, size=(n, 3)).astype(np.float32),
        "body_pose": rng.normal(scale=0.4, size=(n, 63)).astype(np.float32),
        "betas": rng.normal(scale=1.0, size=(n, 10)).astype(np.float32),
    }


def test_joints_cross_framework(body, twin, rng):
    """Posed joints (fast path, no vertex skinning) match torch LBS <1e-5 m."""
    p = _random_params(rng)
    with torch.no_grad():
        want = twin(**{k: torch.from_numpy(v) for k, v in p.items()}).joints.numpy()
    got = np.asarray(
        forward_joints(
            body, jnp.asarray(p["betas"]), jnp.asarray(p["global_orient"]),
            jnp.asarray(p["body_pose"]), jnp.asarray(p["transl"]),
            num_joints=NUM_JOINTS,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vertices_cross_framework(body, twin, rng):
    """Full LBS vertices (shape+pose blendshapes+skinning) match <1e-5 m."""
    p = _random_params(rng)
    with torch.no_grad():
        out = twin(**{k: torch.from_numpy(v) for k, v in p.items()})
    got_v, got_j = forward_vertices(
        body, jnp.asarray(p["betas"]), jnp.asarray(p["global_orient"]),
        jnp.asarray(p["body_pose"]), jnp.asarray(p["transl"]),
    )
    np.testing.assert_allclose(np.asarray(got_v), out.vertices.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_j), out.joints.numpy(), atol=1e-5)


def test_zero_pose_joints_match_shaped_template(body, twin):
    """Identity pose: joints == regressed shaped-template skeleton (both)."""
    n = 2
    p = {
        "transl": np.zeros((n, 3), np.float32),
        "global_orient": np.zeros((n, 3), np.float32),
        "body_pose": np.zeros((n, 63), np.float32),
        "betas": np.zeros((n, 10), np.float32),
    }
    with torch.no_grad():
        j = twin(**{k: torch.from_numpy(v) for k, v in p.items()}).joints.numpy()
    want = np.asarray(body.j_template)[None].repeat(n, 0)
    np.testing.assert_allclose(j, want, atol=1e-6)


def test_guidance_gradients_cross_framework(body, twin, rng):
    """d(sum of squared joint positions)/d(pose params) matches across
    frameworks — the reference guidance backprops through the body model
    (model/posenet.py:196-258), so grad parity matters as much as primal."""
    import jax

    p = _random_params(rng, n=3)

    tp = {k: torch.from_numpy(v.copy()) for k, v in p.items()}
    for k in ("global_orient", "body_pose", "transl", "betas"):
        tp[k].requires_grad_()
    loss_t = (twin(**tp).joints ** 2).sum()
    loss_t.backward()

    def loss_j(go, bp, tr, be):
        j = forward_joints(body, be, go, bp, tr, num_joints=NUM_JOINTS)
        return (j**2).sum()

    grads = jax.grad(loss_j, argnums=(0, 1, 2, 3))(
        jnp.asarray(p["global_orient"]), jnp.asarray(p["body_pose"]),
        jnp.asarray(p["transl"]), jnp.asarray(p["betas"]),
    )
    for got, want, name in [
        (grads[0], tp["global_orient"].grad, "global_orient"),
        (grads[1], tp["body_pose"].grad, "body_pose"),
        (grads[2], tp["transl"].grad, "transl"),
        (grads[3], tp["betas"].grad, "betas"),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), atol=2e-3, rtol=1e-4, err_msg=name
        )


def test_hands_face_zeroed_semantics(body, twin, rng):
    """Extra smplx kwargs (jaw/eyes/hands/expression) are accepted when zero
    — the reference always passes them as zeros
    (motion_representation.py:383-389) — and rejected otherwise."""
    p = _random_params(rng, n=2)
    tp = {k: torch.from_numpy(v) for k, v in p.items()}
    zeros = dict(
        jaw_pose=torch.zeros(2, 3), leye_pose=torch.zeros(2, 3),
        reye_pose=torch.zeros(2, 3), left_hand_pose=torch.zeros(2, 45),
        right_hand_pose=torch.zeros(2, 45), expression=torch.zeros(2, 10),
    )
    with torch.no_grad():
        a = twin(**tp).joints
        b = twin(**tp, **zeros).joints
    np.testing.assert_array_equal(a.numpy(), b.numpy())
    with pytest.raises(NotImplementedError):
        twin(**tp, jaw_pose=torch.ones(2, 3))
