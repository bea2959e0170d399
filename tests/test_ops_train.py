"""Custom-VJP fused TRAINING layer parity tests (interpret mode on CPU).

Oracles, strongest first:
1. reference_layer — a pure-JAX mirror fed the SAME dropout masks the kernel
   uses (regenerated from the same seed): fwd outputs and every gradient must
   match to f32 tolerance, including with dropout active.
2. flax TransformerEncoderLayer at p=0 (masks identity): the fused layer must
   match the real model's layer (models/blocks.py:154-181) in value and grads.
3. posenet_apply_train vs PoseNet.apply(train=True) at p=0: full-model parity
   in value and param grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rohm_tpu.models.posenet import PoseNet
from rohm_tpu.ops.transformer_layer_train import (
    fused_train_layer,
    gen_dropout_masks,
    posenet_apply_train,
    reference_layer,
)

B, S, D, F, H = 4, 9, 32, 64, 4


def _layer_params(key):
    """A random flax-layout encoder-layer scope dict."""
    ks = jax.random.split(key, 12)
    dh = D // H
    n = lambda k, sh, sc=0.3: (jax.random.normal(k, sh) * sc).astype(jnp.float32)
    return {
        "MultiHeadDotProductAttention_0": {
            "query": {"kernel": n(ks[0], (D, H, dh)), "bias": n(ks[1], (H, dh), 0.05)},
            "key": {"kernel": n(ks[2], (D, H, dh)), "bias": n(ks[3], (H, dh), 0.05)},
            "value": {"kernel": n(ks[4], (D, H, dh)), "bias": n(ks[5], (H, dh), 0.05)},
            "out": {"kernel": n(ks[6], (H, dh, D)), "bias": n(ks[7], (D,), 0.05)},
        },
        "LayerNorm_0": {"scale": jnp.ones(D) + n(ks[8], (D,), 0.1), "bias": n(ks[8], (D,), 0.1)},
        "Dense_0": {"kernel": n(ks[9], (D, F)), "bias": n(ks[9], (F,), 0.05)},
        "Dense_1": {"kernel": n(ks[10], (F, D)), "bias": n(ks[10], (D,), 0.05)},
        "LayerNorm_1": {"scale": jnp.ones(D) + n(ks[11], (D,), 0.1), "bias": n(ks[11], (D,), 0.1)},
    }


def _seed(i=0):
    return jax.random.key_data(jax.random.key(i, impl="rbg"))


@pytest.mark.parametrize("p", [0.0, 0.25])
def test_forward_matches_mirror(p):
    layer = _layer_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
    seed = _seed(3)
    y = fused_train_layer(layer, x, seed, num_heads=H, dropout_p=p, dtype=jnp.float32)
    masks = gen_dropout_masks(seed, B, S, D, F, H, p)
    y_ref = reference_layer(layer, x, masks, num_heads=H, dropout_p=p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("p", [0.0, 0.25])
def test_grads_match_mirror(p):
    """Every parameter gradient + dx vs the mirror with identical masks."""
    layer = _layer_params(jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (B, S, D))
    seed = _seed(7)
    masks = gen_dropout_masks(seed, B, S, D, F, H, p)
    # a non-trivial scalar readout so every output coordinate matters
    w_out = jax.random.normal(jax.random.PRNGKey(8), (B, S, D))

    def loss_fused(layer, x):
        y = fused_train_layer(layer, x, seed, num_heads=H, dropout_p=p, dtype=jnp.float32)
        return jnp.sum(y * w_out)

    def loss_ref(layer, x):
        return jnp.sum(reference_layer(layer, x, masks, num_heads=H, dropout_p=p) * w_out)

    (gl_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(layer, x)
    (gl_r, gx_r) = jax.grad(loss_ref, argnums=(0, 1))(layer, x)

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=5e-4, rtol=1e-4)
    flat_f = jax.tree.leaves_with_path(gl_f)
    flat_r = dict(jax.tree.leaves_with_path(gl_r))
    assert len(flat_f) == 16  # 8 attn + 4 LN + 4 dense leaves all present
    for path, leaf_f in flat_f:
        leaf_r = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_r), atol=5e-4, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_matches_flax_layer_at_p0():
    """At p=0 the fused layer equals the real flax TransformerEncoderLayer."""
    from rohm_tpu.models.blocks import TransformerEncoderLayer

    mod = TransformerEncoderLayer(D, H, F, dropout=0.1)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D))
    variables = mod.init(jax.random.PRNGKey(3), x)
    layer = variables["params"]

    y_flax = mod.apply(variables, x)  # train=False -> no dropout
    y_fused = fused_train_layer(
        layer, x, _seed(4), num_heads=H, dropout_p=0.0, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_flax), atol=2e-5, rtol=1e-5)

    def lf(params):
        return jnp.sum(jnp.sin(mod.apply({"params": params}, x)))

    def lk(params):
        return jnp.sum(jnp.sin(fused_train_layer(
            params, x, _seed(4), num_heads=H, dropout_p=0.0, dtype=jnp.float32)))

    g_flax = jax.grad(lf)(layer)
    g_fused = jax.grad(lk)(layer)
    for path, leaf_f in jax.tree.leaves_with_path(g_fused):
        leaf_r = dict(jax.tree.leaves_with_path(g_flax))[path]
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_r), atol=1e-3, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_posenet_apply_train_matches_flax_at_p0():
    model = PoseNet(
        body_feat_dim=40, pose_feat_dim=18, traj_feat_dim=22, latent_dim=D,
        ff_size=F, num_layers=2, num_heads=H, dropout=0.0,
    )
    x_t = jax.random.normal(jax.random.PRNGKey(1), (B, S, 40))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, S, 40))
    t = jnp.arange(B)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x_t, cond, t)
    key = jax.random.key(9, impl="rbg")

    y_flax = model.apply(params, x_t, cond, t)
    y_fused = posenet_apply_train(
        params, x_t, cond, t, key, num_layers=2, num_heads=H,
        dropout_p=0.0, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_flax), atol=5e-5, rtol=1e-5)

    def lf(p):
        return jnp.mean(model.apply(p, x_t, cond, t) ** 2)

    def lk(p):
        return jnp.mean(posenet_apply_train(
            p, x_t, cond, t, key, num_layers=2, num_heads=H,
            dropout_p=0.0, dtype=jnp.float32) ** 2)

    g_flax = jax.grad(lf)(params)
    g_fused = jax.grad(lk)(params)
    flat_r = dict(jax.tree.leaves_with_path(g_flax))
    for path, leaf_f in jax.tree.leaves_with_path(g_fused):
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(flat_r[path]), atol=1e-3, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_bf16_mode_close_to_f32():
    """The bf16 GEMM mode stays within bf16 rounding of the f32 kernel."""
    layer = _layer_params(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (B, S, D))
    seed = _seed(13)
    y32 = fused_train_layer(layer, x, seed, num_heads=H, dropout_p=0.1, dtype=jnp.float32)
    y16 = fused_train_layer(layer, x, seed, num_heads=H, dropout_p=0.1, dtype=jnp.bfloat16)
    assert float(jnp.max(jnp.abs(y32 - y16))) < 0.15
    assert float(jnp.mean(jnp.abs(y32 - y16))) < 0.02


def test_dropout_masks_regenerate_identically():
    seed = _seed(21)
    m1 = gen_dropout_masks(seed, B, S, D, F, H, 0.1)
    m2 = gen_dropout_masks(seed, B, S, D, F, H, 0.1)
    for a, b in zip(m1, m2):
        assert (np.asarray(a) == np.asarray(b)).all()
    frac = float(np.mean(np.asarray(m1[0], np.float32)))
    assert 0.85 < frac < 0.95  # keep-prob 0.9
