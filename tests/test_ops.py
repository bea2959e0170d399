"""Pallas fused-transformer-layer parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rohm_tpu.models import PoseNet
from rohm_tpu.models.blocks import TransformerEncoderLayer
from rohm_tpu.ops import fused_encoder_layer, posenet_apply_fused

D, HEADS, FF, LAYERS = 64, 4, 128, 2
B, T = 2, 15


@pytest.fixture(scope="module")
def posenet_setup():
    model = PoseNet(latent_dim=D, ff_size=FF, num_layers=LAYERS, num_heads=HEADS, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 294))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, T, 294))
    t = jnp.array([5, 900])
    params = model.init(jax.random.PRNGKey(0), x, cond, t)
    return model, params, x, cond, t


def test_fused_layer_matches_flax(posenet_setup):
    _, params, *_ = posenet_setup
    layer_params = params["params"]["layer_0"]
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T + 1, D))

    flax_layer = TransformerEncoderLayer(D, HEADS, FF, dropout=0.0)
    ref = flax_layer.apply({"params": layer_params}, x, train=False)
    out = fused_encoder_layer(x, layer_params, num_heads=HEADS, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_posenet_fused_matches_flax(posenet_setup):
    model, params, x, cond, t = posenet_setup
    ref = model.apply(params, x, cond, t)
    out = posenet_apply_fused(
        params, x, cond, t, num_layers=LAYERS, num_heads=HEADS, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_sampler_integration(posenet_setup):
    """make_posenet_sampler(fused=True) runs the scan through the kernel."""
    from rohm_tpu.diffusion import make_schedule
    from rohm_tpu.train.steps import make_posenet_sampler

    model, params, x, cond, t = posenet_setup
    sched = make_schedule("cosine", 6)
    s_flax = make_posenet_sampler(model, sched, fused=False)
    s_fused = make_posenet_sampler(model, sched, fused=True)
    key = jax.random.PRNGKey(0)
    out_flax = np.asarray(s_flax(params, cond, key))
    out_fused = np.asarray(s_fused(params, cond, key))
    # same PRNG stream + numerically-equivalent model -> near-identical chains
    np.testing.assert_allclose(out_fused, out_flax, atol=1e-3, rtol=1e-3)


class TestBf16Fused:
    """bf16 production kernel (transformer_layer_bf16): parity with the flax
    path within the bf16 rounding envelope, exercised in interpret mode."""

    def test_layer_matches_flax_bf16_envelope(self, posenet_setup):
        from rohm_tpu.ops import fused_encoder_layer_bf16
        from rohm_tpu.ops.transformer_layer_bf16 import prepare_layer_bf16

        _, params, *_ = posenet_setup
        layer_params = params["params"]["layer_0"]
        x = jax.random.normal(jax.random.PRNGKey(3), (B, 16, D))

        flax_layer = TransformerEncoderLayer(D, HEADS, FF, dropout=0.0)
        ref = np.asarray(flax_layer.apply({"params": layer_params}, x, train=False))
        prepared = prepare_layer_bf16(layer_params)
        out = np.asarray(
            fused_encoder_layer_bf16(
                x.astype(jnp.bfloat16), prepared, num_heads=HEADS, interpret=True
            ).astype(jnp.float32)
        )
        # bf16 activations: ~8e-3 relative rounding; post-LN output is O(1)
        np.testing.assert_allclose(out, ref, atol=6e-2)
        assert np.abs(out - ref).mean() < 1e-2

    def test_posenet_prepared_matches_flax(self, posenet_setup):
        from rohm_tpu.ops import (
            embed_cond,
            posenet_apply_prepared,
            prepare_posenet_fused,
        )

        model, params, x, cond, t = posenet_setup
        ref = np.asarray(model.apply(params, x, cond, t))
        prep = prepare_posenet_fused(params, num_layers=LAYERS)
        out = np.asarray(
            posenet_apply_prepared(prep, x, cond, t, num_heads=HEADS, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=6e-2)
        assert np.abs(out - ref).mean() < 1e-2
        # traj passthrough dims must be exact (copied from cond, not computed)
        np.testing.assert_array_equal(out[..., :22], np.asarray(cond)[..., :22])
        # hoisted cond embedding is bit-identical to inline
        out2 = np.asarray(
            posenet_apply_prepared(
                prep, x, cond, t, num_heads=HEADS, interpret=True,
                cond_emb=embed_cond(prep, cond),
            )
        )
        np.testing.assert_array_equal(out, out2)


class TestInt8Fused:
    """int8 W8A8 throughput kernel (transformer_layer_int8): parity with the
    flax path within the int8 quantization envelope (~5x the bf16 one;
    measured on TPU at production scale: 0.11 max / 0.017 mean vs flax)."""

    def test_layer_matches_flax_int8_envelope(self, posenet_setup):
        from rohm_tpu.ops import fused_encoder_layer_int8
        from rohm_tpu.ops.transformer_layer_int8 import prepare_layer_int8

        _, params, *_ = posenet_setup
        layer_params = params["params"]["layer_0"]
        x = jax.random.normal(jax.random.PRNGKey(3), (B, 16, D))

        flax_layer = TransformerEncoderLayer(D, HEADS, FF, dropout=0.0)
        ref = np.asarray(flax_layer.apply({"params": layer_params}, x, train=False))
        prepared = prepare_layer_int8(layer_params)
        out = np.asarray(
            fused_encoder_layer_int8(
                x.astype(jnp.bfloat16), prepared, num_heads=HEADS, interpret=True
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(out, ref, atol=0.3)
        assert np.abs(out - ref).mean() < 5e-2

    def test_posenet_prepared_dispatches_int8(self, posenet_setup):
        """posenet_apply_prepared picks the int8 kernel from the prepared
        tree's structure (16-tuple layers) — no mode flag in the pytree."""
        from rohm_tpu.ops import posenet_apply_prepared, prepare_posenet_int8

        model, params, x, cond, t = posenet_setup
        ref = np.asarray(model.apply(params, x, cond, t))
        prep = prepare_posenet_int8(params, num_layers=LAYERS, mega=False)
        assert len(prep["layers"][0]) == 16
        out = np.asarray(
            posenet_apply_prepared(prep, x, cond, t, num_heads=HEADS, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=0.3)
        assert np.abs(out - ref).mean() < 5e-2
        # traj passthrough dims must be exact (copied from cond, not computed)
        np.testing.assert_array_equal(out[..., :22], np.asarray(cond)[..., :22])

    def test_mega_stack_matches_per_layer(self, posenet_setup):
        """The whole-stack program (layers_stacked) computes the same math as
        chaining per-layer int8 kernels."""
        from rohm_tpu.ops import posenet_apply_prepared, prepare_posenet_int8

        model, params, x, cond, t = posenet_setup
        prep_mega = prepare_posenet_int8(params, num_layers=LAYERS, mega=True)
        prep_per = prepare_posenet_int8(params, num_layers=LAYERS, mega=False)
        assert "layers_stacked" in prep_mega and len(prep_mega["layers_stacked"]) == 16
        out_mega = np.asarray(
            posenet_apply_prepared(prep_mega, x, cond, t, num_heads=HEADS, interpret=True)
        )
        out_per = np.asarray(
            posenet_apply_prepared(prep_per, x, cond, t, num_heads=HEADS, interpret=True)
        )
        np.testing.assert_allclose(out_mega, out_per, atol=2e-5)

    def test_int8_prep_is_jit_argument_safe(self, posenet_setup):
        """The prepared tree must pass through jit as a pytree ARGUMENT
        (pipeline weights contract) — no string leaves, stable structure."""
        from rohm_tpu.ops import posenet_apply_prepared, prepare_posenet_int8

        model, params, x, cond, t = posenet_setup
        prep = prepare_posenet_int8(params, num_layers=LAYERS)

        @jax.jit
        def run(prep, x, cond, t):
            return posenet_apply_prepared(prep, x, cond, t, num_heads=HEADS, interpret=True)

        out = run(prep, x, cond, t)
        assert np.isfinite(np.asarray(out)).all()


class TestInt8QuantizedAttention:
    """Experimental qattn variant: attention GEMMs on the int8 MXU
    (scores via per-row-quantized q/k, probs at fixed 1/127 scale x
    per-column-quantized V). Must stay within the int8 envelope vs flax and
    close to the bf16-attention int8 kernel."""

    def test_qattn_layer_envelope(self, posenet_setup):
        from rohm_tpu.ops import fused_encoder_layer_int8
        from rohm_tpu.ops.transformer_layer_int8 import prepare_layer_int8

        _, params, *_ = posenet_setup
        layer_params = params["params"]["layer_0"]
        x = jax.random.normal(jax.random.PRNGKey(3), (B, 16, D))

        flax_layer = TransformerEncoderLayer(D, HEADS, FF, dropout=0.0)
        ref = np.asarray(flax_layer.apply({"params": layer_params}, x, train=False))
        prepared = prepare_layer_int8(layer_params)
        out_q = np.asarray(
            fused_encoder_layer_int8(
                x.astype(jnp.bfloat16), prepared, num_heads=HEADS,
                interpret=True, qattn=True,
            ).astype(jnp.float32)
        )
        out_b = np.asarray(
            fused_encoder_layer_int8(
                x.astype(jnp.bfloat16), prepared, num_heads=HEADS, interpret=True
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(out_q, ref, atol=0.3)
        assert np.abs(out_q - ref).mean() < 5e-2
        # qattn vs bf16-attention int8: difference bounded by probs/V quant
        assert np.abs(out_q - out_b).mean() < 2e-2

    def test_qattn_prep_dispatch(self, posenet_setup):
        """prepare_posenet_int8(qattn=True) marks the tree structurally and
        posenet_apply_prepared routes through attention_int8."""
        from rohm_tpu.ops import posenet_apply_prepared, prepare_posenet_int8

        model, params, x, cond, t = posenet_setup
        ref = np.asarray(model.apply(params, x, cond, t))
        prep = prepare_posenet_int8(params, num_layers=LAYERS, qattn=True)
        assert "layers_qattn" in prep and "layers" not in prep

        @jax.jit
        def run(prep, x, cond, t):
            return posenet_apply_prepared(prep, x, cond, t, num_heads=HEADS, interpret=True)

        out = np.asarray(run(prep, x, cond, t))
        np.testing.assert_allclose(out, ref, atol=0.3)
        assert np.abs(out - ref).mean() < 5e-2
        np.testing.assert_array_equal(out[..., :22], np.asarray(cond)[..., :22])
