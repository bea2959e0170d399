"""Checkpoint loading must fail loudly (VERDICT r2 #4).

Reference behavior: torch.load raises on a bad path and load_state_dict is
strict except the documented TrajControl graft (train_trajnet.py:144-164).
A typo'd --model_path or converter drift must abort, not silently produce
random-init weights and garbage metrics with rc=0.
"""

import numpy as np
import pytest

from rohm_tpu.cli.common import (
    build_posenet,
    init_posenet_params,
    load_or_init,
    load_pretrained,
)


class _Args:
    latent_dim = 32
    model_dtype = "float32"


def _tiny_posenet_params():
    model = build_posenet(_Args())
    return model, init_posenet_params(model, clip_len=9)


def test_missing_ckpt_path_raises(tmp_path):
    model, _ = _tiny_posenet_params()
    with pytest.raises(FileNotFoundError, match="allow_missing_ckpt"):
        load_or_init(model, init_posenet_params, str(tmp_path / "nope.npz"), 9)


def test_missing_ckpt_path_allowed_when_opted_in(tmp_path):
    model, params = _tiny_posenet_params()
    got = load_or_init(model, init_posenet_params, str(tmp_path / "nope.npz"), 9,
                       allow_missing=True)
    # random init with the same seed: identical leaves
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_path_means_random_init():
    model, _ = _tiny_posenet_params()
    assert load_or_init(model, init_posenet_params, "", 9) is not None


def test_npz_missing_key_raises(tmp_path):
    import flax

    model, params = _tiny_posenet_params()
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    flat = {k: np.asarray(v) for k, v in flat.items()}
    victim = sorted(flat)[0]
    del flat[victim]
    p = tmp_path / "partial.npz"
    np.savez(p, **flat)
    with pytest.raises(KeyError, match="missing 1 parameter"):
        load_pretrained(params, str(p))
    # explicit opt-in keeps the old partial-load behavior
    out = load_pretrained(params, str(p), allow_partial=True)
    assert out is not None


def test_npz_exact_roundtrip(tmp_path):
    import flax
    import jax

    model, params = _tiny_posenet_params()
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    p = tmp_path / "full.npz"
    np.savez(p, **{k: np.asarray(v) for k, v in flat.items()})
    out = load_pretrained(params, str(p))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
