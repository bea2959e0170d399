"""Shared CLI plumbing: body-model resolution, dataset lists, model builders,
checkpoint load/bootstrap. Mirrors reference entry-script behavior
(train_trajnet.py:82-194, test_amass_full.py:77-188)."""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from rohm_tpu.body import SmplxModel, load_smplx_npz, synthetic_model
from rohm_tpu.models import PoseNet, TrajNet

log = logging.getLogger("rohm_tpu.cli")

# reference train_trajnet.py:86-92
AMASS_TRAIN_DATASETS = [
    "HumanEva", "HDM05", "MoSh", "Transitions", "ACCAD", "BMLhandball",
    "BMLmovi", "BMLrub", "CMU", "DFaust", "Eyes_Japan_Dataset", "PosePrior",
    "SSM", "GRAB", "SOMA",
]
AMASS_TEST_DATASETS = ["TCDHands", "TotalCapture", "SFU"]


def resolve_body_model(body_model_path: str, gender: str = "neutral") -> SmplxModel:
    """Load SMPL-X weights if present, else fall back to the synthetic test
    model (real SMPL-X weights are license-gated and may be absent)."""
    candidates = [
        body_model_path,
        os.path.join(body_model_path, f"SMPLX_{gender.upper()}.npz"),
        os.path.join(body_model_path, "smplx", f"SMPLX_{gender.upper()}.npz"),
    ]
    for c in candidates:
        if os.path.isfile(c) and c.endswith(".npz"):
            log.info("loading SMPL-X model from %s", c)
            return load_smplx_npz(c)
    log.warning(
        "SMPL-X weights not found under %s — using the synthetic body model "
        "(shapes/kinematics identical; joint outputs are NOT SMPL-X-accurate)",
        body_model_path,
    )
    return synthetic_model()


def _model_dtype(args):
    """Opt-in compute dtype (params/outputs stay f32; norm stats f32).

    Measured on v5e at bs=64: bf16 is +29% on the PoseNet train step
    (30.7 -> 39.5 steps/s) but -35% on the TrajNet conv U-Net (layout casts
    around f32 GroupNorm dominate), so it is a per-script flag, default f32."""
    name = getattr(args, "model_dtype", None) or "float32"
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def build_trajnet(args, traj_feat_dim: int, trajcontrol: bool = False) -> TrajNet:
    """Hyperparameters as constructed by the reference entry scripts
    (train_trajnet.py:128-142: time_dim=32, mid_dim=512)."""
    return TrajNet(
        traj_feat_dim=traj_feat_dim,
        cond_dim=traj_feat_dim,
        mid_dim=getattr(args, "mid_dim", None) or 512,
        time_dim=32,
        trajcontrol=trajcontrol,
        dtype=_model_dtype(args),
    )


def build_posenet(args) -> PoseNet:
    """Reference train_posenet.py:116-128: latent 512, ff 1024, 8 layers, 4 heads."""
    return PoseNet(
        latent_dim=getattr(args, "latent_dim", None) or 512,
        ff_size=1024,
        num_layers=8,
        num_heads=4,
        dropout=0.1,
        dtype=_model_dtype(args),
    )


def init_trajnet_params(model: TrajNet, clip_len: int, seed: int = 0):
    t = clip_len - 1
    d = model.traj_feat_dim
    kwargs = {}
    if model.trajcontrol:
        kwargs["control_cond"] = jnp.zeros((1, t, model.control_cond_dim))
    # jitted init: one compiled program instead of per-op dispatch (critical
    # on remote-tunneled devices where each eager op is a network roundtrip)
    return jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, t, d)), jnp.zeros((1, t, model.cond_dim)),
        jnp.zeros((1,), jnp.int32), **kwargs,
    )


def init_posenet_params(model: PoseNet, clip_len: int, seed: int = 0):
    t = clip_len - 1
    return jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, t, model.body_feat_dim)),
        jnp.zeros((1, t, model.body_feat_dim)),
        jnp.zeros((1,), jnp.int32),
    )


def bootstrap_trajcontrol(params_control, params_backbone):
    """Copy the pretrained U-Net into a trajcontrol model's params: backbone
    weights verbatim, plus the diffusion encoder + mid blocks duplicated into
    the ControlNet branch (reference train_trajnet.py:149-164). Zero convs
    stay zero-initialized.

    Flax naming (call order in TrajNet.__call__): ResidualTemporalBlock_0..3 =
    encoder, _4.._5 = mid, Downsample1d_0..3 = encoder downsamples — the same
    indices the ControlNet branch uses for its copies.
    """
    import flax

    flat_c = flax.traverse_util.flatten_dict(params_control)
    flat_b = flax.traverse_util.flatten_dict(params_backbone)

    out = dict(flat_c)
    for key, val in flat_b.items():
        if key in out:
            out[key] = val  # backbone weights (cond enc, unet, time mlp, final)
    # encoder + mid copies into the ControlNet scope
    for key, val in flat_b.items():
        name = key[1]  # ('params', 'ResidualTemporalBlock_0', ...)
        if name.startswith("ResidualTemporalBlock_"):
            idx = int(name.split("_")[-1])
            if idx <= 5:  # enc1-4 + mid1-2
                ckey = (key[0], "ControlNet_0", name) + key[2:]
                if ckey in out:
                    out[ckey] = val
        elif name.startswith("Downsample1d_"):
            idx = int(name.split("_")[-1])
            if idx <= 3:
                ckey = (key[0], "ControlNet_0", name) + key[2:]
                if ckey in out:
                    out[ckey] = val
    return flax.traverse_util.unflatten_dict(out)


def load_pretrained(params_like, path: str, allow_partial: bool = False):
    """Load an orbax checkpoint (or a torch->jax converted .npz) into params.

    Strict by default, matching the reference's torch.load + load_state_dict
    (train_trajnet.py:144-164, strict except the documented TrajControl
    graft): a key expected by the model but absent from the .npz raises —
    silently keeping random init for that leaf would produce garbage metrics
    with rc=0. Unused file keys only warn (forward-compat)."""
    from rohm_tpu.train.checkpoint import load_params_into

    if path.endswith(".npz"):
        flat = dict(np.load(path))
        import flax

        like_flat = flax.traverse_util.flatten_dict(params_like, sep="/")
        missing = sorted(k for k in like_flat if k not in flat)
        unused = sorted(k for k in flat if k not in like_flat)
        if missing and not allow_partial:
            raise KeyError(
                f"checkpoint {path} is missing {len(missing)} parameter(s) the "
                f"model expects (converter drift or wrong architecture flags): "
                f"{missing[:8]}{'...' if len(missing) > 8 else ''}. "
                "Pass allow_partial=True only for intentional partial loads."
            )
        if missing:
            log.warning("partial load from %s: %d key(s) keep random init: %s",
                        path, len(missing), missing[:8])
        if unused:
            log.warning("checkpoint %s has %d key(s) the model does not use: %s",
                        path, len(unused), unused[:8])
        out = {}
        for k, v in like_flat.items():
            out[k] = flat[k] if k in flat else v
        return flax.traverse_util.unflatten_dict(out, sep="/")
    return load_params_into(params_like, path)


def maybe_via_server(cmd: str, args, argv):
    """--via_server relay: forward this CLI invocation (minus the flag) to the
    resident server (rohm_tpu/serve). Returns (handled, result).

    Inside the daemon the env guard short-circuits: a YAML config with
    `via_server: true` reparsed server-side must run locally, not recurse
    into relaying (which would spawn daemons unboundedly — the daemon's
    socket is busy with THIS request, so the ping would time out and
    ensure_server would Popen a fresh daemon per recursion level)."""
    if os.environ.get("ROHM_TPU_IN_SERVER"):
        return False, None
    if not getattr(args, "via_server", False):
        return False, None
    import sys

    from rohm_tpu.serve import run_cli
    from rohm_tpu.utils.config import strip_flag

    fwd = strip_flag(list(argv if argv is not None else sys.argv[1:]), "--via_server")
    return True, run_cli(cmd, fwd)


def load_or_init(model, init_fn, path: str, clip_len: int, seed: int = 0,
                 allow_missing: bool = False, name: str = "model"):
    """Init params, then load `path` if given. A given-but-nonexistent path
    RAISES (reference behavior: torch.load fails loudly on a typo'd
    --model_path); an empty path means intentional random init (synthetic /
    smoke runs). `allow_missing` downgrades the raise to a loud warning."""
    params = init_fn(model, clip_len, seed)
    if not path:
        return params
    if not os.path.exists(path):
        if allow_missing:
            log.warning(
                "%s checkpoint %s not found — proceeding with RANDOM-INIT "
                "weights (allow_missing_ckpt=True)", name, path,
            )
            return params
        raise FileNotFoundError(
            f"{name} checkpoint not found: {path!r}. Fix the path, or pass "
            "--allow_missing_ckpt=True to run with random-init weights."
        )
    return load_pretrained(params, path)
