"""Torch -> flax checkpoint conversion for the released RoHM weights.

Maps reference state_dict names (model/trajnet.py:80-175, model/posenet.py:11-96,
model/heads.py) onto this framework's flax param trees and saves an .npz the
CLIs load via `load_pretrained` (slash-separated flat keys). Layout rules:

  Linear  weight [out, in]        -> Dense kernel [in, out]      (transpose)
  Conv1d  weight [out, in, k]     -> Conv kernel [k, in, out]    (transpose 2,1,0)
  ConvT1d weight [in, out, k]     -> Upsample1d kernel [k, in, out] (transpose
                                     2,0,1; flip is applied at forward time)
  GroupNorm/LayerNorm weight/bias -> scale/bias
  MHA in_proj [3D, D]             -> query/key/value kernels [D, H, D/H]
  MHA out_proj [D, D]             -> out kernel [H, D/H, D]

Usage:
  python -m rohm_tpu.utils.convert_torch_ckpt --model=trajnet \
      --torch_path=model000450000.pt --out_path=trajnet.npz \
      [--trajcontrol=True] [--mid_dim=512] [--traj_feat_dim=13]
"""

from __future__ import annotations

import argparse

import numpy as np


def _conv(w):  # torch Conv1d [out, in, k] -> flax [k, in, out]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _dense(w):  # torch Linear [out, in] -> flax [in, out]
    return np.ascontiguousarray(np.asarray(w).T)


def _convT(w):  # torch ConvTranspose1d [in, out, k] -> [k, in, out]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 0, 1)))


def _rtb(src: dict, prefix: str, has_time: bool, has_res: bool) -> dict:
    """ResidualTemporalBlock params (heads.py:20-54) -> flax RTB scope."""
    out = {
        "Conv1dBlock_0/Conv_0/kernel": _conv(src[f"{prefix}.blocks.0.block.0.weight"]),
        "Conv1dBlock_0/Conv_0/bias": np.asarray(src[f"{prefix}.blocks.0.block.0.bias"]),
        "Conv1dBlock_0/GroupNorm_0/scale": np.asarray(src[f"{prefix}.blocks.0.block.2.weight"]),
        "Conv1dBlock_0/GroupNorm_0/bias": np.asarray(src[f"{prefix}.blocks.0.block.2.bias"]),
        "Conv1dBlock_1/Conv_0/kernel": _conv(src[f"{prefix}.blocks.1.block.0.weight"]),
        "Conv1dBlock_1/Conv_0/bias": np.asarray(src[f"{prefix}.blocks.1.block.0.bias"]),
        "Conv1dBlock_1/GroupNorm_0/scale": np.asarray(src[f"{prefix}.blocks.1.block.2.weight"]),
        "Conv1dBlock_1/GroupNorm_0/bias": np.asarray(src[f"{prefix}.blocks.1.block.2.bias"]),
    }
    if has_time:
        out["Dense_0/kernel"] = _dense(src[f"{prefix}.time_mlp.1.weight"])
        out["Dense_0/bias"] = np.asarray(src[f"{prefix}.time_mlp.1.bias"])
    if has_res:
        out["Conv_0/kernel"] = _conv(src[f"{prefix}.residual_conv.weight"])
        out["Conv_0/bias"] = np.asarray(src[f"{prefix}.residual_conv.bias"])
    return out


def _downsample(src: dict, prefix: str) -> dict:
    return {
        "Conv_0/kernel": _conv(src[f"{prefix}.conv.weight"]),
        "Conv_0/bias": np.asarray(src[f"{prefix}.conv.bias"]),
    }


def _upsample(src: dict, prefix: str) -> dict:
    return {
        "kernel": _convT(src[f"{prefix}.conv.weight"]),
        "bias": np.asarray(src[f"{prefix}.conv.bias"]),
    }


def _emit(flat: dict, scope: str, sub: dict):
    for k, v in sub.items():
        flat[f"{scope}/{k}"] = v


def _has(src, prefix):
    return any(k.startswith(prefix + ".") for k in src)


def _unet_branch(src: dict, flat: dict, torch_prefix: str, flax_scope: str):
    """Shared mapping of a diffuser-U-Net branch (diff_* or controlnet.control_*)."""
    p = lambda name: f"{torch_prefix}{name}"
    s = (flax_scope + "/") if flax_scope else ""
    for i in range(1, 5):
        _emit(flat, f"{s}ResidualTemporalBlock_{i - 1}",
              _rtb(src, p(f"enc{i}"), True, _has(src, p(f"enc{i}") + ".residual_conv")))
        if _has(src, p(f"downsample{i}")):
            _emit(flat, f"{s}Downsample1d_{i - 1}", _downsample(src, p(f"downsample{i}")))
    _emit(flat, f"{s}ResidualTemporalBlock_4",
          _rtb(src, p("mid_block1"), True, _has(src, p("mid_block1") + ".residual_conv")))
    _emit(flat, f"{s}ResidualTemporalBlock_5",
          _rtb(src, p("mid_block2"), True, _has(src, p("mid_block2") + ".residual_conv")))


def convert_trajnet(state_dict: dict, trajcontrol: bool = False) -> dict:
    """TrajNet (+ControlNet branch) state_dict -> flat flax param dict."""
    src = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = {}
    # time MLP (trajnet.py:120-125)
    _emit(flat, "TimeMlp_0", {
        "Dense_0/kernel": _dense(src["time_mlp.1.weight"]),
        "Dense_0/bias": np.asarray(src["time_mlp.1.bias"]),
        "Dense_1/kernel": _dense(src["time_mlp.3.weight"]),
        "Dense_1/bias": np.asarray(src["time_mlp.3.bias"]),
    })
    # condition encoder (4 blocks, 3 downsamples used)
    for i in range(1, 5):
        _emit(flat, f"CondEncoder_0/ResidualTemporalBlock_{i - 1}",
              _rtb(src, f"cond_enc{i}", False, _has(src, f"cond_enc{i}.residual_conv")))
        if i < 4:
            _emit(flat, f"CondEncoder_0/Downsample1d_{i - 1}",
                  _downsample(src, f"cond_downsample{i}"))
    # U-Net encoder + mid
    _unet_branch(src, flat, "diff_", "")
    # decoder: diff_upsample4..1 -> Upsample1d_0..3; diff_dec4..1 -> RTB_6..9
    for slot, i in enumerate((4, 3, 2, 1)):
        _emit(flat, f"Upsample1d_{slot}", _upsample(src, f"diff_upsample{i}"))
        _emit(flat, f"ResidualTemporalBlock_{6 + slot}",
              _rtb(src, f"diff_dec{i}", True, _has(src, f"diff_dec{i}.residual_conv")))
    # final conv stack (Conv1dBlock + 1x1)
    _emit(flat, "Conv1dBlock_0", {
        "Conv_0/kernel": _conv(src["diff_final_conv.0.block.0.weight"]),
        "Conv_0/bias": np.asarray(src["diff_final_conv.0.block.0.bias"]),
        "GroupNorm_0/scale": np.asarray(src["diff_final_conv.0.block.2.weight"]),
        "GroupNorm_0/bias": np.asarray(src["diff_final_conv.0.block.2.bias"]),
    })
    flat["Conv_0/kernel"] = _conv(src["diff_final_conv.1.weight"])
    flat["Conv_0/bias"] = np.asarray(src["diff_final_conv.1.bias"])

    if trajcontrol:
        # zero conv on the control condition + copied encoder + taps
        # (reference ControlNet, trajnet.py:10-75; zero convs named
        # zero_conv_1..4/mid + input zero conv)
        cn = "ControlNet_0"
        _unet_branch(src, flat, "controlnet.control_", cn)
        # zero convs: control_zero_conv_0 (input) .. _4, _mid (trajnet.py:19-41)
        names = ["control_zero_conv_0"] + [f"control_zero_conv_{i}" for i in range(1, 5)] + [
            "control_zero_conv_mid"
        ]
        for slot, name in enumerate(names):
            _emit(flat, f"{cn}/ZeroConv1x1_{slot}", {
                "Conv_0/kernel": _conv(src[f"controlnet.{name}.weight"]),
                "Conv_0/bias": np.asarray(src[f"controlnet.{name}.bias"]),
            })
    return {f"params/{k}": v for k, v in flat.items()}


def convert_posenet(state_dict: dict, num_layers: int = 8, num_heads: int = 4,
                    latent_dim: int = 512) -> dict:
    """PoseNet state_dict -> flat flax param dict (model/posenet.py:11-96)."""
    src = {k: np.asarray(v) for k, v in state_dict.items()}
    flat = {}
    flat["Dense_0/kernel"] = _dense(src["embed_timestep.time_embed.0.weight"])
    flat["Dense_0/bias"] = np.asarray(src["embed_timestep.time_embed.0.bias"])
    flat["Dense_1/kernel"] = _dense(src["embed_timestep.time_embed.2.weight"])
    flat["Dense_1/bias"] = np.asarray(src["embed_timestep.time_embed.2.bias"])
    flat["input_process/kernel"] = _dense(src["input_process.poseEmbedding.weight"])
    flat["input_process/bias"] = np.asarray(src["input_process.poseEmbedding.bias"])
    flat["input_process_cond/kernel"] = _dense(src["input_process_cond.poseEmbedding.weight"])
    flat["input_process_cond/bias"] = np.asarray(src["input_process_cond.poseEmbedding.bias"])
    flat["output_process/kernel"] = _dense(src["output_process.poseFinal.weight"])
    flat["output_process/bias"] = np.asarray(src["output_process.poseFinal.bias"])

    d, h = latent_dim, num_heads
    hd = d // h
    for i in range(num_layers):
        p = f"seqTransEncoder.layers.{i}"
        s = f"layer_{i}"
        in_w = src[f"{p}.self_attn.in_proj_weight"]  # [3D, D]
        in_b = src[f"{p}.self_attn.in_proj_bias"]  # [3D]
        for j, name in enumerate(("query", "key", "value")):
            w = in_w[j * d : (j + 1) * d]  # [D, D] (out, in)
            b = in_b[j * d : (j + 1) * d]
            flat[f"{s}/MultiHeadDotProductAttention_0/{name}/kernel"] = (
                _dense(w).reshape(d, h, hd)
            )
            flat[f"{s}/MultiHeadDotProductAttention_0/{name}/bias"] = b.reshape(h, hd)
        out_w = src[f"{p}.self_attn.out_proj.weight"]  # [D, D] (out, in)
        flat[f"{s}/MultiHeadDotProductAttention_0/out/kernel"] = (
            _dense(out_w).reshape(h, hd, d)
        )
        flat[f"{s}/MultiHeadDotProductAttention_0/out/bias"] = np.asarray(
            src[f"{p}.self_attn.out_proj.bias"]
        )
        flat[f"{s}/LayerNorm_0/scale"] = np.asarray(src[f"{p}.norm1.weight"])
        flat[f"{s}/LayerNorm_0/bias"] = np.asarray(src[f"{p}.norm1.bias"])
        flat[f"{s}/Dense_0/kernel"] = _dense(src[f"{p}.linear1.weight"])
        flat[f"{s}/Dense_0/bias"] = np.asarray(src[f"{p}.linear1.bias"])
        flat[f"{s}/Dense_1/kernel"] = _dense(src[f"{p}.linear2.weight"])
        flat[f"{s}/Dense_1/bias"] = np.asarray(src[f"{p}.linear2.bias"])
        flat[f"{s}/LayerNorm_1/scale"] = np.asarray(src[f"{p}.norm2.weight"])
        flat[f"{s}/LayerNorm_1/bias"] = np.asarray(src[f"{p}.norm2.bias"])
    return {f"params/{k}": v for k, v in flat.items()}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=["trajnet", "posenet"], required=True)
    parser.add_argument("--torch_path", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--trajcontrol", default=False,
                        type=lambda x: str(x).lower() in ["true", "1"])
    args = parser.parse_args(argv)

    import torch

    state_dict = torch.load(args.torch_path, map_location="cpu")
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    if args.model == "trajnet":
        flat = convert_trajnet(state_dict, args.trajcontrol)
    else:
        flat = convert_posenet(state_dict)
    np.savez(args.out_path, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out_path}")


if __name__ == "__main__":
    main()
