"""Config-parser tests: YAML defaults, CLI override, reference bool parsing."""

from rohm_tpu.utils.config import ConfigParser, str2bool


def _parser():
    p = ConfigParser("t")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--name", type=str, default="x")
    p.add_argument("--flag", type=bool, default=False)
    p.add_argument("--count", type=int, default=3)
    return p


def test_defaults():
    args = _parser().parse_args([])
    assert args.alpha == 1.0 and args.name == "x" and args.flag is False and args.count == 3


def test_yaml_defaults_and_cli_override(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("alpha: 2.5\nflag: True\nname: yam\nextra_key: 7\n")
    args = _parser().parse_args([f"--config={cfg}", "--name=cli"])
    assert args.alpha == 2.5          # yaml beats default
    assert args.flag is True
    assert args.name == "cli"         # cli beats yaml
    assert args.extra_key == 7        # unknown yaml keys pass through


def test_reference_bool_convention():
    # reference: lambda x: x.lower() in ['true', '1']
    assert str2bool("True") and str2bool("1") and str2bool("true")
    assert not str2bool("False") and not str2bool("0") and not str2bool("no")
    args = _parser().parse_args(["--flag=1"])
    assert args.flag is True
    args = _parser().parse_args(["--flag=false"])
    assert args.flag is False


def test_fused_mode_parser():
    """--fused_posenet accepts bools (reference-style) and kernel names."""
    from rohm_tpu.utils.config import fused_mode

    assert fused_mode("True") is True
    assert fused_mode("false") is False
    assert fused_mode("int8") == "int8"
    assert fused_mode("bf16") == "bf16"
    assert fused_mode("f32") == "f32"
    assert fused_mode(True) is True
