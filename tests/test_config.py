"""Config-system parity: the REFERENCE repo's YAMLs load unmodified
(same keys, same coercions, incl. the `0.0002 / 40` string-arithmetic
quirk, reference configs/dnerf/lego.yaml:53), and train.py reproduces the
reference CLI precedence: argparse defaults < CLI flags < YAML < a
post-YAML --override escape hatch (reference train.py:381-390 merges the
YAML last)."""

import glob
import os
import sys

import pytest

from fourdgs_tpu.config import load_config

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/*/*.yaml"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUR_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yaml")))


@pytest.mark.skipif(not REF_CONFIGS, reason="reference not mounted")
@pytest.mark.parametrize("path", REF_CONFIGS, ids=os.path.basename)
def test_reference_yaml_loads_unmodified(path):
    cfg = load_config(path)
    # The string-arithmetic quirk must coerce to a float.
    assert isinstance(cfg.optimization.densify_grad_t_threshold, float)
    assert cfg.optimization.densify_grad_t_threshold == pytest.approx(
        0.0002 / 40)
    assert cfg.gaussian_dim in (3, 4)
    assert cfg.batch_size >= 1


@pytest.mark.parametrize("path", OUR_CONFIGS, ids=os.path.basename)
def test_shipped_yaml_loads(path):
    cfg = load_config(path)
    assert cfg.model.source_path != "" or True  # loads without KeyError


def test_unknown_yaml_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("definitely_not_a_key: 1\n")
    with pytest.raises(KeyError):
        load_config(str(bad))


def test_cli_precedence_yaml_wins(tmp_path):
    sys.path.insert(0, REPO)
    try:
        from train import build_config, parse_args
    finally:
        sys.path.pop(0)
    yml = tmp_path / "scene.yaml"
    yml.write_text("batch_size: 5\nnum_pts: 1234\n")
    # YAML overrides an explicit CLI flag (the reference's merge order).
    args = parse_args(["--config", str(yml), "--batch_size", "9",
                       "--seed", "42", "--rot_4d",
                       "--checkpoint_iterations", "100", "200"])
    cfg = build_config(args)
    assert cfg.batch_size == 5          # YAML beat the CLI flag
    assert cfg.num_pts == 1234
    assert cfg.seed == 42               # CLI survives keys YAML omits
    assert cfg.rot_4d is True
    assert cfg.checkpoint_iterations == [100, 200]
    # --override is applied after the YAML.
    args2 = parse_args(["--config", str(yml), "--override",
                        "batch_size=7", "optimization.lambda_rigid=0.5"])
    cfg2 = build_config(args2)
    assert cfg2.batch_size == 7
    assert cfg2.optimization.lambda_rigid == 0.5
