"""CLI surface: every reference script has a subcommand; argument plumbing."""
import pytest

from vistaf_tpu.runner import cli


def test_cli_subcommands_exist():
    # --help on each subcommand must not raise (SystemExit 0)
    for cmd in ["force", "temperature", "multimodal", "train-p2h", "train-h2f",
                "train-temp-color", "train-temp-black", "pretest"]:
        with pytest.raises(SystemExit) as e:
            cli.main([cmd, "--help"])
        assert e.value.code == 0


def test_cli_requires_args():
    with pytest.raises(SystemExit) as e:
        cli.main(["force"])  # missing --ref/--def
    assert e.value.code != 0


def test_cli_preset_builds_deploy_configs():
    """--preset deploy must hand the pipelines the .deploy() presets."""
    import argparse
    from vistaf_tpu.runner.cli import _cfgs
    from vistaf_tpu.config import FTPConfig, TempConfig

    ns = argparse.Namespace(preset="deploy")
    fcfg, tcfg = _cfgs(ns)
    assert fcfg == FTPConfig().deploy()
    assert tcfg == TempConfig().deploy()
    assert tcfg.rotate_method == "shear" and tcfg.crop_compute

    ns = argparse.Namespace(preset="parity")
    fcfg, tcfg = _cfgs(ns)
    assert fcfg == FTPConfig() and tcfg == TempConfig()
