"""End-to-end smoke of the user-facing CLI surface on the tiny preset:
train -> checkpoint -> eval (metric dumps) -> render (path frames) ->
extract (mesh) -> tsdf (fused mesh), sharing one trained checkpoint.

These are the reference's five entry points (train.py / eval.py /
render.py / extract.py / tsdf.py) driven exactly as a user would, asserting
the on-disk artifacts each one contracts to produce."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    from ucnerf_tpu.cli import train as train_cli

    exp = str(tmp_path_factory.mktemp("cli_e2e") / "exp")
    train_cli.main(["--preset", "tiny",
                    "-b", f"Config.exp_name = '{exp}'",
                    "-b", "Config.max_steps = 40",
                    "-b", "Config.checkpoint_every = 40",
                    "-b", "Config.train_render_every = 0"])
    assert os.path.isdir(os.path.join(exp, "checkpoints", "40"))
    return exp


def test_eval_cli_writes_metrics(trained_exp):
    from ucnerf_tpu.cli import eval as eval_cli

    eval_cli.main(["--preset", "tiny",
                   "-b", f"Config.exp_name = '{trained_exp}'",
                   "--limit", "1"])
    psnr_files = glob.glob(os.path.join(trained_exp, "psnr_*.txt"))
    assert psnr_files, os.listdir(trained_exp)
    vals = [float(x) for x in open(psnr_files[0]).read().split()]
    assert vals and np.isfinite(vals).all()


def test_render_cli_writes_frames(trained_exp):
    from ucnerf_tpu.cli import render as render_cli

    render_cli.main(["--preset", "tiny",
                     "-b", f"Config.exp_name = '{trained_exp}'",
                     "-b", "Config.render_path_frames = 2"])
    frames = glob.glob(os.path.join(trained_exp, "render",
                                    "path_renders_step_*", "color_*.png"))
    assert len(frames) >= 2, os.listdir(os.path.join(trained_exp, "render"))


def test_extract_cli_writes_mesh(trained_exp):
    from ucnerf_tpu.cli import extract as extract_cli

    out = os.path.join(trained_exp, "mesh.ply")
    extract_cli.main(["--preset", "tiny",
                      "-b", f"Config.exp_name = '{trained_exp}'",
                      "--resolution", "48", "--iso-density", "0.4",
                      "--out", out])
    assert os.path.exists(out)
    head = open(out, "rb").read(200)
    assert head.startswith(b"ply")


def test_tsdf_cli_writes_mesh(trained_exp):
    from ucnerf_tpu.cli import tsdf as tsdf_cli

    out = os.path.join(trained_exp, "tsdf.ply")
    tsdf_cli.main(["--preset", "tiny",
                   "-b", f"Config.exp_name = '{trained_exp}'",
                   "--resolution", "48", "--max-views", "2", "--out", out])
    assert os.path.exists(out)
    assert open(out, "rb").read(200).startswith(b"ply")
