"""Subprocess smoke tests for the CLI entry points on the synthetic config
(no external assets, CPU, tiny shapes)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, tmp, extra_env=None, timeout=2400):
    env = dict(os.environ)
    # the axon plugin ignores JAX_PLATFORMS; SCL_PLATFORM is honored by the
    # package __init__ via jax.config
    env["SCL_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True)


@pytest.mark.slow
def test_pretrain_cli(tmp_path):
    r = _run(["pretrain.py", "--yaml=options/synthetic/config.yaml",
              f"--output_root={tmp_path}", "--pre.iter=5",
              "--pre.sample_points=256", "--pre.viewpoint!",
              "--batch_size=2", "--freq.ckpt_latest=5"], tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out = tmp_path / "synthetic_output" / "smoke"
    assert (out / "latest.ckpt").exists()
    assert (out / "options.yaml").exists()


@pytest.mark.slow
def test_train_and_evaluate_cli(tmp_path):
    common = ["--yaml=options/synthetic/config.yaml",
              f"--output_root={tmp_path}",
              "--max_epoch=1", "--batch_size=2", "--image_size=[32,32]",
              "--render.rand_sample=32", "--render.n_samples_uniform=8",
              "--eval.vox_res=12", "--eval.num_points=512",
              "--eval.image_size=[16,16]", "--data.max_img_cat=4",
              "--freq.eval=1", "--tpu.encoder_dtype=float32",
              "--tpu.mesh={data: 1}", "--tb!"]
    r = _run(["train.py"] + common, tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out = tmp_path / "synthetic_output" / "smoke"
    assert (out / "latest.ckpt").exists()

    r = _run(["evaluate.py"] + common + ["--resume"], tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / "cd_cat.txt").exists()
    assert (out / "f_score.txt").exists()
    assert (out / "chamfer.txt").exists()

    # single-image inference from the same run's best checkpoint, fed one
    # of evaluate's dumped inputs
    img = out / "dump" / "0_image_input.png"
    assert img.exists()
    r = _run(["infer.py"] + common
             + ["--resume", f"--image={img}", "--n_rotate=2",
                "--force_override"], tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    for f in ("0_image_recon.png", "0_mask_recon.png", "0_normal_recon.png",
              "0_mesh.ply", "0_image_rotate.gif"):
        assert (out / "infer" / f).exists(), f


@pytest.mark.slow
def test_clip_anno_cli(tmp_path):
    r = _run(["CLIP_anno.py", "--yaml=options/clip/pix3d.yaml",
              f"--output_root={tmp_path}",
              f"--anno_root={tmp_path}/CLIP_NN",
              "--data.dataset=synthetic", "--data.max_img_cat=6",
              "--data.num_workers=0", "--batch_size=2", "--k_nearest=3",
              "--image_size=[32,32]", "--clip.model=vit_b32", "--force_add",
              "--data.synthetic.cat=synthetic"], tmp_path, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / "CLIP_NN" / "synthetic_train.csv").exists()
