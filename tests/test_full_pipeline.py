"""End-to-end pipeline on the miniature Pix3D fixture, through the real CLIs:
pretrain -> CLIP_anno (regenerates the NN CSVs) -> train -> evaluate.
This is the closest thing to the reference's README workflow that runs
without real Pix3D assets."""

import os
import subprocess
import sys

import pytest

from .test_pix3d_data import pix3d_root  # noqa: F401 (fixture)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(args, timeout=2400):
    env = dict(os.environ)
    env["SCL_PLATFORM"] = "cpu"
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       timeout=timeout, capture_output=True, text=True)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    return r


@pytest.mark.slow
def test_pix3d_pipeline_via_clis(pix3d_root, tmp_path):  # noqa: F811
    out_root = str(tmp_path / "out")
    common = ["--yaml=options/pix3d/config.yaml", f"--output_root={out_root}",
              f"--data.root={pix3d_root}", "--data.num_workers=0",
              "--data.k_nearest=2", "--batch_size=2", "--image_size=[32,32]",
              "--render.rand_sample=32", "--render.n_samples_uniform=8",
              "--eval.batch_size=1", "--eval.image_size=[16,16]",
              "--eval.vox_res=12", "--eval.num_points=512", "--eval.n_vis=1",
              "--tpu.encoder_dtype=float32", "--tpu.mesh={data: 1}",
              "--freq.eval=1", "--freq.scalar=1000", "--freq.vis=1000",
              "--freq.save_vis=1000", "--freq.ckpt_latest=1000", "--tb!",
              "--force_add"]

    # 1. pretrain (sphere init; viewpoint loss uses the fixture images)
    _run(["pretrain.py"] + common + [
        "--pretrain", "--name=pre", "--pre.iter=3", "--pre.sample_points=256"])
    pre_ckpt = f"{out_root}/pix3d_output/pre/latest.ckpt"
    assert os.path.exists(pre_ckpt)

    # 2. CLIP annotation: regenerate the NN CSVs into the fixture tree
    _run(["CLIP_anno.py", "--yaml=options/clip/pix3d.yaml",
          f"--output_root={out_root}", f"--data.root={pix3d_root}",
          f"--anno_root={pix3d_root}/CLIP_NN", "--data.num_workers=0",
          "--batch_size=2", "--k_nearest=3", "--image_size=[32,32]",
          "--clip.model=vit_b32", "--force_add"])
    assert os.path.exists(f"{pix3d_root}/CLIP_NN/chair_train.csv")

    # 3. train one epoch, loading the pretrain checkpoint (child restore)
    _run(["train.py"] + common + [
        "--name=run", "--max_epoch=1", f"--load={pre_ckpt}"])
    run_dir = f"{out_root}/pix3d_output/run"
    assert os.path.exists(f"{run_dir}/latest.ckpt")

    # 4. evaluate from the best checkpoint
    _run(["evaluate.py"] + common + ["--name=run", "--resume"])
    assert os.path.exists(f"{run_dir}/cd_cat.txt")
    assert os.path.exists(f"{run_dir}/f_score.txt")
    assert os.path.exists(f"{run_dir}/data_list.txt")
    with open(f"{run_dir}/cd_cat.txt") as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("CD") and "chair" in lines[1]
