"""Single-image inference CLI: image in -> reconstructed mesh + views out.

The reference has no standalone inference entry point (reconstructions are
only reachable through `evaluate.py`'s dataset-driven dumps,
`model/runner.py:468-503`); this CLI runs the same forward pipeline on ONE
image from disk:

    python infer.py --yaml=options/pix3d/config.yaml --name=run --resume \
        --image=path/to/img.png [--mask=path/to/mask.png] [--n_rotate=50]

restores the run's best checkpoint (or `--load=ckpt`), predicts the
viewpoint + shape/texture latents, and writes to
`{output_path}/infer/`:

    0_image_input.png / 0_image_recon.png / 0_mask_recon.png /
    0_normal_recon.png         reconstruction at eval.image_size
    0_mesh.ply                 marching-tetrahedra mesh of the SDF at
                               eval.vox_res (world units)
    0_image_rotate.gif / 0_mask_rotate.gif / 0_normal_rotate.gif
                               rotating-azimuth turntable (n_rotate views)

Preprocessing matches the Pix3D loader exactly (resize to `image_size`,
mask binarized at 0.5, white-background composite,
`shapeclipper_tpu/data/pix3d.py:preprocess_image`); the mask comes from
`--mask`, the image's alpha channel, or defaults to all-foreground.
"""

import os
import sys

import numpy as np
import PIL.Image

from shapeclipper_tpu.config import options
from shapeclipper_tpu.utils.easydict import EasyDict as edict
from shapeclipper_tpu.utils.log import log


def _pop_arg(argv, key):
    """Strip `--key=value` from argv (these are CLI-local, not config keys)."""
    val = None
    rest = []
    for a in argv:
        if a.startswith(f"--{key}="):
            val = a.split("=", 1)[1]
        else:
            rest.append(a)
    return val, rest


def load_image(opt, image_path, mask_path=None):
    """-> (rgb [1,H,W,3] f32, mask [1,H,W,1] f32), preprocessed like the
    Pix3D dataset (`data/pix3d.py:preprocess_image`)."""
    image = PIL.Image.open(image_path)
    if mask_path is not None:
        mask = PIL.Image.open(mask_path).convert("L")
        image = PIL.Image.merge("RGBA", (*image.convert("RGB").split(),
                                         mask.resize(image.size)))
    elif image.mode != "RGBA":
        image = image.convert("RGBA")  # alpha defaults to opaque
    image = image.resize((opt.W, opt.H))
    arr = np.asarray(image, dtype=np.float32) / 255.0
    rgb, mask = arr[..., :3], arr[..., 3:]
    mask = (mask > 0.5).astype(np.float32)
    if opt.data.bgcolor is not None:
        rgb = rgb * mask + opt.data.bgcolor * (1 - mask)
    return rgb[None], mask[None]


def main():
    log.process(os.getpid())
    log.title(f"[{sys.argv[0]}] (single-image inference)")

    argv = sys.argv[1:]
    image_path, argv = _pop_arg(argv, "image")
    mask_path, argv = _pop_arg(argv, "mask")
    n_rotate, argv = _pop_arg(argv, "n_rotate")
    if not image_path:
        raise SystemExit("usage: python infer.py --yaml=... --resume "
                         "--image=IMG [--mask=MASK] [--n_rotate=50]")
    n_rotate = int(n_rotate) if n_rotate else 50

    opt_cmd = options.parse_arguments(argv)
    opt = options.set(opt_cmd=opt_cmd)

    # Heavy imports after options parsing so usage errors fail fast.
    import jax
    import jax.numpy as jnp

    from shapeclipper_tpu.eval3d import isosurface
    from shapeclipper_tpu.train.trainer import Runner
    from shapeclipper_tpu import vis as util_vis

    # Runner.__init__ clears stale tfevents/vis dirs on non-resume runs
    # (reference `model/runner.py:25-30`) — inference must never mutate an
    # existing training run directory, so mask that path.
    resume = opt.resume
    opt.resume = True
    runner = Runner(opt)
    opt.resume = resume
    runner.build_networks(opt)
    runner.setup_optimizer(opt)
    runner.restore_checkpoint(opt, best=True, evaluate=True)

    rgb, mask = load_image(opt, image_path, mask_path)
    var = edict(idx=np.array([0]), rgb_input_map=jnp.asarray(rgb),
                mask_input_map=jnp.asarray(mask))

    log.info("running forward + dense SDF grid...")
    var, level = runner._eval_forward_and_grid(runner.params,
                                               runner.batch_stats, var)

    opt_e = runner.graph_eval.opt
    folder = "infer"
    H, W = opt_e.H, opt_e.W
    util_vis.dump_images(opt, var.idx, "image_input", rgb, folder=folder)
    util_vis.dump_images(opt, var.idx, "image_recon",
                         np.asarray(var.rgb_recon).reshape(1, H, W, 3),
                         folder=folder)
    util_vis.dump_images(opt, var.idx, "mask_recon",
                         np.asarray(var.mask_recon).reshape(1, H, W, 1),
                         folder=folder)
    util_vis.dump_images(opt, var.idx, "normal_recon",
                         np.asarray(var.normal_recon).reshape(1, H, W, 3) / 2
                         + 0.5, folder=folder)

    log.info("extracting mesh...")
    range_min, range_max = opt.eval.range
    mesh = isosurface.marching_cubes_world(
        np.asarray(jax.device_get(level))[0], range_min, range_max)
    util_vis.dump_meshes(opt, var.idx, "mesh", [mesh], folder=folder)

    if n_rotate > 0:
        log.info(f"rendering {n_rotate} rotating views...")
        var = runner.vis_rotate(opt, var, n_views=n_rotate)
        util_vis.dump_gifs(opt, var.idx, "image_rotate", var.rotating_imgs,
                           from_range=(0, 1), folder=folder)
        util_vis.dump_gifs(opt, var.idx, "mask_rotate", var.rotating_masks,
                           folder=folder)
        util_vis.dump_gifs(opt, var.idx, "normal_rotate",
                           var.rotating_normals, from_range=(0, 1),
                           folder=folder)

    out_dir = os.path.join(opt.output_path, folder)
    log.info(f"outputs written to {out_dir}:")
    for f in sorted(os.listdir(out_dir)):
        log.info(f"  {f}")


if __name__ == "__main__":
    main()
