"""Pretrain CLI: sphere-initialize the SDF MLP (+ viewpoint uniformity).

Usage (same surface as the reference `pretrain.py`):
    python pretrain.py --yaml=options/pix3d/config.yaml --pretrain [--k=v ...]
"""

import os
import sys

from shapeclipper_tpu.config import options
from shapeclipper_tpu.train.pretrainer import Runner
from shapeclipper_tpu.utils.log import log


def main():
    log.process(os.getpid())
    log.title(f"[{sys.argv[0]}] (pretraining)")

    opt_cmd = options.parse_arguments(sys.argv[1:])
    opt = options.set(opt_cmd=opt_cmd)
    options.save_options_file(opt)

    if opt.pre.viewpoint and opt.data.dataset == "pix3d":
        root = opt.data.get("root", "data/Pix3D")
        if not os.path.isdir(os.path.join(root, "lists")):
            log.warn(f"Pix3D assets not found under {root} — disabling the "
                     "viewpoint-uniformity loss (density-only pretraining; "
                     "sphere init does not need images, reference "
                     "model/pretrainer.py:174-181)")
            opt.pre.viewpoint = False

    trainer = Runner(opt)
    if opt.pre.viewpoint:
        trainer.load_dataset(opt)
    trainer.build_networks(opt)
    trainer.setup_optimizer(opt)
    trainer.train(opt)


if __name__ == "__main__":
    main()
