"""CLIP nearest-neighbor annotation CLI (same surface as the reference).

Usage:
    python CLIP_anno.py --yaml=options/clip/pix3d.yaml [--k=v ...]

Produces data/Pix3D/CLIP_NN/{cats}_{split}.csv consumed by the train-time
dataset (`shapeclipper_tpu/data/pix3d.py:get_NN_anno`).
"""

import os
import sys

from shapeclipper_tpu.clipnn.annotator import Pix3DAnnotator
from shapeclipper_tpu.config import options
from shapeclipper_tpu.utils.log import log


def main():
    log.process(os.getpid())
    log.title(f"[{sys.argv[0]}] (compute CLIP-NN)")

    opt_cmd = options.parse_arguments(sys.argv[1:])
    opt = options.set(opt_cmd=opt_cmd)
    options.save_options_file(opt)

    if opt.data.dataset.startswith("pix3d") or opt.data.dataset == "synthetic":
        annotator = Pix3DAnnotator(opt)
    else:
        raise NotImplementedError(opt.data.dataset)
    annotator.load_dataset(opt)
    annotator.compute_NN(opt)


if __name__ == "__main__":
    main()
