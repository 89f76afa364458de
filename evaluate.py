"""Evaluation CLI (same surface as the reference `evaluate.py`).

Usage:
    python evaluate.py --yaml=options/pix3d/config.yaml --resume
        [--eval.vox_res=100 ...]

Restores the best checkpoint non-strict, writes data_list.txt, runs a full
test-split evaluation with per-category Chamfer + F-score reports.
"""

import os
import sys

from shapeclipper_tpu.config import options
from shapeclipper_tpu.train.trainer import Runner
from shapeclipper_tpu.utils.log import log


def main():
    log.process(os.getpid())
    log.title(f"[{sys.argv[0]}] (evaluating)")

    opt_cmd = options.parse_arguments(sys.argv[1:])
    opt = options.set(opt_cmd=opt_cmd)

    evaluator = Runner(opt)
    evaluator.load_dataset(opt, eval_split="test")
    if hasattr(evaluator.test_data, "id_filename_mapping"):
        evaluator.test_data.id_filename_mapping(
            opt, os.path.join(opt.output_path, "data_list.txt"))
    evaluator.build_networks(opt)
    evaluator.setup_optimizer(opt)
    evaluator.restore_checkpoint(opt, best=True, evaluate=True)
    evaluator.setup_visualizer(opt)
    evaluator.evaluate(opt, ep=0)


if __name__ == "__main__":
    main()
