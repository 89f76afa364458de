"""Train CLI (same surface as the reference `train.py`).

Usage:
    python train.py --yaml=options/pix3d/config.yaml [--key.sub=val ...]

Single-controller JAX: data parallelism shards the global batch over a device
mesh inside one process — no process spawning, port scanning, or NCCL
rendezvous (reference `train.py:26-44` replaced).
"""

import os
import sys

from shapeclipper_tpu.config import options
from shapeclipper_tpu.train.trainer import Runner
from shapeclipper_tpu.utils.log import log


def main():
    log.process(os.getpid())
    log.title(f"[{sys.argv[0]}] (training)")

    opt_cmd = options.parse_arguments(sys.argv[1:])
    # multi-host (multi-slice / DCN): initialize the distributed runtime
    # before any jax call; each host then drives its local devices and loads
    # its shard of the data (replaces mp.spawn + NCCL rendezvous,
    # reference `train.py:34-41`)
    if opt_cmd.pop("distributed", False):
        import jax
        jax.distributed.initialize()
    opt = options.set(opt_cmd=opt_cmd)
    options.save_options_file(opt)

    trainer = Runner(opt)
    trainer.load_dataset(opt)
    trainer.build_networks(opt)
    trainer.setup_optimizer(opt)
    trainer.restore_checkpoint(opt)
    trainer.setup_visualizer(opt)
    trainer.train(opt)


if __name__ == "__main__":
    main()
