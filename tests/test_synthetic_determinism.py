"""Synthetic-dataset determinism across processes.

`hash()` on strings is salted per process (PYTHONHASHSEED), so seeding
per-sample RNG from `hash((split, idx))` silently produced different data in
every process (bench runs, CLI subprocess tests, cross-process comparisons).
The dataset seeds from crc32 instead; these tests pin the fix by rendering
the same sample under two different explicit hash seeds in subprocesses.
"""

import os
import subprocess
import sys

_SNIPPET = r"""
import hashlib
import numpy as np
from shapeclipper_tpu.config import options
from shapeclipper_tpu.utils.easydict import EasyDict as edict

opt = options.load_options("options/pix3d/config.yaml")
opt.image_size = [16, 16]
opt.H, opt.W = opt.image_size
opt.data.update(dataset="synthetic", max_img_cat=4, k_nearest=2)
opt.render.rand_sample = 64
from shapeclipper_tpu.data import synthetic
ds = synthetic.Dataset(opt, split="train")
h = hashlib.sha256()
for idx in range(3):
    s = ds[idx]
    for k in sorted(s):
        h.update(np.ascontiguousarray(np.asarray(s[k])).tobytes())
print(h.hexdigest())
"""


def _digest(hashseed):
    env = dict(os.environ, PYTHONHASHSEED=str(hashseed),
               JAX_PLATFORMS="cpu", SCL_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET], capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_same_sample_bytes_across_processes():
    # two processes with different hash salts must produce identical samples
    assert _digest(1) == _digest(12345)
