"""Convert torch checkpoints (torchvision ResNets, OpenAI CLIP) to the .npz
format consumed by this framework's offline weight loaders.

ImageNet / CLIP pretrained weights are data artifacts; this tool runs
wherever the source .pth files are available (no network access needed here):

    # torchvision resnet34 state_dict -> npz
    python scripts/convert_weights.py resnet resnet34-b627a593.pth resnet34.npz

    # OpenAI CLIP (full model state_dict, jit or plain) -> visual.* npz
    python scripts/convert_weights.py clip ViT-L-14.pt clip_vitl14.npz

The npz keeps the ORIGINAL torch parameter names; the flax-side loaders
(`shapeclipper_tpu/models/resnet.py:load_pretrained_npz`,
`shapeclipper_tpu/clipnn/vit.py:load_clip_npz`) do the layout transposes.
"""

import sys

import numpy as np


def convert_resnet(src, dst):
    import torch
    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {k: v.numpy() for k, v in sd.items()
           if not k.endswith("num_batches_tracked")}
    np.savez(dst, **out)
    print(f"wrote {len(out)} arrays -> {dst}")


def convert_clip(src, dst):
    import torch
    try:
        model = torch.jit.load(src, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(src, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out = {k: v.float().numpy() for k, v in sd.items()
           if k.startswith("visual.")}
    np.savez(dst, **out)
    print(f"wrote {len(out)} visual.* arrays -> {dst}")


if __name__ == "__main__":
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    {"resnet": convert_resnet, "clip": convert_clip}[kind](src, dst)
