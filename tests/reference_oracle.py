"""Load the PyTorch reference model as a numerical oracle.

The reference repo (read-only at /root/reference) is imported — not copied —
to generate golden outputs for parity tests.  Released checkpoints are not
downloadable in this environment, so the oracle runs with seeded random
weights; the checkpoint converter maps those exact weights onto the JAX
model, making the comparison weight-exact.

Missing optional deps of the reference are shimmed: ``easydict`` (a dict
subclass) — xformers is already optional in the reference and falls back to
naive attention on CPU.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_shims() -> None:
    if "easydict" not in sys.modules:
        mod = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, *args, **kwargs):
                super().__init__(*args, **kwargs)
                self.__dict__ = self

        mod.EasyDict = EasyDict
        sys.modules["easydict"] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, fns):
                self.fns = list(fns)

            def __call__(self, sample):
                for fn in self.fns:
                    sample = fn(sample)
                return sample

        transforms.Compose = Compose
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms


def load_reference_vda(encoder: str = "vits", num_frames: int = 32, seed: int = 0):
    """Instantiate the reference VideoDepthAnything with seeded random
    weights; returns the eval-mode torch module."""
    import torch

    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from video_depth_anything.video_depth import VideoDepthAnything  # noqa: E501  (reference import)

    configs = {
        "vits": dict(features=64, out_channels=[48, 96, 192, 384]),
        "vitb": dict(features=128, out_channels=[96, 192, 384, 768]),
        "vitl": dict(features=256, out_channels=[256, 512, 1024, 1024]),
    }
    torch.manual_seed(seed)
    model = VideoDepthAnything(
        encoder=encoder, num_frames=num_frames, **configs[encoder]
    )
    if encoder == "vitb":
        # the reference's intermediate_layer_idx dict only lists vits/vitl
        # (video_depth.py:48-51) though its DINOv2 factory supports vitb
        # (dinov2.py:339-360); patch the instance so the oracle covers the
        # vitb tap layers our config.py uses
        model.intermediate_layer_idx["vitb"] = [2, 5, 8, 11]
    return model.eval()


def reference_state_numpy(model) -> dict:
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
