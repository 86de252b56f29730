"""Dataset registry (capability surface of reference ``datasets/``)."""

from video_depth_anything_tpu.data.base import SceneDepthDataset  # noqa: F401


def get_dataset(name: str, root: str, **kwargs) -> SceneDepthDataset:
    name = name.lower()
    if name == "kitti":
        from video_depth_anything_tpu.data.kitti import KITTI

        return KITTI(root, **kwargs)
    if name == "vkitti":
        from video_depth_anything_tpu.data.vkitti import VKITTI

        return VKITTI(root, **kwargs)
    if name == "sintel":
        from video_depth_anything_tpu.data.sintel import Sintel

        return Sintel(root, **kwargs)
    if name == "tartanair":
        from video_depth_anything_tpu.data.tartanair import TartanAir

        return TartanAir(root, **kwargs)
    if name == "pointodyssey":
        from video_depth_anything_tpu.data.pointodyssey import PointOdyssey

        return PointOdyssey(root, **kwargs)
    if name == "dynamicreplica":
        from video_depth_anything_tpu.data.dynamicreplica import DynamicReplica

        return DynamicReplica(root, **kwargs)
    if name == "sceneflow":
        from video_depth_anything_tpu.data.sceneflow import SceneFlow

        return SceneFlow(root, **kwargs)
    if name == "irs":
        from video_depth_anything_tpu.data.irs import IRS

        return IRS(root, **kwargs)
    raise ValueError(f"unknown dataset {name!r}")
