#!/usr/bin/env python
"""Motion-module feature visualization (role of reference
``Test_singleImage_processing.py:67-201`` / ``Visualise_VideoDepthAny.ipynb``):
run a window, project each DPT level's pre-motion features to their top-3
PCA components, and render them as RGB maps next to the input — a manual
check of temporal feature stability between shifted windows.

  python examples/feature_pca.py [video.mp4] [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pca_rgb(feat: np.ndarray) -> np.ndarray:
    """(H, W, C) features → (H, W, 3) image from the top-3 principal
    components, each normalized to [0, 1]."""
    h, w, c = feat.shape
    flat = feat.reshape(-1, c).astype(np.float64)
    flat = flat - flat.mean(axis=0)
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T
    proj = proj - proj.min(axis=0)
    proj = proj / (proj.max(axis=0) + 1e-8)
    return proj.reshape(h, w, 3)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from video_depth_anything_tpu.io.video import read_video_frames
    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.utils.transform import preprocess_frames

    video = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/assets/example_videos/davis_rollercoaster.mp4"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "feature_pca.png"

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(0))

    frames, _ = read_video_frames(video, process_length=2, max_res=480)
    pre = preprocess_frames(frames, input_size=252)

    feats = jax.jit(
        lambda p, x: model.module.apply({"params": p}, x, method="encode_level_features")
    )(model.params, jnp.asarray(pre))

    fig, axs = plt.subplots(2, 5, figsize=(20, 8))
    for row in range(2):
        axs[row, 0].imshow(frames[row])
        axs[row, 0].set_title(f"frame {row}")
        for lvl in range(4):
            fmap = np.asarray(feats[lvl][row], dtype=np.float32)
            axs[row, lvl + 1].imshow(pca_rgb(fmap))
            axs[row, lvl + 1].set_title(
                f"level {lvl + 1} PCA  {fmap.shape[0]}x{fmap.shape[1]}x{fmap.shape[2]}"
            )
    for ax in axs.ravel():
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
