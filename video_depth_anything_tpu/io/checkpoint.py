"""Checkpoint conversion and native persistence.

The released Video-Depth-Anything weights are torch ``.pth`` state dicts
(fetched by reference ``get_weights.sh:1-6`` and loaded with
``load_state_dict(..., strict=True)`` at ``run.py:80``).  This module maps
them onto the JAX param pytree, handling the layout changes of the
TPU-native model:

* torch Linear ``(out, in)`` → flax Dense kernel ``(in, out)``
* torch Conv2d OIHW → NHWC conv kernel HWIO
* torch ConvTranspose2d ``(in, out, k, k)`` → pixel-shuffle GEMM kernel
  ``(in, k, k, out)``
* the 14×14 patch-embed conv → a ``(14·14·3, D)`` patch GEMM kernel with
  ``(kh, kw, c)`` patch ordering
* sinusoidal APE buffers (``motion_module.py:189-207``) and the unused
  ``mask_token`` are dropped (deterministic / dead at inference)

Conversion is strict both ways: every torch key must be consumed (or
explicitly skipped) and every model parameter must be produced — the moral
equivalent of ``strict=True``.

Native format: Orbax (``save_native`` / ``load_native``).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

from video_depth_anything_tpu.config import ModelConfig

_SKIP_PATTERNS = (
    r"^pretrained\.mask_token$",
    r"pos_encoder\.pe$",  # deterministic sinusoid, recomputed in-model
)


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:  # OIHW -> HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv(w: np.ndarray) -> np.ndarray:  # (in, out, k, k) -> (in, k, k, out)
    return np.ascontiguousarray(w.transpose(0, 2, 3, 1))


def convert_torch_state_dict(
    state: Mapping[str, np.ndarray], cfg: ModelConfig
) -> Dict:
    """Convert a torch state dict (tensors already as numpy fp32) to the
    flax ``params`` pytree of ``VideoDepthAnything``."""
    state = dict(state)
    consumed = set()

    def take(key: str) -> np.ndarray:
        if key not in state:
            raise KeyError(f"missing torch checkpoint key: {key}")
        consumed.add(key)
        return np.asarray(state[key], dtype=np.float32)

    p = cfg.vit.patch_size
    d = cfg.vit.embed_dim

    # ---- encoder -----------------------------------------------------------
    pw = take("pretrained.patch_embed.proj.weight")  # (D, 3, p, p)
    pretrained: Dict = {
        "patch_kernel": np.ascontiguousarray(
            pw.transpose(2, 3, 1, 0).reshape(p * p * 3, d)
        ),
        "patch_bias": take("pretrained.patch_embed.proj.bias"),
        "cls_token": take("pretrained.cls_token"),
        "pos_embed": take("pretrained.pos_embed"),
        "norm": {
            "scale": take("pretrained.norm.weight"),
            "bias": take("pretrained.norm.bias"),
        },
    }
    for i in range(cfg.vit.depth):
        t = f"pretrained.blocks.{i}"
        pretrained[f"block_{i}"] = {
            "norm1": {"scale": take(f"{t}.norm1.weight"), "bias": take(f"{t}.norm1.bias")},
            "norm2": {"scale": take(f"{t}.norm2.weight"), "bias": take(f"{t}.norm2.bias")},
            "ls1_gamma": take(f"{t}.ls1.gamma"),
            "ls2_gamma": take(f"{t}.ls2.gamma"),
            "attn": {
                "qkv": {
                    "kernel": _linear(take(f"{t}.attn.qkv.weight")),
                    "bias": take(f"{t}.attn.qkv.bias"),
                },
                "proj": {
                    "kernel": _linear(take(f"{t}.attn.proj.weight")),
                    "bias": take(f"{t}.attn.proj.bias"),
                },
            },
            "mlp": (
                {
                    "w12": {
                        "kernel": _linear(take(f"{t}.mlp.w12.weight")),
                        "bias": take(f"{t}.mlp.w12.bias"),
                    },
                    "w3": {
                        "kernel": _linear(take(f"{t}.mlp.w3.weight")),
                        "bias": take(f"{t}.mlp.w3.bias"),
                    },
                }
                if cfg.vit.ffn_layer == "swiglufused"
                else {
                    "fc1": {
                        "kernel": _linear(take(f"{t}.mlp.fc1.weight")),
                        "bias": take(f"{t}.mlp.fc1.bias"),
                    },
                    "fc2": {
                        "kernel": _linear(take(f"{t}.mlp.fc2.weight")),
                        "bias": take(f"{t}.mlp.fc2.bias"),
                    },
                }
            ),
        }

    # ---- DPT head ----------------------------------------------------------
    head: Dict = {}
    for i in range(4):
        w = take(f"head.projects.{i}.weight")  # (out, in, 1, 1)
        head[f"project_{i}"] = {
            "kernel": _linear(w[:, :, 0, 0]),
            "bias": take(f"head.projects.{i}.bias"),
        }
    head["resize_0"] = {
        "kernel": _deconv(take("head.resize_layers.0.weight")),
        "bias": take("head.resize_layers.0.bias"),
    }
    head["resize_1"] = {
        "kernel": _deconv(take("head.resize_layers.1.weight")),
        "bias": take("head.resize_layers.1.bias"),
    }
    head["resize_3"] = {
        "kernel": _conv(take("head.resize_layers.3.weight")),
        "bias": take("head.resize_layers.3.bias"),
    }
    for i in range(1, 5):
        head[f"layer{i}_rn"] = {"kernel": _conv(take(f"head.scratch.layer{i}_rn.weight"))}
    for i in range(1, 5):
        t = f"head.scratch.refinenet{i}"
        rcu = lambda name: {
            "conv1": {
                "kernel": _conv(take(f"{t}.{name}.conv1.weight")),
                "bias": take(f"{t}.{name}.conv1.bias"),
            },
            "conv2": {
                "kernel": _conv(take(f"{t}.{name}.conv2.weight")),
                "bias": take(f"{t}.{name}.conv2.bias"),
            },
        }
        head[f"refinenet{i}"] = {
            "out_conv": {
                "kernel": _conv(take(f"{t}.out_conv.weight")),
                "bias": take(f"{t}.out_conv.bias"),
            },
            "rcu1": rcu("resConfUnit1"),
            "rcu2": rcu("resConfUnit2"),
        }
    head["output_conv1"] = {
        "kernel": _conv(take("head.scratch.output_conv1.weight")),
        "bias": take("head.scratch.output_conv1.bias"),
    }
    head["output_conv2_0"] = {
        "kernel": _conv(take("head.scratch.output_conv2.0.weight")),
        "bias": take("head.scratch.output_conv2.0.bias"),
    }
    head["output_conv2_2"] = {
        "kernel": _conv(take("head.scratch.output_conv2.2.weight")),
        "bias": take("head.scratch.output_conv2.2.bias"),
    }

    for j in range(4):
        t = f"head.motion_modules.{j}.temporal_transformer"
        mm: Dict = {
            "norm": {"scale": take(f"{t}.norm.weight"), "bias": take(f"{t}.norm.bias")},
            "proj_in": {
                "kernel": _linear(take(f"{t}.proj_in.weight")),
                "bias": take(f"{t}.proj_in.bias"),
            },
            "proj_out": {
                "kernel": _linear(take(f"{t}.proj_out.weight")),
                "bias": take(f"{t}.proj_out.bias"),
            },
        }
        for k in range(cfg.motion.num_transformer_blocks):
            bt = f"{t}.transformer_blocks.{k}"
            blk: Dict = {
                "ff_norm": {
                    "scale": take(f"{bt}.ff_norm.weight"),
                    "bias": take(f"{bt}.ff_norm.bias"),
                },
                "ff": {
                    "proj": {
                        "kernel": _linear(take(f"{bt}.ff.net.0.proj.weight")),
                        "bias": take(f"{bt}.ff.net.0.proj.bias"),
                    },
                    "out": {
                        "kernel": _linear(take(f"{bt}.ff.net.2.weight")),
                        "bias": take(f"{bt}.ff.net.2.bias"),
                    },
                },
            }
            for a in range(cfg.motion.num_attention_blocks):
                at = f"{bt}.attention_blocks.{a}"
                blk[f"norm_{a}"] = {
                    "scale": take(f"{bt}.norms.{a}.weight"),
                    "bias": take(f"{bt}.norms.{a}.bias"),
                }
                blk[f"attn_{a}"] = {
                    "to_q": {"kernel": _linear(take(f"{at}.to_q.weight"))},
                    "to_k": {"kernel": _linear(take(f"{at}.to_k.weight"))},
                    "to_v": {"kernel": _linear(take(f"{at}.to_v.weight"))},
                    "to_out": {
                        "kernel": _linear(take(f"{at}.to_out.0.weight")),
                        "bias": take(f"{at}.to_out.0.bias"),
                    },
                }
            mm[f"block_{k}"] = blk
        head[f"motion_{j}"] = mm

    leftovers = [
        k
        for k in state
        if k not in consumed
        and not any(re.search(pat, k) for pat in _SKIP_PATTERNS)
    ]
    if leftovers:
        raise ValueError(f"unconsumed torch checkpoint keys: {leftovers[:10]}")

    return {"pretrained": pretrained, "head": head}


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Dict:
    """Load a ``.pth`` checkpoint file and convert it (CPU torch required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    np_state = {k: v.float().numpy() for k, v in sd.items()}
    return convert_torch_state_dict(np_state, cfg)


def export_torch_state_dict(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_torch_state_dict``: JAX pytree → torch-style
    state dict (numpy), so fine-tuned weights can round-trip back to the
    reference ecosystem.  The deterministic APE buffers and ``mask_token``
    (dropped on import) are re-synthesized / zero-filled."""
    from video_depth_anything_tpu.models.temporal import sinusoidal_position_table

    out: Dict[str, np.ndarray] = {}
    p = cfg.vit.patch_size
    d = cfg.vit.embed_dim
    g = lambda tree, *path: np.asarray(
        _tree_get(tree, path), dtype=np.float32
    )

    def _tree_get(tree, path):
        for key in path:
            tree = tree[key]
        return tree

    pre = params["pretrained"]
    out["pretrained.patch_embed.proj.weight"] = np.ascontiguousarray(
        np.asarray(pre["patch_kernel"], np.float32)
        .reshape(p, p, 3, d)
        .transpose(3, 2, 0, 1)
    )
    out["pretrained.patch_embed.proj.bias"] = np.asarray(pre["patch_bias"], np.float32)
    out["pretrained.cls_token"] = np.asarray(pre["cls_token"], np.float32)
    out["pretrained.pos_embed"] = np.asarray(pre["pos_embed"], np.float32)
    out["pretrained.mask_token"] = np.zeros((1, d), np.float32)
    out["pretrained.norm.weight"] = g(pre, "norm", "scale")
    out["pretrained.norm.bias"] = g(pre, "norm", "bias")
    for i in range(cfg.vit.depth):
        b = pre[f"block_{i}"]
        t = f"pretrained.blocks.{i}"
        out[f"{t}.norm1.weight"] = g(b, "norm1", "scale")
        out[f"{t}.norm1.bias"] = g(b, "norm1", "bias")
        out[f"{t}.norm2.weight"] = g(b, "norm2", "scale")
        out[f"{t}.norm2.bias"] = g(b, "norm2", "bias")
        out[f"{t}.ls1.gamma"] = np.asarray(b["ls1_gamma"], np.float32)
        out[f"{t}.ls2.gamma"] = np.asarray(b["ls2_gamma"], np.float32)
        out[f"{t}.attn.qkv.weight"] = _linear(g(b, "attn", "qkv", "kernel"))
        out[f"{t}.attn.qkv.bias"] = g(b, "attn", "qkv", "bias")
        out[f"{t}.attn.proj.weight"] = _linear(g(b, "attn", "proj", "kernel"))
        out[f"{t}.attn.proj.bias"] = g(b, "attn", "proj", "bias")
        if cfg.vit.ffn_layer == "swiglufused":
            out[f"{t}.mlp.w12.weight"] = _linear(g(b, "mlp", "w12", "kernel"))
            out[f"{t}.mlp.w12.bias"] = g(b, "mlp", "w12", "bias")
            out[f"{t}.mlp.w3.weight"] = _linear(g(b, "mlp", "w3", "kernel"))
            out[f"{t}.mlp.w3.bias"] = g(b, "mlp", "w3", "bias")
        else:
            out[f"{t}.mlp.fc1.weight"] = _linear(g(b, "mlp", "fc1", "kernel"))
            out[f"{t}.mlp.fc1.bias"] = g(b, "mlp", "fc1", "bias")
            out[f"{t}.mlp.fc2.weight"] = _linear(g(b, "mlp", "fc2", "kernel"))
            out[f"{t}.mlp.fc2.bias"] = g(b, "mlp", "fc2", "bias")

    head = params["head"]
    for i in range(4):
        out[f"head.projects.{i}.weight"] = _linear(
            g(head, f"project_{i}", "kernel")
        )[:, :, None, None]
        out[f"head.projects.{i}.bias"] = g(head, f"project_{i}", "bias")
    out["head.resize_layers.0.weight"] = np.ascontiguousarray(
        g(head, "resize_0", "kernel").transpose(0, 3, 1, 2)
    )
    out["head.resize_layers.0.bias"] = g(head, "resize_0", "bias")
    out["head.resize_layers.1.weight"] = np.ascontiguousarray(
        g(head, "resize_1", "kernel").transpose(0, 3, 1, 2)
    )
    out["head.resize_layers.1.bias"] = g(head, "resize_1", "bias")
    out["head.resize_layers.3.weight"] = np.ascontiguousarray(
        g(head, "resize_3", "kernel").transpose(3, 2, 0, 1)
    )
    out["head.resize_layers.3.bias"] = g(head, "resize_3", "bias")
    conv_back = lambda w: np.ascontiguousarray(w.transpose(3, 2, 0, 1))
    for i in range(1, 5):
        out[f"head.scratch.layer{i}_rn.weight"] = conv_back(
            g(head, f"layer{i}_rn", "kernel")
        )
    for i in range(1, 5):
        r = head[f"refinenet{i}"]
        t = f"head.scratch.refinenet{i}"
        out[f"{t}.out_conv.weight"] = conv_back(g(r, "out_conv", "kernel"))
        out[f"{t}.out_conv.bias"] = g(r, "out_conv", "bias")
        for rcu_t, rcu_j in (("resConfUnit1", "rcu1"), ("resConfUnit2", "rcu2")):
            for c in ("conv1", "conv2"):
                out[f"{t}.{rcu_t}.{c}.weight"] = conv_back(g(r, rcu_j, c, "kernel"))
                out[f"{t}.{rcu_t}.{c}.bias"] = g(r, rcu_j, c, "bias")
    out["head.scratch.output_conv1.weight"] = conv_back(g(head, "output_conv1", "kernel"))
    out["head.scratch.output_conv1.bias"] = g(head, "output_conv1", "bias")
    out["head.scratch.output_conv2.0.weight"] = conv_back(g(head, "output_conv2_0", "kernel"))
    out["head.scratch.output_conv2.0.bias"] = g(head, "output_conv2_0", "bias")
    out["head.scratch.output_conv2.2.weight"] = conv_back(g(head, "output_conv2_2", "kernel"))
    out["head.scratch.output_conv2.2.bias"] = g(head, "output_conv2_2", "bias")

    for j in range(4):
        mm = head[f"motion_{j}"]
        t = f"head.motion_modules.{j}.temporal_transformer"
        out[f"{t}.norm.weight"] = g(mm, "norm", "scale")
        out[f"{t}.norm.bias"] = g(mm, "norm", "bias")
        out[f"{t}.proj_in.weight"] = _linear(g(mm, "proj_in", "kernel"))
        out[f"{t}.proj_in.bias"] = g(mm, "proj_in", "bias")
        out[f"{t}.proj_out.weight"] = _linear(g(mm, "proj_out", "kernel"))
        out[f"{t}.proj_out.bias"] = g(mm, "proj_out", "bias")
        dim = np.asarray(mm["proj_in"]["kernel"]).shape[1]
        for k in range(cfg.motion.num_transformer_blocks):
            blk = mm[f"block_{k}"]
            bt = f"{t}.transformer_blocks.{k}"
            out[f"{bt}.ff_norm.weight"] = g(blk, "ff_norm", "scale")
            out[f"{bt}.ff_norm.bias"] = g(blk, "ff_norm", "bias")
            out[f"{bt}.ff.net.0.proj.weight"] = _linear(g(blk, "ff", "proj", "kernel"))
            out[f"{bt}.ff.net.0.proj.bias"] = g(blk, "ff", "proj", "bias")
            out[f"{bt}.ff.net.2.weight"] = _linear(g(blk, "ff", "out", "kernel"))
            out[f"{bt}.ff.net.2.bias"] = g(blk, "ff", "out", "bias")
            pe = sinusoidal_position_table(cfg.motion.temporal_max_len, dim)[None]
            for a in range(cfg.motion.num_attention_blocks):
                at = f"{bt}.attention_blocks.{a}"
                out[f"{bt}.norms.{a}.weight"] = g(blk, f"norm_{a}", "scale")
                out[f"{bt}.norms.{a}.bias"] = g(blk, f"norm_{a}", "bias")
                out[f"{at}.to_q.weight"] = _linear(g(blk, f"attn_{a}", "to_q", "kernel"))
                out[f"{at}.to_k.weight"] = _linear(g(blk, f"attn_{a}", "to_k", "kernel"))
                out[f"{at}.to_v.weight"] = _linear(g(blk, f"attn_{a}", "to_v", "kernel"))
                out[f"{at}.to_out.0.weight"] = _linear(
                    g(blk, f"attn_{a}", "to_out", "kernel")
                )
                out[f"{at}.to_out.0.bias"] = g(blk, f"attn_{a}", "to_out", "bias")
                out[f"{at}.pos_encoder.pe"] = pe
    return out


# ---------------------------------------------------------------------------
# Native (Orbax) persistence


def save_native(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_native(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
