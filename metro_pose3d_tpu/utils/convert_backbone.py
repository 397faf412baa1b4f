"""ImageNet backbone weight conversion (SURVEY.md §6 "Checkpoint/resume":
the reference warm-starts its ResNet-50 from an ImageNet slim checkpoint).

This module converts a torchvision ResNet-50 (v1.5, post-activation)
`state_dict` into the parameter/batch-stats trees of `models.resnet.ResNet`
(`preact=False`). Numerical parity is exact when the ResNet is built with
`conv_padding="torch"` (torch pads stride-2 convs and the stem pool
symmetrically; TF/XLA "SAME" pads lo/hi asymmetrically, shifting the output
grid one pixel) — tests/test_convert_backbone.py pins feature-map parity
against torch itself.

Layout mapping (torch OIHW -> flax HWIO):
    conv1.weight                  -> conv_stem/kernel
    bn1.*                         -> bn_stem
    layer{L}.{B}.conv{k}.weight   -> stage{L}_block{B+1}/conv{k}/kernel
    layer{L}.{B}.bn{k}.*          -> stage{L}_block{B+1}/bn{k}
    layer{L}.{B}.downsample.0/1   -> proj / bn_proj
"""
from __future__ import annotations

import numpy as np


def _k(t):
    """torch OIHW conv kernel -> HWIO numpy float32."""
    return np.ascontiguousarray(np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0)))


def _bn(sd, prefix):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return params, stats


def torchvision_resnet_to_flax(state_dict, depths=(3, 4, 6, 3)):
    """torchvision ResNet state_dict -> (params, batch_stats) trees for
    `ResNet(variant=..., preact=False)`. Tensors may be torch tensors or
    numpy arrays (anything `np.asarray` accepts)."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in state_dict.items()}
    params: dict = {"conv_stem": {"kernel": _k(sd["conv1.weight"])}}
    stats: dict = {}
    p, s = _bn(sd, "bn1")
    params["bn_stem"] = p
    stats["bn_stem"] = s

    for stage, n_blocks in enumerate(depths, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"stage{stage}_block{b + 1}"
            bp: dict = {}
            bs: dict = {}
            for k in (1, 2, 3):
                if f"{src}.conv{k}.weight" not in sd:
                    continue  # basic blocks have two convs
                bp[f"conv{k}"] = {"kernel": _k(sd[f"{src}.conv{k}.weight"])}
                p, s = _bn(sd, f"{src}.bn{k}")
                bp[f"bn{k}"] = p
                bs[f"bn{k}"] = s
            if f"{src}.downsample.0.weight" in sd:
                bp["proj"] = {"kernel": _k(sd[f"{src}.downsample.0.weight"])}
                p, s = _bn(sd, f"{src}.downsample.1")
                bp["bn_proj"] = p
                bs["bn_proj"] = s
            params[dst] = bp
            stats[dst] = bs
    return params, stats


_KERAS_STACKS = {"resnet50v2": (3, 4, 6, 3), "resnet101v2": (3, 4, 23, 3),
                 "resnet152v2": (3, 8, 36, 3)}


def keras_resnet_v2_to_flax(model, depths=(3, 4, 6, 3)):
    """Keras `ResNet50V2`-family model -> (params, batch_stats) trees for
    `ResNet(preact=True, conv_padding="keras", stride_position="last",
    v2_biases=True)`.

    This is the reference's backbone family (TF ResNet-v2, pre-activation;
    slim and Keras share block structure and bias placement: biases live on
    the stem conv, each block's conv3, and projection shortcuts — the convs
    NOT followed by a BatchNorm). tests/test_convert_backbone.py pins
    feature-map parity against the Keras model itself.

    Keras layer names: conv1_conv; conv{s+1}_block{b}_{preact_bn,1_conv,
    1_bn,2_conv,2_bn,3_conv,0_conv}; post_bn.
    """

    def w(name):
        return [np.asarray(v, np.float32) for v in model.get_layer(name).get_weights()]

    def bn(name):
        gamma, beta, mean, var = w(name)
        return {"scale": gamma, "bias": beta}, {"mean": mean, "var": var}

    k, b = w("conv1_conv")
    params: dict = {"conv_stem": {"kernel": k, "bias": b}}
    stats: dict = {}
    for stage, n_blocks in enumerate(depths, start=1):
        for blk in range(1, n_blocks + 1):
            src = f"conv{stage + 1}_block{blk}"
            dst = f"stage{stage}_block{blk}"
            bp: dict = {}
            bs: dict = {}
            p, s = bn(f"{src}_preact_bn")
            bp["bn_pre"] = p
            bs["bn_pre"] = s
            for i, our in ((1, "conv1"), (2, "conv2")):
                bp[our] = {"kernel": w(f"{src}_{i}_conv")[0]}
                p, s = bn(f"{src}_{i}_bn")
                bp[f"bn{i}"] = p
                bs[f"bn{i}"] = s
            k3, b3 = w(f"{src}_3_conv")
            bp["conv3"] = {"kernel": k3, "bias": b3}
            try:
                k0, b0 = w(f"{src}_0_conv")
                bp["proj"] = {"kernel": k0, "bias": b0}
            except ValueError:
                pass  # identity/subsample shortcut
            params[dst] = bp
            stats[dst] = bs
    p, s = bn("post_bn")
    params["bn_final"] = p
    stats["bn_final"] = s
    return params, stats


def convert_keras_v2_checkpoint(dst_path: str, name: str = "resnet50v2",
                                weights: str = "imagenet"):
    """Build the Keras v2 model (downloads ImageNet weights when `weights=
    'imagenet'` and the environment has network) and convert to our npz."""
    import tensorflow as tf

    builders = {
        "resnet50v2": tf.keras.applications.ResNet50V2,
        "resnet101v2": tf.keras.applications.ResNet101V2,
        "resnet152v2": tf.keras.applications.ResNet152V2,
    }
    model = builders[name](weights=weights, include_top=False)
    params, stats = keras_resnet_v2_to_flax(model, _KERAS_STACKS[name])
    save_backbone_npz(params, stats, dst_path)
    return dst_path


def save_backbone_npz(params: dict, batch_stats: dict, path: str):
    """Flat npz serialization (slash-joined paths) of a backbone tree."""
    flat = {}

    def walk(tree, prefix, sink):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name, sink)
            else:
                flat[f"{sink}:{name}"] = np.asarray(v)

    walk(params, "", "params")
    walk(batch_stats, "", "stats")
    np.savez_compressed(path, **flat)


def load_backbone_npz(path: str):
    data = np.load(path)
    params: dict = {}
    stats: dict = {}
    for key in data.files:
        sink, name = key.split(":", 1)
        tree = params if sink == "params" else stats
        parts = name.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    return params, stats


def convert_torchvision_checkpoint(src_path: str, dst_path: str,
                                   depths=(3, 4, 6, 3)):
    """CLI-friendly: .pth state_dict -> our backbone .npz."""
    import torch

    sd = torch.load(src_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = torchvision_resnet_to_flax(sd, depths)
    save_backbone_npz(params, stats, dst_path)
    return dst_path


def apply_backbone_init(state_params, state_stats, backbone_params,
                        backbone_stats):
    """Merge converted backbone trees into full-model variables (the model
    nests the trunk under 'backbone'). Returns new (params, batch_stats).
    Shape-checks every leaf and reports all mismatches at once."""
    import jax

    def merge(dst, src, path):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                errors.append(f"missing in model: {path}/{k}")
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    errors.append(
                        f"shape mismatch at {path}/{k}: "
                        f"model {np.shape(dst[k])} vs init {np.shape(v)}"
                    )
                    continue
                out[k] = np.asarray(v, np.float32)
        return out

    errors: list = []
    new_params = dict(state_params)
    new_params["backbone"] = merge(state_params["backbone"], backbone_params, "backbone")
    new_stats = dict(state_stats)
    new_stats["backbone"] = merge(state_stats["backbone"], backbone_stats, "backbone")
    if errors:
        raise ValueError("backbone init mismatch:\n  " + "\n  ".join(errors))
    return jax.tree.map(np.asarray, new_params), jax.tree.map(np.asarray, new_stats)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="torchvision .pth state_dict")
    ap.add_argument("--dst", required=True, help="output .npz")
    args = ap.parse_args()
    print(convert_torchvision_checkpoint(args.src, args.dst))
