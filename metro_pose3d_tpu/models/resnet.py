"""ResNet backbone with controllable output stride (dilated final stage).

Responsibility-parity with the reference's vendored slim `resnet_v2_50`
(SURVEY.md §3: "ResNet-50 v2, ImageNet-init, output stride 16 via dilated
final stage"). Re-designed for TPU:

* NHWC layout and bfloat16 compute (MXU-native); parameters and batch-norm
  statistics stay float32.
* `output_stride=16`: the final stage runs at stride 1 with dilation 2, so
  the 256x256 crop yields the 16x16 feature map the heatmap heads need.
* Under pjit over a data mesh, batch-norm statistics are computed over the
  GLOBAL batch automatically (the mean over a sharded axis lowers to an XLA
  collective) — sync-BN for free, no axis_name plumbing.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

def max_pool_3x3_stride2(x):
    """3x3/2 max pool as a shift-and-max over 9 slices (SAME padding).

    Deliberately NOT `lax.reduce_window`: on the experimental axon TPU
    platform the select-and-scatter gradient of reduce_window-max produces
    NaNs (observed on jax 0.9.0 / v5e; minimal repro: grad of
    sum(reduce_window_max(conv(x))**2)). Elementwise `jnp.maximum` selects
    have a safe gradient, and XLA fuses the 9-way max into one kernel; the
    pool only runs once per forward (stem), so cost is negligible.
    """
    h, w = x.shape[1], x.shape[2]
    out_h, out_w = (h + 1) // 2, (w + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-1e30)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy : dy + h : 2, dx : dx + w : 2, :][:, :out_h, :out_w]
            out = s if out is None else jnp.maximum(out, s)
    return out


RESNET_DEPTHS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "tiny": (1, 1, 1, 1),  # for tests / CPU dry-runs
}
# Backbones that use the basic (two 3x3) block instead of the bottleneck.
BASIC_BLOCK = {"resnet18", "resnet34"}
BASE_WIDTHS = {"tiny": 8}  # default 64


class Bottleneck(nn.Module):
    """Pre-activation bottleneck (ResNet v2) or post-activation (v1.5)."""

    features: int  # inner width; output is 4x
    strides: int = 1
    dilation: int = 1
    preact: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        conv = lambda f, k, s, d, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            kernel_dilation=(d, d),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        out_features = self.features * 4
        needs_proj = x.shape[-1] != out_features or self.strides != 1

        if self.preact:
            h = nn.relu(bn("bn_pre")(x))
            shortcut = conv(out_features, 1, self.strides, 1, "proj")(h) if needs_proj else x
            h = conv(self.features, 1, 1, 1, "conv1")(h)
            h = nn.relu(bn("bn1")(h))
            h = conv(self.features, 3, self.strides, self.dilation, "conv2")(h)
            h = nn.relu(bn("bn2")(h))
            h = conv(out_features, 1, 1, 1, "conv3")(h)
            return shortcut + h
        else:
            shortcut = x
            if needs_proj:
                shortcut = conv(out_features, 1, self.strides, 1, "proj")(x)
                shortcut = bn("bn_proj")(shortcut)
            h = nn.relu(bn("bn1")(conv(self.features, 1, 1, 1, "conv1")(x)))
            h = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, self.dilation, "conv2")(h)))
            h = bn("bn3")(conv(out_features, 1, 1, 1, "conv3")(h))
            return nn.relu(shortcut + h)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    preact: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        conv = lambda f, k, s, d, name: nn.Conv(
            f, (k, k), strides=(s, s), kernel_dilation=(d, d), padding="SAME",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        needs_proj = x.shape[-1] != self.features or self.strides != 1
        if self.preact:
            h = nn.relu(bn("bn_pre")(x))
            shortcut = conv(self.features, 1, self.strides, 1, "proj")(h) if needs_proj else x
            h = conv(self.features, 3, self.strides, self.dilation, "conv1")(h)
            h = nn.relu(bn("bn1")(h))
            h = conv(self.features, 3, 1, self.dilation, "conv2")(h)
            return shortcut + h
        else:
            shortcut = x
            if needs_proj:
                shortcut = bn("bn_proj")(conv(self.features, 1, self.strides, 1, "proj")(x))
            h = nn.relu(bn("bn1")(conv(self.features, 3, self.strides, self.dilation, "conv1")(x)))
            h = bn("bn2")(conv(self.features, 3, 1, self.dilation, "conv2")(h))
            return nn.relu(shortcut + h)


class ResNet(nn.Module):
    """Fully-convolutional ResNet trunk; returns the final feature map."""

    variant: str = "resnet50"
    output_stride: int = 16  # 32 (none), 16 or 8 (dilated final stages)
    preact: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths: Sequence[int] = RESNET_DEPTHS[self.variant]
        base = BASE_WIDTHS.get(self.variant, 64)
        block_cls = BasicBlock if self.variant in BASIC_BLOCK else Bottleneck

        x = x.astype(self.dtype)
        x = nn.Conv(
            base, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_stem",
        )(x)
        if not self.preact:
            x = nn.relu(
                nn.BatchNorm(
                    use_running_average=not train, momentum=self.bn_momentum,
                    epsilon=self.bn_epsilon, dtype=self.dtype,
                    param_dtype=jnp.float32, name="bn_stem",
                )(x)
            )
        x = max_pool_3x3_stride2(x)

        # Stage strides for the requested output stride; once the cumulative
        # stride hits the target, later stages switch to dilation instead.
        current_stride = 4
        dilation = 1
        for stage, n_blocks in enumerate(depths):
            features = base * (2**stage)
            stage_stride = 1 if stage == 0 else 2
            if current_stride >= self.output_stride and stage_stride > 1:
                dilation *= stage_stride
                stage_stride = 1
            else:
                current_stride *= stage_stride
            for i in range(n_blocks):
                x = block_cls(
                    features=features,
                    strides=stage_stride if i == 0 else 1,
                    dilation=dilation,
                    preact=self.preact,
                    dtype=self.dtype,
                    bn_momentum=self.bn_momentum,
                    bn_epsilon=self.bn_epsilon,
                    name=f"stage{stage + 1}_block{i + 1}",
                )(x, train)

        if self.preact:  # v2: final BN+ReLU
            x = nn.relu(
                nn.BatchNorm(
                    use_running_average=not train, momentum=self.bn_momentum,
                    epsilon=self.bn_epsilon, dtype=self.dtype,
                    param_dtype=jnp.float32, name="bn_final",
                )(x)
            )
        return x
