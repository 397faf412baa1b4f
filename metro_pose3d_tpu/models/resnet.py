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
from jax import lax


class StemConv(nn.Module):
    """7x7/2 stem convolution, computed as a space-to-depth 4x4/1 conv.

    A 7x7 stride-2 conv on a 3-channel image keeps the MXU ~3% busy: the
    contraction dimension (7*7*3) is dominated by the tiny channel count and
    the strided access pattern tiles poorly. The standard TPU remedy is
    space-to-depth: group the input into 2x2 pixel blocks ([B,S,S,3] ->
    [B,S/2,S/2,12]) and run the EXACTLY equivalent 4x4 stride-1 conv whose
    kernel is the 7x7 kernel scattered over an 8x8 grid (8th row/col zero).
    Same math, same parameter (a [7,7,3,F] kernel, so ImageNet weight
    conversion is unaffected).

    Equivalence (verified by tests/test_model.py): with stride 2 and XLA
    SAME padding (pad 2 lo / 3 hi for kernel 7, even input), output pixel y
    reads input rows 2y-2..2y+4 = block rows y-1..y+2 with in-block offset
    a = (row index parity), i.e. kernel tap dy = 2*by + a. Padding for the
    block-space conv is 1 lo / 2 hi, which is XLA SAME for kernel 4 stride 1.

    Measured on the axon v5e: standalone the s2d conv is NOT faster here (the
    in-graph space-to-depth transpose costs more than the small-channel conv
    saves at this platform's effective elementwise bandwidth), so the default
    is the direct 7x7/2 conv; the s2d path stays selectable and exactness-
    tested for platforms where the transpose is free (host-side s2d or
    fusion-friendlier XLA versions).
    """

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    conv_padding: str = "same"  # "same" (TF/XLA) | "torch" (symmetric 3)
    use_bias: bool = False  # slim/Keras v2 stems carry a bias

    @nn.compact
    def __call__(self, x, use_s2d: bool = False):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
            jnp.float32,
        ).astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            .astype(self.dtype)
            if self.use_bias
            else None
        )

        def out(y):
            return y if bias is None else y + bias

        x = x.astype(self.dtype)
        b, h, w, c = x.shape
        if self.conv_padding in ("torch", "keras"):
            # torchvision/Keras pad 3/3 — a one-pixel grid shift vs XLA SAME
            # (2 lo/3 hi for even inputs); needed for exact use of
            # converted torch/Keras weights.
            return out(lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
        if not use_s2d or h % 2 or w % 2:
            return out(lax.conv_general_dilated(
                x, kernel, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
        x2 = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k4 = (
            k8.reshape(4, 2, 4, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        return out(lax.conv_general_dilated(
            x2, k4, (1, 1), [(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))


# 3x3/2 stem max pool: mode- and train-aware dispatch lives in
# ops/pool_pallas.stem_max_pool (reduce_window forward for inference,
# shift-and-max autodiff for training; measurements in its docstring).
# Alignment of the default "same" mode matches TF/XLA SAME (window at
# 2i..2i+2), i.e. the reference's slim `max_pool2d(..., 'SAME')`, which
# matters for weight-conversion parity.


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


def _conv_pad(kernel: int, strides: int, dilation: int, mode: str):
    """Padding spec: XLA "SAME", or torch's symmetric (k-1)//2 * dilation.

    Identical for stride 1; for stride 2 torch's symmetric padding shifts
    the output grid one pixel vs SAME — matters only when running
    torchvision-converted weights bit-exactly.
    """
    if mode in ("torch", "keras") and strides > 1 and kernel > 1:
        p = (kernel - 1) // 2 * dilation
        return [(p, p), (p, p)]
    return "SAME"


def parse_quantize_extras(extras: str) -> frozenset:
    """Validate `model.quantize_extras` ("" or csv of stem/heads)."""
    toks = frozenset(t.strip() for t in extras.split(",") if t.strip())
    unknown = toks - {"stem", "heads"}
    if unknown:
        raise ValueError(
            f"unknown quantize_extras {sorted(unknown)}; valid: stem, heads")
    return toks


def _make_conv(f, k, s, d, name, use_bias, dtype, conv_padding, quantize,
               out_mode="dequant", dot_1x1="none", layout="nhwc"):
    """Block conv factory: nn.Conv, or the int8/calibration conv
    (models/quantize.py) with the identical parameter tree."""
    pad = _conv_pad(k, s, d, conv_padding)
    if quantize == "none":
        if layout != "nhwc":
            raise ValueError("bf16 block convs are NHWC-only; the nchw "
                             "trunk requires quantize_stages='all'")
        return nn.Conv(
            f, (k, k), strides=(s, s), kernel_dilation=(d, d), padding=pad,
            use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name,
        )
    from metro_pose3d_tpu.models.quantize import QuantConv

    return QuantConv(
        features=f, kernel_size=(k, k), strides=(s, s), kernel_dilation=(d, d),
        padding=pad, use_bias=use_bias, dtype=dtype, mode=quantize, name=name,
        out_mode=out_mode, dot_1x1=dot_1x1, layout=layout,
    )


class GhostBatchNorm(nn.Module):
    """`nn.BatchNorm` drop-in whose TRAIN statistics cover fixed-size example
    groups (ghost BN), for training-numerics parity with small-batch
    references (VERDICT r1 missing #4).

    The rebuild's default BN under pjit normalizes with GLOBAL-batch moments
    (a mean over the sharded axis lowers to an ICI collective). The reference
    trains single-GPU at batch ~64, where BN noise is materially larger; with
    `group_size=64` every group of 64 examples gets its own train statistics,
    reproducing that regime at any global batch. When groups align with the
    per-device shard (global_batch/n_devices a multiple of group_size), XLA
    computes the statistics with NO cross-device collectives.

    Running statistics are updated with the FULL-batch moments (composed
    exactly from the group moments), identical to global BN — inference
    behavior does not depend on the switch. The parameter/stat tree matches
    `nn.BatchNorm` (params scale/bias; batch_stats mean/var), so checkpoints
    interchange between the modes.
    """

    group_size: int
    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            b = x.shape[0]
            gs = min(self.group_size, b)
            if b % gs:
                raise ValueError(
                    f"batch {b} not divisible by bn group size {gs}"
                )
            xf = x.astype(jnp.float32).reshape(b // gs, gs, *x.shape[1:])
            gmean = jnp.mean(xf, axis=(1, 2, 3))  # [G, C]
            gmean2 = jnp.mean(jnp.square(xf), axis=(1, 2, 3))
            gvar = gmean2 - jnp.square(gmean)
            # normalization uses PER-GROUP moments ...
            mean = jnp.repeat(gmean, gs, axis=0)[:, None, None, :]
            var = jnp.repeat(gvar, gs, axis=0)[:, None, None, :]
            # ... while the running stats get the exact FULL-batch moments
            full_mean = jnp.mean(gmean, axis=0)
            full_var = jnp.mean(gmean2, axis=0) - jnp.square(full_mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * full_mean
                ra_var.value = m * ra_var.value + (1 - m) * full_var

        y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def make_batch_norm(*, group_size: int, train: bool, momentum: float,
                    epsilon: float, dtype, name: str, axis: int = -1):
    """BN factory: global sync-BN (flax) or ghost BN per `group_size`.

    `axis` is the feature axis (-1 for NHWC, 1 for the int8 NCHW trunk);
    ghost BN is a training feature and the NCHW trunk is inference-only,
    so GhostBatchNorm stays channels-last.
    """
    if group_size > 0:
        if axis != -1:
            raise ValueError("ghost BN is channels-last only; the nchw "
                             "int8 trunk requires bn_group_size=0")
        return GhostBatchNorm(
            group_size=group_size, use_running_average=not train,
            momentum=momentum, epsilon=epsilon, dtype=dtype, name=name,
        )
    return nn.BatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=epsilon,
        dtype=dtype, param_dtype=jnp.float32, name=name, axis=axis,
    )


class Bottleneck(nn.Module):
    """Pre-activation bottleneck (ResNet v2) or post-activation (v1.5)."""

    features: int  # inner width; output is 4x
    strides: int = 1
    dilation: int = 1
    preact: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-5
    conv_padding: str = "same"
    # slim/Keras v2 put biases on the convs NOT followed by a BN (conv3 and
    # the projection shortcut); needed for exact v2-checkpoint conversion.
    v2_biases: bool = False
    bn_group_size: int = 0  # 0 = global sync-BN; >0 = ghost BN groups
    quantize: str = "none"  # "none" | "int8" | "calib" (models/quantize.py)
    quantize_fused: bool = True  # int8: fuse dequant+BN+ReLU+requant at the
    #                              block-internal junctions (preact only)
    quantize_1x1_dot: str = "none"  # pointwise int8 convs as dot_generals
    quantize_layout: str = "nhwc"  # int8 activation layout (see QuantConv)

    @nn.compact
    def __call__(self, x, train: bool):
        # NCHW applies only to the int8 graph (the layout knob is an int8
        # emitter lever; bf16/calib stay flax-native NHWC)
        nchw = self.quantize == "int8" and self.quantize_layout == "nchw"
        caxis = 1 if nchw else -1
        bn = lambda name: make_batch_norm(
            group_size=self.bn_group_size, train=train,
            momentum=self.bn_momentum, epsilon=self.bn_epsilon,
            dtype=self.dtype, name=name, axis=caxis,
        )
        conv = lambda f, k, s, d, name, ub=False, om="dequant": _make_conv(
            f, k, s, d, name, ub, self.dtype, self.conv_padding, self.quantize,
            out_mode=om, dot_1x1=self.quantize_1x1_dot,
            layout="nchw" if nchw else "nhwc",
        )
        out_features = self.features * 4
        change = x.shape[caxis] != out_features
        # stride without channel change (slim "last"-unit case): shortcut is
        # a 1x1 subsample of the input (slim's max_pool2d([1,1], stride)),
        # not a projection — keeps the parameter tree identical across
        # stride_position modes.
        if self.strides != 1 and not change:
            subsample = (
                (lambda t: t[:, :, :: self.strides, :: self.strides]) if nchw
                else (lambda t: t[:, :: self.strides, :: self.strides, :]))
        else:
            subsample = lambda t: t

        if self.preact:
            h = nn.relu(bn("bn_pre")(x))
            shortcut = (
                conv(out_features, 1, self.strides, 1, "proj", ub=self.v2_biases)(h)
                if change
                else subsample(x)
            )
            if self.quantize == "int8" and self.quantize_fused:
                # fused int8 chain (VERDICT r2 weak #2): the residual stream
                # stays bf16, but the two block-internal junctions run as
                # one elementwise requant pass on the int32 accumulator and
                # the inter-conv activations stay int8 in HBM. BNAffine
                # declares the identical bn1/bn2 trees, so checkpoints and
                # calibrations interchange with the unfused graph.
                from metro_pose3d_tpu.models.quantize import BNAffine

                acc1 = conv(self.features, 1, 1, 1, "conv1", om="acc")(h)
                aff1 = BNAffine(epsilon=self.bn_epsilon, name="bn1")(self.features)
                acc2 = conv(self.features, 3, self.strides, self.dilation,
                            "conv2", om="acc")(acc1, pre_affine=aff1)
                aff2 = BNAffine(epsilon=self.bn_epsilon, name="bn2")(self.features)
                h = conv(out_features, 1, 1, 1, "conv3",
                         ub=self.v2_biases)(acc2, pre_affine=aff2)
                return shortcut + h
            h = conv(self.features, 1, 1, 1, "conv1")(h)
            h = nn.relu(bn("bn1")(h))
            h = conv(self.features, 3, self.strides, self.dilation, "conv2")(h)
            h = nn.relu(bn("bn2")(h))
            h = conv(out_features, 1, 1, 1, "conv3", ub=self.v2_biases)(h)
            return shortcut + h
        else:
            shortcut = subsample(x)
            if change:
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
    conv_padding: str = "same"
    v2_biases: bool = False
    bn_group_size: int = 0
    quantize: str = "none"
    quantize_fused: bool = True  # accepted for API parity; the basic block
    quantize_1x1_dot: str = "none"  # parity; basic blocks have no 1x1 convs
    #                              keeps the unfused int8 junctions
    quantize_layout: str = "nhwc"  # parity; ResNet rejects nchw for basic
    #                                variants before any block is built

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: make_batch_norm(
            group_size=self.bn_group_size, train=train,
            momentum=self.bn_momentum, epsilon=self.bn_epsilon,
            dtype=self.dtype, name=name,
        )
        conv = lambda f, k, s, d, name, ub=False: _make_conv(
            f, k, s, d, name, ub, self.dtype, self.conv_padding, self.quantize
        )
        change = x.shape[-1] != self.features
        subsample = (lambda t: t[:, :: self.strides, :: self.strides, :]) if (
            self.strides != 1 and not change
        ) else (lambda t: t)
        if self.preact:
            h = nn.relu(bn("bn_pre")(x))
            shortcut = (
                conv(self.features, 1, self.strides, 1, "proj", ub=self.v2_biases)(h)
                if change
                else subsample(x)
            )
            h = conv(self.features, 3, self.strides, self.dilation, "conv1")(h)
            h = nn.relu(bn("bn1")(h))
            h = conv(self.features, 3, 1, self.dilation, "conv2", ub=self.v2_biases)(h)
            return shortcut + h
        else:
            shortcut = subsample(x)
            if change:
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
    conv_padding: str = "same"  # "same" (TF parity) | "torch" (torchvision)
    # Where a stage's stride-2 lives: "first" unit (torch/torchvision
    # convention — matches utils/convert_backbone.py) or "last" unit (TF
    # slim resnet_v2 / Keras V2 — the reference's vendored backbone;
    # required for converting slim ImageNet checkpoints exactly).
    stride_position: str = "first"
    v2_biases: bool = False  # slim/Keras v2 bias placement (see Bottleneck)
    bn_group_size: int = 0  # 0 = global sync-BN; >0 = ghost-BN group size
    quantize: str = "none"  # inference-only int8 path (models/quantize.py)
    quantize_stages: str = "all"  # "all" or csv of 1-based stage numbers
    quantize_fused: bool = True  # fused block-internal int8 junctions
    quantize_1x1_dot: str = "none"  # pointwise int8 convs as dot_generals
    quantize_extras: str = ""  # csv; "stem" quantizes the 7x7/2 input conv
    quantize_layout: str = "nhwc"  # int8 trunk activation layout (see
    #                                QuantConv.layout; "nchw" transposes the
    #                                trunk once after the stem pool and once
    #                                before bn_final)

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths: Sequence[int] = RESNET_DEPTHS[self.variant]
        base = BASE_WIDTHS.get(self.variant, 64)
        block_cls = BasicBlock if self.variant in BASIC_BLOCK else Bottleneck

        if self.quantize_layout not in ("nhwc", "nchw"):
            raise ValueError(
                f"unknown quantize_layout {self.quantize_layout!r}")
        # NCHW is an int8-emitter lever: bf16 and calibration graphs stay
        # flax-native NHWC (per-tensor scales transfer across layouts).
        nchw_trunk = self.quantize == "int8" and self.quantize_layout == "nchw"
        if nchw_trunk and self.quantize_stages != "all":
            raise ValueError(
                "quantize_layout='nchw' transposes the whole trunk once; "
                "mixed bf16/int8 stages would need per-stage transposes — "
                "use quantize_stages='all' (or layout='nhwc')")
        if nchw_trunk and self.variant in BASIC_BLOCK:
            raise ValueError(
                "quantize_layout='nchw' supports bottleneck variants only")

        x = x.astype(self.dtype)
        extras = parse_quantize_extras(self.quantize_extras)
        if "stem" in extras and self.quantize != "none":
            # Same parameter tree as StemConv ("kernel" [7,7,3,F] + optional
            # "bias"), so checkpoints stay interchangeable across quantize
            # modes. The crop input is normalize()'s roughly zero-mean float
            # (NOT post-ReLU), so symmetric int8 uses the full signed range
            # here, unlike the effectively-7-bit block activations.
            x = _make_conv(base, 7, 2, 1, "conv_stem", self.v2_biases,
                           self.dtype, self.conv_padding, self.quantize)(x)
        else:
            x = StemConv(base, dtype=self.dtype,
                         conv_padding=self.conv_padding,
                         use_bias=self.v2_biases, name="conv_stem")(x)
        if not self.preact:
            x = nn.relu(
                make_batch_norm(
                    group_size=self.bn_group_size, train=train,
                    momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                    dtype=self.dtype, name="bn_stem",
                )(x)
            )
        # train routes through the shift-max autodiff form (fastest
        # fwd+bwd); inference keeps reduce_window (fastest fwd, fuses
        # with the stem conv). Identical forward values either way; see
        # the measured ledger in ops/pool_pallas.py `stem_max_pool`.
        from metro_pose3d_tpu.ops.pool_pallas import stem_max_pool

        pool_mode = (self.conv_padding
                     if self.conv_padding in ("torch", "keras") else "same")
        x = stem_max_pool(x, mode=pool_mode, train=train)
        if nchw_trunk:
            # one transpose in, one out (before bn_final) for the whole
            # trunk — the full-model A/B (config.py quantize_layout) prices
            # these against the per-conv emitter wins
            x = jnp.transpose(x, (0, 3, 1, 2))

        # Stage strides for the requested output stride; once the cumulative
        # stride hits the target, later stages switch to dilation instead.
        # With stride_position="first" (torch), stage s>1 downsamples at its
        # first unit; with "last" (TF slim v2), each stage downsamples at its
        # LAST unit, so the NEXT stage starts at the reduced resolution —
        # identical stage-boundary shapes and parameter tree, different
        # within-stage resolutions.
        current_stride = 4
        dilation = 1
        last_pos = self.stride_position == "last"
        for stage, n_blocks in enumerate(depths):
            features = base * (2**stage)
            if last_pos:
                # slim: stages 1..3 end with stride 2, final stage stride 1
                stage_stride = 2 if stage < len(depths) - 1 else 1
            else:
                stage_stride = 1 if stage == 0 else 2
            stage_dil = dilation
            if stage_stride > 1 and current_stride >= self.output_stride:
                # stride dropped for the target output stride. torch-style
                # bumps the rate for the stage itself; slim-style multiplies
                # the rate AFTER the dropped-stride (last) unit, so the
                # dropping stage still runs at the previous rate.
                dilation *= stage_stride
                if not last_pos:
                    stage_dil = dilation
                stage_stride = 1
            elif stage_stride > 1:
                current_stride *= stage_stride
            if self.quantize_stages == "all":
                stage_quant = self.quantize
            else:
                allowed = {int(s) for s in self.quantize_stages.split(",") if s}
                stage_quant = self.quantize if (stage + 1) in allowed else "none"
            strided_unit = (n_blocks - 1) if last_pos else 0
            for i in range(n_blocks):
                x = block_cls(
                    features=features,
                    strides=stage_stride if i == strided_unit else 1,
                    dilation=stage_dil,
                    preact=self.preact,
                    dtype=self.dtype,
                    bn_momentum=self.bn_momentum,
                    bn_epsilon=self.bn_epsilon,
                    conv_padding=self.conv_padding,
                    v2_biases=self.v2_biases,
                    bn_group_size=self.bn_group_size,
                    quantize=stage_quant,
                    quantize_fused=self.quantize_fused,
                    quantize_1x1_dot=self.quantize_1x1_dot,
                    quantize_layout=self.quantize_layout,
                    name=f"stage{stage + 1}_block{i + 1}",
                )(x, train)

        if nchw_trunk:
            x = jnp.transpose(x, (0, 2, 3, 1))
        if self.preact:  # v2: final BN+ReLU
            x = nn.relu(
                make_batch_norm(
                    group_size=self.bn_group_size, train=train,
                    momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                    dtype=self.dtype, name="bn_final",
                )(x)
            )
        return x
