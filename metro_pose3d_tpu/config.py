"""Typed configuration tree + CLI overrides.

TPU-native replacement for the reference's global-FLAGS system
(`src/options.py` + `src/init.py`, SURVEY.md §2 L0 / §6): every reference
flag that changes numerics is an explicit field with the reference default
(see `reference_constants` for provenance). Instead of a mutable module-global
singleton, a frozen dataclass tree is threaded explicitly; CLI overrides use
dotted paths, e.g. ``--model.depth=8 --train.base_lr=1e-4``.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

from metro_pose3d_tpu import reference_constants as C


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model_class: str = "metro"      # "metro" | "twofive" (2.5D baseline)
    backbone: str = "resnet50"      # resnet50/101/152 (bottleneck), resnet18/
                                    # 34 (basic block), "tiny" (tests) — the
                                    # reference's --architecture depth choices
                                    # (models/resnet.py RESNET_DEPTHS)
    preactivation: bool = True      # ResNet v2 (preact) vs v1.5
    conv_padding: str = "same"      # "same" (TF parity) | "torch"/"keras"
                                    # (for converted ImageNet weights; they
                                    # differ only in the pool pad value)
    stride_position: str = "last"   # "last" (TF slim v2 / Keras V2 — the
                                    # reference's backbone; also ~9% faster:
                                    # stage tails downsample a block earlier)
                                    # | "first" (torch/torchvision layout)
    v2_biases: bool = False         # slim/Keras v2 bias placement (conv3 +
                                    # projection + stem)
    proc_side: int = C.PROC_SIDE
    stride: int = C.STRIDE          # output stride (dilated final stage)
    # Phase-specific output strides — the reference's --stride-train /
    # --stride-test flag pair (SURVEY.md §6 config row). The dilated-final-
    # stage trick keeps every parameter shape identical across strides
    # (dilation only changes conv spacing, never kernel/BN shapes), so ONE
    # param tree can train at a coarse stride (e.g. 32: the final stage runs
    # at 8x8 instead of 16x16 for a 256 crop — cheaper convs) and evaluate
    # at a fine one (e.g. 16, or 8 for extra heatmap resolution). 0 = use
    # `stride` (default: phases share one stride, the round-1 behavior).
    # Resolution happens via `at_phase`: the trainer (incl. its in-loop
    # validation) runs the train stride; --test/--export/serving paths run
    # the test stride.
    stride_train: int = 0
    stride_test: int = 0
    depth: int = C.DEPTH            # depth slices of the volumetric heatmap
    box_size_mm: float = C.BOX_SIZE_MM
    num_joints: int = 17
    compute_dtype: str = "bfloat16"  # MXU-native; params stay float32
    matmul_precision: str = ""      # "" (platform default; TPU: bf16 inputs
                                    # even for f32 arrays) | "highest" (f32
                                    # everywhere — exact CPU<->TPU protocol
                                    # parity, ~3x slower convs; applied as
                                    # jax's global default by main.py)
    # inference-only int8 conv path ("none" | "int8"; "calib" is used
    # internally by models/quantize.calibrate). Requires a calibration
    # pass — see models/quantize.py.
    quantize: str = "none"
    # activation-scale estimator for the calibration pass: "p<pct>" (e.g.
    # "p99.9": running max of per-batch |x| percentiles) or "absmax"
    # (running |x| max). Default p99.9: on the frozen H36M shard a few
    # saturated pixels in ONE calibration batch cost absmax +1.44 mm MPJPE
    # while p99.9 held at -0.07 mm, and its clean-data delta is -0.20 mm on
    # a 511 mm protocol (tests/test_h36m_shard.py::TestCalibOutlierShard,
    # round-4 A/B). Mechanism test: test_quantize.py::TestCalibOutlier.
    quantize_calib: str = "p99.9"
    # which residual stages quantize ("all" or csv of 1..4, matching the
    # parameter names stage1..stage4; stage4 is the dilated final stage =
    # torchvision's conv5_x): per-shape int8 rates vary 0.28x-3.29x vs bf16
    # on v5e (scripts/exp_int8_shapes.py 2026-08-17) — the dilated final
    # stage wins everywhere, small-channel 1x1s lose, so a stage policy
    # beats blanket quantization.
    quantize_stages: str = "all"
    # csv of extra graph pieces to quantize beyond the residual stages:
    # "stem" (the 7x7/2 input conv) and/or "heads" (the two 1x1 output
    # convs). Default "": round-3 left these bf16 ("the heads themselves
    # and the stem stay bf16", models/quantize.py) — the round-4 chip A/B
    # at the serving shapes decides whether they join the int8 graph
    # (VERDICT r3 weak #1: the unattempted margin levers on the 5k-TTA
    # target). Accuracy deltas are pinned on the frozen H36M shard.
    quantize_extras: str = ""
    # int8: fuse the block-internal dequant+BN+ReLU+requant junctions into
    # one elementwise pass on the int32 accumulator (activations stay int8
    # in HBM between a bottleneck's convs). Identical math to the unfused
    # graph up to f32 reassociation; calibration always runs unfused.
    quantize_fused: bool = True
    # int8: emit qualifying pointwise (1x1, unit-stride) convs as reshaped
    # int8 dot_generals instead of convs — "none" | "all" | "cin>=N".
    # BIT-EXACT rerouting (same int8xint8->int32 integer sums), so goldens
    # and calibration never move; purely a throughput knob. Per-shape micro
    # rates: dot wins up to 1.46x (s5 2048->512) and loses to 0.46x
    # (s3 512->128) vs the conv emitter — scripts/exp_int8_dot1x1.py.
    # End-to-end same-session chip A/B (2026-08-19, /tmp/ab_dot1x1.log):
    # no-TTA bs128 none 9,692 / all 9,863 (+1.8%) / cin>=1024 9,659;
    # TTA bs64 none 4,808 / all 4,905 (+2.0%) / cin>=1024 4,956 (+3.1%);
    # p50 batch latency drops consistently (47.8->42.2 / 49.8->38.4 ms).
    # Round-5 revisit under the dispatch-free device scan rate (BASELINE
    # round-5 dot-policy sweep + replication): all policies agree within
    # ~1% on both protocols (TTA all-mean 5,645 vs none 5,617; no-TTA
    # 11,078 vs 11,091) — the round-4 edges were dispatch noise. "all"
    # stays the default: bit-exact, never loses, simplest invariant.
    quantize_1x1_dot: str = "all"
    # int8: activation layout of the residual trunk — "nhwc" (flax-native)
    # or "nchw". The int8 conv emitter prefers NCHW on 7/8 R50 shapes in
    # isolation (1.01-1.18x, scripts/exp_int8_layout.py) and the win
    # survives the fused requant chain on 3/4 stages (-5.3% trunk-stage
    # sum, scripts/exp_int8_layout_chain.py) — but the FULL-MODEL chip A/B
    # (2026-08-20, two serial passes each direction, /tmp/ab_layout.log →
    # BASELINE.md round-5): NHWC 10,020 vs NCHW 7,980 crops/s no-TTA bs128
    # (-20%!), TTA bs64 NHWC 4,839 vs NCHW 3,057-4,037. The stage-level
    # probes miss what the whole graph sees: XLA fuses the f32 requant
    # epilogues and head/stem transitions differently once every stage is
    # NCHW, and the two explicit trunk transposes don't amortize. NHWC
    # stays the default; the knob remains for re-probing after toolchain
    # updates. BIT-EXACT rerouting either way (integer conv sums +
    # elementwise f32 epilogues are layout-independent;
    # tests/test_quantize.py::TestLayout). Requires quantize_stages="all"
    # and a bottleneck variant.
    quantize_layout: str = "nhwc"
    bn_momentum: float = C.BN_MOMENTUM
    bn_epsilon: float = C.BN_EPSILON
    # 0 = global sync-BN over the sharded batch (TPU default). >0 = ghost BN:
    # train statistics per `bn_group_size` examples, for training-numerics
    # parity with the reference's single-GPU batch (~64); see
    # models/resnet.py GhostBatchNorm. Inference is unaffected.
    bn_group_size: int = 0

    @property
    def heatmap_side(self) -> int:
        return self.proc_side // self.stride

    def at_phase(self, train: bool) -> "ModelConfig":
        """Resolve stride_train/stride_test into a concrete `stride`.

        Every model-construction site calls this (train/state.py +
        train/loop.py with train=True; evaluation/engine.py, export.py,
        multiperson.py, models/quantize.py with train=False), so the
        phase fields never leak past model build time. Returns self when
        no phase override is set.
        """
        s = (self.stride_train if train else self.stride_test) or self.stride
        if s == self.stride and not (self.stride_train or self.stride_test):
            return self
        return dataclasses.replace(self, stride=s, stride_train=0, stride_test=0)


@dataclasses.dataclass(frozen=True)
class AugConfig:
    shift_frac: float = C.AUG_SHIFT_FRAC
    scale_down: float = C.AUG_SCALE_DOWN
    scale_up: float = C.AUG_SCALE_UP
    rot_max_deg: float = C.AUG_ROT_MAX_DEG
    flip_prob: float = C.AUG_FLIP_PROB
    occlude_prob: float = C.AUG_OCCLUDE_PROB
    # side (px) of the device-resident occluder RGBA tiles; the VOC cutouts
    # are area-resized into this square at bank build time
    # (pipeline/occluders.get_occluder_bank)
    occluder_tile_side: int = 96
    color_prob: float = C.AUG_COLOR_PROB
    brightness_max: float = 0.125   # additive, on [0,1]-scaled intensities
    contrast_range: float = 0.25
    saturation_range: float = 0.25
    hue_max: float = 0.05           # fraction of a full hue revolution
    background_prob: float = 0.7    # 3DHP green-screen replacement
    # on-device warp sampler for ALL crop extraction (train augment, eval
    # from-tiles, multi-person frame mode): auto | twopass | packed |
    # reference — see ops/warp.py::warp_images. "auto" = the Mosaic two-pass
    # kernel on TPU (27x faster, <=1 LSB vs direct bilinear), exact direct
    # gather elsewhere.
    warp_sampler: str = "auto"
    # Newton iterations of the two-pass sampler's row-crossing inverse
    # (ops/warp_twopass.py). The closed form is EXACT for distortion-free
    # cameras, so pipelines whose sources carry no distortion (synthetic,
    # pre-undistorted) may set 0 and save ~60% of the field computation;
    # MUST stay >= 2 when any source camera has distortion coefficients.
    # Static (trace-time): a runtime branch was measured slower (DESIGN
    # §3.1.1).
    warp_newton_iters: int = 3


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"      # h36m | mpi_inf_3dhp | mpii | synthetic
    dataset_2d: str = ""            # auxiliary 2D dataset (e.g. "mpii")
    data_root: str = "/data"
    cache_dir: str = "/data/cache"
    source_side: int = 512          # fixed host->device source-tile side
    workers: int = 4
    # "thread" (decode releases the GIL; fine for <=2 cores) | "process"
    # (spawn workers; needed on real hosts where prepare_example's Python
    # 3x3 algebra is GIL-bound — BASELINE.md puts it at ~4.5 cores/chip at
    # the 5k crops/s target)
    pool_type: str = "thread"
    # crop-parameter math engine: "auto" (native C engine when it builds,
    # else python — the default since round 4: the engine is parity-pinned
    # to ~1e-12 across 11 tests and 5x the eval feed, so production users
    # get it without knowing the knob), "native" (fail loud when the
    # extension can't build), "python" (numpy; golden-generating test
    # configs pin this explicitly). Results agree to ~1e-12 relative; rng
    # draws are engine-independent.
    host_prep: str = "auto"
    test_box_expansion: float = C.TEST_BOX_EXPANSION
    # augmentation asset roots (reference: VOC2012 occluder cutouts, INRIA-
    # style background images for 3DHP green-screen replacement). Empty ->
    # procedural fallback banks, so training runs without the downloads.
    # These are the CLI spellings of train()'s occluder_root/background_root
    # arguments; an explicit argument wins over the config field.
    occluder_root: str = ""
    background_root: str = ""
    # BENCHMARK AID, off in production (0): pre-prepare this many host
    # batches once, then cycle them for the whole run. Decouples device-
    # throughput/stability receipts (e.g. the flagship R50@256 bs512
    # training run) from this dev box's single host core, which cannot
    # sustain the live feed at that shape. NOTE: augmentation parameters
    # are host-sampled per (seed, epoch, idx) and ride in the batch, so
    # cycling repeats examples WITH their augmentations — fine for
    # throughput/stability receipts, not for learning-curve fidelity.
    cycle_batches: int = 0
    # synthetic-dataset split sizes (data.dataset="synthetic" only): the
    # procedural dataset is generated per (seed, index), so the split sizes
    # are free parameters; CLI-reachable so flagship-scale receipts (e.g.
    # R50@256 bs512) can draw enough distinct examples per cycled batch.
    synthetic_n_train: int = 512
    synthetic_n_test: int = 64


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64            # global batch (split over the mesh)
    batch_size_2d: int = 32         # auxiliary 2D examples per global batch
    num_steps: int = 400_000
    base_lr: float = C.ADAM_LR
    lr_schedule: str = "exp_decay"  # "exp_decay" | "cosine" | "constant"
    lr_decay_steps: int = 100_000
    lr_decay_rate: float = 0.33
    warmup_steps: int = 1_000
    loss_2d_weight: float = C.LOSS_2D_WEIGHT
    absloss_weight: float = 0.0     # optional absolute-pose aux loss
    grad_clip_norm: float = 1.0     # global-norm gradient clip (0 = off);
                                    # framework default — an unclipped spike
                                    # was observed to poison Adam state and
                                    # permanently degrade a synthetic run
    fused_adam: bool = False        # single-buffer Adam+clip (train/loop.py
                                    # flat_fused_adam): ~4.7 ms/step cheaper
                                    # than the optax tree chain on the v5e;
                                    # same math up to float reassociation
    # > 1: run K train steps inside ONE jitted lax.fori_loop dispatch
    # (train/loop.py make_fused_train_step) — per-dispatch host overhead is
    # paid once per K steps. Requires device-resident batches
    # (data.cycle_batches > 0); log/checkpoint/validate boundaries must be
    # multiples of K so the logging semantics stay step-exact. Numerically
    # step-for-step equivalent to unfused dispatch (tests/test_fused_steps).
    fused_steps: int = 1
    seed: int = 0
    checkpoint_every: int = 2_000
    # > 0: capture an XLA profiler trace of this many consecutive train
    # steps (starting a few steps in, past compilation) into
    # <logdir>/profile — view with tensorboard-plugin-profile/xprof
    profile_steps: int = 0
    keep_checkpoints: int = 3
    log_every: int = 100
    validate_every: int = 10_000
    # eval batches per in-loop validation pass (caps the examples the
    # best-checkpoint decision sees; raise at real-dataset scale where a
    # 4-batch subsample makes `save_if_best` ride a noisy estimate)
    validate_batches: int = 4
    logdir: str = "/tmp/metro_tpu_runs/default"
    load_path: str = ""             # warm-start checkpoint
    backbone_init: str = ""         # ImageNet-pretrained backbone params


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 128
    flip_tta: bool = True
    scale_recovery: str = "metric"  # "metric" | "bone_lengths"
    reconstruct_absolute: bool = True
    reconstruction: str = "full"    # "full" perspective LSQ | "weak"
                                    # (orthographic z-decoupled variant)
    pred_path: str = ""             # where --test dumps predictions (.npz)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data_axis: int = -1             # -1: all local devices data-parallel


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    aug: AugConfig = dataclasses.field(default_factory=AugConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def apply_matmul_precision(cfg: "Config") -> None:
    """Honor `model.matmul_precision` as jax's global default.

    Called by every entry point that runs the model (main.py CLI,
    trainer.train, evaluation.predict.*), so the field works for
    programmatic users too, not just the CLI. TPU's platform default feeds
    bf16-mantissa inputs to f32 matmuls; "highest" makes chip protocol
    numbers match the CPU-pinned goldens to rtol 1e-4
    (scripts/exp_shard_parity_chip.py, BASELINE round-3 section).
    """
    if cfg.model.matmul_precision:
        import jax

        jax.config.update("jax_default_matmul_precision",
                          cfg.model.matmul_precision)


def _coerce(value: str, target_type):
    if target_type is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if target_type is Optional[str]:
        return value
    return target_type(value)


def apply_overrides(cfg: Config, overrides: dict) -> Config:
    """Apply {"model.depth": "8", ...} dotted-path overrides (immutably)."""
    grouped: dict = {}
    for path, value in overrides.items():
        section, _, field = path.partition(".")
        if not field:
            raise ValueError(f"override must be section.field, got {path!r}")
        grouped.setdefault(section, {})[field] = value

    updates = {}
    for section, fields in grouped.items():
        sub = getattr(cfg, section)
        field_types = {f.name: f.type for f in dataclasses.fields(sub)}
        coerced = {}
        for name, raw in fields.items():
            if name not in field_types:
                raise ValueError(f"unknown config field {section}.{name}")
            current = getattr(sub, name)
            coerced[name] = _coerce(str(raw), type(current))
        updates[section] = dataclasses.replace(sub, **coerced)
    return dataclasses.replace(cfg, **updates)


def parse_cli(argv) -> tuple[Config, list]:
    """Parse ``--section.field=value`` overrides; returns (config, rest)."""
    overrides, rest = {}, []
    for arg in argv:
        if arg.startswith("--") and "=" in arg and "." in arg.split("=", 1)[0]:
            key, _, value = arg[2:].partition("=")
            overrides[key] = value
        else:
            rest.append(arg)
    return apply_overrides(Config(), overrides), rest


def config_to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)
