"""Int8 inference path (models/quantize.py): mechanism tests on CPU.

Throughput evidence lives on the chip (scripts/exp_int8_probe.py and the
quantized predict bench); here: calibration populates scales, the int8
graph tracks the f32 graph within quantization error, parameter trees are
interchangeable, and training refuses the quantized graph.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metro_pose3d_tpu.config import Config, apply_overrides
from metro_pose3d_tpu.models.metro import MetroModel
from metro_pose3d_tpu.models.quantize import calibrate


def _cfg(quant="none"):
    cfg = apply_overrides(Config(), {
        "model.backbone": "tiny", "model.proc_side": "64",
        "model.depth": "4", "model.compute_dtype": "float32",
    })
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize=quant))


def _crops(rng, n=4):
    return jnp.asarray(rng.uniform(-1, 1, (n, 64, 64, 3)), jnp.float32)


def test_calibrate_then_int8_tracks_f32():
    rng = np.random.RandomState(0)
    base = MetroModel(_cfg("none").model)
    variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)

    calib_model = MetroModel(_cfg("calib").model)
    calibrated = calibrate(
        calib_model, dict(variables), [_crops(rng) for _ in range(3)])
    assert "quant" in calibrated
    amaxes = jax.tree_util.tree_leaves(calibrated["quant"])
    assert len(amaxes) > 0 and all(float(a) > 0 for a in amaxes)

    l3_f, l2_f = base.apply(variables, _crops(np.random.RandomState(7)), train=False)
    int8_model = MetroModel(_cfg("int8").model)
    l3_q, l2_q = int8_model.apply(
        calibrated, _crops(np.random.RandomState(7)), train=False)
    # random-weight logits are O(1); int8 PTQ should track within a few %
    scale = float(jnp.abs(l3_f).max())
    assert float(jnp.abs(l3_q - l3_f).max()) < 0.1 * scale + 0.05
    assert np.isfinite(np.asarray(l2_q)).all()


def test_fused_junctions_match_unfused_int8():
    """model.quantize_fused folds dequant+BN+ReLU+requant into one pass on
    the int32 accumulator; it must (a) reuse the SAME param/batch_stats/
    quant trees and (b) track the unfused int8 graph within rounding."""
    import jax.numpy as jnp

    rng = np.random.RandomState(6)
    base = MetroModel(_cfg("none").model)
    variables = base.init(jax.random.PRNGKey(2), _crops(rng, 1), train=False)
    # non-trivial batch stats so the BN affine actually does something
    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map(
        lambda v: v + jnp.abs(jax.random.normal(
            jax.random.PRNGKey(3), v.shape)) * 0.1,
        variables["batch_stats"])
    calibrated = calibrate(
        MetroModel(_cfg("calib").model), dict(variables),
        [_crops(rng) for _ in range(2)])

    cfg_fused = _cfg("int8")
    cfg_unfused = dataclasses.replace(
        cfg_fused, model=dataclasses.replace(
            cfg_fused.model, quantize_fused=False))
    x = _crops(np.random.RandomState(8))
    l3_f, l2_f = MetroModel(cfg_fused.model).apply(calibrated, x, train=False)
    l3_u, l2_u = MetroModel(cfg_unfused.model).apply(calibrated, x, train=False)
    # same math up to f32 reassociation; a borderline texel may round to a
    # neighboring int8 step, so compare with a small tolerance
    scale = float(jnp.abs(l3_u).max()) + 1e-6
    assert float(jnp.abs(l3_f - l3_u).max()) < 0.05 * scale + 0.02
    assert np.isfinite(np.asarray(l2_f)).all()

    # both graphs template the same variable trees
    v_f = MetroModel(cfg_fused.model).init(
        jax.random.PRNGKey(0), _crops(rng, 1), train=False)
    v_u = MetroModel(cfg_unfused.model).init(
        jax.random.PRNGKey(0), _crops(rng, 1), train=False)
    paths = lambda tree: set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(tree))
    for coll in ("params", "batch_stats", "quant"):
        assert paths(v_f[coll]) == paths(v_u[coll]), coll


def test_param_tree_identical_across_modes():
    rng = np.random.RandomState(1)
    v_none = MetroModel(_cfg("none").model).init(
        jax.random.PRNGKey(0), _crops(rng, 1), train=False)
    v_int8 = MetroModel(_cfg("int8").model).init(
        jax.random.PRNGKey(0), _crops(rng, 1), train=False)
    paths = lambda tree: set(
        jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(tree))
    assert paths(v_none["params"]) == paths(v_int8["params"])


def test_train_refuses_quantized_graph():
    rng = np.random.RandomState(2)
    model = MetroModel(_cfg("int8").model)
    with pytest.raises(ValueError, match="inference-only"):
        model.init(jax.random.PRNGKey(0), _crops(rng, 1), train=True)


def test_int8_bundle_export_roundtrip(tmp_path):
    """An exported int8 bundle must preserve the calibrated quant scales
    (export serializes all variable collections; load templates them from
    model.init under the bundled config)."""
    from metro_pose3d_tpu.export import export_model, load_exported

    rng = np.random.RandomState(3)
    base = MetroModel(_cfg("none").model)
    variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
    calibrated = calibrate(
        MetroModel(_cfg("calib").model), dict(variables), [_crops(rng)])

    out = str(tmp_path / "bundle")
    export_model(_cfg("int8"), calibrated, out)
    cfg2, loaded, fn = load_exported(out)
    assert cfg2.model.quantize == "int8"
    want = jax.tree_util.tree_leaves(calibrated["quant"])
    got = jax.tree_util.tree_leaves(loaded["quant"])
    assert len(want) == len(got)
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32))
    crops_u8 = jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3)), jnp.uint8)
    intr = jnp.tile(jnp.asarray(
        [[90.0, 0, 31.5], [0, 90.0, 31.5], [0, 0, 1]], jnp.float32)[None], (2, 1, 1))
    out = fn(loaded, crops_u8, intr)
    assert np.isfinite(np.asarray(out["pose3d_rootrel"])).all()


def test_quantize_stage_policy_limits_scales():
    """quantize_stages="2" creates quant scales only for stage-2 blocks."""
    rng = np.random.RandomState(4)
    cfg = _cfg("calib")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize_stages="2"))
    model = MetroModel(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
    calibrated = calibrate(model, dict(variables), [_crops(rng)])
    names = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(calibrated["quant"])]
    assert names and all("stage2_" in n for n in names)

    # and the int8 graph under the same policy runs on those scales
    cfg8 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize="int8"))
    out3, out2 = MetroModel(cfg8.model).apply(
        calibrated, _crops(np.random.RandomState(5)), train=False)
    assert np.isfinite(np.asarray(out3)).all()


class TestCalibOutlier:
    """VERDICT r3 weak #2: abs-max activation calibration is maximally
    outlier-sensitive — one hot pixel in one calibration batch inflates the
    scale for the whole tensor. The percentile estimator (quantize_calib=
    "p99.9") must shrug the outlier off and keep int8 accuracy."""

    def _setup(self, estimator):
        from metro_pose3d_tpu.models.quantize import calib_mode

        rng = np.random.RandomState(10)
        base = MetroModel(_cfg("none").model)
        variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        batches = [_crops(rng) for _ in range(3)]
        # hot pixel: one element of one batch blows up 50x
        poisoned = batches[1].at[0, 5, 5, 0].set(50.0)
        batches = [batches[0], poisoned, batches[2]]
        mcfg = dataclasses.replace(_cfg("none").model, quantize_calib=estimator)
        calib = MetroModel(dataclasses.replace(mcfg, quantize=calib_mode(mcfg)))
        calibrated = calibrate(calib, dict(variables), batches)
        return variables, calibrated

    def test_percentile_scales_resist_outlier(self):
        """Estimator mechanism at the QuantConv level: a single hot element
        defines the absmax scale but cannot move the 99.9th percentile."""
        from metro_pose3d_tpu.models.quantize import QuantConv

        rng = np.random.RandomState(12)
        x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 8)), jnp.float32)
        hot = x.at[0, 3, 3, 0].set(50.0)

        def amax_after(mode, batch):
            conv = QuantConv(features=4, kernel_size=(1, 1), mode=mode)
            v = conv.init(jax.random.PRNGKey(0), batch)
            _, upd = conv.apply(v, batch, mutable=["quant"])
            return float(jax.tree_util.tree_leaves(upd["quant"])[0])

        assert amax_after("calib", hot) == pytest.approx(50.0)
        clean_p = amax_after("calib:99.9", x)
        hot_p = amax_after("calib:99.9", hot)
        assert hot_p == pytest.approx(clean_p, rel=0.02)  # outlier rejected
        assert hot_p < 1.5  # stays in the clean data range

    def test_percentile_beats_absmax_on_poisoned_calibration(self):
        v, cal_abs = self._setup("absmax")
        _, cal_p = self._setup("p99.9")
        x = _crops(np.random.RandomState(11))
        l3_f, _ = MetroModel(_cfg("none").model).apply(v, x, train=False)
        int8 = MetroModel(_cfg("int8").model)
        l3_abs, _ = int8.apply(cal_abs, x, train=False)
        l3_p, _ = int8.apply(cal_p, x, train=False)
        err_abs = float(jnp.abs(l3_abs - l3_f).mean())
        err_p = float(jnp.abs(l3_p - l3_f).mean())
        assert err_p < err_abs  # robust estimator closer to the f32 graph

    def test_calib_mode_mapping(self):
        from metro_pose3d_tpu.models.quantize import calib_mode

        m = _cfg("none").model
        assert calib_mode(m) == "calib:99.9"  # p99.9 is the default
        assert calib_mode(
            dataclasses.replace(m, quantize_calib="absmax")) == "calib"
        assert calib_mode(
            dataclasses.replace(m, quantize_calib="p99.9")) == "calib:99.9"
        with pytest.raises(ValueError):
            calib_mode(dataclasses.replace(m, quantize_calib="median"))
        with pytest.raises(ValueError):
            calib_mode(dataclasses.replace(m, quantize_calib="p120"))


def test_int8_calibration_at_test_stride():
    """quantize x phase-stride interaction: with model.stride_test set, the
    calibration model and the serving model must both build at the TEST
    stride (models/quantize.calibrate resolves at_phase(train=False)), and
    per-channel amax scales are stride-independent by construction."""
    rng = np.random.RandomState(0)
    cfg = _cfg("none")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stride_test=32))
    base = MetroModel(cfg.model.at_phase(train=False))
    variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)

    calib_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize="calib"))
    calibrated = calibrate(
        MetroModel(calib_cfg.model.at_phase(train=False)), dict(variables),
        [_crops(rng)])
    int8_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize="int8"))
    l3, l2 = MetroModel(int8_cfg.model.at_phase(train=False)).apply(
        calibrated, _crops(np.random.RandomState(7)), train=False)
    assert l3.shape[1:3] == (2, 2)  # 64 / 32: built at the test stride
    assert np.isfinite(np.asarray(l3)).all()


class TestQuantizeExtras:
    """model.quantize_extras: the stem 7x7/2 and the two 1x1 heads join the
    int8 graph (round 4, VERDICT r3 weak #1 margin levers). One checkpoint
    must serve every extras combination, and each combination must track
    the f32 graph within PTQ error."""

    def test_extras_graphs_track_f32_off_one_checkpoint(self):
        rng = np.random.RandomState(0)
        from metro_pose3d_tpu.models.quantize import calib_mode

        base_cfg = _cfg("none").model
        base = MetroModel(base_cfg)
        variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        x = _crops(np.random.RandomState(7))
        l3_f, _ = base.apply(variables, x, train=False)
        scale = float(jnp.abs(l3_f).max())

        for extras in ("stem", "heads", "stem,heads"):
            mcfg = dataclasses.replace(
                base_cfg, quantize="int8", quantize_extras=extras)
            calibrated = calibrate(
                MetroModel(dataclasses.replace(mcfg, quantize=calib_mode(mcfg))),
                dict(variables), [_crops(rng) for _ in range(3)])
            l3_q, l2_q = MetroModel(mcfg).apply(calibrated, x, train=False)
            assert float(jnp.abs(l3_q - l3_f).max()) < 0.15 * scale + 0.05, extras
            assert np.isfinite(np.asarray(l2_q)).all(), extras

    def test_param_tree_identical_with_extras(self):
        rng = np.random.RandomState(1)
        mcfg = dataclasses.replace(
            _cfg("int8").model, quantize_extras="stem,heads")
        v_none = MetroModel(_cfg("none").model).init(
            jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        v_extra = MetroModel(mcfg).init(
            jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        paths = lambda tree: set(
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree))
        assert paths(v_none["params"]) == paths(v_extra["params"])
        # the stem and both heads now carry activation scales
        qpaths = paths(v_extra["quant"])
        assert any("conv_stem" in p for p in qpaths)
        assert any("head3d" in p for p in qpaths)
        assert any("head2d" in p for p in qpaths)

    def test_unknown_extras_rejected(self):
        from metro_pose3d_tpu.models.resnet import parse_quantize_extras

        with pytest.raises(ValueError, match="quantize_extras"):
            parse_quantize_extras("stem,head")  # typo for "heads"
        assert parse_quantize_extras("") == frozenset()
        assert parse_quantize_extras("stem, heads") == {"stem", "heads"}


class TestDot1x1:
    """quantize_1x1_dot: pointwise int8 convs as reshaped dot_generals.

    The routing is BIT-EXACT (both emit the same int8xint8->int32 integer
    sums; integer addition is associative), so the int8 graph's outputs
    must match bitwise across policies — it is purely a throughput knob
    (per-shape emitter rates: scripts/exp_int8_dot1x1.py)."""

    def _int8_out(self, policy):
        rng = np.random.RandomState(0)
        base = MetroModel(_cfg("none").model)
        variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        calibrated = calibrate(
            MetroModel(_cfg("calib").model), dict(variables),
            [_crops(rng) for _ in range(2)])
        cfg = _cfg("int8")
        model = MetroModel(dataclasses.replace(
            cfg.model, quantize_1x1_dot=policy))
        return model.apply(
            calibrated, _crops(np.random.RandomState(7)), train=False)

    def test_dot_routing_is_bit_exact(self):
        l3_conv, l2_conv = self._int8_out("none")
        l3_dot, l2_dot = self._int8_out("all")
        assert jnp.array_equal(l3_conv, l3_dot)
        assert jnp.array_equal(l2_conv, l2_dot)

    def test_threshold_policy_is_bit_exact(self):
        l3_conv, l2_conv = self._int8_out("none")
        l3_thr, l2_thr = self._int8_out("cin>=16")
        assert jnp.array_equal(l3_conv, l3_thr)
        assert jnp.array_equal(l2_conv, l2_thr)

    def test_bad_policy_rejected(self):
        from metro_pose3d_tpu.models.quantize import dot_1x1_applies

        with pytest.raises(ValueError, match="quantize_1x1_dot"):
            dot_1x1_applies("sometimes", (1, 1), (1, 1), (1, 1), 64)
        with pytest.raises(ValueError, match="threshold"):
            dot_1x1_applies("cin>=lots", (1, 1), (1, 1), (1, 1), 64)
        # non-pointwise convs never reroute, whatever the policy
        assert not dot_1x1_applies("all", (3, 3), (1, 1), (1, 1), 64)
        assert not dot_1x1_applies("all", (1, 1), (2, 2), (1, 1), 64)


class TestLayout:
    """quantize_layout: the int8 trunk in NCHW (config.py provenance).

    Like the dot_1x1 routing, the layout is BIT-EXACT: the integer conv
    sums are layout-independent and the f32 requant epilogues are
    elementwise, so int8 outputs must match bitwise across layouts off
    the same calibration. Calibration itself always runs the NHWC graph."""

    def _int8_out(self, layout, fused=True, dot="all"):
        rng = np.random.RandomState(0)
        base = MetroModel(_cfg("none").model)
        variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        # non-trivial batch stats so the fused BN affines matter
        variables = dict(variables)
        variables["batch_stats"] = jax.tree_util.tree_map(
            lambda v: v + jnp.abs(jax.random.normal(
                jax.random.PRNGKey(5), v.shape)) * 0.1,
            variables["batch_stats"])
        calibrated = calibrate(
            MetroModel(_cfg("calib").model), dict(variables),
            [_crops(rng) for _ in range(2)])
        cfg = _cfg("int8")
        model = MetroModel(dataclasses.replace(
            cfg.model, quantize_layout=layout, quantize_fused=fused,
            quantize_1x1_dot=dot))
        return model.apply(
            calibrated, _crops(np.random.RandomState(7)), train=False)

    def test_nchw_is_bit_exact_fused(self):
        l3_hwc, l2_hwc = self._int8_out("nhwc")
        l3_chw, l2_chw = self._int8_out("nchw")
        assert jnp.array_equal(l3_hwc, l3_chw)
        assert jnp.array_equal(l2_hwc, l2_chw)

    def test_nchw_is_bit_exact_unfused(self):
        l3_hwc, l2_hwc = self._int8_out("nhwc", fused=False, dot="none")
        l3_chw, l2_chw = self._int8_out("nchw", fused=False, dot="none")
        assert jnp.array_equal(l3_hwc, l3_chw)
        assert jnp.array_equal(l2_hwc, l2_chw)

    def test_bf16_graph_ignores_layout_knob(self):
        # layout is an int8 lever: the unquantized graph runs NHWC whatever
        # the knob says (calibration relies on this)
        rng = np.random.RandomState(0)
        base = MetroModel(_cfg("none").model)
        variables = base.init(jax.random.PRNGKey(0), _crops(rng, 1), train=False)
        knob = MetroModel(dataclasses.replace(
            _cfg("none").model, quantize_layout="nchw"))
        l3_a, _ = base.apply(variables, _crops(np.random.RandomState(7)), train=False)
        l3_b, _ = knob.apply(variables, _crops(np.random.RandomState(7)), train=False)
        assert jnp.array_equal(l3_a, l3_b)

    def test_guards(self):
        from metro_pose3d_tpu.models.quantize import QuantConv
        from metro_pose3d_tpu.models.resnet import ResNet

        with pytest.raises(ValueError, match="quantize_layout"):
            MetroModel(dataclasses.replace(
                _cfg("int8").model, quantize_layout="chwn")).apply(
                {}, jnp.zeros((1, 64, 64, 3)), train=False)
        # mixed-stage quantization can't share the single trunk transpose
        with pytest.raises(ValueError, match="quantize_stages"):
            ResNet(variant="tiny", quantize="int8", quantize_stages="2,3",
                   quantize_layout="nchw").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        # basic-block variants are NHWC-only
        with pytest.raises(ValueError, match="bottleneck"):
            ResNet(variant="resnet18", quantize="int8",
                   quantize_layout="nchw").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        # calibration never runs NCHW (per-tensor scales transfer)
        with pytest.raises(ValueError, match="calibration"):
            QuantConv(8, (1, 1), mode="calib", layout="nchw").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 4, 4)))
