"""End-to-end protocol rehearsal on a frozen synthetic H36M shard
(VERDICT r1 missing #2; SURVEY.md §5.2): prepare-script layout on disk ->
`data/h36m.py` builder -> loader -> fused predict with flip-TTA + bone-length
rescale + absolute reconstruction -> .npz dump -> `eval_h36m` per-action
table, with the resulting numbers pinned as goldens.

Regenerate the golden intentionally with:
    python tests/test_h36m_shard.py --regen
(then inspect the diff before committing).
"""
import json
import os
import sys

if __name__ == "__main__" and "--regen" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metro_pose3d_tpu.config import Config, apply_overrides

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "golden", "h36m_shard_golden.json"
)

OVERRIDES = {
    "model.backbone": "tiny",
    "model.proc_side": "64",
    "model.depth": "4",
    "model.compute_dtype": "float32",
    "data.source_side": "128",
    "data.workers": "2",
    "data.host_prep": "python",  # goldens pin the numpy engine explicitly
    "eval.batch_size": "8",
    "eval.flip_tta": "true",
    "eval.reconstruct_absolute": "true",
    "eval.scale_recovery": "bone_lengths",
}


def _run_protocol(tmp_root: str) -> dict:
    """Write the shard, run builder -> predict -> dump -> eval_h36m."""
    from metro_pose3d_tpu.data.h36m import H36MDataset
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_h36m_shard
    from metro_pose3d_tpu.evaluation.eval_h36m import evaluate
    from metro_pose3d_tpu.evaluation.predict import predict_dataset, save_predictions
    from metro_pose3d_tpu.models.metro import MetroModel

    write_synthetic_h36m_shard(tmp_root)
    cfg = apply_overrides(Config(), OVERRIDES)
    ds = H36MDataset(tmp_root)
    assert ds.n_train == 8 and ds.n_test == 20

    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    result = predict_dataset(cfg, variables, ds)
    pred_path = os.path.join(tmp_root, "predictions.npz")
    save_predictions(result, pred_path)
    return evaluate(pred_path), result


class TestProtocolRehearsal:
    @pytest.fixture(scope="class")
    def protocol(self, tmp_path_factory):
        return _run_protocol(str(tmp_path_factory.mktemp("shard")))

    def test_per_action_table_rows(self, protocol):
        scores, _ = protocol
        # the shard's deliberately variant spellings all merge to canonical
        assert set(scores["per_action_mpjpe"]) == {
            "Walking", "WalkingDog", "Greeting", "Photo", "WalkTogether"
        }

    def test_structural_sanity(self, protocol):
        scores, result = protocol
        assert result["pose3d_rootrel"].shape == (20, 17, 3)
        assert result["pose3d_abs"].shape == (20, 17, 3)
        assert np.isfinite(result["pose3d_abs"]).all()
        # every test joint is valid in the synthetic scenes
        assert result["valid"].all()
        # PA-MPJPE <= MPJPE always holds after optimal alignment
        assert scores["pa_mpjpe"] <= scores["mpjpe"] + 1e-6
        # tiny random model: garbage accuracy, but bounded garbage (decode
        # range is the metric box, so errors stay within ~2 box diagonals)
        assert 10.0 < scores["mpjpe"] < 4000.0

    @pytest.mark.skipif(not os.path.exists(GOLDEN_PATH), reason="no golden file")
    def test_matches_golden(self, protocol):
        scores, _ = protocol
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
        assert set(scores["per_action_mpjpe"]) == set(golden["per_action_mpjpe"])
        np.testing.assert_allclose(
            scores["mpjpe"], golden["mpjpe"], rtol=1e-4,
            err_msg="protocol MPJPE drift vs frozen-shard golden",
        )
        np.testing.assert_allclose(
            scores["pa_mpjpe"], golden["pa_mpjpe"], rtol=1e-4
        )
        np.testing.assert_allclose(
            scores["abs_mpjpe"], golden["abs_mpjpe"], rtol=1e-4
        )
        for action, val in golden["per_action_mpjpe"].items():
            np.testing.assert_allclose(
                scores["per_action_mpjpe"][action], val, rtol=1e-4,
                err_msg=f"per-action drift: {action}",
            )


INT8_GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "golden", "int8_shard_golden.json"
)


def _run_int8_protocol(tmp_root: str) -> dict:
    """Protocol-level int8 damage (VERDICT r2 missing #3): MPJPE on the
    frozen shard for the fp graph vs the calibrated int8 graph, same
    weights, same crops. A PTQ regression that silently costs accuracy
    moves the delta and trips the golden."""
    import dataclasses

    from metro_pose3d_tpu.data.h36m import H36MDataset
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_h36m_shard
    from metro_pose3d_tpu.evaluation.eval_h36m import evaluate
    from metro_pose3d_tpu.evaluation.predict import predict_dataset, save_predictions
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.models.quantize import calibrate_on_dataset

    write_synthetic_h36m_shard(tmp_root)
    cfg = apply_overrides(Config(), OVERRIDES)
    ds = H36MDataset(tmp_root)
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    scores = {}
    cfg8 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quantize="int8"))
    calibrated = calibrate_on_dataset(cfg8, dict(variables), ds, n_batches=2)
    for name, c, v in (("fp", cfg, variables), ("int8", cfg8, calibrated)):
        result = predict_dataset(c, v, ds)
        path = os.path.join(tmp_root, f"pred_{name}.npz")
        save_predictions(result, path)
        scores[f"mpjpe_{name}"] = evaluate(path)["mpjpe"]
    scores["mpjpe_delta"] = scores["mpjpe_int8"] - scores["mpjpe_fp"]
    return scores


class TestInt8AccuracyGolden:
    @pytest.fixture(scope="class")
    def int8_scores(self, tmp_path_factory):
        return _run_int8_protocol(str(tmp_path_factory.mktemp("int8shard")))

    def test_int8_damage_bounded(self, int8_scores):
        # int8 PTQ must not change the protocol number materially even for
        # this random-weight rehearsal model (logits are O(1))
        assert abs(int8_scores["mpjpe_delta"]) < 0.05 * int8_scores["mpjpe_fp"]

    @pytest.mark.skipif(not os.path.exists(INT8_GOLDEN_PATH), reason="no golden")
    def test_matches_golden(self, int8_scores):
        with open(INT8_GOLDEN_PATH) as f:
            golden = json.load(f)
        np.testing.assert_allclose(
            int8_scores["mpjpe_fp"], golden["mpjpe_fp"], rtol=1e-4)
        np.testing.assert_allclose(
            int8_scores["mpjpe_int8"], golden["mpjpe_int8"], rtol=1e-3,
            err_msg="int8 protocol accuracy drift vs frozen-shard golden",
        )


class TestCalibOutlierShard:
    """Protocol-level estimator A/B (VERDICT r3 weak #2): hot pixels in ONE
    calibration batch must not poison the int8 protocol number. Round-4
    measurements on this shard: absmax clean -0.004 / poisoned +1.44 mm;
    p99.9 clean -0.20 / poisoned -0.07 mm — hence the p99.9 default."""

    @pytest.fixture(scope="class")
    def deltas(self, tmp_path_factory):
        import dataclasses

        from metro_pose3d_tpu.data.h36m import H36MDataset
        from metro_pose3d_tpu.data.synth_shard import write_synthetic_h36m_shard
        from metro_pose3d_tpu.evaluation.eval_h36m import evaluate
        from metro_pose3d_tpu.evaluation.predict import predict_dataset, save_predictions
        from metro_pose3d_tpu.models.metro import MetroModel
        from metro_pose3d_tpu.models.quantize import calib_mode, calibrate
        from metro_pose3d_tpu.pipeline.device import device_augment
        from metro_pose3d_tpu.pipeline.loader import batch_iterator

        tmp = str(tmp_path_factory.mktemp("calib_ab"))
        write_synthetic_h36m_shard(tmp)
        cfg = apply_overrides(Config(), OVERRIDES)
        ds = H36MDataset(tmp)
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=False,
        )
        it = batch_iterator(
            ds.test_example, ds.n_test, ds.joint_info, cfg.eval.batch_size,
            cfg.model.proc_side, cfg.data.source_side, aug_cfg=None,
            shuffle=False, max_epochs=1, drop_remainder=False,
            n_workers=cfg.data.workers,
            box_expansion=cfg.data.test_box_expansion,
        )
        crops = [
            device_augment(b, cfg.model.proc_side, train=False,
                           warp_sampler=cfg.aug.warp_sampler)
            for _, b in zip(range(2), it)
        ]
        poisoned = list(crops)
        # saturated 2x2 glint in the first calibration batch
        poisoned[0] = poisoned[0].at[0, 10:12, 10:12, :].set(25.0)

        result = predict_dataset(cfg, variables, ds)
        save_predictions(result, os.path.join(tmp, "pred_fp.npz"))
        fp = evaluate(os.path.join(tmp, "pred_fp.npz"))["mpjpe"]

        out = {}
        for est in ("absmax", "p99.9"):
            mcfg = dataclasses.replace(cfg.model, quantize_calib=est)
            calib = MetroModel(
                dataclasses.replace(mcfg, quantize=calib_mode(mcfg)))
            for name, batches in (("clean", crops), ("poisoned", poisoned)):
                cal = calibrate(calib, dict(variables), batches)
                cfg8 = dataclasses.replace(
                    cfg, model=dataclasses.replace(mcfg, quantize="int8"))
                res = predict_dataset(cfg8, cal, ds)
                p = os.path.join(tmp, f"pred_{est}_{name}.npz")
                save_predictions(res, p)
                out[(est, name)] = evaluate(p)["mpjpe"] - fp
        out["fp"] = fp
        return out

    def test_percentile_resists_poisoned_calibration(self, deltas):
        assert abs(deltas[("p99.9", "poisoned")]) < 0.25 * abs(
            deltas[("absmax", "poisoned")])
        assert abs(deltas[("p99.9", "poisoned")]) < 1e-3 * deltas["fp"]

    def test_percentile_clean_cost_negligible(self, deltas):
        assert abs(deltas[("p99.9", "clean")]) < 1e-3 * deltas["fp"]


class TestShardDeterminism:
    def test_shard_is_byte_stable(self, tmp_path):
        """Two writes of the shard produce identical bytes — goldens pinned
        on it are trustworthy."""
        import hashlib

        from metro_pose3d_tpu.data.synth_shard import write_synthetic_h36m_shard

        def digest(root):
            write_synthetic_h36m_shard(root, frames_per_sequence=2)
            h = hashlib.sha256()
            base = os.path.join(root, "h36m")
            for dirpath, _, files in sorted(os.walk(base)):
                for fname in sorted(files):
                    rel = os.path.relpath(os.path.join(dirpath, fname), base)
                    h.update(rel.encode())
                    if fname.endswith(".jpg"):
                        with open(os.path.join(dirpath, fname), "rb") as f:
                            h.update(f.read())
            # npz files embed timestamps; hash their arrays instead
            ann = np.load(os.path.join(base, "annotations.npz"))
            for key in sorted(ann.files):
                h.update(key.encode())
                h.update(np.ascontiguousarray(ann[key]).tobytes())
            return h.hexdigest()

        d1 = digest(str(tmp_path / "a"))
        d2 = digest(str(tmp_path / "b"))
        assert d1 == d2


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            scores, _ = _run_protocol(tmp)
        scores = {
            k: v for k, v in scores.items()
            if k in ("mpjpe", "pa_mpjpe", "abs_mpjpe", "per_action_mpjpe")
        }
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(scores, f, indent=2, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}:\n{json.dumps(scores, indent=2)}")
        with tempfile.TemporaryDirectory() as tmp:
            int8_scores = _run_int8_protocol(tmp)
        with open(INT8_GOLDEN_PATH, "w") as f:
            json.dump(int8_scores, f, indent=2, sort_keys=True)
        print(f"wrote {INT8_GOLDEN_PATH}:\n{json.dumps(int8_scores, indent=2)}")
