"""End-to-end protocol rehearsal on a frozen synthetic MPI-INF-3DHP shard
(VERDICT r2 next-round #1; SURVEY.md §4.2-4.3, §5.2): prepare-script layout
on disk -> `data/mpi_inf_3dhp.py` builder (valid-frame filter, masks,
activities, univ scales) -> loader (incl. the green-screen mask ->
background-replacement chain from disk) -> fused predict with flip-TTA +
bone-length rescale -> .npz dump -> `eval_3dhp` per-activity PCK table +
AUC + universal-skeleton variant, with the numbers pinned as goldens.

Regenerate the golden intentionally with:
    python tests/test_3dhp_shard.py --regen
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
    os.path.dirname(__file__), "golden", "3dhp_shard_golden.json"
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


def _run_protocol(tmp_root: str):
    """Write the shard, run builder -> predict -> dump -> eval_3dhp."""
    from metro_pose3d_tpu.data.mpi_inf_3dhp import Mpi3dhpDataset
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_3dhp_shard
    from metro_pose3d_tpu.evaluation.eval_3dhp import evaluate
    from metro_pose3d_tpu.evaluation.predict import predict_dataset, save_predictions
    from metro_pose3d_tpu.models.metro import MetroModel

    write_synthetic_3dhp_shard(tmp_root)
    cfg = apply_overrides(Config(), OVERRIDES)
    ds = Mpi3dhpDataset(tmp_root)
    assert ds.n_train == 12  # 2 sequences x 2 cameras x 3 frames
    assert ds.n_test == 10  # 2 TS x 6 frames, 1 invalid each filtered out

    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    result = predict_dataset(cfg, variables, ds)
    pred_path = os.path.join(tmp_root, "predictions.npz")
    save_predictions(result, pred_path)
    return evaluate(pred_path), result, ds


class TestProtocolRehearsal:
    @pytest.fixture(scope="class")
    def protocol(self, tmp_path_factory):
        return _run_protocol(str(tmp_path_factory.mktemp("shard3dhp")))

    def test_per_activity_table_from_standard_dump(self, protocol):
        """The VERDICT r2 weak-#1 class of bug: the per-activity table must
        materialize from the plain --test dump path (the 'actions' key)."""
        from metro_pose3d_tpu.data.mpi_inf_3dhp import ACTIVITY_NAMES

        scores, result, _ = protocol
        assert "per_activity_pck" in scores
        assert set(scores["per_activity_pck"]) <= set(ACTIVITY_NAMES)
        assert len(scores["per_activity_pck"]) >= 4  # several groups present
        # the dump itself carries the activity labels under "actions"
        assert set(np.asarray(result["actions"]).tolist()) <= set(ACTIVITY_NAMES)

    def test_universal_skeleton_variant(self, protocol):
        scores, result, ds = protocol
        # univ scales flow dataset -> dump -> univ metrics
        assert result["univ_scale"].shape == (10,)
        assert np.all(result["univ_scale"] > 0.8)
        for key in ("pck_150_univ", "auc_univ", "mpjpe_univ"):
            assert key in scores and np.isfinite(scores[key])
        # GT rescale changes the numbers (scales != 1)
        assert scores["mpjpe_univ"] != pytest.approx(scores["mpjpe"], rel=1e-6)

    def test_legacy_shard_without_univ_scale_omits_univ_metrics(self, protocol):
        """A shard prepared without universal annotations must NOT produce
        univ-protocol numbers: a silent 1.0 default made the report emit
        pck_150_univ/auc_univ rows that exactly duplicated the non-universal
        ones — indistinguishable from a real univ result."""
        _, _, ds = protocol
        legacy = dict(ds._test)
        legacy.pop("univ_scale")
        ds2 = object.__new__(type(ds))
        ds2.root = ds.root
        ds2._train = ds._train
        ds2._test = legacy
        assert ds2.test_univ_scale(0) is None
        # the dump-side guard: any None scale suppresses the key entirely
        scales = [ds2.test_univ_scale(i) for i in range(3)]
        assert not all(s is not None for s in scales)

    def test_structural_sanity(self, protocol):
        scores, result, _ = protocol
        assert result["pose3d_rootrel"].shape == (10, 17, 3)
        assert np.isfinite(result["pose3d_abs"]).all()
        assert 0.0 <= scores["pck_150"] <= 100.0
        assert 0.0 <= scores["auc"] <= scores["pck_150"] + 1e-9

    @pytest.mark.skipif(not os.path.exists(GOLDEN_PATH), reason="no golden file")
    def test_matches_golden(self, protocol):
        scores, _, _ = protocol
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
        for key in ("pck_150", "auc", "mpjpe", "pck_150_univ", "auc_univ",
                    "mpjpe_univ"):
            np.testing.assert_allclose(
                scores[key], golden[key], rtol=1e-4,
                err_msg=f"protocol drift vs frozen-shard golden: {key}",
            )
        assert set(scores["per_activity_pck"]) == set(golden["per_activity_pck"])
        for act, val in golden["per_activity_pck"].items():
            np.testing.assert_allclose(
                scores["per_activity_pck"][act], val, rtol=1e-4,
                err_msg=f"per-activity drift: {act}",
            )
        for act, val in golden.get("per_activity_auc", {}).items():
            np.testing.assert_allclose(
                scores["per_activity_auc"][act], val, rtol=1e-4,
                err_msg=f"per-activity AUC drift: {act}",
            )


class TestMaskChainFromDisk:
    def test_background_replacement_reads_masks(self, tmp_path):
        """Green-screen chain: FG mask JPEGs on disk -> builder Example.mask
        -> prepare_example source_mask tile -> device composite actually
        replaces background pixels."""
        from metro_pose3d_tpu.config import AugConfig
        from metro_pose3d_tpu.data.mpi_inf_3dhp import Mpi3dhpDataset
        from metro_pose3d_tpu.data.synth_shard import write_synthetic_3dhp_shard
        from metro_pose3d_tpu.pipeline.crops import prepare_example, sample_aug_params

        write_synthetic_3dhp_shard(str(tmp_path))
        ds = Mpi3dhpDataset(str(tmp_path))
        assert ds.has_masks
        ex = ds.train_example(0)
        assert ex.mask is not None and ex.mask.dtype == bool
        # the synthetic FG (joint discs) covers a small minority of pixels
        frac = ex.mask.mean()
        assert 0.001 < frac < 0.25

        rng = np.random.default_rng(0)
        aug = AugConfig(background_prob=1.0)
        params, occ_center = sample_aug_params(rng, aug, 4, n_backgrounds=4)
        assert params.bg_enabled
        prep = prepare_example(
            ex, ds.joint_info, 64, 128, aug=params, occ_center=occ_center,
            with_background=True,
        )
        # the mask tile must carry REAL background (0) pixels from disk
        assert prep["source_mask"].min() < 128
        assert prep["bg_params"][0] == 1.0

        from metro_pose3d_tpu.ops.color import composite_background
        import jax.numpy as jnp

        bank = jnp.asarray(
            np.full((4, 128, 128, 3), 200, np.uint8))  # bright backgrounds
        out = np.asarray(composite_background(
            jnp.asarray(prep["source"][None]),
            jnp.asarray(prep["source_mask"][None]),
            bank, jnp.asarray(prep["bg_params"][None]),
        ))
        # background pixels replaced by the bank value, foreground kept
        # (the JPEG-decoded mask is a soft alpha, so compare away from the
        # ringing band around disc edges)
        bg = prep["source_mask"] < 5
        assert bg.any()
        assert (np.abs(out[0][bg].astype(int) - 200) <= 6).mean() > 0.95
        fg = prep["source_mask"] >= 250
        if fg.any():
            np.testing.assert_allclose(
                out[0][fg].astype(int), prep["source"][fg].astype(int), atol=6)


class TestShardDeterminism:
    def test_shard_is_byte_stable(self, tmp_path):
        import hashlib

        from metro_pose3d_tpu.data.synth_shard import write_synthetic_3dhp_shard

        def digest(root):
            write_synthetic_3dhp_shard(root)
            h = hashlib.sha256()
            base = os.path.join(root, "3dhp")
            for dirpath, _, files in sorted(os.walk(base)):
                for fname in sorted(files):
                    rel = os.path.relpath(os.path.join(dirpath, fname), base)
                    h.update(rel.encode())
                    if fname.endswith(".jpg"):
                        with open(os.path.join(dirpath, fname), "rb") as f:
                            h.update(f.read())
            for npz in ("annotations_train.npz", "annotations_test.npz"):
                ann = np.load(os.path.join(base, npz), allow_pickle=True)
                for key in sorted(ann.files):
                    h.update(key.encode())
                    h.update(np.ascontiguousarray(ann[key]).tobytes())
            return h.hexdigest()

        assert digest(str(tmp_path / "a")) == digest(str(tmp_path / "b"))


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            scores, _, _ = _run_protocol(tmp)
        scores = {
            k: v for k, v in scores.items()
            if k in ("pck_150", "auc", "mpjpe", "pck_150_univ", "auc_univ",
                     "mpjpe_univ", "per_activity_pck", "per_activity_auc")
        }
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(scores, f, indent=2, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}:\n{json.dumps(scores, indent=2)}")
