"""End-to-end multi-person protocol rehearsal on a frozen synthetic 3DPW
release (completing the per-dataset rehearsal set: H36M r2, 3DHP r3):
official release layout on disk -> `data/tdpw.py` parser -> frame-wise
multi-person prediction (detector boxes -> bucketed crops -> absolute
back-projection, `predict_multiperson_dataset`) -> .npz dump ->
`eval_3dpw` per-sequence table, with the numbers pinned as goldens.

Regenerate the golden intentionally with:
    python tests/test_3dpw_shard.py --regen
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
    os.path.dirname(__file__), "golden", "tdpw_shard_golden.json"
)

OVERRIDES = {
    "model.backbone": "tiny",
    "model.proc_side": "64",
    "model.depth": "4",
    "model.num_joints": "24",  # SMPL-24 skeleton (3DPW GT)
    "model.compute_dtype": "float32",
    "data.source_side": "128",
    "data.host_prep": "python",  # goldens pin the numpy engine explicitly
}


def _run_protocol(tmp_root: str) -> tuple:
    """Write the release, run parser -> multiperson predict -> dump -> eval."""
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_3dpw_release
    from metro_pose3d_tpu.data.tdpw import Tdpw3Dataset
    from metro_pose3d_tpu.evaluation.eval_3dpw import evaluate_3dpw
    from metro_pose3d_tpu.evaluation.predict import (
        predict_multiperson_dataset,
        save_predictions,
    )
    from metro_pose3d_tpu.models.metro import MetroModel

    write_synthetic_3dpw_release(tmp_root)
    cfg = apply_overrides(Config(), OVERRIDES)
    ds = Tdpw3Dataset(tmp_root)

    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    result = predict_multiperson_dataset(cfg, variables, ds)
    pred_path = os.path.join(tmp_root, "predictions_mp.npz")
    save_predictions(result, pred_path)
    scores = evaluate_3dpw(pred_path)
    scores14 = evaluate_3dpw(pred_path, joints14=True)
    return scores, scores14, result, ds


class TestTdpwProtocolRehearsal:
    @pytest.fixture(scope="class")
    def protocol(self, tmp_path_factory):
        return _run_protocol(str(tmp_path_factory.mktemp("tdpw_release")))

    def test_release_indexing(self, protocol):
        *_, ds = protocol
        # 2 sequences x 3 frames, every frame keeps >= 1 valid actor
        assert ds.n_test_frames == 6
        # 2 actors per frame minus the two campose-invalid actor-frames
        assert ds.n_test == 2 * 6 - 2

    def test_dump_layout_and_instances(self, protocol):
        _, _, result, ds = protocol
        n = ds.n_test
        assert result["pose3d"].shape == (n, 24, 3)
        assert result["pose3d_abs"].shape == (n, 24, 3)
        assert result["gt3d"].shape == (n, 24, 3)
        assert np.isfinite(result["pose3d_abs"]).all()
        assert set(result["seq"]) == {"courtyard_synthA_00", "downtown_synthB_00"}

    def test_structural_sanity(self, protocol):
        scores, scores14, result, _ = protocol
        # PA-MPJPE <= MPJPE after optimal alignment, always
        assert scores["pa_mpjpe"] <= scores["mpjpe"] + 1e-6
        assert set(scores["per_sequence_mpjpe"]) == {
            "courtyard_synthA_00", "downtown_synthB_00"
        }
        assert scores14["n_instances"] == result["pose3d"].shape[0]
        # tiny random model: garbage accuracy, but bounded garbage (decode
        # range is the metric box)
        assert 10.0 < scores["mpjpe"] < 4000.0
        # the back-projection must stay finite; with random weights the
        # reconstructed depth itself is garbage (near-zero 2D/3D agreement),
        # so no sign claim is made about it here — absolute ACCURACY claims
        # live in tests/test_multiperson.py::test_absolute_poses_in_shared_frame
        # with a crafted consistent model
        assert np.isfinite(scores["abs_mpjpe"])

    def test_gt_camera_geometry(self, protocol):
        """The non-identity-extrinsic sequence genuinely validates the
        world->camera math: GT people sit meters (not kilometers) in front
        of the camera and project inside the image. This is the assertion
        that catches unit bugs like the meters->mm double conversion the
        parser shipped with until round 3 (camera optical center 1000x off
        for any sequence with non-zero camera translation)."""
        _, _, result, ds = protocol
        root_depth_m = result["gt3d_abs"][:, :, 2].mean(-1) / 1000.0
        assert np.all((2.0 < root_depth_m) & (root_depth_m < 6.0)), root_depth_m
        for i in range(ds.n_test_frames):
            img, boxes, cam, world, _ = ds.test_frame(i)
            h, w = img.shape[:2]
            for person in world:
                px = cam.world_to_image(person)
                assert np.all(px > -50) and np.all(px[:, 0] < w + 50) \
                    and np.all(px[:, 1] < h + 50), px

    @pytest.mark.skipif(not os.path.exists(GOLDEN_PATH), reason="no golden file")
    def test_matches_golden(self, protocol):
        scores, scores14, _, _ = protocol
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
        np.testing.assert_allclose(
            scores["mpjpe"], golden["mpjpe"], rtol=1e-4,
            err_msg="3DPW protocol MPJPE drift vs frozen-release golden",
        )
        np.testing.assert_allclose(scores["pa_mpjpe"], golden["pa_mpjpe"], rtol=1e-4)
        np.testing.assert_allclose(scores["abs_mpjpe"], golden["abs_mpjpe"], rtol=1e-4)
        np.testing.assert_allclose(
            scores14["mpjpe"], golden["mpjpe_14"], rtol=1e-4)
        for seq, val in golden["per_sequence_mpjpe"].items():
            np.testing.assert_allclose(
                scores["per_sequence_mpjpe"][seq], val, rtol=1e-4,
                err_msg=f"per-sequence drift: {seq}",
            )


if __name__ == "__main__" and "--regen" in sys.argv:
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        scores, scores14, _, _ = _run_protocol(d)
    golden = {
        "mpjpe": scores["mpjpe"],
        "pa_mpjpe": scores["pa_mpjpe"],
        "abs_mpjpe": scores["abs_mpjpe"],
        "mpjpe_14": scores14["mpjpe"],
        "per_sequence_mpjpe": scores["per_sequence_mpjpe"],
    }
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=2)
    print(f"wrote {GOLDEN_PATH}:\n{json.dumps(golden, indent=2)}")
