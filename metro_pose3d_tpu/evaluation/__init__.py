from metro_pose3d_tpu.evaluation.engine import PoseEstimator, make_predict_fn

__all__ = ["PoseEstimator", "make_predict_fn"]
