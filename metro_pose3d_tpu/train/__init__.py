from metro_pose3d_tpu.train.state import TrainState, create_train_state
from metro_pose3d_tpu.train.loop import make_train_step, make_lr_schedule

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_lr_schedule"]
