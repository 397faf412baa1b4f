from metro_pose3d_tpu.utils.cache import cache_result_on_disk

__all__ = ["cache_result_on_disk"]
