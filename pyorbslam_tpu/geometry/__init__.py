from pyorbslam_tpu.geometry import se3, sim3  # noqa: F401
