"""Full-circle loop closure integration (the reference's KITTI-00-style
gate, SURVEY.md §7 step 7, on the synthetic loop world)."""

import numpy as np
import pytest

from pyorbslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from pyorbslam_tpu.io.synthetic import generate_sequence
from pyorbslam_tpu.slam.system import System
from pyorbslam_tpu.utils.metrics import ate_rmse


# full_loop_run fixture is shared session-wide (tests/conftest.py)


class TestLoopClosing:
    def test_loop_detected_and_closed(self, full_loop_run):
        sysm, _ = full_loop_run
        assert sysm.loop_closer is not None
        assert sysm.loop_closer.n_loops_closed >= 1

    def test_corrected_ate(self, full_loop_run):
        sysm, seq = full_loop_run
        corr = np.linalg.inv(sysm.corrected_trajectory())
        ate = ate_rmse(corr, seq.poses_wc)
        assert ate < 0.6, f"corrected ATE {ate:.3f} m over ~113 m circle"

    def test_loop_edges_recorded(self, full_loop_run):
        sysm, _ = full_loop_run
        edges = [(k, v) for k, v in sysm.map.loop_edges.items() if v]
        assert edges, "loop edges missing from the essential graph"

    def test_no_tracking_loss(self, full_loop_run):
        sysm, _ = full_loop_run
        weak = sum(1 for s in sysm.stats if s["inliers"] < 10)
        assert weak == 0
