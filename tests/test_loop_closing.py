"""Full-circle loop closure integration (the reference's KITTI-00-style
gate, SURVEY.md §7 step 7, on the synthetic loop world)."""

import numpy as np
import pytest

from pyorbslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
from pyorbslam_tpu.io.synthetic import generate_sequence
from pyorbslam_tpu.slam.system import System
from pyorbslam_tpu.utils.metrics import ate_rmse


@pytest.fixture(scope="module")
def full_loop_run(data_cache_dir):
    seq = generate_sequence(
        n_frames=80, width=512, height=160, trajectory="loop",
        seed=11, cache_dir=data_cache_dir,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=float(seq.K[0, 0]), fy=float(seq.K[1, 1]),
            cx=float(seq.K[0, 2]), cy=float(seq.K[1, 2]),
            width=512, height=160, bf=seq.bf, th_depth=40.0,
        ),
        orb=OrbConfig(n_features=1000),
    )
    sysm = System(cfg)
    for i in range(80):
        sysm.track_stereo(seq.left[i], seq.right[i], seq.timestamps[i])
    return sysm, seq


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
