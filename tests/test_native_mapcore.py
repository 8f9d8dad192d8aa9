"""Native map core equivalence against the Python dict implementation."""

import numpy as np
import pytest

from pyorbslam_tpu.native import mapcore_ffi


@pytest.fixture(scope="module")
def core():
    if not mapcore_ffi.available():
        pytest.skip("native mapcore not buildable here")
    return None


class TestNativeMapCore:
    def test_covisibility_matches_python(self, core):
        rng = np.random.default_rng(0)
        n_feat = 64
        n_kf = 12
        n_lm = 200
        mc = mapcore_ffi.MapCore(n_feat)

        from collections import defaultdict

        py_lm_obs = defaultdict(dict)
        rows = []
        for kf in range(n_kf):
            row = np.full(n_feat, -1, np.int32)
            picks = rng.choice(n_lm, 40, replace=False)
            slots = rng.choice(n_feat, 40, replace=False)
            row[slots] = picks
            rows.append(row)
            mc.add_keyframe(kf, row)
            for s, p in zip(slots, picks):
                py_lm_obs[int(p)][kf] = int(s)

        for kf in range(n_kf):
            ids, w = mc.update_connections(kf, th=5)
            # python recount
            counter = defaultdict(int)
            for lm in rows[kf][rows[kf] >= 0]:
                for other in py_lm_obs[int(lm)]:
                    if other != kf:
                        counter[other] += 1
            expect = {o: c for o, c in counter.items() if c >= 5}
            if not expect and counter:
                best = max(counter, key=counter.get)
                expect = {best: counter[best]}
            got = dict(zip(ids.tolist(), w.tolist()))
            assert got == expect, (kf, got, expect)
            # descending order
            assert all(w[i] >= w[i + 1] for i in range(len(w) - 1))

    def test_observation_lifecycle(self, core):
        mc = mapcore_ffi.MapCore(8)
        mc.add_keyframe(0, np.array([5, -1, 7, -1, -1, -1, -1, -1], np.int32))
        mc.add_observation(5, 1, 3)
        assert mc.n_observations(5) == 2
        kfs, feats = mc.observers(5)
        assert set(kfs.tolist()) == {0, 1}
        mc.erase_observation(5, 0)
        assert mc.n_observations(5) == 1

    def test_assemble_obs(self, core):
        mc = mapcore_ffi.MapCore(4)
        mc.add_keyframe(0, np.array([10, 11, -1, -1], np.int32))
        mc.add_keyframe(1, np.array([-1, 10, 11, -1], np.int32))
        u_right = np.zeros((4, 4), np.float32)
        u_right[0, 0] = 5.0   # kf0/feat0 stereo
        u_right[1, 1] = 6.0   # kf1/feat1 stereo
        u_right[1, 2] = -1.0  # kf1/feat2 mono -> excluded
        oc, op, okf, oft = mc.assemble_obs(
            np.array([0, 1], np.int32), np.array([10, 11], np.int32),
            u_right, cap=16)
        pairs = set(zip(oc.tolist(), op.tolist()))
        assert pairs == {(0, 0), (1, 0)}  # both stereo obs of landmark 10
