"""Distributed Schur BA on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyorbslam_tpu.optim import ba
from pyorbslam_tpu.parallel import dist_ba
from tests.test_ba import make_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return dist_ba.make_mesh(8)


def shardable_problem(rng, n_shards=8):
    prob, T_true, pts = make_ba_problem(rng, n_cam=8, n_pnt=512 - 8, noise_px=0.3,
                                        pad_pnt=8)  # pad points to 512
    n_pnt = prob.pnt_pos.shape[0]
    assert n_pnt % n_shards == 0
    obs_pnt = np.asarray(prob.obs_pnt)
    arrays = (
        np.asarray(prob.obs_cam), np.asarray(prob.obs_uvr),
        np.asarray(prob.obs_inv_sigma2),
    )
    new_pnt, (oc, ouvr, oisig), active = (
        dist_ba.group_observations_by_point_shard(obs_pnt, n_pnt, n_shards, arrays)
    )
    prob2 = prob._replace(
        obs_pnt=jnp.asarray(new_pnt),
        obs_cam=jnp.asarray(oc),
        obs_uvr=jnp.asarray(ouvr),
        obs_inv_sigma2=jnp.asarray(oisig),
        obs_active=jnp.asarray(active),
    )
    return prob2, T_true, pts


class TestDistributedBA:
    def test_matches_single_device_quality(self, mesh):
        rng = np.random.default_rng(0)
        prob, T_true, pts = shardable_problem(rng)
        sharded = dist_ba.shard_problem(prob, mesh)
        cam_out, pnt_out, inlier = dist_ba.distributed_bundle_adjust(
            sharded, mesh, n_cam=prob.cam_Tcw.shape[0]
        )
        cam_err = np.linalg.norm(
            np.asarray(cam_out)[:8, :3, 3] - T_true[:, :3, 3], axis=1
        )
        assert cam_err.max() < 0.06, cam_err

        # single-device result for comparison
        res = ba.bundle_adjust(prob)
        cam_err_1dev = np.linalg.norm(
            np.asarray(res.cam_Tcw)[:8, :3, 3] - T_true[:, :3, 3], axis=1
        )
        assert cam_err.mean() < 2.0 * cam_err_1dev.mean() + 1e-3

    def test_point_updates_happen_on_shards(self, mesh):
        rng = np.random.default_rng(1)
        prob, T_true, pts = shardable_problem(rng)
        sharded = dist_ba.shard_problem(prob, mesh)
        _, pnt_out, _ = dist_ba.distributed_bundle_adjust(
            sharded, mesh, n_cam=prob.cam_Tcw.shape[0]
        )
        n_pnt = len(pts)
        moved = np.linalg.norm(
            np.asarray(pnt_out)[:n_pnt] - np.asarray(prob.pnt_pos)[:n_pnt], axis=1
        )
        assert (moved > 1e-6).mean() > 0.9  # points actually optimized
        err = np.linalg.norm(np.asarray(pnt_out)[:n_pnt] - pts, axis=1)
        assert np.median(err) < 0.1
