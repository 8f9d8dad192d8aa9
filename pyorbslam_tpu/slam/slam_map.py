"""SlamMap: keyframes + landmarks + observations + covisibility + local BA.

The host-side map backend (the array redesign of Map.py / KeyFrame.py /
MapPoint.py bookkeeping) plus the device-side Schur BA invocation.  All
pointer-chasing structures (observer lists, covisibility weights) stay in
numpy/python on the host per SURVEY.md §7's host/device split; the BA
problem is assembled into bucketed fixed-shape arrays and dispatched to
the batched Schur LM engine.

Reference semantics preserved:
  * covisibility edges at weight >= 15, ordered descending
    (KeyFrame.update_connections:145-203 — note the reference's
    update_best_covisibles ascending-sort bug is deliberately fixed,
    SURVEY.md §6);
  * local BA neighborhood: the KF + its covisibles free, second-ring
    observers fixed, KF 0 always fixed (Optimizer.py:210-260);
  * observation erasure after BA outlier gating (Optimizer.py:336-353),
    landmarks dying below 2 observing keyframes (stereo counts per-KF
    here; MapPoint.erase_observation semantics);
  * map-point culling by found/visible ratio < 0.25 or weak early
    support (LocalMapping.map_point_culling:125-150);
  * normal/depth refresh after BA (MapPoint.update_normal_and_depth).
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyorbslam_tpu.config import SlamConfig
from pyorbslam_tpu.optim import ba
from pyorbslam_tpu.slam.mapstore import KeyFrameStore, LandmarkStore

COVIS_TH = 15


@jax.jit
def _pack_ba_result(cam_Tcw, pnt_pos, inlier):
    """BA write-back in one int32 buffer (one ~30ms tunnel read instead
    of three): [cam_Tcw bits 16C | pnt_pos bits 3P | inlier O]."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(cam_Tcw, jnp.int32).reshape(-1),
        jax.lax.bitcast_convert_type(pnt_pos, jnp.int32).reshape(-1),
        inlier.astype(jnp.int32),
    ])


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class SlamMap:
    cfg: SlamConfig
    landmark_capacity: int = 1 << 18
    keyframe_capacity: int = 4096

    def __post_init__(self):
        self.landmarks = LandmarkStore(self.landmark_capacity)
        self.keyframes = KeyFrameStore(
            self.keyframe_capacity, self.cfg.orb.max_keypoints
        )
        # landmark id -> {kf_id: feat_idx}
        self.lm_obs: Dict[int, Dict[int, int]] = defaultdict(dict)
        # covisibility weights kf -> {kf: weight}
        self.covis: Dict[int, Dict[int, int]] = defaultdict(dict)
        # spanning tree (parent = strongest covisible at insertion)
        self.parent: Dict[int, int] = {}
        self.children: Dict[int, set] = defaultdict(set)
        self.loop_edges: Dict[int, set] = defaultdict(set)

    # ------------- keyframe insertion -------------

    def add_keyframe(self, frame_np: dict, Tcw: np.ndarray, assign: np.ndarray,
                     frame_id: int, timestamp: float,
                     kp_node: Optional[np.ndarray] = None) -> int:
        """frame_np: dict of numpy arrays (xy, octave, angle, desc, valid,
        u_right, depth); assign: (N,) landmark id per feature (-1 = none)."""
        kf = self.keyframes.add(
            Tcw=Tcw, frame_id=frame_id, timestamp=timestamp,
            kp_xy=frame_np["xy"], kp_octave=frame_np["octave"],
            kp_angle=frame_np["angle"], kp_desc=frame_np["desc"],
            kp_valid=frame_np["valid"], u_right=frame_np["u_right"],
            depth=frame_np["depth"], obs_lm=assign.astype(np.int32),
            kp_node=kp_node,
        )
        feat_idx = np.nonzero(assign >= 0)[0]
        for i in feat_idx:
            lm = int(assign[i])
            self.lm_obs[lm][kf] = int(i)
            self.landmarks.n_obs[lm] += 2 if frame_np["u_right"][i] > 0 else 1
        self.update_connections(kf)
        return kf

    def update_connections(self, kf: int):
        """Recount shared-landmark weights for ``kf`` (KeyFrame.py:145-203)."""
        counter: Dict[int, int] = defaultdict(int)
        for lm in self.keyframes.obs_lm[kf]:
            if lm < 0:
                continue
            for other in self.lm_obs[int(lm)]:
                if other != kf:
                    counter[other] += 1
        if not counter:
            return
        w_max = max(counter.values())
        kf_max = max(counter, key=counter.get)
        edges = {o: w for o, w in counter.items() if w >= COVIS_TH}
        if not edges:  # keep at least the strongest link
            edges = {kf_max: w_max}
        self.covis[kf] = dict(edges)
        for o, w in edges.items():
            self.covis[o][kf] = w
        if kf not in self.parent and kf != 0:
            self.parent[kf] = kf_max
            self.children[kf_max].add(kf)

    def covisible_neighbors(self, kf: int, n: Optional[int] = None) -> List[int]:
        """Neighbors ordered by weight DESC (intended semantics; the
        reference's incremental update sorts ascending by mistake)."""
        items = sorted(self.covis.get(kf, {}).items(), key=lambda kv: -kv[1])
        ids = [k for k, _ in items]
        return ids if n is None else ids[:n]

    # ------------- observation management -------------

    def erase_observation(self, lm: int, kf: int):
        obs = self.lm_obs.get(lm)
        if obs is None or kf not in obs:
            return
        feat = obs.pop(kf)
        if self.keyframes.obs_lm[kf, feat] == lm:
            self.keyframes.obs_lm[kf, feat] = -1
        stereo = self.keyframes.u_right[kf, feat] > 0
        self.landmarks.n_obs[lm] -= 2 if stereo else 1
        if self.landmarks.n_obs[lm] <= 2 and len(obs) <= 1:
            self.kill_landmark(lm)

    def kill_landmark(self, lm: int):
        for kf, feat in list(self.lm_obs.get(lm, {}).items()):
            if self.keyframes.obs_lm[kf, feat] == lm:
                self.keyframes.obs_lm[kf, feat] = -1
        self.lm_obs.pop(lm, None)
        self.landmarks.alive[lm] = False

    def replace_landmark(self, lm: int, by: int):
        """MapPoint.replace (MapPoint.py:157-182): forward all observations."""
        if lm == by:
            return
        for kf, feat in list(self.lm_obs.get(lm, {}).items()):
            if by not in self.lm_obs[by] or kf not in self.lm_obs[by]:
                self.keyframes.obs_lm[kf, feat] = by
                self.lm_obs[by][kf] = feat
                stereo = self.keyframes.u_right[kf, feat] > 0
                self.landmarks.n_obs[by] += 2 if stereo else 1
            else:
                self.keyframes.obs_lm[kf, feat] = -1
        self.landmarks.found[by] += self.landmarks.found[lm]
        self.landmarks.visible[by] += self.landmarks.visible[lm]
        self.lm_obs.pop(lm, None)
        self.landmarks.alive[lm] = False
        self.landmarks.replaced_by[lm] = by

    # ------------- maintenance -------------

    def cull_map_points(self, recent_ids: np.ndarray, current_kf: int,
                        created_kf: np.ndarray):
        """LocalMapping.map_point_culling: kill points with found/visible
        < 0.25, or with <= 3 stereo-equivalent observations 2-3 KFs after
        creation."""
        for lm in recent_ids:
            lm = int(lm)
            if not self.landmarks.alive[lm]:
                continue
            found_ratio = self.landmarks.found[lm] / max(self.landmarks.visible[lm], 1)
            age = current_kf - int(created_kf[lm])
            if found_ratio < 0.25:
                self.kill_landmark(lm)
            elif age >= 2 and self.landmarks.n_obs[lm] <= 3:
                self.kill_landmark(lm)

    def update_landmark_geometry(self, lm_ids: np.ndarray):
        """MapPoint.update_normal_and_depth for a batch of landmarks,
        vectorized: one flat (landmark, keyframe) pair list, then numpy
        segment sums (np.add.at) — the Python-per-landmark loop was a
        measurable slice of keyframe-insertion time."""
        lm = self.landmarks
        ids, pair_l, pair_k, ref_kf, ref_feat = [], [], [], [], []
        for l in lm_ids:
            l = int(l)
            obs = self.lm_obs.get(l)
            if not obs or not lm.alive[l]:
                continue
            li = len(ids)
            ids.append(l)
            for kf in obs:
                pair_l.append(li)
                pair_k.append(kf)
            rk = next(iter(obs))
            ref_kf.append(rk)
            ref_feat.append(obs[rk])
        if not ids:
            return
        ids = np.asarray(ids)
        pair_l = np.asarray(pair_l)
        pair_k = np.asarray(pair_k)
        pos = lm.pos[ids]

        Tcw = self.keyframes.Tcw[pair_k]
        Ow = -np.einsum("mji,mj->mi", Tcw[:, :3, :3], Tcw[:, :3, 3])
        d = pos[pair_l] - Ow
        n = np.linalg.norm(d, axis=1)
        ok = n > 1e-6
        dn = np.where(ok[:, None], d / np.maximum(n, 1e-12)[:, None], 0.0)
        sums = np.zeros((len(ids), 3), np.float64)
        np.add.at(sums, pair_l, dn)
        nn = np.linalg.norm(sums, axis=1)   # mean dir ∝ sum dir
        upd = nn > 1e-6
        lm.normal[ids[upd]] = (sums[upd] / nn[upd, None]).astype(np.float32)

        # depth band from the reference (first) observation
        ref_kf = np.asarray(ref_kf)
        ref_feat = np.asarray(ref_feat)
        Tr = self.keyframes.Tcw[ref_kf]
        Owr = -np.einsum("mji,mj->mi", Tr[:, :3, :3], Tr[:, :3, 3])
        dist = np.linalg.norm(pos - Owr, axis=1)
        level = self.keyframes.kp_octave[ref_kf, ref_feat]
        sf = self.cfg.orb.scale_factor
        max_dist = dist * sf ** level
        min_dist = max_dist / (sf ** (self.cfg.orb.n_levels - 1))
        lm.dmax[ids] = 1.2 * max_dist
        lm.dmin[ids] = 0.8 * min_dist

    # ------------- global bundle adjustment -------------

    def global_ba(self) -> dict:
        """Optimizer.bundle_adjustment (Optimizer.py:21-121): all KFs and
        landmarks, KF 0 fixed, 10 iterations — run after loop closure."""
        C_live = list(range(self.keyframes.n))
        pnt_ids = [int(p) for p, obs in self.lm_obs.items()
                   if obs and self.landmarks.alive[p]]
        if len(C_live) < 2 or len(pnt_ids) < 50:
            return dict(ran=False)
        # beyond the dense engine's sweet spot the implicit-Schur CG
        # engine takes over (no dense camera-point coupling; scales to
        # the full KITTI-00 map)
        engine = "cg" if len(C_live) > 96 else "dense"
        return self._run_ba(
            cams=C_live, n_free=len(C_live), pnt_ids=pnt_ids,
            iters1=self.cfg.ba.gba_iters, iters2=self.cfg.ba.gba_iters,
            erase_outliers=False, engine=engine,
        )

    # ------------- local bundle adjustment -------------

    def local_ba(self, kf: int) -> dict:
        """Assemble + run the Schur BA over the covisible neighborhood of
        ``kf``; write back poses/points and erase outlier observations."""
        bacfg = self.cfg.ba
        local_kfs = [kf] + self.covisible_neighbors(kf, bacfg.max_local_kfs - 1)
        local_set = set(local_kfs)

        # local points = landmarks seen by local KFs
        pnt_ids: List[int] = []
        seen = set()
        for k in local_kfs:
            for lm in self.keyframes.obs_lm[k]:
                lm = int(lm)
                if lm >= 0 and lm not in seen and self.landmarks.alive[lm]:
                    seen.add(lm)
                    pnt_ids.append(lm)
        if len(pnt_ids) > bacfg.max_local_points:
            pnt_ids = pnt_ids[: bacfg.max_local_points]
            seen = set(pnt_ids)

        # fixed cameras = other observers of local points
        fixed_kfs: List[int] = []
        fixed_seen = set(local_set)
        for lm in pnt_ids:
            for k in self.lm_obs[lm]:
                if k not in fixed_seen:
                    fixed_seen.add(k)
                    fixed_kfs.append(k)

        cams = local_kfs + fixed_kfs
        if len(cams) > 2 * bacfg.max_local_kfs:
            cams = cams[: 2 * bacfg.max_local_kfs]
        return self._run_ba(
            cams=cams, n_free=len(local_kfs), pnt_ids=pnt_ids,
            iters1=bacfg.local_ba_iters1, iters2=bacfg.local_ba_iters2,
            erase_outliers=True,
        )

    def _run_ba(self, cams: List[int], n_free: int, pnt_ids: List[int],
                iters1: int, iters2: int, erase_outliers: bool,
                engine: str = "dense") -> dict:
        """Assemble bucketed fixed-shape arrays, dispatch the Schur BA
        (dense reduced system, or implicit-Schur CG for global scale),
        write back, optionally erase outlier observations."""
        if engine == "cg":
            cam_buckets = [128, 256, 512, 1024, 2048, 4096]
            pnt_buckets = [16384, 32768, 65536, 131072, 262144]
            obs_buckets = [65536, 131072, 262144, 524288, 1048576]
        else:
            cam_buckets = [8, 16, 32, 64, 128, 256]
            pnt_buckets = [1024, 2048, 4096, 8192, 16384, 32768, 65536]
            obs_buckets = [4096, 8192, 16384, 32768, 65536, 131072, 262144]
        C = _bucket(len(cams), cam_buckets)
        P = _bucket(len(pnt_ids), pnt_buckets)
        cams = cams[:C]
        n_free = min(n_free, C)
        pnt_ids = pnt_ids[:P]
        cam_index = {k: i for i, k in enumerate(cams)}

        # observations (stereo-only edges, Optimizer.py:293 branch)
        obs_cam, obs_pnt, obs_uvr, obs_isig = [], [], [], []
        obs_back = []  # (lm, kf) for erasure bookkeeping
        inv_sigma2 = self.cfg.orb.inv_level_sigma2
        pnt_index = {p: i for i, p in enumerate(pnt_ids)}
        for lm in pnt_ids:
            for k, feat in self.lm_obs[lm].items():
                if k not in cam_index:
                    continue
                if self.keyframes.u_right[k, feat] <= 0:
                    continue
                obs_cam.append(cam_index[k])
                obs_pnt.append(pnt_index[lm])
                obs_uvr.append([
                    self.keyframes.kp_xy[k, feat, 0],
                    self.keyframes.kp_xy[k, feat, 1],
                    self.keyframes.u_right[k, feat],
                ])
                obs_isig.append(inv_sigma2[self.keyframes.kp_octave[k, feat]])
                obs_back.append((lm, k))
        n_obs = len(obs_cam)
        if n_obs < 20 or len(pnt_ids) < 10:
            return dict(ran=False)

        O = _bucket(n_obs, obs_buckets)
        n_obs = min(n_obs, O)

        cam_Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        cam_Tcw[: len(cams)] = self.keyframes.Tcw[cams]
        cam_fixed = np.ones(C, bool)
        for i, k in enumerate(cams):
            cam_fixed[i] = (i >= n_free) or (k == 0)
        pnt_pos = np.zeros((P, 3), np.float32)
        pnt_pos[: len(pnt_ids)] = self.landmarks.pos[pnt_ids]
        pnt_active = np.zeros(P, bool)
        pnt_active[: len(pnt_ids)] = True

        oc = np.zeros(O, np.int32)
        op = np.zeros(O, np.int32)
        ouvr = np.zeros((O, 3), np.float32)
        oisig = np.zeros(O, np.float32)
        oact = np.zeros(O, bool)
        oc[:n_obs] = obs_cam[:n_obs]
        op[:n_obs] = obs_pnt[:n_obs]
        ouvr[:n_obs] = obs_uvr[:n_obs]
        oisig[:n_obs] = obs_isig[:n_obs]
        oact[:n_obs] = True

        c = self.cfg.camera
        prob = ba.BAProblem(
            cam_Tcw=jnp.asarray(cam_Tcw),
            cam_fixed=jnp.asarray(cam_fixed),
            pnt_pos=jnp.asarray(pnt_pos),
            pnt_active=jnp.asarray(pnt_active),
            obs_cam=jnp.asarray(oc),
            obs_pnt=jnp.asarray(op),
            obs_uvr=jnp.asarray(ouvr),
            obs_inv_sigma2=jnp.asarray(oisig),
            obs_active=jnp.asarray(oact),
            cam=jnp.asarray([c.fx, c.fy, c.cx, c.cy, c.bf], jnp.float32),
        )
        if engine == "cg":
            from pyorbslam_tpu.optim import ba_cg

            res = ba_cg.bundle_adjust_cg(prob, iters1=iters1, iters2=iters2)
        else:
            res = ba.bundle_adjust(prob, iters1=iters1, iters2=iters2)

        out = np.asarray(_pack_ba_result(res.cam_Tcw, res.pnt_pos,
                                         res.obs_inlier))
        new_Tcw = out[: 16 * C].view(np.float32).reshape(C, 4, 4)
        for i in range(n_free):
            if not cam_fixed[i]:
                self.keyframes.Tcw[cams[i]] = new_Tcw[i]
        new_pos = out[16 * C: 16 * C + 3 * P].view(np.float32).reshape(P, 3)
        self.landmarks.pos[pnt_ids] = new_pos[: len(pnt_ids)]

        inlier = out[16 * C + 3 * P:].astype(bool)
        n_erased = 0
        if erase_outliers:
            for o in np.nonzero(~inlier[:n_obs])[0]:
                lm, k = obs_back[o]
                self.erase_observation(lm, k)
                n_erased += 1

        self.update_landmark_geometry(np.asarray(pnt_ids))
        return dict(
            ran=True, n_cams=len(cams), n_free=n_free,
            n_points=len(pnt_ids), n_obs=n_obs, n_erased=n_erased,
        )
