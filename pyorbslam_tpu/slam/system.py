"""System facade: the full SLAM pipeline (tracking + local mapping).

API parity with the reference System (System.py:20-168):
``track_stereo``, ``save_trajectory_kitti``, ``reset``, ``shutdown``,
``activate/deactivate_localization_mode``.  The reference's three threads
become a synchronous interleaved schedule (SURVEY.md §2.3): each keyframe
insertion immediately runs the local-mapping step (covisibility update,
point culling, local Schur BA) before the next frame is tracked — same
semantics, deterministic order, no locks.

Loop closing / relocalization hook in as later stages on this same spine.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pyorbslam_tpu.config import SlamConfig
from pyorbslam_tpu.io.kitti import save_trajectory_kitti
from pyorbslam_tpu.ops import matching as match_ops
from pyorbslam_tpu.ops.hamming import popcount, unpack_bits
from pyorbslam_tpu.optim import pose_opt
from pyorbslam_tpu.optim.epnp import epnp_ransac
from pyorbslam_tpu.place import vocabulary as vocab_mod
from pyorbslam_tpu.place.keyframe_db import KeyFrameDatabase
from pyorbslam_tpu.place.vocabulary import Vocabulary
from pyorbslam_tpu.slam.frame import (
    StereoFrame,
    build_stereo_frame_jit,
    pack_frame,
    unpack_frame_np,
    unproject,
)
from pyorbslam_tpu.slam.slam_map import SlamMap
from pyorbslam_tpu.slam.tracking import (
    fused_retrack_step,
    fused_track_step,
    fused_track_window,
    local_track_step,
    motion_track_step,
)


def _cap_bucket(n: int, max_cap: int) -> int:
    """Pick a padded capacity bucket so device programs stay few-shaped
    while small local maps don't pay full-capacity compute."""
    for b in (2048, 4096, 8192):
        if n <= b and b <= max_cap:
            return b
    return max_cap


def need_new_keyframe(
    n_inliers: int, n_ref_matches: int, n_kfs: int,
    frame_id: int, last_kf_frame: int, last_reloc_frame: int,
    tracked_close: int, non_tracked_close: int,
    min_frames: int, max_frames: int,
    mapper_idle: bool = True, queue_len: int = 0,
) -> bool:
    """Tracking.need_new_key_frame (Tracking.py:470-520), as a pure
    host predicate.

    Clauses (reference names):
      * reloc guard: no keyframes right after relocalization while the
        map is already mature;
      * bNeedToInsertClose: close points are undertracked;
      * c1a: max_frames elapsed since the last keyframe;
      * c1b: min_frames elapsed and the mapper can accept (always true
        in the synchronous schedule);
      * c1c: inliers collapsed below 0.25x the reference KF's tracked
        points, or close points needed;
      * c2: inliers below thRefRatio x reference (0.75 stereo; 0.4 while
        the map has <2 KFs), or close needed — and at least 15 inliers.
    """
    if frame_id < last_reloc_frame + max_frames and n_kfs > max_frames:
        return False
    need_close = tracked_close < 100 and non_tracked_close > 70
    th_ref_ratio = 0.75 if n_kfs >= 2 else 0.4
    c1a = frame_id >= last_kf_frame + max_frames
    c1b = frame_id >= last_kf_frame + min_frames and mapper_idle
    c1c = n_inliers < n_ref_matches * 0.25 or need_close
    c2 = (n_inliers < n_ref_matches * th_ref_ratio or need_close) \
        and n_inliers > 15
    if not ((c1a or c1b or c1c) and c2):
        return False
    # mapper-busy arbitration (Tracking.py:512-519): in the synchronous
    # schedule the mapper is idle by construction; kept for parity with
    # an async host schedule
    return mapper_idle or queue_len < 3


@dataclasses.dataclass
class System:
    cfg: SlamConfig
    landmark_capacity: int = 1 << 18
    keyframe_capacity: int = 4096
    ba_every_n_kf: int = 1          # local BA cadence (1 = every KF)
    # windowed mode: a scanned frame is committed only while its local-map
    # anchoring stays at least this strong; the rest of the window re-tracks
    # per-frame (keyframes then refresh the map at full accuracy).  Guards
    # against the map-feedback drift of committing weakly-anchored poses.
    window_commit_min_inliers: int = 90
    localization_only: bool = False
    vocabulary: Optional[Vocabulary] = None  # trained lazily if absent

    def __post_init__(self):
        self.reset()

    # ---------------- public API (reference parity) ----------------

    def reset(self):
        self.map = SlamMap(
            self.cfg, self.landmark_capacity, self.keyframe_capacity
        )
        self.kfdb = (
            KeyFrameDatabase(self.vocabulary) if self.vocabulary else None
        )
        self.loop_closer = None
        self.local_mapper = None
        self.last_reloc_frame = -10**9
        self.state = "NOT_INITIALIZED"
        self.Tcw = np.eye(4, dtype=np.float32)
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_frame: Optional[StereoFrame] = None
        self.last_assign: Optional[np.ndarray] = None
        self.lm_created_kf = np.full(self.landmark_capacity, -1, np.int32)
        self.recent_lms: list = []
        self.last_kf_frame = -10**9   # frame id of the last keyframe
        self.frame_id = -1
        self.trajectory: list = []   # raw per-frame Tcw at track time
        self.frame_refs: list = []   # (ref_kf, Tcr): relative log for export
        self.stats: list = []
        self._mirror = None          # device-resident landmark blocks
        self._mirror_stale = True
        self._frame_cache = None     # (frame, host snapshot) of the last pull
        self._vocab_cache = None     # (frame, (word, weight, node)) prefetch
        # windowed schedule: while committing a window the mapper counts
        # as BUSY (the reference's async LocalMapping while a queue
        # drains, LocalMapping.py:86-106) — keyframe insertion then needs
        # c1a/c1c and is capped by the queue arbitration
        self._mapper_queue = None    # None = idle (per-frame schedule)
        self._pending_window = None  # in-flight pipelined window
        self._scan_correction = None

    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float) -> np.ndarray:
        self.frame_id += 1
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        if self.state == "NOT_INITIALIZED":
            frame = build_stereo_frame_jit(left, right, self.cfg)
            self._stereo_initialization(frame, timestamp)
        else:
            self._track_fused(left, right, timestamp)
        self.trajectory.append(self.Tcw.copy())
        # relative-pose log: frame pose expressed in its reference KF so
        # later BA / loop corrections propagate to the whole trajectory
        # (System.save_trajectory_kitti chaining, System.py:124-145)
        ref = self.map.keyframes.n - 1
        if ref >= 0:
            Tcr = self.Tcw @ np.linalg.inv(self.map.keyframes.Tcw[ref])
            self.frame_refs.append((ref, Tcr.astype(np.float32)))
        else:
            self.frame_refs.append((-1, self.Tcw.copy()))
        return self.Tcw

    def track_stereo_window(self, lefts, rights, timestamps) -> np.ndarray:
        """Track a window of W frames with ONE device dispatch
        (tracking.fused_track_window): a lax.scan carries features/pose
        across frames on-chip; keyframe decisions and map updates run on
        the host AFTER the window from the per-frame packed stats.  The
        local map is frozen for the window — the same lag the reference's
        asynchronous LocalMapping thread produces.  Falls back to
        per-frame tracking until initialized or when any frame in the
        window tracks weakly.  Returns the W per-frame Tcw poses."""
        if self.state != "OK" or self.map.keyframes.n == 0:
            return np.stack([
                self.track_stereo(lefts[i], rights[i], timestamps[i])
                for i in range(len(timestamps))
            ])
        return self._commit_window(
            self._dispatch_window(lefts, rights, timestamps))

    # ---- pipelined deployment driver ----
    #
    # The chip scans window N+1 while the host processes window N's
    # keyframes (triangulation / fuse / local BA / loop closing) — the
    # TPU-native form of the reference's async Tracking/LocalMapping
    # split (System.py:58-64).  The next scan is dispatched from the
    # DEVICE-side carry of the previous one (no host round trip), against
    # the landmark mirror as of the last processed window (1-window map
    # lag).  Corrections the host discovers while processing (BA-refined
    # keyframe poses, loop closures) are applied to the in-flight
    # window's raw poses as a relative transform at commit time.

    def window_feed(self, lefts, rights, timestamps) -> np.ndarray:
        """Feed one window; returns the poses that became FINAL with this
        call (usually the previous window's W poses; empty on the first
        call; 2W when a bootstrap flush occurs)."""
        empty = np.zeros((0, 4, 4), np.float32)
        if self.state != "OK" or self.map.keyframes.n == 0:
            done = self.window_flush()
            boot = np.stack([
                self.track_stereo(lefts[i], rights[i], timestamps[i])
                for i in range(len(timestamps))
            ])
            return np.concatenate([done, boot]) if len(done) else boot
        old = self._pending_window
        new = self._dispatch_window(
            lefts, rights, timestamps,
            carry=(old["carry"] if old is not None else None))
        out = empty
        if old is not None:
            out = self._commit_window(old)
            new["base"] = self._scan_correction
            if self.state != "OK":
                # the in-flight scan chained off a lost track: its raw
                # poses are unusable — re-track those frames per-frame
                new["discard"] = True
        self._pending_window = new
        return out

    def window_flush(self) -> np.ndarray:
        """Commit any in-flight window; returns its poses."""
        pending = self._pending_window
        self._pending_window = None
        if pending is None:
            return np.zeros((0, 4, 4), np.float32)
        if pending.get("discard") or self.state != "OK":
            return np.stack([
                self.track_stereo(l, r, t) for l, r, t in zip(
                    pending["lefts"], pending["rights"],
                    pending["timestamps"])
            ])
        return self._commit_window(pending)

    def _dispatch_window(self, lefts, rights, timestamps, carry=None):
        """Upload one window of stereo pairs and dispatch the scan.
        ``carry`` (device tuple from the previous scan) lets the chip
        chain windows without waiting for host processing."""
        W = len(timestamps)
        lm = self.map.landmarks
        local_ids = self._local_point_ids(self.last_assign)
        cap = _cap_bucket(len(local_ids), self.cfg.tracking.max_local_points)
        p_ids = np.full(cap, -1, np.int32)
        p_ids[: len(local_ids)] = local_ids

        images = jnp.stack([
            jnp.stack([jnp.asarray(lefts[i], jnp.float32),
                       jnp.asarray(rights[i], jnp.float32)])
            for i in range(W)
        ])
        if carry is None:
            frame0 = self.last_frame
            q_lm0 = jnp.asarray(lm.resolve(self.last_assign))
            Tlw0 = jnp.asarray(self.Tcw)
            Tllw0 = jnp.asarray(
                (np.linalg.inv(self.velocity) @ self.Tcw).astype(np.float32))
        else:
            frame0, q_lm0, Tlw0, Tllw0 = carry
        voc = self.vocabulary
        packed, frames, carry_out = fused_track_window(
            images, *self._landmark_mirror(), frame0, q_lm0,
            jnp.asarray(p_ids), Tlw0, Tllw0, self.cfg,
            voc_arrays=voc._device_arrays(),
            voc_k=voc.k, voc_L=voc.L,
            voc_levels_up=voc.feature_levels_up,
        )
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()   # overlap the read with the scan
        return dict(packed=packed, frames=frames, carry=carry_out,
                    frame0=frame0,
                    lefts=lefts, rights=rights, timestamps=timestamps,
                    p_ids=p_ids, n_local=len(local_ids),
                    n_feat=int(q_lm0.shape[0]), base=None)

    def _commit_window(self, pending) -> np.ndarray:
        """Process one scanned window.  Healthy frames commit the scan
        pose directly.  A frame that needs a keyframe — or whose
        scan anchoring weakened — is RE-ANCHORED on device first: one
        local_track_packed dispatch re-optimizes its pose against the
        CURRENT map, reusing the scan's extracted features (no ORB
        re-extraction).  Only frames that stay weak after re-anchoring
        (true tracking loss) fall back to the per-frame state machine
        with its relocalization ladder."""
        timestamps = pending["timestamps"]
        lefts, rights = pending["lefts"], pending["rights"]
        p_ids = pending["p_ids"]
        local_n = pending["n_local"]
        lm = self.map.landmarks
        W = len(timestamps)
        out = np.asarray(pending["packed"])   # ONE device->host transfer
        n_feat = pending["n_feat"]
        N, P = n_feat, len(p_ids)
        base_off = 21 + N + P
        frames = pending["frames"]
        stats = out[:, :5]

        base_raw, base_corr = pending["base"] or (None, None)
        raw_last = out[W - 1, 5:21].copy().view(np.float32).reshape(4, 4)
        trk = self.cfg.tracking
        poses = []
        aborted = None
        self._mapper_queue = 0   # window commit = mapper busy
        for i in range(W):
            row = out[i]
            if int(row[0]) < 20 or int(row[1]) < 20:
                aborted = i        # motion tracking collapsed mid-scan
                break
            n_matches_i = int(row[0])
            n_inliers = int(row[2])
            assign = lm.resolve(row[21: 21 + N])
            assign = np.where(
                (assign >= 0) & lm.alive[np.maximum(assign, 0)], assign, -1)
            p_visible = row[21 + N: 21 + N + P].astype(bool)
            raw = row[5:21].copy().view(np.float32).reshape(4, 4)
            Tcw_i = raw if base_raw is None \
                else raw @ np.linalg.inv(base_raw) @ base_corr
            Tcw_i = np.ascontiguousarray(Tcw_i, dtype=np.float32)
            frame_i = jax.tree_util.tree_map(lambda a: a[i], frames)
            snap = unpack_frame_np(
                row[base_off: base_off + 16 * N].copy(), N)
            tracked_close = int(row[3])
            non_tracked_close = int(row[4])
            n_local_i = local_n

            # does this frame need a keyframe (busy-mapper gating), or
            # did its map anchoring weaken below the commit bar?
            ks = self.map.keyframes
            needs_kf = need_new_keyframe(
                n_inliers=int((assign >= 0).sum()),
                n_ref_matches=self._ref_kf_tracked_points(),
                n_kfs=int(ks.alive[: ks.n].sum()),
                frame_id=self.frame_id + 1,
                last_kf_frame=self.last_kf_frame,
                last_reloc_frame=self.last_reloc_frame,
                tracked_close=tracked_close,
                non_tracked_close=non_tracked_close,
                min_frames=trk.min_frames, max_frames=trk.max_frames,
                mapper_idle=False, queue_len=self._mapper_queue,
            )
            if needs_kf or n_inliers < self.window_commit_min_inliers:
                frame_prev = pending["frame0"] if i == 0 else \
                    jax.tree_util.tree_map(lambda a: a[i - 1], frames)
                re = self._retrack_window_frame(frame_i, frame_prev)
                if re is None:
                    # weak even against the fresh map: this stretch needs
                    # the per-frame machine's full rescue ladder
                    aborted = i
                    break
                (n_matches_i, n_inliers, Tcw_i, assign, p_ids_i,
                 p_visible, tracked_close, non_tracked_close) = re
                # the re-tracked pose leaves the raw scan chain: fold the
                # delta into the base correction so later rows follow
                base_raw = raw.copy()
                base_corr = Tcw_i.copy()
                p_vis_ids = p_ids_i
                n_local_i = int((p_ids_i >= 0).sum())
            else:
                p_vis_ids = p_ids

            self.frame_id += 1
            vis_ids = p_vis_ids[p_visible[: len(p_vis_ids)]]
            vis_ids = vis_ids[vis_ids >= 0]
            lm.visible[vis_ids] += 1
            found_ids = np.unique(assign[assign >= 0])
            lm.found[found_ids] += 1
            lm.visible[found_ids] += 1

            self.state = "OK" if n_inliers >= 20 else "MARGINAL"
            self.Tcw = np.ascontiguousarray(Tcw_i, dtype=np.float32)
            # prefetched host snapshot + BoW vectors: keyframe insertion
            # reuses the window read instead of new device round trips
            self._frame_cache = (frame_i, snap)
            self._vocab_cache = (frame_i, (
                row[base_off + 16 * N: base_off + 17 * N].copy(),
                row[base_off + 17 * N: base_off + 18 * N].copy()
                .view(np.float32),
                row[base_off + 18 * N: base_off + 19 * N].copy(),
            ))
            pre_kf_Tcw = self.Tcw.copy()
            self._finish_track(
                frame_i, assign, n_matches_i, n_inliers,
                tracked_close, non_tracked_close, n_local_i, timestamps[i],
            )
            if not np.allclose(self.Tcw, pre_kf_Tcw, atol=1e-7):
                base_raw = raw.copy()
                base_corr = self.Tcw.copy()
            self.trajectory.append(self.Tcw.copy())
            ref = self.map.keyframes.n - 1
            Tcr = self.Tcw @ np.linalg.inv(self.map.keyframes.Tcw[ref])
            self.frame_refs.append((ref, Tcr.astype(np.float32)))
            poses.append(self.Tcw.copy())
        if aborted is not None:
            # true weakness: the per-frame machine (BoW fallback, wide
            # rescue, relocalization) takes the rest of the window
            for i in range(aborted, W):
                poses.append(
                    self.track_stereo(lefts[i], rights[i], timestamps[i]))
        self._mapper_queue = None   # mapper idle again
        # divergence between the raw scan chain (which any in-flight
        # window continued from) and the host's final pose for this
        # window's last frame — applied to the next pipelined commit
        self._scan_correction = (raw_last, self.Tcw.copy())
        return np.stack(poses)

    def _retrack_window_frame(self, frame_i, frame_prev):
        """Full tracking body (motion + local + pose opt) for one scanned
        frame against the CURRENT map, reusing its extracted features —
        the device re-track that precedes in-window keyframe insertion.
        Returns (n_matches, n_inliers, Tcw, assign, p_ids, p_visible,
        tracked_close, non_tracked_close) or None when weak."""
        lm = self.map.landmarks
        Tcw_pred = (self.velocity @ self.Tcw).astype(np.float32)
        q_lm = lm.resolve(self.last_assign)
        local_ids = self._local_point_ids(self.last_assign)
        cap = _cap_bucket(len(local_ids), self.cfg.tracking.max_local_points)
        p_ids = np.full(cap, -1, np.int32)
        p_ids[: len(local_ids)] = local_ids
        packed = np.asarray(fused_retrack_step(
            frame_i, *self._landmark_mirror(),
            jnp.asarray(q_lm), frame_prev, jnp.asarray(p_ids),
            jnp.asarray(Tcw_pred), jnp.asarray(self.Tcw), self.cfg,
        ))
        N = q_lm.shape[0]
        stats = packed[:5]
        n_matches, n_in_motion, n_inliers = (int(x) for x in stats[:3])
        if n_matches < 20 or n_in_motion < 20 or n_inliers < 20:
            return None
        Tcw = packed[5:21].copy().view(np.float32).reshape(4, 4)
        assign = packed[21: 21 + N].copy()
        p_visible = packed[21 + N:].astype(bool)
        return (n_matches, n_inliers,
                np.ascontiguousarray(Tcw, np.float32), assign, p_ids,
                p_visible, int(stats[3]), int(stats[4]))

    def corrected_trajectory(self) -> np.ndarray:
        """Per-frame Tcw with all keyframe corrections applied.  Frames
        whose reference KF was culled chain Tcr through the frozen
        dead-KF relative poses to the nearest live ancestor
        (System.save_trajectory_kitti, System.py:124-145)."""
        out = []
        for (ref, Tcr), raw in zip(self.frame_refs, self.trajectory):
            if ref >= 0:
                ref, Tcr = self.map.resolve_ref(ref, Tcr)
                out.append(Tcr @ self.map.keyframes.Tcw[ref])
            else:
                out.append(raw)
        return np.stack(out) if out else np.zeros((0, 4, 4), np.float32)

    def save_trajectory_kitti(self, path: str):
        save_trajectory_kitti(path, self.corrected_trajectory())

    def activate_localization_mode(self):
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def shutdown(self):
        pass  # synchronous pipeline: nothing to join

    # ---------------- initialization ----------------

    def _stereo_initialization(self, frame: StereoFrame, timestamp: float):
        # the reference requires > 500 features at its 2000-feature
        # operating point (Tracking.py:284); scale the gate with the
        # configured budget so small configs can still bootstrap
        n_valid = int(np.asarray(frame.valid).sum())
        if n_valid <= min(500, self.cfg.orb.n_features // 4):
            return
        if self.vocabulary is None:
            # prefer the shipped offline-trained vocabulary (corpus idf,
            # tools/train_vocab.py); fall back to training a small scene
            # vocabulary from the initial frame (DBoW2 k-majority)
            self.vocabulary = vocab_mod.load_default()
        if self.vocabulary is None:
            d = np.asarray(frame.desc)[np.asarray(frame.valid)]
            self.vocabulary = vocab_mod.train(d, k=10, L=3, seed=0)
        if self.kfdb is None:
            self.kfdb = KeyFrameDatabase(self.vocabulary)
        self.Tcw = np.eye(4, dtype=np.float32)
        assign = self._create_landmarks(frame, self.Tcw, limit=None)
        self._insert_keyframe(frame, assign, timestamp, run_ba=False)
        self.last_frame = frame
        self.last_assign = assign
        self.state = "OK"

    # ---------------- per-frame tracking ----------------

    def _landmark_mirror(self):
        """Device-resident landmark blocks (positions, descriptors,
        normals, distance bands, alive mask), refreshed only after map
        mutations — per-frame tracking gathers from these by index so the
        blocks never cross the host boundary (SURVEY §7 host/device split)."""
        lm = self.map.landmarks
        if self._mirror is None or self._mirror_stale:
            cap = 1 << 14
            while cap < lm.n:
                cap <<= 1
            cap = min(cap, lm.capacity)
            self._mirror = (
                jnp.asarray(lm.pos[:cap]), jnp.asarray(lm.desc[:cap]),
                jnp.asarray(lm.normal[:cap]), jnp.asarray(lm.dmin[:cap]),
                jnp.asarray(lm.dmax[:cap]), jnp.asarray(lm.alive[:cap]),
            )
            self._mirror_stale = False
        return self._mirror

    def _track_fused(self, left, right, timestamp: float):
        """Fast path: the whole per-frame hot path in one device dispatch
        (tracking.fused_track_step) + one packed read-back.  Falls back to
        the step-by-step host path on weak tracking (rare)."""
        lm = self.map.landmarks
        Tcw_pred = (self.velocity @ self.Tcw).astype(np.float32)
        q_lm = lm.resolve(self.last_assign)
        local_ids = self._local_point_ids(self.last_assign)
        cap = _cap_bucket(len(local_ids), self.cfg.tracking.max_local_points)
        p_ids = np.full(cap, -1, np.int32)
        p_ids[: len(local_ids)] = local_ids

        fres = fused_track_step(
            left, right, *self._landmark_mirror(),
            jnp.asarray(q_lm), self.last_frame,
            jnp.asarray(p_ids), jnp.asarray(Tcw_pred), jnp.asarray(self.Tcw),
            self.cfg,
        )
        packed = np.asarray(fres.packed)   # ONE device->host transfer
        n_feat = q_lm.shape[0]
        stats = packed[:5]
        Tcw = packed[5:21].view(np.float32).reshape(4, 4)
        assign = packed[21: 21 + n_feat]
        p_visible = packed[21 + n_feat:].astype(bool)
        n_matches, n_in_motion, n_inliers, tracked_close, non_tracked_close = (
            int(x) for x in stats
        )
        if n_matches < 20 or n_in_motion < 20 or n_inliers < 10:
            # weak tracking: rerun through the host state machine (BoW
            # reference-KF fallback, wide-radius rescue, relocalization)
            return self._track(fres.frame, timestamp)

        vis_ids = p_ids[p_visible]
        vis_ids = vis_ids[vis_ids >= 0]
        lm.visible[vis_ids] += 1
        found_ids = np.unique(assign[assign >= 0])
        lm.found[found_ids] += 1
        lm.visible[found_ids] += 1

        self.state = "OK" if n_inliers >= 20 else "MARGINAL"
        self.Tcw = np.asarray(Tcw, np.float32)
        self._finish_track(
            fres.frame, assign, n_matches, n_inliers,
            tracked_close, non_tracked_close, len(local_ids), timestamp,
        )

    def _track(self, frame: StereoFrame, timestamp: float):
        lm = self.map.landmarks
        Tcw_pred = (self.velocity @ self.Tcw).astype(np.float32)
        lm_ids = lm.resolve(self.last_assign)
        q_active = lm_ids >= 0
        safe = np.maximum(lm_ids, 0)

        def motion_attempt(th_base):
            return motion_track_step(
                frame,
                jnp.asarray(lm.pos[safe]),
                jnp.asarray(lm.desc[safe]),
                self.last_frame.angle,
                self.last_frame.octave,
                jnp.asarray(q_active & lm.alive[safe]),
                jnp.asarray(Tcw_pred),
                jnp.asarray(self.Tcw),
                self.cfg,
                th_base=th_base,
            )

        res = motion_attempt(7.0)
        assign = None
        if int(res.n_matches) < 20 or int(res.n_inliers) < 20:
            # fallbacks, in the reference's order: BoW matching against
            # the reference keyframe (track_reference_key_frame,
            # Tracking.py:329-356), then a wide-radius projection rescue
            # for large prediction errors BoW can't fix (e.g. sharp turns)
            ref = self._track_reference_keyframe(frame)
            if ref is not None:
                Tcw_mid, assign = ref
                n_matches = int((assign >= 0).sum())
            else:
                res = motion_attempt(28.0)
        if assign is None:
            n_matches = int(res.n_matches)
            feat_query = np.asarray(res.feat_query)
            assign = np.where(feat_query >= 0, lm_ids[np.maximum(feat_query, 0)], -1)
            Tcw_mid = np.asarray(res.Tcw) if n_matches >= 20 else Tcw_pred

        # local map from covisibility (update_local_keyframes/points)
        local_ids = self._local_point_ids(assign)
        cap = _cap_bucket(len(local_ids), self.cfg.tracking.max_local_points)
        p_ids = np.full(cap, -1, np.int32)
        p_ids[: len(local_ids)] = local_ids
        p_safe = np.maximum(p_ids, 0)
        feat_has = assign >= 0
        feat_xw = lm.pos[np.maximum(assign, 0)]

        lres = local_track_step(
            frame,
            jnp.asarray(feat_xw),
            jnp.asarray(feat_has),
            jnp.asarray(lm.pos[p_safe]),
            jnp.asarray(lm.desc[p_safe]),
            jnp.asarray(lm.normal[p_safe]),
            jnp.asarray(lm.dmin[p_safe]),
            jnp.asarray(lm.dmax[p_safe]),
            jnp.asarray(p_ids >= 0),
            jnp.asarray(Tcw_mid),
            self.cfg,
        )
        n_inliers = int(lres.n_inliers)
        tracked = np.asarray(lres.tracked)
        feat_local = np.asarray(lres.feat_local)
        assign = np.where(feat_local >= 0, p_ids[np.maximum(feat_local, 0)], assign)
        assign = np.where(tracked, assign, -1)

        # found / visible counters (track_local_map bookkeeping)
        vis_ids = p_ids[np.asarray(lres.p_visible)]
        vis_ids = vis_ids[vis_ids >= 0]
        lm.visible[vis_ids] += 1
        found_ids = np.unique(assign[assign >= 0])
        lm.found[found_ids] += 1
        lm.visible[found_ids] += 1

        if n_inliers >= 10:
            # accept — the reference keeps the optimized pose even when
            # flagging weak tracking; discarding a 10+-inlier solution
            # cascades into permanent loss
            self.state = "OK" if n_inliers >= 20 else "MARGINAL"
            self.Tcw = np.asarray(lres.Tcw)
        else:
            reloc = self._relocalize(frame)
            if reloc is not None:
                self.state = "OK"
                self.Tcw, assign = reloc
                self.last_reloc_frame = self.frame_id
            else:
                self.state = "WEAK"
                self.Tcw = Tcw_pred
                assign = np.full(frame.capacity, -1, np.int32)

        depth = np.asarray(frame.depth)
        valid = np.asarray(frame.valid)
        th_depth = self.cfg.camera.depth_threshold
        close = (depth > 0) & (depth < th_depth) & valid
        tracked_close = int((close & (assign >= 0)).sum())
        non_tracked_close = int((close & (assign < 0)).sum())
        self._finish_track(
            frame, assign, n_matches, n_inliers,
            tracked_close, non_tracked_close, len(local_ids), timestamp,
        )

    def _finish_track(self, frame, assign, n_matches, n_inliers,
                      tracked_close, non_tracked_close, n_local,
                      timestamp):
        self.velocity = (
            self.Tcw @ np.linalg.inv(self.trajectory[-1])
        ).astype(np.float32)

        # keyframe decision (Tracking.need_new_key_frame parity), plus:
        # MARGINAL frames force a keyframe (refresh the local map before
        # tracking dies); WEAK frames with failed relocalization reseed via
        # a keyframe as the last resort so odometry survives unmapped
        # excursions (the reference's auto-reset analog, Tracking.py:258-262)
        trk = self.cfg.tracking
        ks = self.map.keyframes
        # mnMatchesInliers counts ALL tracked map points in the frame
        # (Tracking.py:375-382), not just stereo-edge pose-opt inliers —
        # the ratio clauses are calibrated against that count
        n_tracked_points = int((assign >= 0).sum())
        need_kf = not self.localization_only and (
            (self.state == "OK" and need_new_keyframe(
                n_inliers=n_tracked_points,
                n_ref_matches=self._ref_kf_tracked_points(),
                n_kfs=int(ks.alive[: ks.n].sum()),
                frame_id=self.frame_id,
                last_kf_frame=self.last_kf_frame,
                last_reloc_frame=self.last_reloc_frame,
                tracked_close=tracked_close,
                non_tracked_close=non_tracked_close,
                min_frames=trk.min_frames, max_frames=trk.max_frames,
                mapper_idle=(
                    self._mapper_queue is None
                    and self.frame_id
                    >= self.last_kf_frame + trk.mapper_latency_frames
                ),
                queue_len=self._mapper_queue or 0,
            ))
            or self.state == "MARGINAL"
            or self.state == "WEAK"
        )
        if need_kf:
            assign = self._create_landmarks(frame, self.Tcw, limit=100,
                                            existing=assign)
            kf_id = self._insert_keyframe(frame, assign, timestamp, run_ba=True)
            # local mapping may have added triangulated/fused bindings to
            # this keyframe; carry them into the tracker state
            assign = self.map.keyframes.obs_lm[kf_id].copy()

        self.last_frame = frame
        self.last_assign = assign
        self.stats.append(
            dict(frame=self.frame_id, matches=n_matches, inliers=n_inliers,
                 tracked_points=n_tracked_points,
                 tracked_close=tracked_close, new_kf=need_kf,
                 state=self.state,
                 local_points=n_local, n_kfs=self.map.keyframes.n,
                 n_landmarks=int(self.map.landmarks.alive.sum())),
        )

    # ---------------- local mapping (synchronous) ----------------

    def _frame_host(self, frame: StereoFrame) -> dict:
        """Host snapshot of a frame's per-feature arrays, pulled in ONE
        device->host transfer and cached per frame object."""
        if self._frame_cache is not None and self._frame_cache[0] is frame:
            return self._frame_cache[1]
        snap = unpack_frame_np(np.asarray(pack_frame(frame)), frame.capacity)
        self._frame_cache = (frame, snap)
        return snap

    def _insert_keyframe(self, frame: StereoFrame, assign: np.ndarray,
                         timestamp: float, run_ba: bool):
        frame_np = self._frame_host(frame)
        if self._vocab_cache is not None and self._vocab_cache[0] is frame:
            word, wweight, node = self._vocab_cache[1]   # window prefetch
        else:
            word, wweight, node = self.vocabulary.transform(
                frame.desc, levels_up=self.vocabulary.feature_levels_up)
        kf = self.map.add_keyframe(
            frame_np, self.Tcw, assign, self.frame_id, timestamp,
            kp_node=node,
        )
        bow = self.vocabulary.bow_vector(word, wweight, frame_np["valid"])
        self.kfdb.add(kf, bow)
        if self.loop_closer is None:
            from pyorbslam_tpu.slam.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(
                self.cfg, self.map, self.vocabulary, self.kfdb
            )
        if self.local_mapper is None:
            from pyorbslam_tpu.slam.local_mapping import LocalMapper

            self.local_mapper = LocalMapper(self.cfg, self.map)
        new_ids = assign[(assign >= 0) & (self.lm_created_kf[np.maximum(assign, 0)] < 0)]
        self.lm_created_kf[new_ids] = kf
        self.recent_lms.append(np.unique(assign[assign >= 0]))
        self.last_kf_frame = self.frame_id
        if self._mapper_queue is not None:
            self._mapper_queue += 1

        # map-point culling over landmarks created in the last 3 KFs
        if len(self.recent_lms) > 3:
            self.map.cull_map_points(
                self.recent_lms[-3], kf, self.lm_created_kf
            )

        if run_ba and self.local_mapper is not None:
            # LocalMapping order (LocalMapping.run): triangulate new points
            # over covisible neighbors, fuse duplicates, then local BA,
            # then keyframe culling
            self.local_mapper.create_new_points(kf)
            self.local_mapper.fuse_neighbors(kf)

        if run_ba and kf % self.ba_every_n_kf == 0:
            info = self.map.local_ba(kf)
            if info.get("ran"):
                # adopt the BA-refined pose for the current camera
                self.Tcw = self.map.keyframes.Tcw[kf].copy()

        if run_ba and self.local_mapper is not None and kf % 4 == 0:
            self.local_mapper.cull_keyframes(
                kf, on_removed=lambda k: self.kfdb.erase(k))

        if self.loop_closer is not None and run_ba:
            closed = self.loop_closer.on_keyframe(kf, bow)
            if closed:
                # loop correction + pose graph + GBA rewrote the map;
                # adopt the corrected current pose and clear the motion
                # model (the old velocity lives in the pre-correction frame)
                self.Tcw = self.map.keyframes.Tcw[kf].copy()
                self.velocity = np.eye(4, dtype=np.float32)
        self._mirror_stale = True   # the store changed; re-upload lazily
        return kf

    # ---------------- reference-keyframe tracking ----------------

    def _track_reference_keyframe(self, frame: StereoFrame):
        """Tracking.track_reference_key_frame (Tracking.py:329-356): BoW-match
        the current frame against the reference (latest) keyframe with the
        0.7 ratio test at TH_LOW plus rotation consistency
        (ORBMatcher.search_by_BoW_kf_f:21-118), seed the pose from the last
        frame, run motion-only optimization; accepted at >= 10 inliers."""
        ks = self.map.keyframes
        kf = ks.n - 1
        if kf < 0 or self.vocabulary is None:
            return None
        lm = self.map.landmarks
        kf_lm = lm.resolve(ks.obs_lm[kf])
        q_active = (kf_lm >= 0) & lm.alive[np.maximum(kf_lm, 0)]
        if q_active.sum() < 15:
            return None
        _, _, node = self.vocabulary.transform(
            frame.desc, levels_up=self.vocabulary.feature_levels_up)
        kf_desc = jnp.asarray(ks.kp_desc[kf])
        idx, _, matched = match_ops.match_by_bow(
            unpack_bits(kf_desc), popcount(kf_desc),
            jnp.asarray(ks.kp_node[kf]), jnp.asarray(q_active),
            frame.desc_bits, popcount(frame.desc), jnp.asarray(node),
            frame.valid,
        )
        matched = match_ops.rotation_consistency_mask(
            jnp.asarray(ks.kp_angle[kf]), frame.angle,
            jnp.maximum(idx, 0), matched,
        )
        matched_np = np.asarray(matched)
        if matched_np.sum() < 15:
            return None
        idx_np = np.asarray(idx)
        qi = np.nonzero(matched_np)[0]
        assign = np.full(frame.capacity, -1, np.int32)
        assign[idx_np[qi]] = kf_lm[qi]

        has = assign >= 0
        Xw = lm.pos[np.maximum(assign, 0)]
        obs = np.stack([
            np.asarray(frame.xy)[:, 0], np.asarray(frame.xy)[:, 1],
            np.asarray(frame.u_right)], 1)
        frame_valid = np.asarray(frame.valid)
        edge_active = has & (np.asarray(frame.u_right) > 0) & frame_valid
        inv_sigma2 = np.asarray(self.cfg.orb.inv_level_sigma2)[
            np.asarray(frame.octave)]
        c = self.cfg.camera
        cam5 = jnp.asarray([c.fx, c.fy, c.cx, c.cy, c.bf], jnp.float32)
        pres = pose_opt.pose_optimization(
            jnp.asarray(self.Tcw), jnp.asarray(Xw), jnp.asarray(obs),
            jnp.asarray(inv_sigma2), jnp.asarray(edge_active), cam5,
            rounds=self.cfg.ba.pose_rounds,
            iters=self.cfg.ba.pose_iters_per_round,
        )
        if int(pres.num_inliers) < 10:
            return None
        inl = np.asarray(pres.inliers)
        assign = np.where(edge_active & ~inl, -1, assign)
        return np.asarray(pres.Tcw), assign

    # ---------------- relocalization ----------------

    def _relocalize(self, frame: StereoFrame):
        """Tracking.relocalization (Tracking.py:661-763): BoW candidates ->
        BoW matching (>=15) -> batched EPnP RANSAC -> pose optimization,
        accepted at >=50 stereo inliers after a final refinement."""
        if self.kfdb is None or self.map.keyframes.n == 0:
            return None
        frame_valid = np.asarray(frame.valid)
        word, wweight, node = self.vocabulary.transform(
            frame.desc, levels_up=self.vocabulary.feature_levels_up)
        qbow = self.vocabulary.bow_vector(word, wweight, frame_valid)
        cands = self.kfdb.detect_relocalization_candidates(
            qbow, self.map.covisible_neighbors
        )[:5]
        if not cands:
            return None

        f_bits = unpack_bits(frame.desc)
        f_pop = popcount(frame.desc)
        f_node = jnp.asarray(node)
        cam4 = jnp.asarray(
            [self.cfg.camera.fx, self.cfg.camera.fy,
             self.cfg.camera.cx, self.cfg.camera.cy], jnp.float32)
        cam5 = jnp.asarray(
            [self.cfg.camera.fx, self.cfg.camera.fy, self.cfg.camera.cx,
             self.cfg.camera.cy, self.cfg.camera.bf], jnp.float32)
        sigma2 = np.asarray(self.cfg.orb.level_sigma2)
        inv_sigma2_feat = np.asarray(self.cfg.orb.inv_level_sigma2)[
            np.asarray(frame.octave)]

        for kf in cands:
            ks = self.map.keyframes
            kf_lm = ks.obs_lm[kf]
            q_active = kf_lm >= 0
            kf_desc = jnp.asarray(ks.kp_desc[kf])
            idx, dist, matched = match_ops.match_by_bow(
                unpack_bits(kf_desc), popcount(kf_desc),
                jnp.asarray(ks.kp_node[kf]), jnp.asarray(q_active),
                f_bits, f_pop, f_node, jnp.asarray(frame_valid),
            )
            matched = np.asarray(matched)
            idx = np.asarray(idx)
            if matched.sum() < 15:
                continue
            # correspondences: frame feature -> landmark world pos
            qi = np.nonzero(matched)[0]
            fi = idx[qi]
            lm_ids = self.map.landmarks.resolve(kf_lm[qi])
            ok = lm_ids >= 0
            qi, fi, lm_ids = qi[ok], fi[ok], lm_ids[ok]
            if len(qi) < 15:
                continue
            Xw = self.map.landmarks.pos[lm_ids]
            f_xy = np.asarray(frame.xy)[fi]
            f_oct = np.asarray(frame.octave)[fi]

            n = len(qi)
            res = epnp_ransac(
                jnp.asarray(Xw), jnp.asarray(f_xy),
                jnp.asarray(sigma2[f_oct]), jnp.ones(n, bool), cam4,
                jax.random.PRNGKey(self.frame_id),
            )
            if not bool(res.ok):
                continue
            Tcw0 = np.eye(4, dtype=np.float32)
            Tcw0[:3, :3] = np.asarray(res.R)
            Tcw0[:3, 3] = np.asarray(res.t)

            # motion-only refinement over the matched set
            assign = np.full(frame.capacity, -1, np.int32)
            assign[fi] = lm_ids
            has = assign >= 0
            Xw_full = self.map.landmarks.pos[np.maximum(assign, 0)]
            obs = np.stack([
                np.asarray(frame.xy)[:, 0], np.asarray(frame.xy)[:, 1],
                np.asarray(frame.u_right)], 1)
            edge_active = has & (np.asarray(frame.u_right) > 0) & frame_valid
            pres = pose_opt.pose_optimization(
                jnp.asarray(Tcw0), jnp.asarray(Xw_full), jnp.asarray(obs),
                jnp.asarray(inv_sigma2_feat), jnp.asarray(edge_active), cam5,
            )
            n_good = int(pres.num_inliers)
            if n_good < 10:
                continue
            inl = np.asarray(pres.inliers)
            assign = np.where(edge_active & ~inl, -1, assign)
            Tcw_cur = np.asarray(pres.Tcw)

            # two-tier projection rescue (Tracking.py:724-755): project the
            # candidate KF's landmarks with the coarse pose and re-match —
            # first wide (th=10, ORBdist=100), then, if still marginal,
            # tight (th=3, ORBdist=64); each tier re-runs pose optimization
            # (folded into local_track_step).  Accept at >= 50 inliers.
            lm = self.map.landmarks
            kf_pts = lm.resolve(kf_lm)
            kf_pts = np.unique(kf_pts[kf_pts >= 0])
            kf_pts = kf_pts[lm.alive[kf_pts]]
            cap = _cap_bucket(len(kf_pts), self.cfg.tracking.max_local_points)
            p_ids = np.full(cap, -1, np.int32)
            p_ids[: len(kf_pts)] = kf_pts[:cap]
            p_safe = np.maximum(p_ids, 0)

            def rescue(assign, Tcw_np, radius_mult, max_dist_th):
                lres = local_track_step(
                    frame,
                    jnp.asarray(lm.pos[np.maximum(assign, 0)]),
                    jnp.asarray(assign >= 0),
                    jnp.asarray(lm.pos[p_safe]),
                    jnp.asarray(lm.desc[p_safe]),
                    jnp.asarray(lm.normal[p_safe]),
                    jnp.asarray(lm.dmin[p_safe]),
                    jnp.asarray(lm.dmax[p_safe]),
                    jnp.asarray(p_ids >= 0),
                    jnp.asarray(Tcw_np),
                    self.cfg,
                    radius_mult=radius_mult, max_dist_th=max_dist_th,
                )
                feat_local = np.asarray(lres.feat_local)
                tracked = np.asarray(lres.tracked)
                new_assign = np.where(
                    feat_local >= 0, p_ids[np.maximum(feat_local, 0)], assign
                )
                new_assign = np.where(tracked, new_assign, -1)
                return int(lres.n_inliers), np.asarray(lres.Tcw), new_assign

            if n_good < 50:
                n_good, Tcw_cur, assign = rescue(assign, Tcw_cur, 10.0, 100)
                if 30 < n_good < 50:
                    n_good, Tcw_cur, assign = rescue(assign, Tcw_cur, 3.0, 64)
            if n_good < 50:
                continue
            return Tcw_cur, assign
        return None

    # ---------------- helpers ----------------

    def _ref_kf_tracked_points(self) -> int:
        """KeyFrame.tracked_map_points(minObs) for the reference (latest)
        keyframe: its observed landmarks with enough total observations
        (Tracking.py:483-487; stereo observations count 2)."""
        ks = self.map.keyframes
        ref = ks.n - 1
        if ref < 0:
            return 0
        min_obs = 3 if ks.alive[: ks.n].sum() > 2 else 2
        ids = self.map.landmarks.resolve(ks.obs_lm[ref])
        ids = ids[ids >= 0]
        lm = self.map.landmarks
        ids = ids[lm.alive[ids]]
        return int((lm.n_obs[ids] >= min_obs).sum())

    def _local_point_ids(self, assign: np.ndarray) -> np.ndarray:
        """update_local_keyframes + update_local_points (Tracking.py:392-436):
        KFs observing currently-assigned landmarks, plus their best
        covisible neighbors; local points = union of their observations.
        One native call (mapcore_local_points) replaces the per-frame
        Python dict walk."""
        tracked = np.unique(assign[assign >= 0])
        if len(tracked) == 0:
            return np.empty(0, np.int32)
        return self.map.core.local_points(
            tracked, self.cfg.tracking.max_local_points)

    def _create_landmarks(self, frame: StereoFrame, Tcw: np.ndarray,
                          limit: Optional[int],
                          existing: Optional[np.ndarray] = None) -> np.ndarray:
        """Depth-ordered stereo landmark creation (create_new_key_frame,
        Tracking.py:523-576)."""
        lm = self.map.landmarks
        snap = self._frame_host(frame)
        depth = snap["depth"]
        valid = snap["valid"]
        octave = snap["octave"]
        desc = snap["desc"]
        assign = (existing.copy() if existing is not None
                  else np.full(frame.capacity, -1, np.int32))

        Twc = np.linalg.inv(Tcw)
        # host-side unproject (Frame.unproject_stereo semantics) — the
        # snapshot already holds everything; no extra device round trip
        cam = self.cfg.camera
        z = depth
        pc = np.stack([
            (snap["xy"][:, 0] - cam.cx) * z / cam.fx,
            (snap["xy"][:, 1] - cam.cy) * z / cam.fy,
            z,
        ], axis=-1)
        pts_w = (pc @ Twc[:3, :3].T + Twc[:3, 3]).astype(np.float32)
        Ow = Twc[:3, 3]

        cand = np.nonzero((depth > 0) & valid & (assign < 0))[0]
        cand = cand[np.argsort(depth[cand])]
        if limit is not None:
            th_depth = self.cfg.camera.depth_threshold
            total = int((assign >= 0).sum())
            take = []
            for i in cand:
                take.append(i)
                total += 1
                if depth[i] > th_depth and total > limit:
                    break
            cand = np.array(take, dtype=np.int64)
        if len(cand) == 0:
            return assign

        po = pts_w[cand] - Ow
        dist = np.linalg.norm(po, axis=1)
        normal = po / np.maximum(dist[:, None], 1e-6)
        ids = lm.add(
            pts_w[cand], desc[cand], normal, dist, octave[cand],
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
            ref_kf=self.map.keyframes.n,
        )
        assign[cand] = ids
        return assign
