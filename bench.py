"""Benchmark: tracked frames/s/chip on a synthetic KITTI-resolution stereo
sequence at the reference operating point (2000 ORB features, 8 levels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The baseline denominator is the reference pyOrbSLAM2's single-chip (CPU)
frames/s.  The reference publishes no numbers (BASELINE.md), so it is
MEASURED on this machine by tools/refbench/ref_tracking_bench.py: the
reference's own Tracking.grab_image_stereo hot path (its C++ ORB
extractor + its Python stereo matching, projection matchers, local-map
frustum search and keyframe creation), with only the unbuildable g2o
solve replaced by a ~1 ms numpy stand-in and BoW/mapping-thread work
excluded — every substitution favors the reference, so the recorded
baseline fps is an upper bound on its true speed and vs_baseline
UNDERSTATES the speedup.  baseline_measured.json carries the number
(scope="tracking-sans-g2o"); without it, bench falls back to crediting
the reference with upstream C++ ORB-SLAM2's ~10 fps real-time figure.
"""

import json
import os
import time

import numpy as np


def main():
    # The DEFAULT (driver-visible) metric is the FULL pipeline — tracking
    # + local mapping + local BA + loop closing — in the pipelined
    # windowed deployment shape (BASELINE config 2), with the
    # tracking-only scan number attached as an aux field.
    # BENCH_CONFIG=tracking runs only the motion-tracking scan (config 1);
    # BENCH_CONFIG=highdensity runs the 4x-features stress config
    # (config 4); BENCH_CONFIG=pipeline / pipeline_window run the full
    # pipeline per-frame / sync-windowed.
    bench_config = os.environ.get("BENCH_CONFIG", "")
    if bench_config == "":
        # DEFAULT (driver-visible): the full pipeline in the PIPELINED
        # per-frame schedule — each call dispatches frame N chained off
        # frame N-1's device carry and commits frame N-1, so upload,
        # compute and readback overlap through the device tunnel
        # (System.track_stereo_async).  Per-frame map updates, per-frame
        # keyframe decisions — the reference's semantics with its async
        # tracking/mapping overlap.
        tracking_fps = bench_tracking_scan(emit=False)
        return bench_full_pipeline(window=0, async_mode=True,
                                   tracking_fps=tracking_fps)
    if bench_config == "perframe":
        # the synchronous per-frame schedule (round-3 default)
        return bench_full_pipeline(window=0)
    if bench_config == "pipeline":
        return bench_full_pipeline()
    if bench_config == "highdensity_pipeline":
        # BASELINE config 4 through the FULL pipeline (matcher/BA stress)
        return bench_full_pipeline(n_features=8000)
    if bench_config == "pipeline_window":
        return bench_full_pipeline(window=int(os.environ.get("BENCH_WINDOW", "8")))
    if bench_config == "pipeline_pipelined":
        return bench_full_pipeline(
            window=int(os.environ.get("BENCH_WINDOW", "8")), pipelined=True)
    return bench_tracking_scan(emit=True)


def bench_tracking_scan(emit: bool = True):
    import jax
    import jax.numpy as jnp

    from pyorbslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from pyorbslam_tpu.io.synthetic import generate_sequence
    from pyorbslam_tpu.slam.tracking import motion_track_step

    bench_config = os.environ.get("BENCH_CONFIG", "")
    high_density = bench_config == "highdensity"
    n_features = 8000 if high_density else 2000

    n_frames = int(os.environ.get("BENCH_FRAMES", "34"))
    width, height = 1241, 376
    cache = os.path.join(os.path.dirname(__file__), "tests", "_data")
    seq = generate_sequence(
        n_frames=n_frames, width=width, height=height, trajectory="straight",
        speed=0.8, seed=3, cache_dir=cache,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=float(seq.K[0, 0]), fy=float(seq.K[1, 1]),
            cx=float(seq.K[0, 2]), cy=float(seq.K[1, 2]),
            width=width, height=height, bf=seq.bf, th_depth=40.0,
        ),
        orb=OrbConfig(n_features=n_features),
    )

    import functools

    from pyorbslam_tpu.geometry import se3
    from pyorbslam_tpu.slam.frame import build_stereo_frame, unproject

    frames = [
        (jnp.asarray(seq.left[i]), jnp.asarray(seq.right[i]))
        for i in range(n_frames)
    ]
    eye = jnp.eye(4, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("c",))
    def fused_step(left, right, prev_frame, Tlw, Tllw, c):
        """ONE device dispatch per tracked frame: dual ORB extraction +
        stereo matching + VO queries from the previous frame + velocity
        prediction + projection matching + 4x10 LM pose optimization."""
        frame = build_stereo_frame(left, right, c)
        q_pos = unproject(prev_frame, c, se3.inverse(Tlw))
        vel = Tlw @ se3.inverse(Tllw)
        res = motion_track_step.__wrapped__(
            frame, q_pos, prev_frame.desc, prev_frame.angle,
            prev_frame.octave, prev_frame.depth > 0,
            vel @ Tlw, Tlw, c,
        )
        return frame, res.Tcw, res.n_inliers

    # warmup / compile: ONE compiled program total — the first frame's
    # "previous frame" is a zero dummy (its garbage tracking result is
    # discarded), avoiding a second jit just for bootstrap
    from pyorbslam_tpu.slam.frame import StereoFrame

    n_kp = cfg.orb.max_keypoints
    dummy = StereoFrame(
        xy=jnp.zeros((n_kp, 2)), response=jnp.zeros(n_kp),
        angle=jnp.zeros(n_kp), octave=jnp.zeros(n_kp, jnp.int32),
        desc=jnp.zeros((n_kp, 8), jnp.uint32),
        desc_bits=jnp.zeros((n_kp, 256), jnp.int8),
        valid=jnp.zeros(n_kp, bool),
        u_right=jnp.full(n_kp, -1.0), depth=jnp.full(n_kp, -1.0),
    )
    frame, _, n_in = fused_step(*frames[0], dummy, eye, eye, cfg)
    _ = int(np.asarray(n_in))
    frame, Tcw, n_in = fused_step(*frames[1], frame, eye, eye, cfg)
    _ = int(np.asarray(n_in))

    # ---- timed loop ----
    # two modes:
    #   scan (default): the whole sequence runs as ONE device program —
    #     jax.lax.scan carries (prev features, pose, prev pose) across
    #     frames, so the chip streams frame after frame with zero host
    #     involvement.  This is the TPU-native deployment shape (dispatch
    #     a window of frames, consume poses asynchronously) and measures
    #     the chip's actual tracking throughput.
    #   stream: one dispatch per frame (host pipelines dispatches, drains
    #     diagnostics at the end) — includes per-dispatch host overhead,
    #     which through a remote-tunnel device dominates at ~40 ms/frame.
    mode = os.environ.get("BENCH_MODE", "scan")
    if mode == "scan":
        seq_lr = jnp.stack(
            [jnp.stack([l, r]) for l, r in frames[2:]]
        )  # (N-2, 2, H, W)

        @functools.partial(jax.jit, static_argnames=("c",))
        def scan_track(seq_lr, frame0, Tlw0, Tllw0, c):
            def body(carry, lr):
                prev_frame, Tlw, Tllw = carry
                frame, Tcw, n_in = fused_step.__wrapped__(
                    lr[0], lr[1], prev_frame, Tlw, Tllw, c
                )
                return (frame, Tcw, Tlw), (Tcw, n_in)

            _, (poses, n_ins) = jax.lax.scan(
                body, (frame0, Tlw0, Tllw0), seq_lr
            )
            return poses, n_ins

        poses, n_ins = jax.block_until_ready(
            scan_track(seq_lr, frame, Tcw, eye, cfg))  # compile + warm run
        t0 = time.time()
        poses, n_ins = scan_track(seq_lr, frame, Tcw, eye, cfg)
        jax.block_until_ready(poses)
        dt = time.time() - t0
        n_tracked = seq_lr.shape[0]
        total_inliers = int(np.asarray(n_ins).sum())
    else:
        t0 = time.time()
        n_tracked = 0
        prev, Tlw, Tllw = frame, Tcw, eye
        inlier_handles = []
        for i in range(2, n_frames):
            frame, Tcw, n_in = fused_step(*frames[i], prev, Tlw, Tllw, cfg)
            inlier_handles.append(n_in)
            prev, Tllw, Tlw = frame, Tlw, Tcw
            n_tracked += 1
        jax.block_until_ready(Tcw)  # forces the whole dependency chain
        dt = time.time() - t0
        total_inliers = int(np.asarray(jnp.stack(inlier_handles)).sum())
    fps = n_tracked / dt

    if not emit:
        return fps

    baseline_path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline_fps = float(json.load(f)["reference_fps"])
        baseline_src = "measured"
    else:
        baseline_fps = 10.0  # upstream C++ ORB-SLAM2 real-time figure
        baseline_src = "upstream-cpp-estimate"

    print(json.dumps({
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "baseline_fps": baseline_fps,
        "baseline_source": baseline_src,
        "config": f"1241x376 stereo, {n_features} ORB features, 8 levels, motion tracking",
        "mode": mode,
        "n_frames": n_tracked,
        "device": str(jax.devices()[0]),
    }))
    return fps


def bench_full_pipeline(window: int = 0, pipelined: bool = False,
                        tracking_fps=None, n_features: int = 2000,
                        async_mode: bool = False):
    """Full-pipeline frames/s: tracking + local mapping + local BA +
    loop closing live (BASELINE config 2).  A first pass over the
    sequence populates every jit cache (the per-frame fused step,
    keyframe machinery, capacity buckets); the timed pass runs a fresh
    System so the number is steady-state throughput.

    window > 0 runs W frames per device dispatch (the TPU-native
    deployment shape; map updates at window granularity); pipelined=True
    additionally overlaps the chip's scan of window N+1 with the host's
    map maintenance for window N (System.window_feed/window_flush)."""
    import jax

    from pyorbslam_tpu.config import CameraConfig, OrbConfig, SlamConfig
    from pyorbslam_tpu.io.synthetic import generate_sequence
    from pyorbslam_tpu.slam.system import System

    n_frames = int(os.environ.get("BENCH_FRAMES", "66"))
    width, height = 1241, 376
    cache = os.path.join(os.path.dirname(__file__), "tests", "_data")
    seq = generate_sequence(
        n_frames=n_frames, width=width, height=height, trajectory="straight",
        speed=0.8, seed=3, cache_dir=cache,
    )
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=float(seq.K[0, 0]), fy=float(seq.K[1, 1]),
            cx=float(seq.K[0, 2]), cy=float(seq.K[1, 2]),
            width=width, height=height, bf=seq.bf, th_depth=40.0,
        ),
        orb=OrbConfig(n_features=n_features),
    )

    def run():
        sysm = System(cfg)
        n = n_frames - (n_frames % window if window else 0)
        if window and pipelined:
            for w0 in range(0, n, window):
                sysm.window_feed(
                    seq.left[w0: w0 + window], seq.right[w0: w0 + window],
                    seq.timestamps[w0: w0 + window])
            sysm.window_flush()
        elif window:
            for w0 in range(0, n, window):
                sysm.track_stereo_window(
                    seq.left[w0: w0 + window], seq.right[w0: w0 + window],
                    seq.timestamps[w0: w0 + window])
        elif async_mode:
            # double-buffered sensor upload: frame i+1's images are
            # enqueued while frame i is processed (a real system DMAs
            # the next camera frame during processing; the System API
            # accepts device arrays as-is)
            import jax.numpy as jnp

            nxt = (jnp.asarray(seq.left[0]), jnp.asarray(seq.right[0]))
            for i in range(n):
                cur = nxt
                if i + 1 < n:
                    nxt = (jnp.asarray(seq.left[i + 1]),
                           jnp.asarray(seq.right[i + 1]))
                sysm.track_stereo_async(cur[0], cur[1], seq.timestamps[i])
            sysm.flush_async()
        else:
            for i in range(n):
                sysm.track_stereo(seq.left[i], seq.right[i], seq.timestamps[i])
        assert len(sysm.trajectory) == n, (len(sysm.trajectory), n)
        return sysm

    from pyorbslam_tpu.utils.metrics import ate_rmse

    run()                       # compile/warm pass
    n_tracked = n_frames - (n_frames % window if window else 0)
    # the remote-tunnel device's throughput fluctuates run to run;
    # report the MEDIAN of three timed steady-state passes so the
    # recorded number is robust to a slow phase
    passes = []
    for _ in range(3):
        t0 = time.time()
        sysm = run()
        dt = time.time() - t0
        est = np.linalg.inv(sysm.corrected_trajectory())
        passes.append((n_tracked / dt,
                       float(ate_rmse(est, seq.poses_wc[: len(est)])),
                       sysm))
    passes.sort(key=lambda p: p[0])
    fps, ate, sysm = passes[1]
    fps_all = [round(p[0], 2) for p in passes]

    baseline_path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            bl = json.load(f)
        baseline_fps = float(bl["reference_fps"])
        baseline_src = ("measured-" + bl["scope"].split(" ")[0]
                        if "scope" in bl else "measured")
    else:
        baseline_fps = 10.0
        baseline_src = "upstream-cpp-estimate"

    mode = ("pipelined" if pipelined else "window") if window else \
        ("async" if async_mode else "per-frame")
    rec = {
        "metric": "full_pipeline_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "baseline_fps": baseline_fps,
        "baseline_source": baseline_src,
        "config": f"1241x376 stereo, {n_features} ORB features, 8 levels, "
                  "tracking + local mapping + local BA + loop closing"
                  + (f", window={window} ({mode})" if window
                     else f", {mode} schedule"),
        "n_frames": n_tracked,
        "n_keyframes": int(sysm.map.keyframes.n),
        "ate_rmse_m": round(ate, 4),
        "fps_passes": fps_all,
        "device": str(jax.devices()[0]),
    }
    if tracking_fps is not None:
        rec["tracking_only_fps"] = round(tracking_fps, 2)
    rec["stages_s"] = {
        k: [round(v, 3), sysm.time_counts[k]]
        for k, v in sorted(sysm.times.items(), key=lambda kv: -kv[1])
    }
    rec["ba_stages_s"] = {
        k: round(v, 3) for k, v in sorted(
            sysm.map.times.items(), key=lambda kv: -kv[1])
    }
    rec["ba_counters"] = dict(sysm.map.counters)
    from collections import Counter

    rec["schedule_events"] = dict(Counter(sysm.events))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
