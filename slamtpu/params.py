"""System configuration + mutable runtime state.

Mirrors reference src/params.jl:58-94 — the same knobs with the same defaults,
plus TPU-specific capacity knobs (static padded shapes for jit stability).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Params:
    # -- reference knobs (src/params.jl:58-77) -----------------------------
    stereo: bool = False
    max_nb_keypoints: int = 1000
    max_distance: int = 35            # grid cell size in pixels
    max_ktl_distance: float = 1.0     # forward-backward max distance
    pyramid_levels: int = 3           # + 1 base level
    pyramid_sigma: float = 1.0
    window_size: int = 9              # LK half-window
    initial_parallax: float = 20.0
    # Emergency keyframe floor: a KF fires (past the parallax gate) when
    # the frame's 3D-keypoint count falls below this (front_end.jl:372-374
    # hardcodes 20). Mono pose noise grows sharply below ~30 tracked 3D
    # points (PERF.md r5 mono drift decomposition: the per-step scale
    # spikes all land on frames with <35 P3P candidates), so the mono
    # pipeline may raise it; 20 keeps reference semantics.
    kf_emergency_3d: int = 20
    # Minimum rotation-compensated parallax (px) between the first-observer
    # keyframe and the current one for a temporal-DLT 2D->3D promotion.
    # The reference promotes EVERY low-parallax triangulation (its gates
    # at mapper.jl:244-260 only reject when parallax > 20), which on
    # low-motion mono sequences injects depth-biased points: with ~1 px
    # tracking noise, depth error ~ noise/parallax, and the skewed error
    # (1/disparity) inflates the map scale every keyframe (PERF.md r5 mono
    # drift decomposition: per-anchor-KF map scale 1.11 -> 2.12 over five
    # KFs). Points below the floor stay 2D and re-triangulate at a later
    # keyframe against the SAME first observer, i.e. with a strictly wider
    # baseline. 0.0 = reference semantics.
    min_triangulation_parallax: float = 0.0
    # Require every temporal-DLT promotion to pass the positive-depth and
    # <= max_reprojection_error checks. The reference ties those checks to
    # its REMOVAL decision (`cond && parallax > 20 && (remove; continue)`,
    # mapper.jl:244-260), so at parallax <= 20 a FAILING point falls
    # through and is promoted anyway — negative depths and 100+ px
    # residuals enter the map whenever parallax is low, which is exactly
    # when mono depth is least observable (PERF.md r5 mono decomposition:
    # per-anchor-KF map range ratio up to 5.9x, NN dist 441 on the city
    # scene). With this on, a failing low-parallax point stays 2D and
    # re-triangulates at a later keyframe with a wider baseline; failing
    # high-parallax points are still removed (reference semantics).
    # False = bit-exact reference fallthrough.
    strict_triangulation_gates: bool = True
    # Mono pose-step sanity gate: reject a P3P/PnP pose whose translation
    # step exceeds this ratio x the constant-velocity prediction, falling
    # back to the 5-pt essential pose (vision direction, motion-model
    # scale). Starved pre-keyframe frames (few, FOE-clustered 3D points)
    # otherwise produce low-residual poses sliding 10-30x the true step,
    # and the keyframe triangulated from that pose ratchets the map scale
    # every generation (PERF.md r5 mono decomposition). 0 disables
    # (reference semantics: no such gate, front_end.jl:168-218). Ignored
    # for stereo (depth-constrained PnP never starves this way).
    max_pose_step_ratio: float = 3.0
    max_reprojection_error: float = 3.0
    min_cov_score: int = 25
    do_local_matching: bool = False

    filtering_ratio: float = 0.9
    # The reference runs map filtering unconditionally from the estimator
    # (estimator.jl:104, 358-406); it only engages past keyframe id 20.
    map_filtering: bool = True

    do_local_bundle_adjustment: bool = True
    max_projection_distance: float = 2.0
    max_descriptor_distance: float = 0.35

    # -- TPU-native knobs ---------------------------------------------------
    # Static keypoint capacity per device batch (padded; jit-stable shapes).
    keypoint_capacity: int = 1024
    # LK solver iterations / thresholds (reference lucas_kanade.jl:1-7).
    lk_iterations: int = 30
    lk_eigenvalue_threshold: float = 1e-4
    lk_epsilon: float = 1e-2
    # Production early stop: end an LK level when at most this many points
    # are still iterating (the forward-backward check filters unconverged
    # stragglers). 0 = exact reference semantics (every point runs its full
    # iteration budget).
    lk_min_active: int = 16
    # Subpixel corner refinement: parabola-vertex fit on the raw
    # Shi-Tomasi response around each detected corner (TPU knob, beyond the
    # reference's integer ImageFeatures corners — extractor.jl:63-95).
    # Measured ATE-neutral-to-worse on the synthetic scenes (multi-seed
    # A/B): detection quantization is a ONE-TIME offset that LK then
    # tracks consistently — not per-frame noise — so refinement buys no
    # triangulation accuracy and can nudge corners onto less LK-stable
    # response ridges. Kept as an opt-in for real-imagery experiments.
    subpixel_detect: bool = False
    # Disparity-only (1D) LK for the rectified-stereo keyframe matcher: the
    # tracked row is discarded by the row correction (map_manager.jl:586-588)
    # either way; pinning flow_y = 0 halves the solver-loop work (TPU knob,
    # ops/lucas_kanade.py::_lk_level_lanes_1d).
    stereo_klt_1d: bool = False
    # RANSAC hypothesis counts (hypothesis-parallel; reference RecoverPose
    # uses sequential sampling — accuracy parity, not bitwise). 128 draws
    # on the post-fb-filtered correspondence sets (~90% inlier ratio) give
    # >1-1e-9 probability of an all-inlier 5-sample; measured ATE-neutral
    # vs 256 and ~5 ms less exec per frame.
    ransac_essential_hypotheses: int = 128
    ransac_pnp_hypotheses: int = 128
    # Bundle-adjustment iteration budget (reference bundle_adjustment.jl:39-54:
    # 5 LM iterations, outlier detection, then 10 more).
    ba_phase1_iterations: int = 5
    ba_phase2_iterations: int = 10
    # Covisibility window: number of newest keyframes optimized per local BA
    # (reference hardcodes 5, estimator.jl:328-331).
    ba_window: int = 5
    # Deterministic seed for RANSAC sampling.
    seed: int = 0
    # Keyframe decision: skip the median-parallax gate (cx) in stereo mode.
    # The reference leaves this as a TODO (front_end.jl:381 "TODO || stereo")
    # and ships the parallax gate; round-2 shipped the bypass, which let the
    # 3D-decay conditions fire a keyframe every other frame (31 KFs / 60
    # bench frames) and cost ATE. Default = reference behavior.
    kf_parallax_bypass_stereo: bool = False
    # Run the whole post-init per-frame step as one fused device program
    # (one round trip per frame) instead of separate kernel calls.
    fused_front_end: bool = True
    # Fused stereo keyframe step: matching + triangulation in one device
    # program; the 2 px epipolar gate, row correction, and all depth/
    # reprojection gates run on the host in f64, bit-matching the legacy
    # path's decisions. Multi-seed A/B (25-frame synthetic stereo, seeds
    # 7/8/9/11): legacy 0.0315/0.0450/0.0243/0.0290 vs fused
    # 0.0565/0.0470/0.0213/0.0296 m — accuracy-equivalent (the round-1
    # "fused drift" was chaotic divergence seeded by compile-context f32
    # noise, not a defect); saves a keyframe round trip + ~80 ms.
    fused_stereo: bool = True
    # Fused KEYFRAME program (pipelined mode, stereo, no descriptors):
    # detection + stereo matching + stereo/temporal DLT in ONE dispatch +
    # fetch (ops/keyframe_step.py) instead of three serialized round trips.
    # Host re-makes all accept/reject gates in f64 as with fused_stereo.
    fused_keyframe: bool = True
    # Async (carry-chained) keyframe: the keyframe program consumes and
    # emits the track_step carry (ops/keyframe_step.py::keyframe_step_carry)
    # so the next tracked frame dispatches device-side with NO host round
    # trip at keyframes — the keyframe's exec/fetch and the host's f64
    # gates run one frame behind (slam_manager._drain_pending_kf), with
    # stereo promotions predicted in f32 on device and reconciled by a
    # carry-merge correction. Requires pipelined + fused_keyframe + stereo.
    # Default on since round 3: measured 13.0 vs 11.1 FPS at equal-or-better
    # ATE (0.038 vs 0.055) on the 60-frame synthetic stereo bench.
    async_keyframe: bool = True
    # Speculate THROUGH keyframes: keep the in-flight speculated dispatches
    # at a keyframe instead of discard+replay, chain the keyframe program
    # off the keyframe frame's carry, and graft its new detections / 3D
    # promotions / prev-KF refs onto the speculated tip with a device-side
    # merge (ops/track_step.py::carry_adopt_kf). New detections are carried
    # to the tip frame by an in-adopt catch-up LK pass (keyframe pyramid ->
    # tip pyramid); failures drop from the current frame at drain time.
    # In-flight frames that were dispatched before the keyframe re-make
    # their keyframe decision from host f64 state (their device parallax is
    # measured against the OLD keyframe). The pipeline never drains at
    # keyframes — the reference's mapper thread overlaps the same way
    # (mapper.jl:37-140). Requires async_keyframe.
    # Measured (PERF.md round 4): ATE improves (0.0303 vs 0.0332, 11 vs 12
    # KFs) but FPS REGRESSES 19.6 -> 13.9 on the tunnel backend — the
    # single device stream executes the keyframe program BEHIND the
    # already-queued speculated track steps, so the keyframe drain syncs
    # on the whole chain (kf fetch 39 -> 135 ms steady). The default
    # predict-drain path schedules the keyframe program first, which is
    # optimal on a FIFO device queue; speculation would need a second
    # compute stream. Default off.
    speculate_keyframes: bool = False
    # Background-prefetch the per-frame track outputs at dispatch time.
    # MEASURED HARMFUL on the tunnel backend (PERF.md r5): a D2H issued
    # before the producing program completes holds the transport for the
    # residual exec time, serializing the uploader's H2D behind it
    # (18.7 -> 12.0 FPS, sm.upload_async 13 -> 38 ms steady). Default off;
    # revisit on a locally-attached backend with true async streams.
    track_prefetch: bool = False
    # Fetch frame N+1's track outputs in the same device_get RPC as frame
    # N's at apply time (device_get batches buffers into one round trip,
    # PERF.md r5 fetch probe). Subject to the same transport hazard as
    # track_prefetch: if frame N+1's program has not finished executing,
    # the batched fetch blocks the CRITICAL PATH for the residual exec
    # time. Interleaved in-process A/B (PERF.md r5): ON median 15.37 FPS
    # vs OFF 14.23 on the city bench — the batched RPC saving wins over
    # the occasional early-fetch wait, so ON is the default.
    pair_fetch: bool = True
    # How many frames' track outputs ride one fetch RPC when pair_fetch is
    # on (2 = the original pair fetch). The apply drain runs pre-dispatch,
    # so every in-flight program was dispatched >= 1 frame period ago and
    # deeper batching adds no exec wait at steady state; it does waste the
    # stashed results when a keyframe discards+replays the in-flight
    # window. Interleaved TPU A/B (PERF.md r5): 4 beat 2 in all three
    # pairs (+1.5 FPS mean, identical trajectories); 4 also equals the
    # speculative dispatch depth, so deeper cannot batch more.
    fetch_batch: int = 4
    # Defer the BA fetch/apply by one keyframe (the reference's estimator
    # worker lag, estimator.jl:79-110). Besides overlapping the BA device
    # time with tracking, this keeps `local_ba_on` True between keyframes —
    # which is what throttles the keyframe cadence in the reference
    # (check_new_kf_required consults it, front_end.jl:368,375,390). The
    # round-1 defer regression was the since-fixed garbage-points-in-early-
    # BA bug; measured now: 30-frame synthetic stereo ATE 0.088 m with 17
    # keyframes deferred vs 0.129 m with 27 keyframes synchronous.
    defer_ba: bool = True
    # Device dtype for uploaded camera images. float16 halves the largest
    # per-frame H2D transfer (~1.8 MB at KITTI size, ~20 ms of tunnel
    # latency); quantization (~1e-3 on [0, 1]) sits far below photometric
    # noise and every kernel upcasts to f32 before filtering.
    image_dtype: str = "float16"
    # Run mapper/estimator inline (lock-step) instead of worker threads.
    # The reference example drains all queues per frame anyway
    # (example/kitty/main.jl:46-54), so lock-step is the honest default.
    sequential: bool = True
    # Pipelined tracking: keep the keypoint/pose state device-resident
    # (ops/track_step.py) and dispatch frame N+1 before fetching frame N's
    # results — host bookkeeping applies one frame behind. Hides the
    # dispatch+fetch round trip (~26 ms RPC floor) plus the host
    # assemble/upload behind device exec. Keyframes/resets fall back to a
    # synchronous resync + replay of the speculated frames. Sequential
    # mode only.
    pipelined: bool = True
    # Max dispatched-but-unapplied frames. Depth overlaps the fetch RPC
    # of the oldest in-flight frame with the exec of the newer ones (the
    # async D2H copy has completed by fetch time). Measured on the tunnel
    # backend: depth 2 → 5.7 FPS, 3 → 5.9 (then 7.9 after the round-3
    # kernel work), 4 → 8.4, 5 → 7.9 (replay cost of keyframe
    # mispredictions overtakes the extra overlap). ATE/cadence identical
    # at 3/4/5. Streaming-latency note: between add_*_image calls up to
    # `pipeline_depth` frames (not depth-1: the drain runs pre-dispatch)
    # are in flight, so slam_io pose outputs lag mid-sequence by up to
    # that many frames; finish()/wait() flushes them all.
    pipeline_depth: int = 4

    # -- runtime state (src/params.jl:79-81) --------------------------------
    vision_initialized: bool = False
    reset_required: bool = False
    local_ba_on: bool = False

    def reset(self) -> None:
        """Reference params.jl:91-94."""
        self.vision_initialized = False
        self.reset_required = False
