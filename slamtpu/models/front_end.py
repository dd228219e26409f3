"""FrontEnd: per-frame tracking and pose estimation.

Port of reference src/front_end.jl behavior: pyramid preprocess ->
motion-model prediction -> KLT tracking -> (pre-init) parallax gate +
essential-matrix init / (post-init) epipolar outlier filter -> PnP RANSAC +
LM refinement -> motion-model update -> keyframe decision. All heavy math
runs as batched device kernels (slamtpu.ops); this module owns ordering and
thresholds.
"""
from __future__ import annotations

import logging
import os
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import hostmath as hm
from ..ops.image import build_lk_pyramid
from ..ops.lucas_kanade import lk_pad
from ..ops.mvg import essential_ransac
from ..ops.pnp import p3p_ransac, pnp_refine
from ..params import Params
from ..utils.padding import pad_rows, valid_mask
from ..utils.profiling import TIMERS
from .frame import Frame
from .map_manager import MapManager
from .motion_model import MotionModel

log = logging.getLogger("slamtpu.fe")


@dataclass
class InflightFrame:
    """One dispatched-but-not-applied tracked frame (pipelined mode)."""
    fid: int
    time: float
    image_dev: object
    right_dev: object
    per_kp: object        # device future (cap, 12)
    scalars: object       # device future (60,)
    carry_after: object   # device carry pytree after this step
    # Background D2H of (per_kp, scalars) issued at dispatch time
    # (utils/prefetch.py): on the tunnel backend copy_to_host_async is a
    # no-op, so without this every apply pays the result wait as a blocking
    # RPC (fe.pipe.fetch 15 ms/frame steady, BENCH r5 decomposition).
    prefetch: object = None
    # Host numpy (per_kp, scalars) stashed by a PAIR fetch: device_get
    # batches any number of buffers into one round trip (PERF.md r5 fetch
    # probe), so the apply of frame N fetches frame N+1's results in the
    # same RPC and stashes them here.
    fetched: object = None

    def fetch(self):
        """Host numpy (per_kp, scalars), via the prefetch when one ran."""
        if self.prefetch is not None:
            fetched, self.prefetch = self.prefetch.get(), None
            return fetched["per_kp"], fetched["scalars"]
        import jax

        return jax.device_get((self.per_kp, self.scalars))


class FrontEnd:
    def __init__(self, params: Params, frame: Frame,
                 map_manager: MapManager):
        self.params = params
        self.current_frame = frame
        self.map_manager = map_manager
        self.motion_model = MotionModel()
        self.current_pyramid = None
        self.previous_pyramid = None
        self.current_image_dev = None
        # Set after a global reset: the next frame re-bootstraps like frame 1
        # (the reference's reset path has no re-entry — front_end.jl:77 only
        # bootstraps on the literal first frame id — so a mid-run reset would
        # loop forever; this makes recovery actually work).
        self.needs_bootstrap = False
        self._intrinsics_np = np.asarray(
            frame.camera.intrinsics_array(), np.float32
        )
        self._distortion_np = np.asarray(
            frame.camera.distortion_array(), np.float32
        )
        self._intrinsics = jnp.asarray(self._intrinsics_np)
        self._distortion = jnp.asarray(self._distortion_np)
        self._pad = lk_pad(params.window_size)
        # -- pipelined (device-resident carry) state -----------------------
        self.inflight: deque = deque()
        self._carry = None
        self._slot_ids: list = []
        self._slot_has_mp = np.zeros(0, bool)
        self._last_dispatch_time = -1.0
        self._frame_reset_taken = False
        # Keyframe-cadence predictor (pipelined dispatch gating): id of the
        # last keyframe-decision frame and the last observed KF interval.
        self._last_kf_fid = 0
        self._last_kf_interval = 3
        # speculate_keyframes state: frames dispatched BEFORE a keyframe
        # landed (their device parallax is stale — decisions re-made on
        # host), and the newest fid dispatched at adopt time (a keyframe on
        # an older fid must fall back to discard+replay: its carry predates
        # the previous keyframe's detections).
        self._stale_kf_fids: set = set()
        self._adopt_tip_fid = -1
        self._n_kf_adopts = 0  # cumulative telemetry (never reset)
        # Diagnostic: cumulative keypoint-removal causes (bench prints it).
        self.removal_counts = {"track": 0, "ess": 0, "p3p": 0, "pnp": 0}
        # Per-gate candidate counts (same keys): removals / candidates is
        # the per-frame removal RATE the churn audit compares against the
        # reference's gates (VERDICT r5 item 2; PERF.md churn table).
        self.gate_candidates = {"track": 0, "ess": 0, "p3p": 0, "pnp": 0}
        # Diagnostic: per-frame (fid, pose_source, n_p3p_candidates,
        # n_inliers, n_pnp_outliers) — which stage last set this frame's
        # pose (mono drift decomposition, scripts/mono_drift.py).
        self.pose_trace: list = []

    # -- entry (front_end.jl:58-73) -----------------------------------------

    def track(self, image_dev, time: float, slam_io=None) -> bool:
        with self.map_manager.map_lock:
            if self.params.fused_front_end:
                is_kf_required = self.track_mono_fused(
                    image_dev, time, slam_io
                )
            else:
                is_kf_required = self.track_mono(image_dev, time, slam_io)
            if is_kf_required:
                self.map_manager.create_keyframe(image_dev)
        return is_kf_required

    def track_mono(self, image_dev, time: float, slam_io=None) -> bool:
        """front_end.jl:75-118."""
        with TIMERS.stage("fe.preprocess"):
            self.preprocess(image_dev)
        if self.current_frame.id == 1 or self.needs_bootstrap:
            self.needs_bootstrap = False
            # Record the origin pose (the reference only records from frame 2
            # onward; keeping frame 1 makes the saved trajectory complete).
            self.current_frame.set_wc(self.current_frame.wc, slam_io)
            return True

        new_pose = self.motion_model.predict(self.current_frame.wc, time)
        self.current_frame.set_wc(new_pose, slam_io)

        if self.previous_pyramid is None:
            return False  # first frame after checkpoint resume

        with TIMERS.stage("fe.klt"):
            self.klt_tracking()

        if not self.params.vision_initialized:
            if self.current_frame.nb_keypoints < 50:
                log.warning("[FE] NB KP < 50. Reset required.")
                self.params.reset_required = True
                return False
            if self.params.stereo and self.current_frame.nb_3d_kpts >= 30:
                # Stereo fast-init: stereo triangulation at keyframe 0 already
                # produced metric 3D points, so the mono parallax gate
                # (reference front_end.jl:92, "TODO option for stereo") is
                # unnecessary — start P3P tracking immediately.
                log.debug("[FE] Stereo fast initialization.")
                self.params.vision_initialized = True
                # fall through to the tracking path below
            elif self.check_ready_for_init(slam_io):
                log.debug("[FE] System ready for initialization.")
                self.params.vision_initialized = True
                return True
            else:
                return False

        # Epipolar filtering; fallback pose if P3P fails (front_end.jl:104-109).
        with TIMERS.stage("fe.5pt"):
            pose_5pt = self.compute_pose_5pt(
                min_parallax=5.0, use_motion_model=True
            )
        if self.map_manager.nb_keyframes > 2 and pose_5pt is not None:
            self.current_frame.set_cw(pose_5pt, slam_io)

        with TIMERS.stage("fe.pose"):
            self.compute_pose(slam_io)

        self.motion_model.update(self.current_frame.wc, time)
        return self.check_new_kf_required()

    # ------------------------------------------------------------------
    # Fused tracking path: the whole post-init per-frame step runs as ONE
    # device program + ONE fetch (slamtpu.ops.frontend_step).
    # ------------------------------------------------------------------

    def track_mono_fused(self, image_dev, time: float, slam_io=None) -> bool:
        frame = self.current_frame

        # Decide whether this frame runs the fused single-program path (one
        # dispatch incl. the pyramid build) or the legacy split path.
        fused_ready = (
            self.params.vision_initialized
            and self.current_pyramid is not None
            and frame.id != 1
            and not self.needs_bootstrap
            and self.map_manager.frames_map.get(frame.kfid) is not None
        )

        if not fused_ready:
            with TIMERS.stage("fe.preprocess"):
                self.preprocess(image_dev)
            if frame.id == 1 or self.needs_bootstrap:
                self.needs_bootstrap = False
                frame.set_wc(frame.wc, slam_io)
                return True

            new_pose = self.motion_model.predict(frame.wc, time)
            frame.set_wc(new_pose, slam_io)

            if self.previous_pyramid is None:
                # First frame after a checkpoint resume: no previous pyramid
                # to track against; tracking restarts next frame.
                return False

            if not self.params.vision_initialized:
                # Pre-init: unfused KLT + init logic (rare frames).
                with TIMERS.stage("fe.klt"):
                    self.klt_tracking()
                if frame.nb_keypoints < 50:
                    log.warning("[FE] NB KP < 50. Reset required.")
                    self.params.reset_required = True
                    return False
                if self.params.stereo and frame.nb_3d_kpts >= 30:
                    log.debug("[FE] Stereo fast initialization.")
                    self.params.vision_initialized = True
                    return True  # becomes a keyframe; tracking resumes fused
                if self.check_ready_for_init(slam_io):
                    log.debug("[FE] System ready for initialization.")
                    self.params.vision_initialized = True
                    return True
                return False
            # vision initialized but no previous keyframe: nothing to do.
            return False

        prev_kf = self.map_manager.frames_map[frame.kfid]
        new_pose = self.motion_model.predict(frame.wc, time)
        frame.set_wc(new_pose, slam_io)

        with TIMERS.stage("fe.fused"):
            res, ids, attempted, has_mp = self._dispatch_fused(
                image_dev, frame, prev_kf
            )
        with TIMERS.stage("fe.apply"):
            kf_required = self._apply_fused(
                res, ids, attempted, has_mp, frame, prev_kf, time, slam_io,
            )
        return kf_required

    def _dispatch_fused(self, image_dev, frame: Frame, prev_kf: Frame):
        from ..ops.frontend_step import (
            FL_HAS_MP,
            FL_PRIOR,
            FL_VALID,
            PK_DISP,
            PK_MP,
            PK_PREV_BEAR,
            PK_PREV_UND,
            PK_PX,
            frontend_step_v2,
        )

        _t_assemble = TIMERS.stage("fe.fused.assemble")
        _t_assemble.__enter__()
        p = self.params
        cap = p.keypoint_capacity
        mm = self.map_manager
        scale3d = 0.5  # 1 / 2^pyramid_levels_3d (map_manager.jl:458,466)

        # One (cap + 3, 13) f32 upload: kp rows | flags col | join col |
        # 3 misc rows (each H2D transfer costs ~4-10 ms of tunnel latency).
        state = np.zeros((cap + 3, 13), np.float32)
        state[:cap, 12] = -1.0  # join col: invalid

        # Pass 1: drop 3D keypoints whose map point vanished (rare), then
        # vectorize the prior projection over all remaining 3D keypoints.
        kps = []
        for kp in frame.keypoints.values():
            if kp.is_3d and kp.id not in mm.map_points:
                mm.remove_mappoint_obs(kp.id, frame.kfid)
                continue
            kps.append(kp)
        if len(kps) > cap:
            # Over-capacity keypoints stay untracked this frame (their
            # observations are preserved; extraction keeps nb_keypoints
            # near the budget, so this is a pathological-config guard).
            log.warning("[FE] keypoints exceed capacity %d.", cap)
            kps = kps[:cap]
        n = len(kps)
        ids = [kp.id for kp in kps]
        is3d = np.fromiter((kp.is_3d for kp in kps), bool, n)
        px = (
            np.stack([kp.pixel for kp in kps])
            if n else np.zeros((0, 2))
        )
        mp_pos = np.zeros((n, 3))
        idx3d = np.nonzero(is3d)[0]
        if len(idx3d):
            mp_pos[idx3d] = [
                mm.map_points[kps[j].id].get_position() for j in idx3d
            ]
            proj = frame.project_world_to_image_distort_batch(
                mp_pos[idx3d]
            )
            inb = frame.in_image_batch(proj)
        else:
            proj = np.zeros((0, 2))
            inb = np.zeros((0,), bool)

        flags = np.where(is3d, 0, FL_VALID).astype(np.int32)
        flags[idx3d] |= FL_HAS_MP
        flags[idx3d[inb]] |= FL_VALID | FL_PRIOR
        attempted = (flags & FL_VALID) > 0
        has_mp = is3d
        state[:n, PK_PX] = px
        state[idx3d[inb], PK_DISP] = scale3d * (proj[inb] - px[idx3d[inb]])
        state[:n, PK_MP] = mp_pos
        state[:n, 11] = flags

        id_to_slot = {kpid: j for j, kpid in enumerate(ids)}
        m = 0
        for kpid, pkp in prev_kf.keypoints.items():
            slot = id_to_slot.get(kpid)
            if slot is None or not attempted[slot]:
                continue
            if m >= cap:
                break
            state[m, 12] = slot
            state[m, PK_PREV_UND] = pkp.undistorted_pixel[::-1]
            state[m, PK_PREV_BEAR] = pkp.position[:2]
            m += 1

        R_comp = (prev_kf.get_Rcw() @ frame.get_Rwc()).astype(np.float32)
        theta_pred = hm.pose_to_theta(frame.cw).astype(np.float32)
        misc = np.concatenate([
            R_comp.reshape(9),
            theta_pred,
            self._intrinsics_np,
            self._distortion_np,
        ]).astype(np.float32)
        state[cap:, :].reshape(39)[:23] = misc

        _t_assemble.__exit__(None, None, None)
        with TIMERS.stage("fe.fused.dispatch"):
            per_kp, scalars, pyr_cur = frontend_step_v2(
                image_dev, self.current_pyramid,
                jnp.asarray(state),
                self._ransac_key(2),
                levels=p.pyramid_levels, window=p.window_size,
                iters=p.lk_iterations, eps=p.lk_epsilon,
                eig_thresh=p.lk_eigenvalue_threshold, pad=self._pad,
                max_fb_distance=p.max_ktl_distance,
                essential_hypotheses=p.ransac_essential_hypotheses,
                pnp_hypotheses=p.ransac_pnp_hypotheses,
                threshold=p.max_reprojection_error,
                min_active=p.lk_min_active,
                sigma=p.pyramid_sigma,
            )
        # Rotate the device-resident pyramid double buffer (the current
        # frame's pyramid never leaves the device).
        self.previous_pyramid = self.current_pyramid
        self.current_pyramid = pyr_cur
        self.current_image_dev = image_dev
        with TIMERS.stage("fe.fused.fetch"):
            res = jax.device_get((per_kp, scalars))
        return res, ids, attempted, has_mp

    def _apply_fused(self, res, ids, attempted, has_mp,
                     frame: Frame, prev_kf: Frame, time: float,
                     slam_io=None, stale_parallax: bool = False) -> bool:
        per_kp, scalars = res
        mm = self.map_manager
        n = len(ids)
        rc = self.removal_counts
        pose_source = "mm"
        # Motion-model prediction (set by the caller just before this
        # apply) — kept for the mono pose-step sanity gate below.
        pred_wc = np.asarray(frame.wc, np.float64).copy()
        pose_5pt = None

        # 1. KLT keypoint updates/removals (map_manager.jl:524-562).
        ok = per_kp[:n, 7] > 0
        rc["track"] += int(np.sum(np.asarray(attempted) & ~ok))
        self.gate_candidates["track"] += int(np.sum(np.asarray(attempted)))
        new_px = per_kp[:n, 0:2]
        und_px = per_kp[:n, 2:4]
        bearings = per_kp[:n, 4:7]
        upd = [
            i for i, kpid in enumerate(ids)
            if kpid is not None and attempted[i] and ok[i]
        ]
        if upd:
            frame.update_keypoints_precomputed_batch(
                [ids[i] for i in upd], new_px[upd], und_px[upd],
                bearings[upd],
            )
        for i, kpid in enumerate(ids):
            if kpid is None or not attempted[i] or ok[i]:
                continue
            mm.remove_obs_from_current_frame(kpid)
            ids[i] = None

        # 2. Essential epipolar outlier removal + 5pt fallback pose
        #    (front_end.jl:102-109,315-330).
        ess_gate = scalars[41] > 0
        ess_out = per_kp[:n, 8] > 0
        if ess_gate:
            n_ess_out = int(np.sum(ess_out))
            rc["ess"] += n_ess_out
            # candidates = inliers (scalar 42) + removed outliers
            self.gate_candidates["ess"] += int(scalars[42]) + n_ess_out
            for i, kpid in enumerate(ids):
                if kpid is not None and ess_out[i]:
                    mm.remove_obs_from_current_frame(kpid)
                    ids[i] = None
            P = np.asarray(scalars[0:16], np.float64).reshape(4, 4)
            prev_cw = prev_kf.cw
            current = prev_cw @ frame.wc
            scale = float(np.linalg.norm(current[:3, 3]))
            R, t = P[:3, :3], P[:3, 3]
            norm_t = float(np.linalg.norm(t))
            if norm_t > 1e-12:
                t = scale * t / norm_t
            pose_5pt = hm.rt_to_4x4(R, t) @ prev_cw
            # A stale frame's device (R, t) was estimated against the OLD
            # keyframe; after a speculative adopt, prev_kf here is the NEW
            # one — composing them would mix reference frames. Skip the
            # fallback pose; the motion-model prediction (or the P3P result
            # below, whose scalars carry a full world pose) stands instead.
            if mm.nb_keyframes > 2 and not stale_parallax:
                frame.set_cw(pose_5pt, slam_io)
                pose_source = "5pt"

        # 3. P3P + PnP refinement application (front_end.jl:168-218).
        n_p3p = int(scalars[43])
        if n_p3p < 5:
            log.warning("[FE] Not enough 3D keypoints to compute P3P %d.",
                        n_p3p)
        elif int(scalars[44]) < 5:
            log.warning("[FE] P3P too few inliers - resetting!")
            pose_source = "reset"
            self.reset_frame()
        else:
            p3p_in = per_kp[:n, 9] > 0
            # The kernel's P3P candidate set: tracked 3D points that are not
            # epipolar outliers (mirrors front_end.jl:144-155,184-185).
            has_mp_ok = (
                ok & np.asarray(has_mp, bool) & ~(ess_out & bool(ess_gate))
            )
            self.gate_candidates["p3p"] += int(np.sum(has_mp_ok))
            rc["p3p"] += int(np.sum(has_mp_ok & ~p3p_in))
            for i, kpid in enumerate(ids):
                if kpid is not None and has_mp_ok[i] and not p3p_in[i]:
                    mm.remove_obs_from_current_frame(kpid)
                    ids[i] = None

            frame.set_cw(
                np.asarray(scalars[16:32], np.float64).reshape(4, 4),
                slam_io,
            )
            pose_source = "p3p"

            n_inl = int(scalars[44])
            n_out = int(scalars[47])
            if n_inl - n_out < 5 or float(scalars[46]) > float(scalars[45]):
                log.warning("[FE] P3P BA too few inliers - resetting!")
                pose_source = "reset"
                self.reset_frame()
            else:
                pnp_out = per_kp[:n, 10] > 0
                self.gate_candidates["pnp"] += int(np.sum(has_mp_ok & p3p_in))
                rc["pnp"] += int(np.sum(has_mp_ok & p3p_in & pnp_out))
                for i, kpid in enumerate(ids):
                    if (kpid is not None and has_mp_ok[i] and p3p_in[i]
                            and pnp_out[i]):
                        mm.remove_obs_from_current_frame(kpid)
                        ids[i] = None
                frame.set_cw(
                    hm.theta_to_pose(
                        np.asarray(scalars[32:38], np.float64)
                    ),
                    slam_io,
                )
                pose_source = "pnp"

        # Mono pose-step sanity gate (TPU-repo addition, params.py
        # max_pose_step_ratio). Starved map geometry (few, FOE-clustered
        # 3D points in the frames before a keyframe) lets P3P/PnP converge
        # to a low-residual pose that slides 10-30x the true step along
        # the optical axis; a keyframe then triangulates with that
        # baseline and the next segment's PnP locks to the inflated map —
        # a per-keyframe scale ratchet (PERF.md r5 mono decomposition:
        # est/gt step ratio spikes exactly one frame before each KF).
        # When the PnP step exceeds ratio x the constant-velocity
        # prediction, fall back to the 5-pt essential pose (vision-based
        # direction, motion-model scale — front_end.jl:321-330), or the
        # prediction itself when no essential pose fired. Mono only:
        # stereo PnP scale is depth-constrained and never starves this way.
        ratio_gate = self.params.max_pose_step_ratio
        if (ratio_gate > 0 and not self.params.stereo
                and pose_source in ("p3p", "pnp")
                and self.motion_model.prev_time >= 0):
            prev_t = np.asarray(self.motion_model.prev_wc, np.float64)[:3, 3]
            pred_step = float(np.linalg.norm(pred_wc[:3, 3] - prev_t))
            est_step = float(
                np.linalg.norm(np.asarray(frame.wc, np.float64)[:3, 3]
                               - prev_t)
            )
            import os as _os
            if _os.environ.get("SLAMTPU_DEBUG_POSE_GATE"):
                print(f"POSE_GATE f{frame.id} pred_step={pred_step:.4f} "
                      f"est_step={est_step:.4f} src={pose_source}",
                      flush=True)
            if pred_step > 1e-4 and est_step > ratio_gate * pred_step:
                if pose_5pt is not None and mm.nb_keyframes > 2 \
                        and not stale_parallax:
                    frame.set_cw(pose_5pt, slam_io)
                    pose_source = "5pt_gate"
                else:
                    frame.set_wc(pred_wc, slam_io)
                    pose_source = "mm_gate"

        self.pose_trace.append(
            (frame.id, pose_source, int(scalars[43]), int(scalars[44]),
             int(scalars[47]), float(scalars[45]), float(scalars[46]))
        )
        # 4. Motion model + keyframe decision (front_end.jl:116-117).
        self.motion_model.update(frame.wc, time)
        # A frame dispatched BEFORE a keyframe landed measured its device
        # parallax against the OLD keyframe (speculate_keyframes): re-make
        # the decision from host f64 state against the current keyframe.
        return self.check_new_kf_required(
            median_parallax=None if stale_parallax else float(scalars[38])
        )

    # ------------------------------------------------------------------
    # Pipelined mode: device-resident carry (ops/track_step.py). The host
    # dispatches frame N+1 off frame N's device-resident outputs BEFORE
    # fetching frame N's results; bookkeeping applies one frame behind.
    # Keyframes / resets invalidate the speculated dispatches: the carry is
    # rebuilt from host state and the speculated frames replay.
    # ------------------------------------------------------------------

    @property
    def pipeline_active(self) -> bool:
        return self._carry is not None

    def can_start_pipeline(self) -> bool:
        """Same readiness conditions as the fused path (track_mono_fused)."""
        return (
            self.params.vision_initialized
            and self.current_pyramid is not None
            and not self.needs_bootstrap
            and self.map_manager.frames_map.get(self.current_frame.kfid)
            is not None
        )

    def start_pipeline(self):
        """(Re)build the device carry from authoritative host state.

        Runs at pipeline entry and after every keyframe / frame reset —
        the only points where the keypoint set, map-point positions, or the
        previous-keyframe join set change (create_keyframe, BA flush,
        map filtering all run at keyframes in sequential mode).
        """
        from ..ops import track_step as ts

        _t = TIMERS.stage("fe.resync")
        _t.__enter__()
        frame = self.current_frame
        mm = self.map_manager
        p = self.params
        cap = p.keypoint_capacity
        prev_kf = mm.frames_map[frame.kfid]

        kp = np.zeros((cap, 10), np.float32)
        ids: list = []
        has_mp_list: list = []
        for kpo in list(frame.keypoints.values()):
            if kpo.is_3d and kpo.id not in mm.map_points:
                mm.remove_mappoint_obs(kpo.id, frame.kfid)
                continue
            if len(ids) >= cap:
                log.warning("[FE] keypoints exceed capacity %d.", cap)
                break
            j = len(ids)
            flags = ts.FL_VALID
            kp[j, ts.TK_PX] = kpo.pixel
            if kpo.is_3d:
                flags |= ts.FL_HAS_MP
                kp[j, ts.TK_MP] = mm.map_points[kpo.id].get_position()
            pkp = prev_kf.keypoints.get(kpo.id)
            if pkp is not None:
                flags |= ts.FL_JOIN
                kp[j, ts.TK_PREV_UND] = pkp.undistorted_pixel[::-1]
                kp[j, ts.TK_PREV_BEAR] = pkp.position[:2]
            kp[j, ts.TK_FLAGS] = flags
            ids.append(kpo.id)
            has_mp_list.append(kpo.is_3d)

        misc = np.zeros(48, np.float32)
        misc[ts.MS_PREV_KF_CW] = prev_kf.cw.reshape(16)
        misc[ts.MS_WC] = frame.wc.reshape(16)
        misc[ts.MS_VEL] = self.motion_model.log_rel_t
        misc[ts.MS_APPLY_5PT] = 1.0 if mm.nb_keyframes > 2 else 0.0
        misc[ts.MS_HAS_PREV] = (
            1.0 if self.motion_model.prev_time >= 0 else 0.0
        )
        misc[ts.MS_INTRINSICS] = self._intrinsics_np
        misc[ts.MS_DISTORTION] = self._distortion_np

        self._carry = {
            "pyr": self.current_pyramid,
            "kp": jnp.asarray(kp),
            "misc": jnp.asarray(misc),
        }
        self._slot_ids = ids
        self._slot_has_mp = np.asarray(has_mp_list, bool)
        self._last_dispatch_time = self.motion_model.prev_time
        self._last_kf_fid = prev_kf.id
        _t.__exit__(None, None, None)

    def pipeline_dispatch(self, fid: int, image_dev, right_dev,
                          time: float):
        from ..ops.track_step import track_step

        p = self.params
        dt = (
            0.0 if self._last_dispatch_time < 0
            else time - self._last_dispatch_time
        )
        self._last_dispatch_time = time
        with TIMERS.stage("fe.pipe.dispatch"):
            new_carry, per_kp, scalars = track_step(
                self._carry, image_dev, np.float32(dt),
                self._ransac_key(2, fid),
                levels=p.pyramid_levels, window=p.window_size,
                iters=p.lk_iterations, eps=p.lk_epsilon,
                eig_thresh=p.lk_eigenvalue_threshold, pad=self._pad,
                max_fb_distance=p.max_ktl_distance,
                essential_hypotheses=p.ransac_essential_hypotheses,
                pnp_hypotheses=p.ransac_pnp_hypotheses,
                threshold=p.max_reprojection_error,
                min_active=p.lk_min_active, sigma=p.pyramid_sigma,
                height=self.current_frame.camera.height,
                width=self.current_frame.camera.width,
            )
        self._carry = new_carry
        rec = InflightFrame(fid, time, image_dev, right_dev,
                            per_kp, scalars, new_carry)
        self.inflight.append(rec)
        # Optional early D2H from the background fetcher. MEASURED HARMFUL
        # on the tunnel backend (PERF.md r5): a D2H issued before the
        # producing program completes HOLDS the transport for the residual
        # exec time, serializing the uploader's H2D behind it (bench
        # 18.7 -> 12.0 FPS, sm.upload_async 13 -> 38 ms). Default off;
        # revisit on a locally-attached backend with real async streams.
        if p.track_prefetch and not os.environ.get("SLAMTPU_NO_PREFETCH"):
            from ..utils.prefetch import DevicePrefetch

            rec.prefetch = DevicePrefetch(
                {"per_kp": per_kp, "scalars": scalars}
            )
        elif os.environ.get("SLAMTPU_C2HA"):
            # A/B knob: the pre-r5 best-effort dispatch-time D2H hint
            # (jax copy_to_host_async; documented as possibly a no-op on
            # the tunnel backend — adjudicated by interleaved bench).
            for buf in (per_kp, scalars):
                try:
                    buf.copy_to_host_async()
                except Exception:
                    pass
        return rec

    def pipeline_apply(self, rec: InflightFrame, per_kp, scalars,
                       slam_io=None) -> bool:
        """Host bookkeeping for an applied frame — identical semantics to
        track_mono_fused (predict + _apply_fused), one frame behind the
        dispatch. Returns the keyframe decision."""
        frame = self.current_frame
        prev_kf = self.map_manager.frames_map[frame.kfid]
        self._frame_reset_taken = False
        new_pose = self.motion_model.predict(frame.wc, rec.time)
        frame.set_wc(new_pose, slam_io)
        n = len(self._slot_ids)
        attempted = per_kp[:n, 11] > 0
        # The 3D mask the DEVICE used for this frame (per_kp col 12): with
        # the async keyframe path the host's view can lag the device's
        # (predicted stereo promotions land before the host's f64 gates
        # run; temporal promotions land after, via carry_merge) — the
        # removal bookkeeping must follow the device's P3P/PnP membership.
        has_mp = per_kp[:n, 12] > 0
        stale = rec.fid in self._stale_kf_fids
        self._stale_kf_fids.discard(rec.fid)
        with TIMERS.stage("fe.pipe.apply"):
            return self._apply_fused(
                (per_kp, scalars), self._slot_ids, attempted,
                has_mp, frame, prev_kf, rec.time, slam_io,
                stale_parallax=stale,
            )

    @property
    def frame_reset_taken(self) -> bool:
        return self._frame_reset_taken

    def predict_kf(self, fid: int) -> bool:
        """Will frame `fid` likely be a keyframe? Used to gate speculative
        dispatch: applying a predicted-KF frame BEFORE dispatching the next
        one avoids discarding + replaying that dispatch (the steady bench
        cadence makes this ~80% predictable). Wrong predictions only cost
        one synchronous frame (~a fetch RPC), not correctness."""
        return fid - self._last_kf_fid >= max(2, self._last_kf_interval)

    def note_kf(self, fid: int):
        self._last_kf_interval = max(1, fid - self._last_kf_fid)
        self._last_kf_fid = fid

    def pipeline_discard(self):
        """Drop speculated dispatches (their carry is stale after a
        keyframe/reset); return their inputs for replay post-resync."""
        replay = [
            (r.fid, r.time, r.image_dev, r.right_dev) for r in self.inflight
        ]
        for r in self.inflight:
            if r.prefetch is not None:
                # Free the shared fetcher worker for the keyframe prefetch —
                # these results are about to be recomputed by the replay.
                r.prefetch.cancel()
        self.inflight.clear()
        self._carry = None
        self._stale_kf_fids = set()
        # The replayed dispatches will run against a freshly resynced carry
        # (start_pipeline), so they no longer predate the last adopt.
        self._adopt_tip_fid = -1
        return replay

    def adopt_keyframe_carry(self, kf_carry, pre_carry):
        """Graft an async keyframe program's output onto the speculated tip
        (speculate_keyframes): new detections (caught up to the tip frame
        by an in-adopt LK pass), 3D promotions and the new prev-KF refs
        enter the chain device-side; the in-flight dispatches stay. Their
        keyframe decisions are re-made on host (stale device parallax).
        Returns the device catch-up mask (per-slot bool; failures must be
        removed from the host's current frame at drain time), or None if
        there is no live carry to adopt into."""
        from ..ops.track_step import carry_adopt_kf

        if self._carry is None:
            return None
        p = self.params
        self._carry, caught = carry_adopt_kf(
            self._carry, kf_carry, pre_carry["kp"],
            levels=p.pyramid_levels, window=p.window_size,
            iters=p.lk_iterations, eps=p.lk_epsilon,
            eig_thresh=p.lk_eigenvalue_threshold, pad=self._pad,
        )
        self._stale_kf_fids = {r.fid for r in self.inflight}
        self._adopt_tip_fid = (
            self.inflight[-1].fid if self.inflight else -1
        )
        self._n_kf_adopts += 1
        return caught

    def pipeline_stop(self):
        for r in self.inflight:
            if r.prefetch is not None:
                r.prefetch.cancel()
        self.inflight.clear()
        self._carry = None
        self._slot_ids = []
        self._slot_has_mp = np.zeros(0, bool)
        self._last_dispatch_time = -1.0
        self._stale_kf_fids = set()
        self._adopt_tip_fid = -1

    def adopt_pyramid(self, rec: InflightFrame):
        """Make the applied frame's device pyramid current (keyframe
        extraction/stereo and the next resync read it)."""
        self.current_pyramid = rec.carry_after["pyr"]
        self.previous_pyramid = None

    def push_correction(self):
        """Reconcile the device carry with authoritative host state after
        an async keyframe's host apply (ops/track_step.py::carry_merge) —
        temporal-DLT promotions, f32/f64 stereo-gate edge flips, map-point
        culls, and BA position updates all land here, WITHOUT discarding
        the in-flight speculated dispatches. Device-owned state (pixels,
        pose recurrence, tracking removals) is kept."""
        from ..ops import track_step as ts

        if self._carry is None:
            return
        _t = TIMERS.stage("fe.correction")
        _t.__enter__()
        frame = self.current_frame
        mm = self.map_manager
        cap = self.params.keypoint_capacity
        prev_kf = mm.frames_map[frame.kfid]

        # Collect rows, then write each column family in one bulk
        # assignment — the per-row setitem twin cost ~6-10 ms of the
        # keyframe's host budget at ~900 live slots.
        rows_mp, mp_pos = [], []
        rows_join, join_und, join_bear = [], [], []
        rows_live, flag_vals = [], []
        kps_get = frame.keypoints.get
        mps_get = mm.map_points.get
        pkf_get = prev_kf.keypoints.get
        for j, kpid in enumerate(self._slot_ids):
            if kpid is None:
                continue
            kpo = kps_get(kpid)
            if kpo is None:
                self._slot_ids[j] = None
                continue
            flags = ts.FL_VALID
            if kpo.is_3d:
                mp = mps_get(kpid)
                if mp is not None:
                    flags |= ts.FL_HAS_MP
                    rows_mp.append(j)
                    mp_pos.append(mp.position)
            pkp = pkf_get(kpid)
            if pkp is not None:
                flags |= ts.FL_JOIN
                rows_join.append(j)
                join_und.append(pkp.undistorted_pixel)
                join_bear.append(pkp.position)
            rows_live.append(j)
            flag_vals.append(flags)
        kp = np.zeros((cap, 10), np.float32)
        has_mp_list = np.zeros(cap, bool)
        if rows_live:
            kp[np.asarray(rows_live), ts.TK_FLAGS] = flag_vals
        if rows_mp:
            rows_mp = np.asarray(rows_mp)
            kp[rows_mp, ts.TK_MP] = np.asarray(mp_pos, np.float32)
            has_mp_list[rows_mp] = True
        if rows_join:
            rows_join = np.asarray(rows_join)
            kp[rows_join, ts.TK_PREV_UND] = np.asarray(
                join_und, np.float32)[:, ::-1]
            kp[rows_join, ts.TK_PREV_BEAR] = np.asarray(
                join_bear, np.float32)[:, :2]
        self._slot_has_mp = has_mp_list[:len(self._slot_ids)]

        misc = np.zeros(17, np.float32)
        misc[:16] = prev_kf.cw.reshape(16)
        misc[16] = 1.0 if mm.nb_keyframes > 2 else 0.0
        self._carry = ts.carry_merge(
            self._carry, jnp.asarray(kp), jnp.asarray(misc)
        )
        _t.__exit__(None, None, None)

    # -- P3P + refinement (front_end.jl:132-219) ----------------------------

    def compute_pose(self, slam_io=None) -> bool:
        frame = self.current_frame
        if frame.nb_3d_kpts < 5:
            log.warning(
                "[FE] Not enough 3D keypoints to compute P3P %d.",
                frame.nb_3d_kpts,
            )
            return False

        ids, pts3d, px_xy, bearings = [], [], [], []
        for kp in frame.keypoints.values():
            if not kp.is_3d:
                continue
            mp = self.map_manager.map_points.get(kp.id)
            if mp is None:
                continue
            ids.append(kp.id)
            pts3d.append(mp.get_position())
            px_xy.append(kp.undistorted_pixel[::-1])
            pos = kp.position
            bearings.append(pos / np.linalg.norm(pos))
        n = len(ids)
        if n < 5:
            return False

        cap = self.params.keypoint_capacity
        res = p3p_ransac(
            jnp.asarray(pad_rows(pts3d, cap, np.float32)),
            jnp.asarray(pad_rows(px_xy, cap, np.float32)),
            jnp.asarray(pad_rows(bearings, cap, np.float32)),
            jnp.asarray(valid_mask(n, cap)),
            jnp.int32(n),
            self._intrinsics,
            self._ransac_key(1),
            hypotheses=self.params.ransac_pnp_hypotheses,
            threshold=self.params.max_reprojection_error,
        )
        res = jax.device_get(res)  # one batched fetch over the tunnel
        n_inliers = int(res["n_inliers"])
        if n_inliers < 5:
            log.warning("[FE] P3P too few inliers - resetting!")
            self.reset_frame()
            return False

        inliers = np.asarray(res["inliers"])[:n]
        frame.set_cw(np.asarray(res["cw"], np.float64), slam_io)
        for kpid, inl in zip(ids, inliers):
            if not inl:
                self.map_manager.remove_obs_from_current_frame(kpid)

        # LM refinement on the inlier set (front_end.jl:202-206).
        in_ids = [ids[i] for i in range(n) if inliers[i]]
        in_pts = [pts3d[i] for i in range(n) if inliers[i]]
        in_px_yx = [px_xy[i][::-1] for i in range(n) if inliers[i]]
        m = len(in_ids)
        theta0 = frame.get_cw_ba()
        ref = pnp_refine(
            jnp.asarray(theta0, jnp.float32),
            jnp.asarray(pad_rows(in_pts, cap, np.float32)),
            jnp.asarray(pad_rows(in_px_yx, cap, np.float32)),
            jnp.asarray(valid_mask(m, cap)),
            self._intrinsics,
            iters1=5, iters2=10,
            repr_eps=self.params.max_reprojection_error,
        )
        ref = jax.device_get(ref)
        outliers = np.asarray(ref["outliers"])[:m]
        n_outliers = int(ref["n_outliers"])
        if m - n_outliers < 5 or float(ref["final_error"]) > float(
            ref["initial_error"]
        ):
            log.warning("[FE] P3P BA too few inliers - resetting!")
            self.reset_frame()
            return False

        for kpid, out in zip(in_ids, outliers):
            if out:
                self.map_manager.remove_obs_from_current_frame(kpid)

        frame.set_cw(
            hm.theta_to_pose(np.asarray(ref["theta"], np.float64)), slam_io
        )
        return True

    # -- essential matrix (front_end.jl:243-332) -----------------------------

    def compute_pose_5pt(self, min_parallax: float,
                         use_motion_model: bool) -> Optional[np.ndarray]:
        frame = self.current_frame
        if frame.nb_keypoints < 8:
            log.debug("[FE] Not enough keypoints for 5pt: %d",
                      frame.nb_keypoints)
            return None
        prev_kf = self.map_manager.frames_map.get(frame.kfid)
        if prev_kf is None:
            return None

        R_comp = prev_kf.get_Rcw() @ frame.get_Rwc()

        ids, prev_px, cur_px, prev_pd, cur_pd = [], [], [], [], []
        n_parallax = 0
        avg_parallax = 0.0
        for kp in frame.keypoints.values():
            pkf_kp = prev_kf.keypoints.get(kp.id)
            if pkf_kp is None:
                continue
            prev_px.append(pkf_kp.undistorted_pixel[::-1])
            cur_px.append(kp.undistorted_pixel[::-1])
            prev_pd.append(pkf_kp.position[:2])
            cur_pd.append(kp.position[:2])
            ids.append(kp.id)
            # Rotation-compensated parallax (front_end.jl:278-282).
            rot_px = frame.camera.project(R_comp @ kp.position)
            avg_parallax += float(
                np.linalg.norm(rot_px - pkf_kp.undistorted_pixel)
            )
            n_parallax += 1

        if n_parallax < 8:
            log.warning("[FE] Not enough keypoints in previous KF for 5pt.")
            return None
        avg_parallax /= n_parallax
        if avg_parallax < min_parallax:
            log.warning("[FE] Not enough parallax (%.2f) for 5pt.",
                        avg_parallax)
            return None

        n = len(ids)
        cap = self.params.keypoint_capacity
        res = essential_ransac(
            jnp.asarray(pad_rows(prev_pd, cap, np.float32)),
            jnp.asarray(pad_rows(cur_pd, cap, np.float32)),
            jnp.asarray(pad_rows(prev_px, cap, np.float32)),
            jnp.asarray(pad_rows(cur_px, cap, np.float32)),
            jnp.asarray(valid_mask(n, cap)),
            jnp.int32(n),
            self._intrinsics,
            self._ransac_key(0),
            hypotheses=self.params.ransac_essential_hypotheses,
            threshold=self.params.max_reprojection_error,
        )
        res = jax.device_get(res)
        n_inliers = int(res["n_inliers"])
        if n_inliers < 5:
            log.warning("[FE] Not enough inliers (%d) for 5pt.", n_inliers)
            return None

        if n_inliers != n:
            inliers = np.asarray(res["inliers"])[:n]
            for i, inl in enumerate(inliers):
                if not inl:
                    self.map_manager.remove_obs_from_current_frame(ids[i])

        P = np.asarray(res["pose"], np.float64)
        if use_motion_model:
            # Scale recovery from the motion model (front_end.jl:321-330).
            prev_cw = prev_kf.cw
            current = prev_cw @ frame.wc
            scale = float(np.linalg.norm(current[:3, 3]))
            R, t = P[:3, :3], P[:3, 3]
            norm_t = np.linalg.norm(t)
            if norm_t > 1e-12:
                t = scale * t / norm_t
            return hm.rt_to_4x4(R, t) @ prev_cw
        return P  # cw pose

    # -- initialization (front_end.jl:343-354) -------------------------------

    def check_ready_for_init(self, slam_io=None) -> bool:
        avg_parallax = self.compute_parallax(
            self.current_frame.kfid,
            compensate_rotation=False, median_parallax=False,
        )
        log.debug("[FE] Initial parallax %.2f vs %.2f.", avg_parallax,
                  self.params.initial_parallax)
        if avg_parallax <= self.params.initial_parallax:
            return False
        pose = self.compute_pose_5pt(
            min_parallax=self.params.initial_parallax,
            use_motion_model=False,
        )
        if pose is None:
            return False
        self.current_frame.set_cw(pose, slam_io)
        return True

    # -- keyframe decision (front_end.jl:361-393) ----------------------------

    def check_new_kf_required(self, median_parallax=None) -> bool:
        frame = self.current_frame
        p = self.params
        prev_kf = self.map_manager.frames_map.get(frame.kfid)
        if prev_kf is None:
            return False

        frames_delta = frame.id - prev_kf.id
        if (frame.nb_occupied_cells < 0.33 * p.max_nb_keypoints
                and frames_delta >= 5 and not p.local_ba_on):
            return True
        if frame.nb_3d_kpts < p.kf_emergency_3d and frames_delta >= 2:
            return True
        if (frame.nb_3d_kpts > 0.5 * p.max_nb_keypoints
                and (p.local_ba_on or frames_delta < 2)):
            return False

        if median_parallax is None:
            median_parallax = self.compute_parallax(
                prev_kf.kfid, compensate_rotation=True, only_2d=False,
            )
        # front_end.jl:381-385. The optional stereo bypass ("TODO || stereo")
        # drops the parallax gate where stereo depth makes it redundant —
        # but it lets the 3D-decay conditions fire every other frame, so the
        # reference's shipped gate is the default (params.py).
        cx = median_parallax >= p.initial_parallax / 2.0 or (
            p.stereo and p.kf_parallax_bypass_stereo
        )
        c0 = median_parallax >= p.initial_parallax
        c1 = frame.nb_3d_kpts < 0.75 * prev_kf.nb_3d_kpts
        c2 = (frame.nb_occupied_cells < 0.5 * p.max_nb_keypoints
              and frame.nb_3d_kpts < 0.85 * prev_kf.nb_3d_kpts
              and not p.local_ba_on)
        return cx and (c0 or c1 or c2)

    # -- parallax (front_end.jl:412-452) -------------------------------------

    def compute_parallax(self, frame_id, compensate_rotation=True,
                         only_2d=True, median_parallax=True) -> float:
        frame = self.current_frame
        other = self.map_manager.frames_map.get(frame_id)
        if other is None:
            log.warning("[FE] compute_parallax: keyframe %s missing.",
                        frame_id)
            return 0.0
        R = (
            other.get_Rcw() @ frame.get_Rwc()
            if compensate_rotation else np.eye(3)
        )
        values = []
        for kp in frame.keypoints.values():
            if only_2d and kp.is_3d:
                continue
            upx_other = other.get_keypoint_unpx(kp.id)
            if upx_other is None:
                continue
            if compensate_rotation:
                upx = other.camera.project(R @ kp.position)
            else:
                upx = kp.undistorted_pixel
            values.append(float(np.linalg.norm(upx - upx_other)))
        if not values:
            return 0.0
        if median_parallax:
            return float(np.median(values))
        return float(np.mean(values))

    # -- preprocessing (front_end.jl:454-481) --------------------------------

    def preprocess(self, image_dev):
        self.previous_pyramid = self.current_pyramid
        self.current_image_dev = image_dev
        self.current_pyramid = build_lk_pyramid(
            image_dev,
            levels=self.params.pyramid_levels,
            sigma=self.params.pyramid_sigma,
            pad=self._pad,
        )

    def klt_tracking(self):
        self.map_manager.optical_flow_matching(
            self.current_frame, self.previous_pyramid, self.current_pyramid,
            stereo=False,
        )

    # -- reset (front_end.jl:488-512) ----------------------------------------

    def reset_frame(self):
        self._frame_reset_taken = True
        for kpid in list(self.current_frame.keypoints.keys()):
            self.map_manager.remove_obs_from_current_frame(kpid)
        self.current_frame.keypoints.clear()
        self.current_frame.keypoints_grid.clear()
        self.current_frame.nb_2d_kpts = 0
        self.current_frame.nb_3d_kpts = 0
        self.current_frame.nb_stereo_kpts = 0
        self.current_frame.nb_keypoints = 0
        self.current_frame.nb_occupied_cells = 0

    def reset(self):
        self.previous_pyramid = None
        self.current_pyramid = None
        self.motion_model.reset()
        self.needs_bootstrap = True
        self.pipeline_stop()

    def _ransac_key(self, salt: int, fid: Optional[int] = None):
        if fid is None:
            fid = self.current_frame.id
        # Mask to 32 bits BEFORE branching: jax.random.PRNGKey's int64 ->
        # int32 canonicalization for seeds >= 2^31 is version-dependent, so
        # the host twin below could silently diverge from the x64 branch
        # for params.seed >= ~307 (ADVICE r4 low).
        seed = ((self.params.seed * 1000003 + fid) * 7 + salt) & 0xFFFFFFFF
        if jax.config.jax_enable_x64:  # pragma: no cover - non-default
            return jax.random.PRNGKey(seed)
        # Host twin of jax.random.PRNGKey under the default no-x64 config
        # (threefry seed = [0, seed mod 2^32], verified bit-identical for
        # seeds up to 2^40) — PRNGKey dispatches a tiny device program,
        # which on the tunnel backend costs a per-frame RPC.
        return np.array([0, seed], np.uint32)
