"""Mapper: keyframe consumer — stereo matching + triangulation, temporal
triangulation, covisibility maintenance, optional descriptor-based local-map
matching.

Port of reference src/mapper.jl behavior. Triangulation batches keypoints by
observer keyframe and solves every DLT system of a group in one device call
(the reference loops point-by-point reusing the relative pose when
consecutive points share an observer, mapper.jl:225-232 — grouping is the
batched equivalent).
"""
from __future__ import annotations

import logging
import math
import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from .. import hostmath as hm
from ..ops.image import build_lk_pyramid
from ..ops.lucas_kanade import lk_pad
from ..ops.mvg import triangulate_batch
from ..params import Params
from ..utils.profiling import TIMERS
from .estimator import Estimator
from .frame import Frame
from .map_manager import MapManager
from .map_point import mappoint_min_distance

log = logging.getLogger("slamtpu.mp")


def _triangulate_padded(px1, px2, P1, P2):
    """Bucket-padded DLT triangulation (stable jit cache; the device sits
    behind a high-latency tunnel where every recompile costs seconds)."""
    from ..utils.padding import next_bucket

    n = len(px1)
    # One fixed shape in the common case — every new shape re-traces.
    cap = next_bucket(n, minimum=1024)
    a = np.zeros((cap, 2), np.float32)
    b = np.zeros((cap, 2), np.float32)
    a[:n] = px1
    b[:n] = px2
    out = np.asarray(triangulate_batch(
        jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32),
    ), np.float64)
    return out[:n]


def _triangulate_padded_P2(px1, px2, P1, P2_rows):
    """Like _triangulate_padded but with a per-row (N, 4, 4) second
    projection (all observer groups in one dispatch)."""
    from ..utils.padding import next_bucket

    n = len(px1)
    cap = next_bucket(n, minimum=1024)
    a = np.zeros((cap, 2), np.float32)
    b = np.zeros((cap, 2), np.float32)
    P2 = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
    a[:n] = px1
    b[:n] = px2
    P2[:n] = P2_rows
    out = np.asarray(triangulate_batch(
        jnp.asarray(a), jnp.asarray(b),
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2),
    ), np.float64)
    return out[:n]


@dataclass
class KeyFrame:
    """Queue payload (reference mapper.jl:1-5)."""
    id: int
    left_pyramid: object = None
    right_image_dev: object = None


@dataclass
class PendingKeyframe:
    """A dispatched-but-not-host-applied async keyframe (the carry-chained
    keyframe program, ops/keyframe_step.py::keyframe_step_carry)."""
    fid: int
    per_slot: object       # device future (cap, 13)
    n_new: object          # device future scalar
    slot_ids: list         # front-end slot list (extended at apply time)
    tri_cand: object       # (cap,) bool — stereo-promotion candidates
    group_data: list       # temporal observer groups (kfid, rel, rel_inv)
    free_list: object      # (cap,) int — detection admission slots
    # speculate_keyframes: device (cap,) bool — new detections that the
    # in-adopt catch-up LK carried to the speculated tip. Failures are
    # removed from the current frame at apply time (the clone keeps the
    # keyframe observation).
    adopt_caught: object = None
    # Background D2H of the outputs (utils/prefetch.py): started once the
    # pending record is complete so the deferred host apply finds
    # host-ready numpy instead of paying a ~26 ms tunnel RPC.
    prefetch: object = None

    def start_prefetch(self):
        if os.environ.get("SLAMTPU_NO_PREFETCH"):
            return
        from ..utils.prefetch import DevicePrefetch

        bufs = {"per_slot": self.per_slot, "n_new": self.n_new}
        if self.adopt_caught is not None:
            bufs["adopt_caught"] = self.adopt_caught
        self.prefetch = DevicePrefetch(bufs)


class Mapper:
    def __init__(self, params: Params, map_manager: MapManager,
                 frame: Frame, slam_io=None):
        self.params = params
        self.map_manager = map_manager
        self.current_frame = frame
        self.estimator = Estimator(map_manager, params, slam_io)
        self.right_pyramid = None
        self.exit_required = False
        self.new_kf_available = False
        self.keyframe_queue = []

    # -- queue (mapper.jl:464-482) -------------------------------------------

    def add_new_kf(self, kf: KeyFrame):
        self.keyframe_queue.append(kf)
        self.new_kf_available = True

    def get_new_kf(self) -> Optional[KeyFrame]:
        if not self.keyframe_queue:
            self.new_kf_available = False
            return None
        kf = self.keyframe_queue.pop(0)
        self.new_kf_available = bool(self.keyframe_queue)
        return kf

    # -- main processing (mapper.jl:37-140) ------------------------------------

    def process(self, kf: KeyFrame) -> bool:
        """Process one keyframe; returns False if a reset was triggered."""
        mm = self.map_manager
        new_keyframe = mm.get_keyframe(kf.id)
        if new_keyframe is None:
            log.error("[MP] Got invalid frame %d from map.", kf.id)
            return True

        if self.params.stereo and kf.right_image_dev is not None:
            if self.params.fused_stereo:
                with mm.map_lock, TIMERS.stage("mp.stereo_fused"):
                    self._stereo_fused(new_keyframe, kf)
            else:
                self.right_pyramid = build_lk_pyramid(
                    kf.right_image_dev,
                    levels=self.params.pyramid_levels,
                    sigma=self.params.pyramid_sigma,
                    pad=lk_pad(self.params.window_size),
                )
                with TIMERS.stage("mp.stereo_match"):
                    mm.optical_flow_matching(
                        new_keyframe, kf.left_pyramid, self.right_pyramid,
                        stereo=True,
                    )
                log.debug("[MP] Stereo matching: %d keypoints.",
                          new_keyframe.nb_stereo_kpts)
                if new_keyframe.nb_stereo_kpts > 0:
                    with mm.map_lock, TIMERS.stage("mp.tri_stereo"):
                        self.triangulate_stereo(new_keyframe)

        if new_keyframe.nb_2d_kpts > 0 and new_keyframe.kfid > 0:
            with mm.map_lock, TIMERS.stage("mp.triangulate"):
                self.triangulate_temporal(new_keyframe)

        # Bad-initialization reset checks (mapper.jl:104-116).
        if self.params.vision_initialized:
            if kf.id == 1 and new_keyframe.nb_3d_kpts < 30:
                log.warning("[MP] Bad initialization detected. Resetting!")
                self.params.reset_required = True
                self.reset()
                return False
            if kf.id < 10 and new_keyframe.nb_3d_kpts < 3:
                log.warning("[MP] Reset required. Nb 3D points: %d.",
                            new_keyframe.nb_3d_kpts)
                self.params.reset_required = True
                self.reset()
                return False

        mm.update_frame_covisibility(new_keyframe)

        if self.params.do_local_matching and kf.id > 0:
            self.match_local_map(new_keyframe)

        self.estimator.add_new_kf(new_keyframe)
        return True

    # -- fused KEYFRAME step: detection + stereo + stereo/temporal DLT in
    # ONE device program (ops/keyframe_step.py). Pipelined-mode fast path
    # replacing create_keyframe + process for stereo without descriptors. --

    def process_fused_keyframe(self, left_pyramid, right_dev) -> bool:
        """Returns False if a reset was triggered (same contract as
        process). Collapses the keyframe path's three dispatch+fetch round
        trips (extract / stereo / temporal DLT) into one."""
        import jax
        from ..ops import keyframe_step as ks

        mm = self.map_manager
        p = self.params
        frame = self.current_frame
        ext = mm.extractor

        with mm.map_lock, TIMERS.stage("mp.kf_fused"):
            mm.prepare_frame()  # sets frame.kfid (map_manager.jl:79-96)

            with TIMERS.stage("mp.kf_fused.assemble"):
                state, meta = self._assemble_keyframe_state(frame)
            (ids, is3d_l, tri_cand, group_data, deferred_removals,
             n_old) = meta

            with TIMERS.stage("mp.kf_fused.dispatch"):
                res = ks.keyframe_step(
                    left_pyramid, right_dev, jnp.asarray(state),
                    levels=p.pyramid_levels, window=p.window_size,
                    iters=p.lk_iterations, eps=p.lk_epsilon,
                    eig_thresh=p.lk_eigenvalue_threshold,
                    pad=lk_pad(p.window_size),
                    max_fb_distance=p.max_ktl_distance,
                    sigma=p.pyramid_sigma, min_active=p.lk_min_active,
                    cell_size=ext.cell_size, radius=ext.radius,
                    min_response=ext.min_response,
                    height=frame.camera.height, width=frame.camera.width,
                    stereo_1d=p.stereo_klt_1d, subpix=p.subpixel_detect,
                )
            with TIMERS.stage("mp.kf_fused.fetch"):
                per_slot, n_new = jax.device_get(res)
            n_new = int(n_new)

            # New keypoints in the kernel's admitted order == the classic
            # host admission order (row-major cell, then rank).
            id_start = mm.current_mappoint_id
            if n_new:
                det = per_slot[n_old:n_old + n_new, 0:2].astype(np.float64)
                mm.add_keypoints_to_frame(frame, det, [None] * n_new)
                ids.extend(range(id_start, id_start + n_new))
                is3d_l.extend([False] * n_new)
                tri_cand.extend([True] * n_new)

            mm.add_keyframe()  # deep clone (map_manager.jl:173-182)
            new_keyframe = mm.get_keyframe(frame.kfid)
            for kpid in deferred_removals:
                mm.remove_mappoint_obs(kpid, frame.kfid)

            with TIMERS.stage("mp.kf_fused.apply"):
                self._apply_keyframe_results(
                    new_keyframe, per_slot, ids, tri_cand, group_data,
                    n_old + n_new,
                )

        # Bad-initialization reset checks (mapper.jl:104-116).
        if self.params.vision_initialized:
            if frame.id == 1 and new_keyframe.nb_3d_kpts < 30:
                log.warning("[MP] Bad initialization detected. Resetting!")
                self.params.reset_required = True
                self.reset()
                return False
            if frame.id < 10 and new_keyframe.nb_3d_kpts < 3:
                log.warning("[MP] Reset required. Nb 3D points: %d.",
                            new_keyframe.nb_3d_kpts)
                self.params.reset_required = True
                self.reset()
                return False

        mm.update_frame_covisibility(new_keyframe)
        self.estimator.add_new_kf(new_keyframe)
        return True

    # -- ASYNC keyframe path: carry-chained keyframe program ---------------
    # (ops/keyframe_step.py::keyframe_step_carry). The dispatch half runs
    # at keyframe decision time and returns the post-keyframe track carry
    # so the next tracked frame chains device-side with no host round trip;
    # the apply half (host f64 gates, map bookkeeping, estimator) runs one
    # frame behind from the fetched outputs, then front_end.push_correction
    # reconciles the carry.

    def dispatch_async_keyframe(self, carry, right_dev, slot_ids):
        """Dispatch the carry-chained keyframe program. Returns
        (new_carry, pending) where pending holds the device futures + the
        host metadata apply_async_keyframe needs. `slot_ids` is the
        front-end's live slot->keypoint-id list (mutated in place: dead
        slots are lazily marked None)."""
        from ..ops import keyframe_step as ks

        mm = self.map_manager
        p = self.params
        frame = self.current_frame
        ext = mm.extractor
        cap = p.keypoint_capacity

        with TIMERS.stage("mp.kf_async.dispatch"):
            mm.prepare_frame()  # sets frame.kfid (map_manager.jl:79-96)
            with TIMERS.stage("mp.kf_async.assemble"):
                state, tri_cand, group_data, free_list = (
                    self._assemble_async_state(frame, slot_ids)
                )
            new_carry, per_slot, n_new = ks.keyframe_step_carry(
                carry, right_dev, jnp.asarray(state),
                levels=p.pyramid_levels, window=p.window_size,
                iters=p.lk_iterations, eps=p.lk_epsilon,
                eig_thresh=p.lk_eigenvalue_threshold,
                pad=lk_pad(p.window_size),
                max_fb_distance=p.max_ktl_distance,
                sigma=p.pyramid_sigma, min_active=p.lk_min_active,
                cell_size=ext.cell_size, radius=ext.radius,
                min_response=ext.min_response,
                height=frame.camera.height, width=frame.camera.width,
                threshold=p.max_reprojection_error,
                stereo_1d=p.stereo_klt_1d, subpix=p.subpixel_detect,
            )
            for buf in (per_slot, n_new):
                try:
                    buf.copy_to_host_async()
                except Exception:
                    pass
        pending = PendingKeyframe(
            fid=frame.id, per_slot=per_slot, n_new=n_new,
            slot_ids=slot_ids, tri_cand=tri_cand, group_data=group_data,
            free_list=free_list,
        )
        return new_carry, pending

    def _assemble_async_state(self, frame: Frame, slot_ids):
        """Packed upload for keyframe_step_carry, slot-aligned with the
        front-end's device carry. Unlike _assemble_keyframe_state, per-slot
        geometry (pixels, map positions, right-projection priors) comes
        from the carry on device — the host uploads only its f64
        undistorted pixels, temporal-DLT candidacy, and the free-slot list
        for detection admission."""
        from ..ops import keyframe_step as ks

        mm = self.map_manager
        p = self.params
        cap = p.keypoint_capacity
        ext = mm.extractor

        state = np.zeros((ks.state2_rows(cap), 16), np.float32)
        state[:cap, ks.KS2_GROUP] = -1.0
        K4l = hm.mat3_to_4x4(frame.camera.K)

        tri_cand = np.zeros(cap, bool)
        free: list = []
        group_of: Dict[int, int] = {}
        group_data: list = []  # (kfid, rel_pose, rel_pose_inv)

        for j in range(cap):
            kpid = slot_ids[j] if j < len(slot_ids) else None
            kp = frame.keypoints.get(kpid) if kpid is not None else None
            if kp is None:
                if kpid is not None and j < len(slot_ids):
                    slot_ids[j] = None
                free.append(j)
                continue
            state[j, ks.KS2_UND] = kp.undistorted_pixel
            mp = mm.map_points.get(kpid)
            if kp.is_3d and mp is None:
                # Should have been removed by prepare_frame; defensive.
                state[j, ks.KS2_FLAGS] = ks.K2_DROP
                continue

            flags2 = 0
            if (not kp.is_3d) and mp is not None and not mp.is_3d:
                flags2 |= ks.K2_TRICAND
                tri_cand[j] = True
                # Temporal-DLT candidacy (mapper.jl:185-232).
                observers = mp.get_observers()
                if len(observers) >= 2 and observers[0] != frame.kfid:
                    okf = mm.get_keyframe(observers[0])
                    okp = okf.get_keypoint(kpid) if okf is not None else None
                    if okp is not None:
                        gi = group_of.get(observers[0])
                        if gi is None and len(group_data) < ks.N_GROUPS:
                            rel_pose = okf.cw @ frame.wc
                            if np.linalg.norm(rel_pose[:3, 3]) >= 1e-9:
                                gi = len(group_data)
                                group_of[observers[0]] = gi
                                group_data.append(
                                    (observers[0], rel_pose,
                                     hm.se3_inv(rel_pose))
                                )
                        if gi is not None:
                            state[j, ks.KS2_OBS_UND] = (
                                okp.undistorted_pixel[::-1]
                            )
                            state[j, ks.KS2_GROUP] = gi
                            flags2 |= ks.K2_TEMPORAL
            state[j, ks.KS2_FLAGS] = flags2

        free_list = np.full(cap, cap, np.int64)
        free_list[:len(free)] = free
        state[:cap, ks.KS2_FREE] = free_list

        for gi, (kfid, rel_pose, rel_inv) in enumerate(group_data):
            state[cap + gi, :] = (K4l @ rel_inv).reshape(16)

        misc = np.zeros(ks.KS2_MISC_ROWS * 16, np.float32)
        misc[ks.M2_P1] = K4l.reshape(16)
        misc[ks.M2_P2R] = (
            hm.mat3_to_4x4(frame.right_camera.K) @ frame.right_camera.Ti0
        ).reshape(16)
        misc[ks.M2_INTR_R] = frame.right_camera.intrinsics_array()
        misc[ks.M2_DIST_R] = frame.right_camera.distortion_array()
        misc[ks.M2_INTR_L] = frame.camera.intrinsics_array()
        misc[ks.M2_DIST_L] = frame.camera.distortion_array()
        # Detection budgets (extractor.jl:74-76 + map_manager.jl:98-114).
        n_cells = ext.grid_resolution[0] * ext.grid_resolution[1]
        if frame.nb_keypoints >= ext.max_points:
            nb_to_detect = 0
            n_cell_detect = 0
        else:
            nb_to_detect = max(
                p.max_nb_keypoints - frame.nb_occupied_cells, 0
            )
            n_cell_detect = -(-(ext.max_points - frame.nb_keypoints)
                              // n_cells)
        misc[ks.M2_CELL_DETECT] = n_cell_detect
        misc[ks.M2_NB_DETECT] = nb_to_detect
        # nb_keyframes AFTER this keyframe's (deferred) clone.
        misc[ks.M2_APPLY5PT] = 1.0 if mm.nb_keyframes + 1 > 2 else 0.0
        misc[ks.M2_NFREE] = len(free)
        misc[ks.M2_TI0] = frame.right_camera.Ti0.reshape(16)
        state[cap + ks.N_GROUPS:, :] = misc.reshape(ks.KS2_MISC_ROWS, 16)

        return state, tri_cand, group_data, free_list

    def apply_async_keyframe(self, pending) -> bool:
        """Deferred host half of the async keyframe: fetch the program's
        outputs, create the keyframe clone, re-make every accept/reject
        gate in f64 (identical decisions to process_fused_keyframe), and
        hand the keyframe to the estimator. Returns False on reset."""
        import jax

        mm = self.map_manager
        frame = self.current_frame
        slot_ids = pending.slot_ids
        cap = self.params.keypoint_capacity

        caught_np = None
        with mm.map_lock, TIMERS.stage("mp.kf_async.apply"):
            with TIMERS.stage("mp.kf_async.fetch"):
                if pending.prefetch is not None:
                    fetched = pending.prefetch.get()
                    per_slot, n_new = fetched["per_slot"], fetched["n_new"]
                    caught_np = fetched.get("adopt_caught")
                else:
                    per_slot, n_new = jax.device_get(
                        (pending.per_slot, pending.n_new)
                    )
            n_new = int(n_new)

            # New keypoints in the kernel's admitted order (the free-slot
            # list is consumed in row-major cell, rank order — identical to
            # the classic host admission order).
            id_start = mm.current_mappoint_id
            det_slots = pending.free_list[:n_new]
            if n_new:
                with TIMERS.stage("mp.kf_async.admit"):
                    det = per_slot[det_slots, 0:2].astype(np.float64)
                    mm.add_keypoints_to_frame(frame, det, [None] * n_new)
                    while len(slot_ids) < cap:
                        slot_ids.append(None)
                    for k, j in enumerate(det_slots):
                        slot_ids[j] = id_start + k
                        pending.tri_cand[j] = True

            mm.add_keyframe()  # deep clone (map_manager.jl:173-182)
            new_keyframe = mm.get_keyframe(frame.kfid)

            # Deferred removals in f64: 3D keypoints whose right projection
            # left the image take no part in this keyframe (occupancy-only,
            # map_manager.jl:500-507) — their keyframe observation is
            # dropped on the clone. The device made the same call in f32
            # for the stereo-tracking set.
            pts3d = [
                (kpid, mm.map_points[kpid].get_position())
                for kpid in slot_ids
                if kpid is not None
                and (kp := frame.keypoints.get(kpid)) is not None
                and kp.is_3d and kpid in mm.map_points
            ]
            if pts3d:
                from ..camera import in_image_batch

                proj_all = frame.project_world_to_right_image_distort_batch(
                    np.asarray([pos for _, pos in pts3d], np.float64)
                )
                inr_all = in_image_batch(frame.right_camera, proj_all)
                for (kpid, _), inr in zip(pts3d, inr_all):
                    if not inr:
                        mm.remove_mappoint_obs(kpid, frame.kfid)

            ids_full = list(slot_ids) + [None] * (cap - len(slot_ids))
            with TIMERS.stage("mp.kf_async.results"):
                self._apply_keyframe_results(
                    new_keyframe, per_slot, ids_full, pending.tri_cand,
                    pending.group_data, cap,
                )

            # speculate_keyframes: new detections whose catch-up LK to the
            # speculated tip failed are no longer tracked — drop them from
            # the CURRENT frame (the keyframe clone keeps the observation,
            # like any post-KF tracking loss; front_end.jl:184-218).
            if pending.adopt_caught is not None and n_new:
                caught = np.asarray(
                    caught_np if caught_np is not None
                    else jax.device_get(pending.adopt_caught)
                )
                for j in det_slots:
                    kpid = slot_ids[j]
                    if kpid is not None and not caught[j]:
                        mm.remove_obs_from_current_frame(kpid)
                        slot_ids[j] = None

        # Bad-initialization reset checks (mapper.jl:104-116).
        if self.params.vision_initialized:
            if pending.fid == 1 and new_keyframe.nb_3d_kpts < 30:
                log.warning("[MP] Bad initialization detected. Resetting!")
                self.params.reset_required = True
                self.reset()
                return False
            if pending.fid < 10 and new_keyframe.nb_3d_kpts < 3:
                log.warning("[MP] Reset required. Nb 3D points: %d.",
                            new_keyframe.nb_3d_kpts)
                self.params.reset_required = True
                self.reset()
                return False

        mm.update_frame_covisibility(new_keyframe)
        self.estimator.add_new_kf(new_keyframe)
        return True

    def _assemble_keyframe_state(self, frame: Frame):
        """One packed (cap + groups + misc, 16) upload for keyframe_step."""
        from ..ops import keyframe_step as ks

        mm = self.map_manager
        p = self.params
        cap = p.keypoint_capacity
        ext = mm.extractor
        scale3d = 0.5

        state = np.zeros((ks.state_rows(cap), 16), np.float32)
        state[:cap, ks.KF_GROUP] = -1.0
        K4l = hm.mat3_to_4x4(frame.camera.K)

        ids: list = []
        is3d_l: list = []
        tri_cand: list = []
        group_of: Dict[int, int] = {}
        group_data: list = []  # (kfid, rel_pose, rel_pose_inv)
        deferred_removals: list = []

        # Batch the right-image projections of all live 3D keypoints in one
        # vectorized pass (the per-point twin costs ~10 us each; ~500 3D
        # priors made this loop ~11 ms of the keyframe's host time).
        kps = list(frame.keypoints.values())
        mp_of = {kp.id: mm.get_mappoint(kp.id) for kp in kps}
        pts3d = [
            (kp.id, mp_of[kp.id].get_position())
            for kp in kps
            if kp.is_3d and mp_of[kp.id] is not None
        ]
        proj_of: Dict[int, np.ndarray] = {}
        inr_of: Dict[int, bool] = {}
        if pts3d:
            from ..camera import in_image_batch

            proj_all = frame.project_world_to_right_image_distort_batch(
                np.asarray([pos for _, pos in pts3d], np.float64)
            )
            inr_all = in_image_batch(frame.right_camera, proj_all)
            for j, (kpid, _) in enumerate(pts3d):
                proj_of[kpid] = proj_all[j]
                inr_of[kpid] = bool(inr_all[j])

        i = 0
        for kp in kps:
            mp = mp_of[kp.id]
            if i >= cap:
                log.warning("[MP] keyframe state exceeds capacity %d.", cap)
                break
            if kp.is_3d:
                if mp is None:
                    deferred_removals.append(kp.id)
                    continue
                projection = proj_of[kp.id]
                if not inr_of[kp.id]:
                    # Keyframe observation dropped (on the clone, after it
                    # exists) but the keypoint keeps tracking in the
                    # front-end — occupancy-only row (placeholder id keeps
                    # state rows and host arrays aligned).
                    deferred_removals.append(kp.id)
                    state[i, ks.KF_PX] = kp.pixel
                    state[i, ks.KF_FLAGS] = ks.KFL_OCCUPY
                    ids.append(None)
                    is3d_l.append(False)
                    tri_cand.append(False)
                    i += 1
                    continue
                flags = ks.KFL_VALID | ks.KFL_PRIOR
                state[i, ks.KF_DISP] = scale3d * (projection - kp.pixel)
            else:
                flags = ks.KFL_VALID

            state[i, ks.KF_PX] = kp.pixel
            state[i, ks.KF_UND] = kp.undistorted_pixel

            # Temporal-DLT candidacy (mapper.jl:185-232): 2D, live 2D map
            # point, >= 2 observers, first observer is an older keyframe.
            if (not kp.is_3d) and mp is not None and not mp.is_3d:
                observers = mp.get_observers()
                if len(observers) >= 2 and observers[0] != frame.kfid:
                    okf = mm.get_keyframe(observers[0])
                    okp = okf.get_keypoint(kp.id) if okf is not None else None
                    if okp is not None:
                        gi = group_of.get(observers[0])
                        if gi is None and len(group_data) < ks.N_GROUPS:
                            rel_pose = okf.cw @ frame.wc
                            # Zero baseline: DLT degenerate, skip (see
                            # triangulate_temporal).
                            if np.linalg.norm(rel_pose[:3, 3]) >= 1e-9:
                                gi = len(group_data)
                                group_of[observers[0]] = gi
                                group_data.append(
                                    (observers[0], rel_pose,
                                     hm.se3_inv(rel_pose))
                                )
                        if gi is not None:
                            state[i, ks.KF_OBS_UND] = (
                                okp.undistorted_pixel[::-1]
                            )
                            state[i, ks.KF_GROUP] = gi
                            flags |= ks.KFL_TEMPORAL

            state[i, ks.KF_FLAGS] = flags
            ids.append(kp.id)
            is3d_l.append(kp.is_3d)
            tri_cand.append(
                (not kp.is_3d) and mp is not None and not mp.is_3d
            )
            i += 1
        n_old = i
        for gi, (kfid, rel_pose, rel_inv) in enumerate(group_data):
            state[cap + gi, :] = (K4l @ rel_inv).reshape(16)

        misc = np.zeros(ks.N_MISC_ROWS * 16, np.float32)
        misc[ks.MISC_P1] = K4l.reshape(16)
        misc[ks.MISC_P2R] = (
            hm.mat3_to_4x4(frame.right_camera.K) @ frame.right_camera.Ti0
        ).reshape(16)
        misc[ks.MISC_INTR_R] = frame.right_camera.intrinsics_array()
        misc[ks.MISC_DIST_R] = frame.right_camera.distortion_array()
        misc[ks.MISC_INTR_L] = frame.camera.intrinsics_array()
        misc[ks.MISC_DIST_L] = frame.camera.distortion_array()
        misc[ks.MISC_N_OLD] = n_old
        # Detection budgets (extractor.jl:74-76 + map_manager.jl:98-114).
        n_cells = ext.grid_resolution[0] * ext.grid_resolution[1]
        if frame.nb_keypoints >= ext.max_points:
            nb_to_detect = 0
            n_cell_detect = 0
        else:
            nb_to_detect = max(
                self.params.max_nb_keypoints - frame.nb_occupied_cells, 0
            )
            n_cell_detect = -(-(ext.max_points - frame.nb_keypoints)
                              // n_cells)
        misc[ks.MISC_CELL_DETECT] = n_cell_detect
        misc[ks.MISC_NB_DETECT] = nb_to_detect
        state[cap + ks.N_GROUPS:, :] = misc.reshape(ks.N_MISC_ROWS, 16)

        return state, (ids, is3d_l, tri_cand, group_data,
                       deferred_removals, n_old)

    def _apply_keyframe_results(self, frame: Frame, per_slot, ids,
                                tri_cand, group_data, n_tot):
        """Host f64 gates + bookkeeping on the keyframe clone — the same
        decisions as _stereo_fused + triangulate_temporal."""
        from ..camera import (
            backproject_batch, project_batch, undistort_batch,
        )
        from ..ops import keyframe_step as ks

        mm = self.map_manager
        p = self.params
        rc = frame.right_camera
        max_error = p.max_reprojection_error

        tracked_ok = per_slot[:n_tot, 4] > 0
        tracked_px = np.asarray(per_slot[:n_tot, 2:4], np.float64)
        lp = np.asarray(per_slot[:n_tot, 5:8], np.float64)
        Xt = np.asarray(per_slot[:n_tot, 8:12], np.float64)

        # Host f64 per-keypoint data from the CLONE (bit-matching the
        # legacy decisions, which used host und/pixels).
        und_arr = np.zeros((n_tot, 2))
        raw_y = np.zeros(n_tot)
        row_live = np.zeros(n_tot, bool)
        kp_objs = []
        for j, kpid in enumerate(ids):
            kp = frame.get_keypoint(kpid)
            kp_objs.append(kp)
            if kp is None:
                continue
            und_arr[j] = kp.undistorted_pixel
            raw_y[j] = kp.pixel[0]
            row_live[j] = True

        ok = tracked_ok & row_live
        right_und_row = undistort_batch(rc, tracked_px)[:, 0]
        epi = ok & (np.abs(und_arr[:, 0] - right_und_row) <= 2.0)

        corrected = np.stack([raw_y, tracked_px[:, 1]], axis=-1)
        right_und_full = undistort_batch(rc, corrected)
        right_bear = backproject_batch(rc, right_und_full)

        rp = lp @ rc.Ti0[:3, :3].T + rc.Ti0[:3, 3]
        lrepr = np.linalg.norm(
            und_arr - project_batch(frame.camera, lp), axis=-1
        )
        rrepr = np.linalg.norm(
            right_und_full - project_batch(rc, rp), axis=-1
        )
        tri_ok = (
            (lp[:, 2] >= 0.1) & (rp[:, 2] >= 0.1)
            & (lrepr <= max_error) & (rrepr <= max_error)
        )
        wpts = lp @ frame.wc[:3, :3].T + frame.wc[:3, 3]

        n_stereo = 0
        n_tri = 0
        for j, kpid in enumerate(ids):
            if not row_live[j]:
                continue
            if epi[j]:
                frame.update_stereo_keypoint_precomputed(
                    kpid, corrected[j], right_und_full[j], right_bear[j]
                )
                n_stereo += 1
            if not (epi[j] and tri_cand[j]):
                continue
            mp = mm.get_mappoint(kpid)
            if mp is None or mp.is_3d:
                continue
            if not tri_ok[j]:
                frame.remove_stereo_keypoint(kpid)
                continue
            mm.update_mappoint(kpid, wpts[j])
            n_tri += 1
        log.debug("[MP] Fused KF stereo: %d matched, %d triangulated.",
                  n_stereo, n_tri)

        # Temporal DLT gates (mapper.jl:239-260; strict_triangulation_gates
        # additionally keeps low-parallax FAILING points 2D, params.py).
        n_temp = 0
        group_of_kfid = {gd[0]: g for g, gd in enumerate(group_data)}
        for j, kpid in enumerate(ids):
            if not row_live[j]:
                continue
            kp = kp_objs[j]
            gi = None  # group index from the uploaded state row
            # Recover candidacy from the per-slot upload conventions.
            # (Rows without KFL_TEMPORAL had group -1 and Xt garbage; the
            # assembly left their KF_OBS_UND zero. Track via group_data.)
            # We stored group index in state; recompute candidacy here:
            mp = mm.get_mappoint(kpid)
            if mp is None or mp.is_3d or kp is None or kp.is_3d:
                continue
            observers = mp.get_observers()
            if len(observers) < 2 or observers[0] == frame.kfid:
                continue
            okf = mm.get_keyframe(observers[0])
            okp = okf.get_keypoint(kpid) if okf is not None else None
            if okp is None:
                continue
            gi = group_of_kfid.get(observers[0])
            if gi is None:
                continue
            _, rel_pose, rel_inv = group_data[gi]

            parallax = np.linalg.norm(
                okp.undistorted_pixel
                - frame.camera.project(rel_pose[:3, :3] @ kp.position)
            )
            X = Xt[j]
            if abs(X[3]) < 1e-12:
                continue
            left_point = X / X[3]
            right_point = rel_inv @ left_point
            lrepr_t = np.linalg.norm(
                frame.camera.project(left_point[:3]) - okp.undistorted_pixel
            )
            rrepr_t = np.linalg.norm(
                frame.camera.project(right_point[:3]) - kp.undistorted_pixel
            )
            bad = (left_point[2] < 0.1 or right_point[2] < 0.1
                   or lrepr_t > max_error or rrepr_t > max_error)
            if bad and parallax > 20.0:
                # Reference removal (mapper.jl:244-260).
                mm.remove_mappoint_obs(okp.id, frame.kfid)
                continue
            if bad and self.params.strict_triangulation_gates:
                # Low-parallax failure: stay 2D, retry at a later KF
                # (params.strict_triangulation_gates).
                continue
            wpt = okf.project_camera_to_world(left_point[:3])
            mm.update_mappoint(kpid, wpt)
            n_temp += 1
        log.debug("[MP] Fused KF temporal: %d good.", n_temp)

    # -- fused stereo step (matching + gate + triangulation, one program) ---

    def _stereo_fused(self, frame: Frame, kf: KeyFrame):
        import jax
        from ..ops.stereo_step import (
            SK_DISP, SK_FLAGS, SK_PX, SK_UND, stereo_step,
        )

        mm = self.map_manager
        p = self.params
        cap = p.keypoint_capacity
        scale3d = 0.5

        # ONE packed (cap + 6, 7) upload — see ops/stereo_step.py layout.
        state = np.zeros((cap + 6, 7), np.float32)
        ids, und, raw_y, tri_cand = [], [], [], []
        i = 0
        for kp in list(frame.keypoints.values()):
            mp = mm.get_mappoint(kp.id)
            if kp.is_3d:
                if mp is None:
                    mm.remove_mappoint_obs(kp.id, frame.kfid)
                    continue
                projection = frame.project_world_to_right_image_distort(
                    mp.get_position()
                )
                if not frame.in_right_image(projection):
                    mm.remove_mappoint_obs(kp.id, frame.kfid)
                    continue
                prior_d = scale3d * (projection - kp.pixel)
                flags = 3  # valid | prior
            else:
                prior_d = None
                flags = 1
            if i >= cap:
                break
            ids.append(kp.id)
            state[i, SK_PX] = kp.pixel
            state[i, SK_UND] = kp.undistorted_pixel
            if prior_d is not None:
                state[i, SK_DISP] = prior_d
            state[i, SK_FLAGS] = flags
            und.append(kp.undistorted_pixel)
            raw_y.append(kp.pixel[0])
            tri_cand.append(
                (not kp.is_3d) and mp is not None and not mp.is_3d
            )
            i += 1
        n = i
        if n == 0:
            return

        K4l = hm.mat3_to_4x4(frame.camera.K)
        P2 = hm.mat3_to_4x4(frame.right_camera.K) @ frame.right_camera.Ti0
        misc = np.zeros(42, np.float32)
        misc[0:16] = K4l.reshape(16)
        misc[16:32] = P2.reshape(16)
        misc[32:36] = frame.right_camera.intrinsics_array()
        misc[36:40] = frame.right_camera.distortion_array()
        state[cap:, :].reshape(42)[:] = misc

        res = stereo_step(
            kf.left_pyramid, kf.right_image_dev, jnp.asarray(state),
            levels=p.pyramid_levels, window=p.window_size,
            iters=p.lk_iterations, eps=p.lk_epsilon,
            eig_thresh=p.lk_eigenvalue_threshold,
            pad=lk_pad(p.window_size), max_fb_distance=p.max_ktl_distance,
            sigma=p.pyramid_sigma, min_active=p.lk_min_active,
        )
        res = jax.device_get(res)

        # Epipolar gate re-decided on HOST in f64 from the raw tracked
        # pixels — same decisions as the legacy maybe_stereo_update
        # (map_manager.jl:579-590), vectorized over the batch (the
        # per-point host loops cost ~40 ms per keyframe).
        from ..camera import (
            backproject_batch, project_batch, undistort_batch,
        )

        rc = frame.right_camera
        tracked_ok = np.asarray(res["ok"], bool)[:n]
        tracked_px = np.asarray(res["tracked_px"], np.float64)[:n]
        und_arr = np.asarray(und, np.float64)[:n]
        right_und_row = undistort_batch(rc, tracked_px)[:, 0]
        epi_host = tracked_ok & (
            np.abs(und_arr[:, 0] - right_und_row) <= 2.0
        )

        # Corrected right pixel: (left raw y, tracked x); batch the
        # undistort/backproject that update_stereo_keypoint would do.
        corrected = np.stack(
            [np.asarray(raw_y, np.float64)[:n], tracked_px[:, 1]], axis=-1
        )
        right_und_full = undistort_batch(rc, corrected)
        right_bear = backproject_batch(rc, right_und_full)

        # Depth/reprojection gates in f64 on host, identical to the legacy
        # triangulate_stereo (mapper.jl:155-181), vectorized.
        max_error = p.max_reprojection_error
        lp = np.asarray(res["left_point"], np.float64)[:n]
        rp = lp @ rc.Ti0[:3, :3].T + rc.Ti0[:3, 3]
        lrepr = np.linalg.norm(und_arr - project_batch(frame.camera, lp),
                               axis=-1)
        rrepr = np.linalg.norm(
            right_und_full - project_batch(rc, rp), axis=-1
        )
        tri_ok = (
            (lp[:, 2] >= 0.1) & (rp[:, 2] >= 0.1)
            & (lrepr <= max_error) & (rrepr <= max_error)
        )
        wpts = lp @ frame.wc[:3, :3].T + frame.wc[:3, 3]

        n_good = 0
        n_tri = 0
        tri_mask = np.asarray(tri_cand, bool)
        for i, kpid in enumerate(ids):
            if epi_host[i]:
                frame.update_stereo_keypoint_precomputed(
                    kpid, corrected[i], right_und_full[i], right_bear[i]
                )
                n_good += 1
            if not (epi_host[i] and tri_mask[i]):
                continue
            if not tri_ok[i]:
                frame.remove_stereo_keypoint(kpid)
                continue
            mm.update_mappoint(kpid, wpts[i])
            n_tri += 1
        log.debug("[MP] Fused stereo: %d matched, %d triangulated.",
                  n_good, n_tri)

    # -- stereo triangulation (mapper.jl:142-183) -------------------------------

    def triangulate_stereo(self, frame: Frame):
        mm = self.map_manager
        kps = [kp for kp in frame.get_stereo_keypoints() if not kp.is_3d]
        cands = []
        for kp in kps:
            mp = mm.get_mappoint(kp.id)
            if mp is None:
                mm.remove_mappoint_obs(kp.id, frame.kfid)
                continue
            if mp.is_3d:
                continue
            cands.append(kp)
        if not cands:
            return

        K4 = hm.mat3_to_4x4(frame.camera.K)
        P1 = K4.copy()
        P2 = hm.mat3_to_4x4(frame.right_camera.K) @ frame.right_camera.Ti0
        px_left = np.array(
            [kp.undistorted_pixel[::-1] for kp in cands], np.float32
        )
        px_right = np.array(
            [kp.right_undistorted_pixel[::-1] for kp in cands], np.float32
        )
        pts = _triangulate_padded(px_left, px_right, P1, P2)

        max_error = self.params.max_reprojection_error
        n_good = 0
        for kp, lp in zip(cands, pts):
            if abs(lp[3]) < 1e-12:
                frame.remove_stereo_keypoint(kp.id)
                continue
            left_point = lp / lp[3]
            if left_point[2] < 0.1:
                frame.remove_stereo_keypoint(kp.id)
                continue
            right_point = frame.right_camera.Ti0 @ left_point
            if right_point[2] < 0.1:
                frame.remove_stereo_keypoint(kp.id)
                continue
            lrepr = np.linalg.norm(
                kp.undistorted_pixel - frame.camera.project(left_point[:3])
            )
            if lrepr > max_error:
                frame.remove_stereo_keypoint(kp.id)
                continue
            rrepr = np.linalg.norm(
                kp.right_undistorted_pixel
                - frame.right_camera.project(right_point[:3])
            )
            if rrepr > max_error:
                frame.remove_stereo_keypoint(kp.id)
                continue
            wpt = frame.project_camera_to_world(left_point[:3])
            mm.update_mappoint(kp.id, wpt)
            n_good += 1
        log.debug("[MP] Stereo triangulation: %d good.", n_good)

    # -- temporal triangulation (mapper.jl:185-263) -------------------------------

    def triangulate_temporal(self, frame: Frame):
        mm = self.map_manager
        keypoints = frame.get_2d_keypoints()
        if not keypoints:
            log.warning("[MP] No 2D keypoints to triangulate.")
            return
        K4 = hm.mat3_to_4x4(frame.camera.K)

        # Group candidates by first-observer keyframe.
        groups: Dict[int, list] = {}
        for kp in keypoints:
            mp = mm.get_mappoint(kp.id)
            if mp is None:
                mm.remove_mappoint_obs(kp.id, frame.kfid)
                continue
            if mp.is_3d:
                continue
            observers = mp.get_observers()
            if len(observers) < 2:
                continue
            kfid = observers[0]
            if kfid == frame.kfid:
                continue
            observer_kf = mm.get_keyframe(kfid)
            if observer_kf is None:
                log.error("[MP] Missing observer for triangulation.")
                continue
            observer_kp = observer_kf.get_keypoint(kp.id)
            if observer_kp is None:
                continue
            groups.setdefault(kfid, []).append((kp, observer_kp))

        max_error = self.params.max_reprojection_error
        good = 0

        # ONE batched DLT dispatch across ALL observer groups: P2 varies
        # per row (triangulate_points broadcasts (N, 4, 4) projections), so
        # the per-group device round trips (~26 ms each) collapse into one.
        live_groups = []
        all_px1, all_px2, all_P2 = [], [], []
        for kfid, pairs in groups.items():
            observer_kf = mm.get_keyframe(kfid)
            rel_pose = observer_kf.cw @ frame.wc   # frame -> observer
            if np.linalg.norm(rel_pose[:3, 3]) < 1e-9:
                # Zero baseline (e.g. the bootstrap keyframe before any
                # motion estimate): two-view DLT is degenerate and returns
                # the null vector, which the reference's low-parallax
                # acceptance (mapper.jl:244-260 gates only when
                # parallax > 20) would admit as a (0,0,0) map point with
                # ~1e5 px residuals. No depth information exists — keep
                # the keypoints 2D for a later keyframe.
                continue
            rel_pose_inv = hm.se3_inv(rel_pose)
            P2 = K4 @ rel_pose_inv
            start = len(all_px1)
            for kp, okp in pairs:
                all_px1.append(okp.undistorted_pixel[::-1])
                all_px2.append(kp.undistorted_pixel[::-1])
                all_P2.append(P2)
            live_groups.append((kfid, pairs, rel_pose, rel_pose_inv, start))
        if not all_px1:
            log.debug("[MP] Temporal triangulation: 0 good.")
            return
        all_pts = _triangulate_padded_P2(
            np.asarray(all_px1, np.float32), np.asarray(all_px2, np.float32),
            K4, np.asarray(all_P2, np.float32),
        )

        for kfid, pairs, rel_pose, rel_pose_inv, start in live_groups:
            observer_kf = mm.get_keyframe(kfid)
            pts = all_pts[start:start + len(pairs)]

            for (kp, okp), lp in zip(pairs, pts):
                # Rotation-only parallax gate (mapper.jl:239-240).
                parallax = np.linalg.norm(
                    okp.undistorted_pixel
                    - frame.camera.project(rel_pose[:3, :3] @ kp.position)
                )
                if parallax < self.params.min_triangulation_parallax:
                    # Depth unobservable at this baseline: stay 2D and
                    # re-triangulate at a later KF (params.py rationale).
                    continue
                if abs(lp[3]) < 1e-12:
                    continue
                left_point = lp / lp[3]
                right_point = rel_pose_inv @ left_point
                lrepr = np.linalg.norm(
                    frame.camera.project(left_point[:3]) - okp.undistorted_pixel
                )
                rrepr = np.linalg.norm(
                    frame.camera.project(right_point[:3]) - kp.undistorted_pixel
                )
                bad = (left_point[2] < 0.1 or right_point[2] < 0.1
                       or lrepr > max_error or rrepr > max_error)
                if bad and parallax > 20.0:
                    # Reference removal (mapper.jl:244-260).
                    mm.remove_mappoint_obs(okp.id, frame.kfid)
                    continue
                if bad and self.params.strict_triangulation_gates:
                    # Low-parallax failure: stay 2D, retry at a later KF
                    # (params.strict_triangulation_gates; the reference
                    # falls through and promotes the bad depth).
                    continue
                wpt = observer_kf.project_camera_to_world(left_point[:3])
                mm.update_mappoint(kp.id, wpt)
                good += 1
        log.debug("[MP] Temporal triangulation: %d good.", good)

    # -- local-map matching (mapper.jl:269-462) -----------------------------------

    def match_local_map(self, frame: Frame):
        mm = self.map_manager
        max_nb_mappoints = 10 * self.params.max_nb_keypoints
        covisibility_map = frame.get_covisible_map()

        if len(frame.local_map_ids) < max_nb_mappoints and covisibility_map:
            kfid = next(iter(covisibility_map.keys()))
            co_kf = mm.get_keyframe(kfid)
            while co_kf is None and kfid > 0:
                kfid -= 1
                co_kf = mm.get_keyframe(kfid)
            if co_kf is not None:
                frame.local_map_ids |= co_kf.local_map_ids

        prev_new_map = self.do_local_map_matching(
            frame, frame.local_map_ids,
            max_projection_distance=self.params.max_projection_distance,
            max_descriptor_distance=self.params.max_descriptor_distance,
        )
        if prev_new_map:
            self.merge_matches(prev_new_map)

    def merge_matches(self, prev_new_map: Dict[int, int]):
        mm = self.map_manager
        with mm.optimization_lock, mm.map_lock:
            for prev_id, new_id in prev_new_map.items():
                mm.merge_mappoints(prev_id, new_id)

    def do_local_map_matching(self, frame: Frame, local_map,
                              max_projection_distance,
                              max_descriptor_distance) -> Dict[int, int]:
        mm = self.map_manager
        prev_new_map: Dict[int, int] = {}
        if not local_map:
            return prev_new_map

        vfov = 0.5 * frame.camera.height / frame.camera.fy
        hfov = 0.5 * frame.camera.width / frame.camera.fx
        max_rad_fov = math.atan(max(vfov, hfov))
        view_threshold = math.cos(max_rad_fov)

        if frame.nb_3d_kpts < 30:
            max_projection_distance *= 2.0

        matches: Dict[int, list] = {}
        for kpid in local_map:
            if frame.is_observing(kpid):
                continue
            mp = mm.get_mappoint(kpid)
            if mp is None or not mp.is_3d or mp.descriptor is None:
                continue
            position = mp.get_position()
            camera_position = frame.project_world_to_camera(position)
            if camera_position[2] < 0.1:
                continue
            view_angle = camera_position[2] / np.linalg.norm(camera_position)
            if abs(view_angle) < view_threshold:
                continue
            projection = frame.camera.project_undistort(camera_position)
            if not frame.camera.in_image(projection):
                continue
            surrounding = frame.get_surrounding_keypoints(projection)
            best_id, best_distance = self.find_best_match(
                frame, mp, projection, surrounding,
                max_projection_distance, max_descriptor_distance,
            )
            if best_id == -1:
                continue
            matches.setdefault(best_id, []).append((kpid, best_distance))

        for kpid, cands in matches.items():
            best_distance = 1e6
            best_id = -1
            for local_kpid, distance in cands:
                if distance <= best_distance:
                    best_distance = distance
                    best_id = local_kpid
                if best_id != -1:
                    prev_new_map[kpid] = best_id
        return prev_new_map

    def find_best_match(self, frame: Frame, target_mp, projection,
                        surrounding_keypoints, max_projection_distance,
                        max_descriptor_distance):
        """mapper.jl:392-462."""
        mm = self.map_manager
        target_observers = set(target_mp.get_observers())
        target_position = target_mp.get_position()

        min_distance = 256.0 * max_descriptor_distance
        best_distance, second_distance = min_distance, min_distance
        best_id, second_id = -1, -1

        for kp in surrounding_keypoints:
            if kp.id < 0:
                continue
            distance = float(np.linalg.norm(projection - kp.pixel))
            if distance > max_projection_distance:
                continue
            mp = mm.get_mappoint(kp.id)
            if mp is None:
                mm.remove_mappoint_obs(kp.id, frame.kfid)
                continue
            if mp.descriptor is None:
                continue
            mp_observers = mp.get_observers()
            if target_observers & set(mp_observers):
                continue

            avg_projection = 0.0
            n_projections = 0
            for observer_kfid in mp_observers:
                observer_kf = mm.get_keyframe(observer_kfid)
                if observer_kf is None:
                    mm.remove_mappoint_obs(kp.id, observer_kfid)
                    continue
                observer_kp = observer_kf.get_keypoint(kp.id)
                if observer_kp is None:
                    mm.remove_mappoint_obs(kp.id, observer_kfid)
                    continue
                observer_projection = (
                    observer_kf.project_world_to_image_distort(target_position)
                )
                avg_projection += float(
                    np.linalg.norm(observer_kp.pixel - observer_projection)
                )
                n_projections += 1
            if n_projections == 0:
                continue
            avg_projection /= n_projections
            if avg_projection > max_projection_distance:
                continue

            distance = mappoint_min_distance(target_mp, mp)
            if distance <= best_distance:
                second_distance = best_distance
                second_id = best_id
                best_distance = distance
                best_id = kp.id
            elif distance <= second_distance:
                second_distance = distance
                second_id = kp.id

        return best_id, best_distance

    def reset(self):
        self.new_kf_available = False
        self.keyframe_queue.clear()
