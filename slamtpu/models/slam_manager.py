"""SlamManager: top-level orchestration (reference src/SLAM.jl:89-323).

Two execution modes:
  - sequential (default): each frame runs front-end -> mapper -> estimator
    inline. The reference's KITTI example drains every queue before feeding
    the next frame (example/kitty/main.jl:46-54), so lock-step is the honest
    equivalent of its steady state.
  - threaded: mapper + estimator worker threads consuming queues, mirroring
    the reference's 3-stage pipeline (SLAM.jl:166, mapper.jl:26).

Images enter as numpy float arrays in [0, 1] (grayscale); they are pushed to
the device once and every kernel reuses the device-resident copy.
"""
from __future__ import annotations

import logging
import threading
import time as _time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..camera import Camera
from ..params import Params
from ..utils.profiling import TIMERS
from .extractor import Extractor
from .frame import Frame
from .front_end import FrontEnd
from .map_manager import MapManager
from .mapper import KeyFrame, Mapper

log = logging.getLogger("slamtpu.sm")


class SlamManager:
    def __init__(self, params: Params, camera: Camera,
                 right_camera: Optional[Camera] = None, slam_io=None):
        if params.stereo and right_camera is None:
            raise ValueError("[SM] Provide right_camera in stereo mode.")
        if params.speculate_keyframes and not (
            params.async_keyframe and params.fused_keyframe
            and params.stereo and params.pipelined
        ):
            # The speculative adopt path only engages when the fused async
            # keyframe program exists (stereo + fused_keyframe +
            # async_keyframe + pipelined); anything else would silently
            # degrade every keyframe to discard+replay while ALSO skipping
            # the predict-keyframe pre-drain (ADVICE r4 low).
            log.warning(
                "[SM] speculate_keyframes requires pipelined stereo with "
                "fused_keyframe + async_keyframe; disabling it."
            )
            params.speculate_keyframes = False
        from ..utils.jaxcache import enable_compilation_cache
        enable_compilation_cache()
        self.params = params
        self.camera = camera
        self.right_camera = right_camera
        self.slam_io = slam_io

        avoidance_radius = max(5, params.max_distance // 2)
        grid_resolution = (
            -(-camera.height // params.max_distance),
            -(-camera.width // params.max_distance),
        )

        self.current_frame = Frame(
            camera, right_camera, cell_size=params.max_distance
        )
        self.extractor = Extractor(
            params.max_nb_keypoints, avoidance_radius, grid_resolution,
            params.max_distance, capacity=params.keypoint_capacity,
            subpix=params.subpixel_detect,
        )
        self.map_manager = MapManager(
            params, self.current_frame, self.extractor
        )
        self.front_end = FrontEnd(params, self.current_frame,
                                  self.map_manager)
        self.mapper = Mapper(params, self.map_manager, self.current_frame,
                             slam_io)

        self.frame_id = 0
        self.exit_required = False
        # Single worker so uploads stay ordered; overlaps the ~7 ms H2D
        # put (plus the host cast) with the pipeline's apply fetches.
        self._uploader = ThreadPoolExecutor(max_workers=1)
        self._pending_kf = None
        self._image_queue = []
        self._queue_lock = threading.Lock()
        self._threads = []
        if not params.sequential:
            self._start_workers()

    # -- feeding (SLAM.jl:237-257) --------------------------------------------

    def add_image(self, image: np.ndarray, time: float):
        if self.params.sequential:
            self._process_frame(image, None, time)
        else:
            with self._queue_lock:
                self._image_queue.append((image, None, time))

    def add_stereo_image(self, image: np.ndarray, right_image: np.ndarray,
                         time: float):
        if self.params.sequential:
            self._process_frame(image, right_image, time)
        else:
            with self._queue_lock:
                self._image_queue.append((image, right_image, time))

    def get_queue_size(self) -> int:
        with self._queue_lock:
            return len(self._image_queue)

    # -- per-frame pipeline (SLAM.jl:187-230) -----------------------------------

    def _to_device_image(self, image, stage: str = "sm.upload"):
        # `sm.upload_async` is recorded from the uploader worker thread:
        # it measures overlapped wall-clock, not main-thread frame time.
        with TIMERS.stage(stage):
            return self._to_device_image_inner(image)

    def _to_device_image_inner(self, image):
        arr = np.asarray(image, np.float32)
        if arr.max() > 1.5:  # uint8-style input: normalize to [0, 1]
            arr = arr / 255.0
        if self.params.image_dtype == "float16":
            arr = arr.astype(np.float16)
        return jnp.asarray(arr)

    def _process_frame(self, image, right_image, time: float):
        # Whole-frame accounting: everything the caller pays per add_*_image
        # call lands under sm.frame, so the per-stage timers below can be
        # checked against the total (PERF.md measurement hygiene).
        with TIMERS.stage("sm.frame"):
            self._process_frame_inner(image, right_image, time)

    def _process_frame_inner(self, image, right_image, time: float):
        fe = self.front_end
        if (self.params.pipelined and self.params.sequential
                and fe.pipeline_active):
            # The left upload (host cast + ~7 ms H2D on the tunnel) runs on
            # a worker thread, overlapped with this frame's apply/fetch work
            # below; joined right before dispatch needs the device buffer.
            if self._uploader is None:  # re-created after finish()/wait()
                self._uploader = ThreadPoolExecutor(max_workers=1)
            upload = self._uploader.submit(
                self._to_device_image, image, "sm.upload_async"
            )
            # The right image is only read on the keyframe path — keep it
            # on the host (numpy) and upload at keyframe-apply time instead
            # of paying ~6 ms of H2D latency every frame.
            right_dev = right_image
            # Apply up to (and including) a predicted-keyframe frame BEFORE
            # dispatching on top of it: a correct prediction avoids
            # discarding + replaying the new dispatch against the
            # pre-keyframe carry. Checks the whole in-flight window — at
            # depth 3 the keyframe can sit behind a tracked frame.
            # speculate_keyframes makes the drain unnecessary: keyframes
            # are grafted onto the speculated chain instead of replayed.
            while (fe.inflight and fe.pipeline_active
                   and not self.params.speculate_keyframes
                   and any(fe.predict_kf(r.fid) for r in fe.inflight)):
                self._pipeline_apply_one()
            # Pre-dispatch drain to depth-1 (equivalent to the post-dispatch
            # drain to depth, one frame shifted) — its device fetches hide
            # the in-flight upload.
            while (fe.pipeline_active
                   and len(fe.inflight) >= self.params.pipeline_depth):
                self._pipeline_apply_one()
            with TIMERS.stage("sm.upload_join"):
                image_dev = upload.result()
            if not fe.pipeline_active:
                # A reset mid-apply tore the pipeline down; fall through to
                # the classic path for this frame.
                pass
            else:
                self.frame_id += 1
                fe.pipeline_dispatch(
                    self.frame_id, image_dev, right_dev, time
                )
                return
        else:
            image_dev = self._to_device_image(image)

        right_dev = (
            self._to_device_image(right_image)
            if right_image is not None else None
        )
        self.frame_id += 1
        self.current_frame.id = self.frame_id
        self.current_frame.time = time
        log.debug("[SM] Frame %d @ %s", self.frame_id, time)

        is_kf_required = self.front_end.track(image_dev, time, self.slam_io)
        if self.params.reset_required:
            self.reset()
            return

        if is_kf_required:
            kf = KeyFrame(
                self.current_frame.kfid,
                self.front_end.current_pyramid if self.params.stereo else None,
                right_dev if self.params.stereo else None,
            )
            if self.params.sequential:
                ok = self.mapper.process(kf)
                if self.params.reset_required:
                    self.reset()
                    return
                if ok:
                    new_kf = self.mapper.estimator.get_new_kf()
                    if new_kf is not None:
                        self.mapper.estimator.process(new_kf)
            else:
                self.mapper.add_new_kf(kf)

        # Enter pipelined mode once tracking is fused-ready (post-init with
        # a previous keyframe on record).
        if (self.params.pipelined and self.params.sequential
                and self.params.fused_front_end
                and not fe.pipeline_active and fe.can_start_pipeline()):
            fe.start_pipeline()

    def _drain_pending_kf(self) -> bool:
        """Host-apply a pending async keyframe (f64 gates, estimator) and
        push the carry correction. Returns False if a reset tore the
        pipeline down."""
        pending = self._pending_kf
        if pending is None:
            return True
        self._pending_kf = None
        fe = self.front_end
        with TIMERS.stage("sm.drain_kf"):
            return self._drain_pending_kf_inner(pending, fe)

    def _drain_pending_kf_inner(self, pending, fe) -> bool:
        ok = self.mapper.apply_async_keyframe(pending)
        if self.params.reset_required:
            fe.pipeline_stop()
            self.reset()
            return False
        if ok:
            new_kf = self.mapper.estimator.get_new_kf()
            if new_kf is not None:
                self.mapper.estimator.process(new_kf)
            if self.params.reset_required:
                fe.pipeline_stop()
                self.reset()
                return False
            fe.push_correction()
        return True

    def _pipeline_apply_one(self):
        """Fetch + apply the oldest in-flight frame; handle keyframes and
        resets by discarding the speculated dispatches, resyncing the
        device carry from host state, and replaying the speculated inputs.
        With async_keyframe, the keyframe program instead chains off the
        applied frame's carry (no resync/fetch on the critical path) and
        its host half runs at the NEXT apply via _drain_pending_kf."""
        fe = self.front_end
        if not self._drain_pending_kf():
            return
        rec = fe.inflight.popleft()
        self.current_frame.id = rec.fid
        self.current_frame.time = rec.time
        with TIMERS.stage("fe.pipe.fetch"):
            if rec.fetched is not None:
                per_kp, scalars = rec.fetched
                rec.fetched = None
            elif (
                self.params.pair_fetch
                and fe.inflight and rec.prefetch is None
                # Right after a keyframe the queue holds fresh replay
                # dispatches whose exec runs BEHIND the keyframe program;
                # a fetch of unfinished outputs holds the tunnel transport
                # (PERF.md r5 contention probe), so batched fetch only once
                # the chain has drained past the keyframe.
                and rec.fid - fe._last_kf_fid >= 3
            ):
                # Fetch up to fetch_batch frames' results in ONE device_get
                # RPC (device_get batches buffers into one round trip,
                # PERF.md r5 fetch probe) and stash the extras. The apply
                # drain runs BEFORE dispatch, so every in-flight program was
                # dispatched >= 1 frame period (~50 ms) ago — past its
                # ~16 ms exec — and the batched fetch incurs no exec wait
                # at steady state.
                extras = []
                for nxt in fe.inflight:
                    if len(extras) >= self.params.fetch_batch - 1:
                        break
                    if nxt.prefetch is not None or nxt.fetched is not None:
                        break
                    extras.append(nxt)
                bufs = [rec.per_kp, rec.scalars]
                for nxt in extras:
                    bufs.append(nxt.per_kp)
                    bufs.append(nxt.scalars)
                out = jax.device_get(tuple(bufs))
                per_kp, scalars = out[0], out[1]
                for j, nxt in enumerate(extras):
                    nxt.fetched = (out[2 + 2 * j], out[3 + 2 * j])
            else:
                per_kp, scalars = rec.fetch()
        is_kf_required = fe.pipeline_apply(rec, per_kp, scalars, self.slam_io)

        if self.params.reset_required:
            fe.pipeline_stop()
            self.reset()
            return

        if not is_kf_required and not fe.frame_reset_taken:
            return

        if is_kf_required:
            fe.note_kf(rec.fid)
            # Speculate THROUGH the keyframe (params.speculate_keyframes):
            # keep the in-flight dispatches, chain the keyframe program off
            # this frame's carry, and graft its output onto the speculated
            # tip device-side. Falls back to discard+replay when this
            # keyframe's carry itself predates a previous keyframe's
            # detections (fid <= the last adopt's dispatch tip).
            use_fused_kf_spec = (
                self.params.fused_keyframe and self.params.stereo
                and rec.right_dev is not None
                and not self.params.do_local_matching
            )
            if (self.params.speculate_keyframes and use_fused_kf_spec
                    and self.params.async_keyframe and fe.pipeline_active
                    and fe._carry is not None
                    and rec.fid > fe._adopt_tip_fid):
                if isinstance(rec.right_dev, np.ndarray):
                    rec.right_dev = self._to_device_image(rec.right_dev)
                fe.adopt_pyramid(rec)
                new_kf_carry, self._pending_kf = (
                    self.mapper.dispatch_async_keyframe(
                        rec.carry_after, rec.right_dev, fe._slot_ids
                    )
                )
                self._pending_kf.adopt_caught = fe.adopt_keyframe_carry(
                    new_kf_carry, rec.carry_after
                )
                self._pending_kf.start_prefetch()
                return
        # The carry beyond this frame was computed against stale state.
        # A keyframe on a fid at/behind the last adopt tip has a carry that
        # PREDATES the previous adopt — chaining the async keyframe program
        # off it would leave the previous keyframe's host-admitted
        # detections device-invalid forever (never tracked, never removed,
        # cloned into every future keyframe). Force the synchronous
        # start_pipeline() resync path instead (ADVICE r4 medium).
        stale_adopt = rec.fid <= fe._adopt_tip_fid
        replay = fe.pipeline_discard()
        fe.adopt_pyramid(rec)

        if is_kf_required:
            if rec.right_dev is not None and isinstance(
                rec.right_dev, np.ndarray
            ):
                # Lazily uploaded: the right image is only needed here.
                rec.right_dev = self._to_device_image(rec.right_dev)
            use_fused_kf = (
                self.params.fused_keyframe and self.params.stereo
                and rec.right_dev is not None
                and not self.params.do_local_matching
            )
            if use_fused_kf and self.params.async_keyframe and not stale_adopt:
                new_carry, self._pending_kf = (
                    self.mapper.dispatch_async_keyframe(
                        rec.carry_after, rec.right_dev, fe._slot_ids
                    )
                )
                fe._carry = new_carry
                fe._last_dispatch_time = fe.motion_model.prev_time
                # Start the background D2H before the replay dispatches so
                # its RPC isn't queued behind them on the tunnel.
                self._pending_kf.start_prefetch()
                for fid, time, image_dev, right_dev in replay:
                    fe.pipeline_dispatch(fid, image_dev, right_dev, time)
                return
            if use_fused_kf:
                ok = self.mapper.process_fused_keyframe(
                    fe.current_pyramid, rec.right_dev
                )
            else:
                self.map_manager.create_keyframe(rec.image_dev)
                kf = KeyFrame(
                    self.current_frame.kfid,
                    fe.current_pyramid if self.params.stereo else None,
                    rec.right_dev if self.params.stereo else None,
                )
                ok = self.mapper.process(kf)
            if self.params.reset_required:
                fe.pipeline_stop()
                self.reset()
                return
            if ok:
                new_kf = self.mapper.estimator.get_new_kf()
                if new_kf is not None:
                    self.mapper.estimator.process(new_kf)

        fe.start_pipeline()
        for fid, time, image_dev, right_dev in replay:
            fe.pipeline_dispatch(fid, image_dev, right_dev, time)

    # -- threaded mode ----------------------------------------------------------

    def _start_workers(self):
        def run_manager():
            while not self.exit_required:
                # Backpressure: do not track ahead while the mapper still
                # holds unprocessed keyframes — the keyframe decision reads
                # 3D counts/covisibility that the mapper is about to change,
                # and racing it snowballs the keyframe cadence (round-2
                # threaded mode: 57 KFs / 60 frames). The reference example
                # drains queues for the same reason
                # (example/kitty/main.jl:46-54).
                if self.mapper.keyframe_queue:
                    _time.sleep(2e-3)
                    continue
                with self._queue_lock:
                    item = (
                        self._image_queue.pop(0) if self._image_queue else None
                    )
                if item is None:
                    _time.sleep(1e-2)
                    continue
                self._process_frame(*item)

        def run_mapper():
            while not self.exit_required:
                kf = self.mapper.get_new_kf()
                if kf is None:
                    _time.sleep(1e-2)
                    continue
                self.mapper.process(kf)

        def run_estimator():
            est = self.mapper.estimator
            while not self.exit_required:
                new_kf = est.get_new_kf()
                if new_kf is None:
                    _time.sleep(1e-2)
                    continue
                est.process(new_kf)

        for fn in (run_manager, run_mapper, run_estimator):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)

    def finish(self):
        """Drain the tracking pipeline and apply any deferred optimization
        results (call at sequence end)."""
        while self.front_end.inflight:
            self._pipeline_apply_one()
        self._drain_pending_kf()
        self.mapper.estimator.flush()
        self._shutdown_uploader()

    def wait(self):
        """Drain queues and stop worker threads (threaded mode)."""
        if self.params.sequential:
            self.finish()
            return
        while (self.get_queue_size() > 0 or self.mapper.keyframe_queue
               or self.mapper.estimator.frame_queue):
            _time.sleep(1e-2)
        self.exit_required = True
        for t in self._threads:
            t.join(timeout=5.0)
        self._shutdown_uploader()

    def _shutdown_uploader(self):
        """Release the upload worker thread (ADVICE r3): long-lived apps
        creating many SlamManagers must not accumulate idle threads."""
        if self._uploader is not None:
            self._uploader.shutdown(wait=False)
            self._uploader = None

    # -- reset (SLAM.jl:316-323) -------------------------------------------------

    def reset(self):
        log.warning("[SM] Reset required. Applying.")
        self._pending_kf = None
        self.params.reset()
        self.current_frame.reset()
        self.front_end.reset()
        self.map_manager.reset()
        self.mapper.reset()
        self.mapper.estimator.reset()
