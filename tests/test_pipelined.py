"""Pipelined (device-resident carry) tracking mode.

The pipelined path (ops/track_step.py + FrontEnd.pipeline_*) must reproduce
the sequential fused path's behavior: same bookkeeping rules one frame
behind, keyframe/reset handled by resync + replay. Trajectories are not
bitwise equal (the motion-model recurrence runs in device f32 instead of
host f64 — butterfly-level divergence), so parity is asserted at the
ATE/keyframe-count level.
"""
import numpy as np
import pytest

from slamtpu import Params
from slamtpu.datasets.synthetic import make_scene
from slamtpu.eval.ate import ate_rmse
from slamtpu.io.saver import ReplaySaver
from slamtpu.models.slam_manager import SlamManager


def _run(scene, pipelined, **overrides):
    params = Params(
        stereo=True, max_nb_keypoints=400, max_distance=24,
        keypoint_capacity=512, initial_parallax=8.0,
        do_local_bundle_adjustment=True, sequential=True,
        pipelined=pipelined, **overrides,
    )
    saver = ReplaySaver()
    sm = SlamManager(params, scene.camera, right_camera=scene.right_camera,
                     slam_io=saver)
    for i in range(len(scene)):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()
    est = saver.trajectory_xyz()
    gt = np.stack([p[:3, 3] for p in scene.poses_wc])
    return sm, params, est, gt


@pytest.mark.slow
def test_pipelined_stereo_parity():
    scene = make_scene(n_frames=10, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=9)
    sm_c, p_c, est_c, gt = _run(scene, pipelined=False)
    sm_p, p_p, est_p, _ = _run(scene, pipelined=True)

    assert not p_c.reset_required and not p_p.reset_required
    # Pipelined mode engaged (not a silent fallback to classic).
    assert sm_p.front_end.pipeline_active or sm_p.front_end.inflight == []
    assert len(est_p) == len(gt), "pipelined trajectory incomplete"
    assert len(est_c) == len(gt)

    total = np.linalg.norm(gt[-1] - gt[0])
    err_c = ate_rmse(est_c.astype(np.float64), gt, align_scale=False)
    err_p = ate_rmse(est_p.astype(np.float64), gt, align_scale=False)
    assert err_c < 0.15 * total
    assert err_p < 0.15 * total
    # Cadence parity: keyframe counts in the same ballpark.
    assert abs(sm_p.map_manager.nb_keyframes
               - sm_c.map_manager.nb_keyframes) <= 3


@pytest.mark.slow
def test_pipelined_drain_on_wait():
    scene = make_scene(n_frames=8, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=11)
    sm, params, est, gt = _run(scene, pipelined=True)
    # Every frame's pose was recorded (applies drained by wait()).
    assert len(est) == len(gt)
    assert sm.front_end.inflight == [] or len(sm.front_end.inflight) == 0


@pytest.mark.slow
def test_fused_keyframe_parity():
    """The one-dispatch keyframe program (ops/keyframe_step.py) must match
    the split path (extract + stereo + temporal DLT) at the map/ATE level:
    the host re-makes every gate in f64 from the same tracked pixels."""
    scene = make_scene(n_frames=10, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=9)
    sm_f, p_f, est_f, gt = _run(scene, pipelined=True, fused_keyframe=True)
    sm_s, p_s, est_s, _ = _run(scene, pipelined=True, fused_keyframe=False)

    assert not p_f.reset_required and not p_s.reset_required
    assert len(est_f) == len(gt) and len(est_s) == len(gt)
    total = np.linalg.norm(gt[-1] - gt[0])
    err_f = ate_rmse(est_f.astype(np.float64), gt, align_scale=False)
    err_s = ate_rmse(est_s.astype(np.float64), gt, align_scale=False)
    assert err_f < 0.15 * total
    assert err_s < 0.15 * total
    assert abs(sm_f.map_manager.nb_keyframes
               - sm_s.map_manager.nb_keyframes) <= 2
    n3d_f = sum(1 for mp in sm_f.map_manager.map_points.values() if mp.is_3d)
    n3d_s = sum(1 for mp in sm_s.map_manager.map_points.values() if mp.is_3d)
    assert n3d_f > 50 and n3d_s > 50


@pytest.mark.slow
def test_planar_scene_fused_production_config():
    """Dominant ground plane through the PRODUCTION fused per-frame path
    (8-point + LS polish epipolar filter, five_point=False) — the regime
    where the linear essential solve degenerates (VERDICT round 2 item 5;
    reference front_end.jl:305 runs 5-point here)."""
    scene = make_scene(n_frames=12, height=160, width=224, n_points=1400,
                       stereo=True, baseline=0.5, seed=21,
                       motion="forward", layout="ground")
    sm, params, est, gt = _run(scene, pipelined=True)
    assert not params.reset_required
    assert len(est) == len(gt)
    total = np.linalg.norm(gt[-1] - gt[0])
    err = ate_rmse(est.astype(np.float64), gt, align_scale=False)
    # The planar degeneracy must not derail the pose cascade: P3P + PnP
    # dominate post-init, the epipolar filter only prunes outliers.
    assert err < 0.2 * total


@pytest.mark.slow
def test_async_keyframe_parity():
    """The carry-chained keyframe path (async_keyframe: keyframe program
    chains off the track carry, host f64 gates one frame behind, carry_merge
    reconciliation) must match the synchronous fused-keyframe path at the
    map/ATE level — the host re-makes every gate in f64 from the same
    fetched values, one frame later."""
    scene = make_scene(n_frames=12, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=9)
    sm_a, p_a, est_a, gt = _run(scene, pipelined=True, async_keyframe=True)
    sm_s, p_s, est_s, _ = _run(scene, pipelined=True, async_keyframe=False)

    assert not p_a.reset_required and not p_s.reset_required
    assert len(est_a) == len(gt) and len(est_s) == len(gt)
    total = np.linalg.norm(gt[-1] - gt[0])
    err_a = ate_rmse(est_a.astype(np.float64), gt, align_scale=False)
    err_s = ate_rmse(est_s.astype(np.float64), gt, align_scale=False)
    assert err_a < 0.15 * total
    assert err_s < 0.15 * total
    assert abs(sm_a.map_manager.nb_keyframes
               - sm_s.map_manager.nb_keyframes) <= 2
    n3d_a = sum(1 for mp in sm_a.map_manager.map_points.values() if mp.is_3d)
    n3d_s = sum(1 for mp in sm_s.map_manager.map_points.values() if mp.is_3d)
    assert n3d_a > 50 and n3d_s > 50


def _run_kf_decisions(scene, **overrides):
    """Run a scene recording every keyframe decision (fid, verdict);
    returns (sm, params, est, gt, kf_fids)."""
    from slamtpu.models.front_end import FrontEnd

    rows = []
    orig = FrontEnd.check_new_kf_required

    def hook(self, median_parallax=None):
        out = orig(self, median_parallax)
        if self.params.vision_initialized:
            rows.append((self.current_frame.id, bool(out)))
        return out

    FrontEnd.check_new_kf_required = hook
    try:
        sm, params, est, gt = _run(scene, pipelined=True, **overrides)
    finally:
        FrontEnd.check_new_kf_required = orig
    return sm, params, est, gt, [fid for fid, d in rows if d]


@pytest.mark.slow
def test_keyframe_decision_parity_async_vs_sync():
    """Decision-level cadence parity (VERDICT r3): the async keyframe path
    (keyframe program chained off the carry, host f64 gates one frame
    behind) must produce the IDENTICAL keyframe fid sequence as the
    synchronous fused path — not merely a count within a tolerance. The
    f32 TPU/CPU cadence gap this guards against was root-caused to bf16
    matmul noise (PERF.md round 4); on one backend the two scheduling
    modes must agree exactly."""
    scene = make_scene(n_frames=14, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=9)
    _, p_a, est_a, gt, kf_a = _run_kf_decisions(scene, async_keyframe=True)
    _, p_s, est_s, _, kf_s = _run_kf_decisions(scene, async_keyframe=False)
    assert not p_a.reset_required and not p_s.reset_required
    assert len(est_a) == len(gt) and len(est_s) == len(gt)
    assert kf_a == kf_s, f"async {kf_a} vs sync {kf_s}"


@pytest.mark.slow
def test_speculate_keyframes_parity():
    """Speculating THROUGH keyframes (no pipeline drain at a keyframe; the
    keyframe program's output is grafted onto the speculated tip via
    carry_adopt_kf) must keep the trajectory and cadence: new detections
    start 1-2 frames stale — the reference's own mapper-thread lag
    (mapper.jl:37-140)."""
    scene = make_scene(n_frames=14, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=9)
    sm_b, p_b, est_b, gt, kf_b = _run_kf_decisions(
        scene, speculate_keyframes=False)
    sm_x, p_x, est_x, _, kf_x = _run_kf_decisions(
        scene, speculate_keyframes=True)
    assert not p_b.reset_required and not p_x.reset_required
    assert len(est_b) == len(gt) and len(est_x) == len(gt)
    total = np.linalg.norm(gt[-1] - gt[0])
    err_b = ate_rmse(est_b.astype(np.float64), gt, align_scale=False)
    err_x = ate_rmse(est_x.astype(np.float64), gt, align_scale=False)
    assert err_b < 0.15 * total
    assert err_x < 0.15 * total
    assert abs(len(kf_x) - len(kf_b)) <= 2, f"{kf_x} vs {kf_b}"
    # Speculation actually engaged at least once (not a silent fallback).
    assert sm_x.front_end._n_kf_adopts > 0


@pytest.mark.slow
def test_async_keyframe_reset_recovery():
    """Tracking collapse with the async keyframe path live: the reset
    cascade must also discard any dispatched-but-unapplied keyframe
    (SlamManager._pending_kf) alongside the in-flight tracked frames, and
    the pipeline must re-bootstrap cleanly when texture returns."""
    scene = make_scene(n_frames=16, height=160, width=224, n_points=900,
                       stereo=True, baseline=0.5, seed=9)
    params = Params(
        stereo=True, max_nb_keypoints=400, max_distance=24,
        keypoint_capacity=512, initial_parallax=8.0, sequential=True,
        pipelined=True, async_keyframe=True,
        do_local_bundle_adjustment=True,
    )
    saver = ReplaySaver()
    sm = SlamManager(params, scene.camera, right_camera=scene.right_camera,
                     slam_io=saver)
    for i in range(10):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()
    assert params.vision_initialized
    assert sm.map_manager.nb_keyframes >= 2

    blank = np.zeros_like(scene.frame(0)[0])
    sm.add_stereo_image(blank, blank, float(scene.timestamps[10]))
    sm.add_stereo_image(blank, blank, float(scene.timestamps[11]))
    sm.wait()
    assert not params.reset_required        # reset applied and cleared
    assert sm._pending_kf is None           # pending async KF discarded

    # Texture returns: re-bootstrap without crashing.
    for i in range(12, 16):
        left, right = scene.frame(i)
        sm.add_stereo_image(left, right, float(scene.timestamps[i]))
    sm.wait()
    assert not params.reset_required
    assert sm.current_frame.nb_keypoints > 50
