"""Decompose fe.fused.dispatch (uploads vs jit call) and fetch (exec vs
RPC) in the live pipeline. Run: python scripts/probe_fused.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import slamtpu.models.front_end as fe_mod
from slamtpu.utils.padding import pad_rows, valid_mask

orig = fe_mod.FrontEnd._dispatch_fused


def probed(self, frame, prev_kf):
    from slamtpu.ops.frontend_step import frontend_step
    import slamtpu.hostmath as hm

    p = self.params
    cap = p.keypoint_capacity
    mm = self.map_manager
    scale3d = 0.5

    t0 = time.perf_counter()
    ids, px, is3d_prior, disp, mp_pos, has_mp, attempted = (
        [], [], [], [], [], [], []
    )
    for kp in list(frame.keypoints.values()):
        mp = mm.map_points.get(kp.id) if kp.is_3d else None
        if kp.is_3d and mp is None:
            mm.remove_mappoint_obs(kp.id, frame.kfid)
            continue
        ids.append(kp.id)
        px.append(kp.pixel)
        if kp.is_3d:
            position = mp.get_position()
            projection = frame.project_world_to_image_distort(position)
            if frame.in_image(projection):
                is3d_prior.append(True)
                disp.append(scale3d * (projection - kp.pixel))
                attempted.append(True)
            else:
                is3d_prior.append(False)
                disp.append(np.zeros(2))
                attempted.append(False)
            mp_pos.append(position)
            has_mp.append(True)
        else:
            is3d_prior.append(False)
            disp.append(np.zeros(2))
            attempted.append(True)
            mp_pos.append(np.zeros(3))
            has_mp.append(False)
    n = len(ids)
    id_to_slot = {kpid: i for i, kpid in enumerate(ids)}
    join_ids, join_idx, prev_und, prev_bear = [], [], [], []
    for kpid, pkp in prev_kf.keypoints.items():
        slot = id_to_slot.get(kpid)
        if slot is None or not attempted[slot]:
            continue
        if len(join_ids) >= cap:
            break
        join_ids.append(kpid)
        join_idx.append(slot)
        prev_und.append(pkp.undistorted_pixel[::-1])
        prev_bear.append(pkp.position[:2])
    m = len(join_ids)
    valid_n = valid_mask(n, cap)
    attempted_arr = np.zeros((cap,), bool)
    attempted_arr[:n] = attempted
    R_comp = (prev_kf.get_Rcw() @ frame.get_Rwc()).astype(np.float32)
    theta_pred = hm.pose_to_theta(frame.cw).astype(np.float32)
    t1 = time.perf_counter()

    args = (
        jnp.asarray(pad_rows(px, cap, np.float32)),
        jnp.asarray(valid_n & attempted_arr),
        jnp.asarray(pad_rows(np.asarray(is3d_prior, bool), cap)),
        jnp.asarray(pad_rows(disp, cap, np.float32)),
        jnp.asarray(pad_rows(mp_pos, cap, np.float32)),
        jnp.asarray(pad_rows(np.asarray(has_mp, bool), cap)),
        jnp.asarray(pad_rows(np.asarray(join_idx, np.int32), cap)
                    if m else np.zeros((cap,), np.int32)),
        jnp.asarray(valid_mask(m, cap)),
        jnp.asarray(pad_rows(prev_und, cap, np.float32) if m else
                    np.zeros((cap, 2), np.float32)),
        jnp.asarray(pad_rows(prev_bear, cap, np.float32) if m else
                    np.zeros((cap, 2), np.float32)),
        jnp.asarray(R_comp),
        jnp.asarray(theta_pred),
    )
    t2 = time.perf_counter()
    jax.block_until_ready(args)
    t3 = time.perf_counter()
    jax.block_until_ready((self.previous_pyramid, self.current_pyramid))
    t4 = time.perf_counter()
    res = frontend_step(
        self.previous_pyramid, self.current_pyramid, *args,
        self._intrinsics, self._distortion, self._ransac_key(2),
        levels=p.pyramid_levels, window=p.window_size,
        iters=p.lk_iterations, eps=p.lk_epsilon,
        eig_thresh=p.lk_eigenvalue_threshold, pad=self._pad,
        max_fb_distance=p.max_ktl_distance,
        essential_hypotheses=p.ransac_essential_hypotheses,
        pnp_hypotheses=p.ransac_pnp_hypotheses,
        threshold=p.max_reprojection_error,
        min_active=p.lk_min_active,
    )
    t5 = time.perf_counter()
    jax.block_until_ready(res)
    t6 = time.perf_counter()
    res = jax.device_get(res)
    t7 = time.perf_counter()
    print(
        f"[fused] host={1e3*(t1-t0):6.1f} upload={1e3*(t2-t1):6.1f} "
        f"upwait={1e3*(t3-t2):6.1f} pyrwait={1e3*(t4-t3):6.1f} "
        f"call={1e3*(t5-t4):6.1f} exec={1e3*(t6-t5):7.1f} "
        f"get={1e3*(t7-t6):6.1f} ms",
        flush=True,
    )
    return res, ids, attempted, has_mp, join_ids


fe_mod.FrontEnd._dispatch_fused = probed

from slamtpu import Params, SlamManager, ReplaySaver
from slamtpu.datasets.synthetic import make_scene

scene = make_scene(n_frames=14, height=376, width=1241, n_points=6000,
                   stereo=True, baseline=0.54, seed=7)
saver = ReplaySaver()
sm = SlamManager(Params(stereo=True), scene.camera,
                 right_camera=scene.right_camera, slam_io=saver)
for i in range(len(scene)):
    l, r = scene.frame(i)
    f0 = time.perf_counter()
    sm.add_stereo_image(l, r, float(scene.timestamps[i]))
    print(f"frame {i}: {1e3*(time.perf_counter()-f0):7.1f} ms", flush=True)
sm.finish()
