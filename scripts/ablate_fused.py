"""Ablate frontend_step components on captured real inputs.

Times jitted sub-programs with device_get (block_until_ready is a no-op on
the axon backend). Each wall number includes ~30 ms fetch RPC.
Run: python scripts/ablate_fused.py
"""
import pickle
import sys
import time

sys.path.insert(0, ".")

from slamtpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax
import jax.numpy as jnp

from slamtpu.ops.frontend_step import frontend_step, _undistort_backproject
from slamtpu.ops.lucas_kanade import merged_fb
from slamtpu.ops.mvg import essential_ransac
from slamtpu.ops.pnp import p3p_ransac, pnp_refine

with open("/tmp/fused_args.pkl", "rb") as f:
    cap = pickle.load(f)

pyr_prev = jax.device_put(cap["pyr_prev"])
pyr_cur = jax.device_put(cap["pyr_cur"])
args = [jax.device_put(a) for a in cap["args"]]
kw = cap["kwargs"]
(px, valid, is3d_prior, disp_prior, mp_pos, has_mp, join_idx, join_valid,
 prev_und_xy, prev_bearing_xy, R_comp, theta_predicted, intrinsics, dist,
 key) = args
print("kwargs:", kw)
print("n valid:", int(np.asarray(valid).sum()),
      "n prior:", int(np.asarray(is3d_prior).sum()),
      "n join:", int(np.asarray(join_valid).sum()))


def t(name, fn, reps=3):
    _ = jax.device_get(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {1e3 * min(ts):8.1f} ms", flush=True)


# Full fused step.
t("frontend_step FULL", lambda: frontend_step(
    pyr_prev, pyr_cur, *args, **kw))


# LK only (the merged cascade + backward + retry exactly as frontend_step).
@jax.jit
def lk_only(px, valid, is3d_prior, disp_prior):
    prior_mask = valid & is3d_prior
    plain_mask = valid & ~is3d_prior
    cascade, backward = merged_fb(
        pyr_prev, pyr_cur, px, plain_mask, prior_mask, disp_prior,
        levels=kw["levels"], prior_level=1, window=kw["window"],
        iters=kw["iters"], eps=kw["eps"], eig_thresh=kw["eig_thresh"],
        pad=kw["pad"], min_active=kw["min_active"],
    )
    flow_m, ok_m = cascade(plain_mask, prior_mask, disp_prior)
    ok_m = backward(flow_m, ok_m, kw["max_fb_distance"])
    retry_mask = prior_mask & ~ok_m
    flow_r, ok_r = cascade(retry_mask, None, None)
    ok_r = backward(flow_r, ok_r & retry_mask, kw["max_fb_distance"])
    use_retry = retry_mask & ok_r
    new_px = jnp.where(use_retry[:, None], px + flow_r, px + flow_m)
    ok = (ok_m | use_retry) & valid
    return new_px, ok


t("LK cascade+bwd+retry", lambda: lk_only(px, valid, is3d_prior, disp_prior))


@jax.jit
def lk_fwd_only(px, valid, is3d_prior, disp_prior):
    prior_mask = valid & is3d_prior
    plain_mask = valid & ~is3d_prior
    cascade, backward = merged_fb(
        pyr_prev, pyr_cur, px, plain_mask, prior_mask, disp_prior,
        levels=kw["levels"], prior_level=1, window=kw["window"],
        iters=kw["iters"], eps=kw["eps"], eig_thresh=kw["eig_thresh"],
        pad=kw["pad"], min_active=kw["min_active"],
    )
    return cascade(plain_mask, prior_mask, disp_prior)


t("LK forward cascade only", lambda: lk_fwd_only(
    px, valid, is3d_prior, disp_prior))

new_px, ok = lk_only(px, valid, is3d_prior, disp_prior)
new_px = jax.device_put(jax.device_get(new_px))
ok = jax.device_put(jax.device_get(ok))


@jax.jit
def ess_only(new_px, ok):
    und_px, bearings = _undistort_backproject(new_px, intrinsics, dist)
    cur_und = und_px[join_idx]
    cur_bear = bearings[join_idx]
    j_ok = join_valid & ok[join_idx]
    n_par = jnp.sum(j_ok)
    j_order = jnp.argsort(~j_ok)
    return essential_ransac(
        prev_bearing_xy[j_order], cur_bear[j_order][:, :2],
        prev_und_xy[j_order], cur_und[j_order][:, ::-1],
        j_ok[j_order], jnp.maximum(n_par, 1), intrinsics, key,
        hypotheses=kw["essential_hypotheses"], threshold=kw["threshold"],
    )


t("essential_ransac branch", lambda: ess_only(new_px, ok))


@jax.jit
def p3p_only(new_px, ok):
    und_px, bearings = _undistort_backproject(new_px, intrinsics, dist)
    p3p_mask = ok & has_mp
    n_p3p = jnp.sum(p3p_mask)
    bear_unit = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)
    order = jnp.argsort(~p3p_mask)
    key_p3p = jax.random.fold_in(key, 1)
    p3p = p3p_ransac(
        mp_pos[order], und_px[order][:, ::-1], bear_unit[order],
        p3p_mask[order], jnp.maximum(n_p3p, 1), intrinsics, key_p3p,
        hypotheses=kw["pnp_hypotheses"], threshold=kw["threshold"],
    )
    return p3p


t("p3p branch", lambda: p3p_only(new_px, ok))


@jax.jit
def refine_only(new_px, ok):
    und_px, _ = _undistort_backproject(new_px, intrinsics, dist)
    p3p_mask = ok & has_mp
    theta0 = theta_predicted
    return pnp_refine(
        theta0, mp_pos, und_px, p3p_mask, intrinsics,
        iters1=5, iters2=10, repr_eps=kw["threshold"],
    )


t("pnp_refine branch", lambda: refine_only(new_px, ok))
