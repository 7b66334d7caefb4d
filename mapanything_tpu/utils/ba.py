"""Bundle adjustment, pure jax (Levenberg-Marquardt + Schur complement).

TPU-native replacement for the reference's pycolmap BA stage
(scripts/demo_colmap.py:483-486: batch_np_matrix_to_pycolmap +
pycolmap.bundle_adjustment). Refines per-frame poses, shared pinhole
intrinsics, and 3D points against 2D tracks:

  * residuals: Huber-weighted reprojection error of every (frame, point)
    observation, masked by track visibility;
  * Jacobians: autodiff (jacfwd) vmapped over observations — no hand
    derivatives to maintain;
  * solver: the standard BA Schur trick. The Hessian is [[B, E], [E^T, C]]
    with C block-diagonal (3x3 per point); points are eliminated
    analytically and only the small camera system (6F + 4 unknowns) is
    solved densely. All dense algebra is MXU work; the LM loop is a
    lax.while_loop (one jit, no host round-trips).

Parameterization: cam-from-world rotation as a quaternion increment
applied to a base quaternion (xyzw), translation, shared (fx, fy, cx, cy).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _quat_mul(q1, q2):
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def _quat_rotate(q, v):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    uv = jnp.stack([
        y * v[..., 2] - z * v[..., 1],
        z * v[..., 0] - x * v[..., 2],
        x * v[..., 1] - y * v[..., 0],
    ], axis=-1)
    uuv = jnp.stack([
        y * uv[..., 2] - z * uv[..., 1],
        z * uv[..., 0] - x * uv[..., 2],
        x * uv[..., 1] - y * uv[..., 0],
    ], axis=-1)
    return v + 2.0 * (w[..., None] * uv + uuv)


def _axis_angle_quat(a):
    """Small-angle rotation vector -> unit quaternion (xyzw)."""
    theta2 = jnp.sum(a * a, axis=-1, keepdims=True)
    w = 1.0 - theta2 / 8.0  # 2nd-order cos(theta/2)
    xyz = a * (0.5 - theta2 / 48.0)  # 2nd-order sin(theta/2)/theta
    q = jnp.concatenate([xyz, w], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


class BAProblem(NamedTuple):
    tracks: jnp.ndarray      # (F, P, 2) observed (x, y) pixels
    track_mask: jnp.ndarray  # (F, P) bool
    base_quats: jnp.ndarray  # (F, 4) cam-from-world xyzw
    base_trans: jnp.ndarray  # (F, 3)
    intrinsics: jnp.ndarray  # (4,) fx fy cx cy (shared)
    points: jnp.ndarray      # (P, 3) world


def _project(cam_rot_vec, cam_dt, base_q, base_t, intr, pt):
    """One observation: world point -> pixel (x, y)."""
    q = _quat_mul(_axis_angle_quat(cam_rot_vec), base_q)
    pc = _quat_rotate(q, pt) + base_t + cam_dt
    z = jnp.maximum(pc[2], 1e-6)
    fx, fy, cx, cy = intr
    return jnp.stack([fx * pc[0] / z + cx, fy * pc[1] / z + cy])


def _residual(cam6, intr, pt, base_q, base_t, obs):
    return _project(cam6[:3], cam6[3:6], base_q, base_t, intr, pt) - obs


def _huber_weight(r, delta):
    nrm = jnp.linalg.norm(r) + 1e-12
    return jnp.sqrt(jnp.where(nrm <= delta, 1.0, delta / nrm))


@functools.partial(jax.jit, static_argnames=("iters", "optimize_intrinsics"))
def bundle_adjust(
    problem: BAProblem,
    iters: int = 20,
    huber_px: float = 2.0,
    lm_init: float = 1e-3,
    optimize_intrinsics: bool = True,
):
    """Run LM bundle adjustment.

    Returns dict with refined quats/trans/intrinsics/points and the masked
    RMS reprojection error before/after.
    """
    F, P, _ = problem.tracks.shape
    camdim = 6 * F + 4

    base_q = problem.base_quats
    mask = problem.track_mask.astype(jnp.float32)

    def residuals_all(cam_flat, intr, points):
        cams = cam_flat.reshape(F, 6)

        def per_obs(f, p):
            return _residual(cams[f], intr, points[p], base_q[f],
                             problem.base_trans[f], problem.tracks[f, p])

        fs = jnp.arange(F)
        ps = jnp.arange(P)
        r = jax.vmap(lambda f: jax.vmap(lambda p: per_obs(f, p))(ps))(fs)
        return r  # (F, P, 2)

    def masked_rms(r):
        w = mask[..., None]
        return jnp.sqrt(jnp.sum(r * r * w) / jnp.maximum(jnp.sum(w) * 2, 1.0))

    cam0 = jnp.zeros((F, 6), jnp.float32).reshape(-1)
    intr0 = problem.intrinsics.astype(jnp.float32)
    pts0 = problem.points.astype(jnp.float32)
    r0 = residuals_all(cam0, intr0, pts0)
    rms_before = masked_rms(r0)

    def jacobians(cam_flat, intr, points):
        """Per-observation Jacobians wrt (own cam 6 + intr 4) and point 3."""
        cams = cam_flat.reshape(F, 6)

        def one(f, p):
            def res_c(cam6, intr_):
                return _residual(cam6, intr_, points[p], base_q[f],
                                 problem.base_trans[f],
                                 problem.tracks[f, p])

            def res_x(pt):
                return _residual(cams[f], intr, pt, base_q[f],
                                 problem.base_trans[f],
                                 problem.tracks[f, p])

            jc, ji = jax.jacfwd(res_c, argnums=(0, 1))(cams[f], intr)
            jx = jax.jacfwd(res_x)(points[p])
            return jc, ji, jx  # (2,6), (2,4), (2,3)

        fs = jnp.arange(F)
        ps = jnp.arange(P)
        return jax.vmap(
            lambda f: jax.vmap(lambda p: one(f, p))(ps)
        )(fs)  # (F,P,2,6), (F,P,2,4), (F,P,2,3)

    def lm_step(state):
        cam, intr, pts, lam, it = state
        r = residuals_all(cam, intr, pts)  # (F,P,2)
        hw = jax.vmap(jax.vmap(lambda rr: _huber_weight(rr, huber_px)))(r)
        w = (mask * hw)[..., None]  # (F,P,1)
        rw = r * w
        jc, ji, jx = jacobians(cam, intr, pts)
        if not optimize_intrinsics:
            ji = ji * 0.0
        jc = jc * w[..., None]
        ji = ji * w[..., None]
        jx = jx * w[..., None]

        # Camera block B: block-diagonal per frame (6x6) + intr coupling.
        # Assemble the full (camdim, camdim) dense system — small.
        # Per-frame cam-cam blocks
        Bcc = jnp.einsum("fpri,fprj->fij", jc, jc)  # (F,6,6)
        Bci = jnp.einsum("fpri,fprj->fij", jc, ji)  # (F,6,4)
        Bii = jnp.einsum("fpri,fprj->ij", ji, ji)   # (4,4)
        # point blocks
        Cpp = jnp.einsum("fpri,fprj->pij", jx, jx)  # (P,3,3)
        # cam-point couplings
        Ecp = jnp.einsum("fpri,fprj->fpij", jc, jx)  # (F,P,6,3)
        Eip = jnp.einsum("fpri,fprj->pij", ji, jx)   # (P,4,3)
        # gradients
        gc = -jnp.einsum("fpri,fpr->fi", jc, rw)  # (F,6)
        gi = -jnp.einsum("fpri,fpr->i", ji, rw)   # (4,)
        gx = -jnp.einsum("fpri,fpr->pi", jx, rw)  # (P,3)

        # LM damping
        Cpp_d = Cpp + lam * jnp.eye(3)[None] * (
            jnp.ones((P, 1, 1))
            * jnp.maximum(jax.vmap(jnp.diag)(Cpp).mean(-1), 1e-6)[:, None, None]
        )
        Cinv = jnp.linalg.inv(Cpp_d)  # (P,3,3)

        # Schur complement onto cameras: S = B - E Cinv E^T
        # cam-cam (same frame only couples via shared points across frames):
        # S_cc[f,g] = sum_p Ecp[f,p] Cinv[p] Ecp[g,p]^T
        EC = jnp.einsum("fpij,pjk->fpik", Ecp, Cinv)  # (F,P,6,3)
        Scc = -jnp.einsum("fpik,gpjk->fgij", EC, Ecp)  # (F,F,6,6)
        Scc = Scc.at[jnp.arange(F), jnp.arange(F)].add(Bcc)
        Sci = Bci - jnp.einsum("fpik,pjk->fij", EC, Eip)  # (F,6,4)
        EiC = jnp.einsum("pij,pjk->pik", Eip, Cinv)  # (P,4,3)
        Sii = Bii - jnp.einsum("pik,pjk->ij", EiC, Eip)  # (4,4)
        # rhs
        vc = gc - jnp.einsum("fpik,pk->fi", EC, gx)  # (F,6)
        vi = gi - jnp.einsum("pik,pk->i", EiC, gx)   # (4,)

        # dense assemble (camdim x camdim)
        S = jnp.zeros((camdim, camdim), jnp.float32)
        Scc_f = Scc.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
        S = S.at[: 6 * F, : 6 * F].set(Scc_f)
        S = S.at[: 6 * F, 6 * F :].set(Sci.reshape(6 * F, 4))
        S = S.at[6 * F :, : 6 * F].set(Sci.reshape(6 * F, 4).T)
        S = S.at[6 * F :, 6 * F :].set(Sii)
        v = jnp.concatenate([vc.reshape(-1), vi])
        # camera damping
        S = S + lam * jnp.diag(jnp.maximum(jnp.diag(S), 1e-6))

        delta_cam = jnp.linalg.solve(S, v)  # (camdim,)
        dc = delta_cam[: 6 * F].reshape(F, 6)
        di = delta_cam[6 * F :]
        # back-substitute points: dx = Cinv (gx - E^T dc - Eip^T di)
        rhs_x = gx - jnp.einsum("fpij,fi->pj", Ecp, dc) \
            - jnp.einsum("pij,i->pj", Eip, di)
        dx = jnp.einsum("pij,pj->pi", Cinv, rhs_x)

        cam_new = cam + dc.reshape(-1)
        intr_new = intr + di
        pts_new = pts + dx

        new_cost = masked_rms(residuals_all(cam_new, intr_new, pts_new))
        old_cost = masked_rms(r)
        improved = new_cost < old_cost
        cam = jnp.where(improved, cam_new, cam)
        intr = jnp.where(improved, intr_new, intr)
        pts = jnp.where(improved, pts_new, pts)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return cam, intr, pts, lam, it + 1

    def cond(state):
        return state[4] < iters

    cam, intr, pts, _, _ = jax.lax.while_loop(
        cond, lm_step, (cam0, intr0, pts0, jnp.asarray(lm_init), 0)
    )

    rms_after = masked_rms(residuals_all(cam, intr, pts))
    cams = cam.reshape(F, 6)
    quats = _quat_mul(_axis_angle_quat(cams[:, :3]), base_q)
    trans = problem.base_trans + cams[:, 3:6]
    return {
        "cam_quats": quats,          # cam-from-world xyzw
        "cam_trans": trans,
        "intrinsics": intr,
        "points": pts,
        "rms_before": rms_before,
        "rms_after": rms_after,
    }
