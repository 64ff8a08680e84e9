#!/usr/bin/env python
"""Pose-correcting BA on a depth-diverse turn window (VERDICT r3 item 5b).

Every prior pose-correction measurement used short deep-scene windows
where the monocular scale direction is weakly observable and the solve
slides (RESULTS r2/r3). This builds the window the judge asked for:
keyframes SPANNING A TURN (the corridor fixture's yaw profile) with
landmarks across the full depth range, realistic odometry noise on the
poses, and measures whether pose write-back beats structure-only.

Protocol per trial:
  - GT: P keyframes through a turn (make_scene yaw profile), L
    landmarks from the corridor depth range, pixel obs + 0.3 px noise;
  - perturb: rotations ~0.15 deg, translations ~1.5% of spacing
    (accumulating, like odometry drift), landmarks from two-view
    triangulation of the PERTURBED poses (what the live map holds);
  - solve: (a) structure-only write-back, (b) pose correction with the
    radial scale prior; gauge = two oldest poses fixed (ba/solver.py);
  - report: mean pose translation error of the free poses before/after,
    and landmark RMS error before/after.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from visualodometry_tpu.ba.solver import BAProblem, ba_solve
from visualodometry_tpu.geometry.se3 import se3_inverse
from visualodometry_tpu.geometry.so3 import so3_exp

K = np.array(
    [[718.856, 0, 607.1928], [0, 718.856, 185.2157], [0, 0, 1]], np.float32
)


def make_turn_window(rng, P=8, L=768, spacing=1.2, peak_yaw=0.012):
    """GT poses through a turn + depth-diverse landmarks + observations."""
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for f in range(P):
        R = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ]
        )
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        poses.append(T)
        heading = R @ np.array([0.0, 0.0, 1.0])
        pos = pos + spacing * heading
        yaw += peak_yaw * np.sin(np.pi * f / P) * spacing * 4
    T_wc = np.stack(poses).astype(np.float32)

    # landmarks: corridor walls/ground, depths 5-60 in front of mid pose
    mid = T_wc[P // 2]
    depth = rng.uniform(5, 60, L)
    lx = rng.uniform(-14, 14, L)
    ly = rng.uniform(-1.5, 2.0, L)
    pc = np.stack([lx, ly, depth], 1)
    X = pc @ mid[:3, :3].T + mid[:3, 3]

    T_cw = np.stack([np.linalg.inv(T) for T in T_wc]).astype(np.float32)
    pcam = np.einsum("pij,lj->lpi", T_cw[:, :3, :3], X) + T_cw[:, :3, 3]
    z = pcam[..., 2]
    uv = pcam[..., :2] / np.maximum(z[..., None], 1e-6) * [
        K[0, 0],
        K[1, 1],
    ] + [K[0, 2], K[1, 2]]
    mask = (
        (z > 1.0)
        & (uv[..., 0] > 0)
        & (uv[..., 0] < 1226)
        & (uv[..., 1] > 0)
        & (uv[..., 1] < 370)
    )
    uv = uv + rng.normal(0, 0.3, uv.shape)
    return T_wc.astype(np.float32), X.astype(np.float32), uv.astype(
        np.float32
    ), mask


def perturb_poses(rng, T_wc, rot_deg=0.15, trans_frac=0.015, spacing=1.2):
    """Accumulating odometry-like noise; first two poses exact (gauge)."""
    P = len(T_wc)
    out = T_wc.copy()
    dR = np.eye(3)
    dt = np.zeros(3)
    for p in range(2, P):
        w = np.radians(rot_deg) * rng.standard_normal(3)
        dR = dR @ np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        dt = dt + trans_frac * spacing * rng.standard_normal(3)
        out[p, :3, :3] = dR @ T_wc[p, :3, :3]
        out[p, :3, 3] = T_wc[p, :3, 3] + dt
    return out


def triangulate_noisy(T_wc_noisy, uv, mask):
    """Landmarks as the live map would hold them: two-view DLT from the
    PERTURBED poses (first/last observing keyframes)."""
    from visualodometry_tpu.config import VOConfig
    from visualodometry_tpu.geometry.triangulation import (
        triangulate_points,
    )

    cfg = VOConfig(min_depth=0.5, max_reproj_err=1e9)

    L, P = mask.shape
    first = np.argmax(mask, axis=1)
    last = P - 1 - np.argmax(mask[:, ::-1], axis=1)
    T_cw = np.stack([np.linalg.inv(T) for T in T_wc_noisy]).astype(
        np.float32
    )
    Kj = jnp.asarray(K)
    X = np.zeros((L, 3), np.float32)
    for l in range(L):
        a, b = first[l], last[l]
        if a == b:
            continue
        Xl, _ = triangulate_points(
            jnp.asarray(T_cw[a]),
            jnp.asarray(T_cw[b]),
            jnp.asarray(uv[l, a][None]),
            jnp.asarray(uv[l, b][None]),
            Kj,
            cfg,
        )
        X[l] = np.asarray(Xl)[0]
    return X


def trial(rng, pose_corr: bool, scale_prior: float):
    T_wc, X_gt, uv, mask = make_turn_window(rng)
    T_noisy = perturb_poses(rng, T_wc)
    X_map = triangulate_noisy(T_noisy, uv, mask)
    ok = np.isfinite(X_map).all(1) & (np.linalg.norm(X_map - X_gt, axis=1) < 20)
    prob = BAProblem(
        T_cw=jnp.asarray(
            np.stack([np.linalg.inv(T) for T in T_noisy], 0), jnp.float32
        ),
        X=jnp.asarray(X_map),
        uv=jnp.asarray(uv.astype(np.float32)),
        mask=jnp.asarray(mask & ok[:, None]),
        K=jnp.asarray(K),
    )
    solved = ba_solve(
        prob, iters=10, damping=1e-4, scale_prior_rel=scale_prior
    )
    T_ref = np.stack(
        [np.asarray(se3_inverse(t)) for t in solved.T_cw], 0
    )
    pe_before = np.linalg.norm(
        T_noisy[2:, :3, 3] - T_wc[2:, :3, 3], axis=1
    ).mean()
    pe_after = np.linalg.norm(
        T_ref[2:, :3, 3] - T_wc[2:, :3, 3], axis=1
    ).mean()
    le_before = np.linalg.norm(
        np.asarray(prob.X)[ok] - X_gt[ok], axis=1
    ).mean()
    le_after = np.linalg.norm(
        np.asarray(solved.X)[ok] - X_gt[ok], axis=1
    ).mean()
    return pe_before, pe_after, le_before, le_after


def main():
    for label, sp in (("no prior   ", 0.0), ("prior 2%   ", 0.02)):
        pb, pa, lb, la = [], [], [], []
        for s in range(8):
            rng = np.random.default_rng(100 + s)
            r = trial(rng, True, sp)
            pb.append(r[0]); pa.append(r[1]); lb.append(r[2]); la.append(r[3])
        print(
            f"pose-corr {label}: pose err {np.mean(pb):.4f} -> "
            f"{np.mean(pa):.4f} m | landmark err {np.mean(lb):.3f} -> "
            f"{np.mean(la):.3f} m  (8 trials)"
        )


if __name__ == "__main__":
    main()
