"""Trajectory export and ATE evaluation.

Replaces the reference's SaveTrajectoryTUM / SaveKeyFrameTrajectoryTUM /
SaveTrajectoryKITTI (src/System.cc:323-473) and the external TUM
ATE-evaluation scripts the workflow relies on (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def _pose_to_twc(Tcw: np.ndarray):
    """[3,4] world->camera -> (R_wc, t_wc)."""
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    return R.T, -R.T @ t


def _rot_to_quat(R):
    """Rotation matrix -> (qx, qy, qz, qw), TUM convention."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return qx, qy, qz, qw


def save_tum(path: str, trajectory):
    """Write TUM-format trajectory: `timestamp tx ty tz qx qy qz qw`
    (matching System::SaveKeyFrameTrajectoryTUM output,
    src/System.cc:393-428). trajectory: list of (frame_id, ts, Tcw [3,4])."""
    with open(path, "w") as f:
        for _, ts, Tcw in trajectory:
            R, t = _pose_to_twc(np.asarray(Tcw))
            qx, qy, qz, qw = _rot_to_quat(R)
            f.write(f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")


def save_kitti(path: str, trajectory):
    """KITTI-format: flattened 3x4 T_wc per line (System::SaveTrajectoryKITTI,
    src/System.cc:430-473)."""
    with open(path, "w") as f:
        for _, _, Tcw in trajectory:
            R, t = _pose_to_twc(np.asarray(Tcw))
            T = np.concatenate([R, t[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in T) + "\n")


def ate_rmse(est_trajectory, gt_poses_wc, align_scale: bool = True):
    """Absolute trajectory error after Sim3/SE3 alignment (Horn), the TUM
    benchmark metric used for all reference comparisons (BASELINE.md).

    Args:
      est_trajectory: list of (frame_id, ts, Tcw [3,4]).
      gt_poses_wc: dict frame_id -> camera center [3] (world frame), or
        [N, 3] array aligned by frame index.
      align_scale: True for monocular (scale-free) evaluation.
    Returns (rmse, n_matched).
    """
    est, gt = [], []
    for fid, _, Tcw in est_trajectory:
        if isinstance(gt_poses_wc, dict):
            if fid not in gt_poses_wc:
                continue
            g = gt_poses_wc[fid]
        else:
            if fid >= len(gt_poses_wc):
                continue
            g = gt_poses_wc[fid]
        _, c = _pose_to_twc(np.asarray(Tcw))
        est.append(c)
        gt.append(np.asarray(g))
    if len(est) < 3:
        return float("inf"), len(est)
    P = np.stack(est)     # [N, 3] estimated centers
    Q = np.stack(gt)      # [N, 3] ground-truth centers

    # Horn alignment Q ~ s R P + t
    mp, mq = P.mean(0), Q.mean(0)
    Pc, Qc = P - mp, Q - mq
    W = Qc.T @ Pc
    U, S, Vt = np.linalg.svd(W)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R = U @ D @ Vt
    if align_scale:
        s = (S * np.diag(D)).sum() / max((Pc ** 2).sum(), 1e-12)
    else:
        s = 1.0
    t = mq - s * R @ mp
    err = Q - (s * (P @ R.T) + t)
    return float(np.sqrt((err ** 2).sum(axis=1).mean())), len(est)
