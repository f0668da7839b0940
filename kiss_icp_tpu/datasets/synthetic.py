"""Procedural synthetic LiDAR sequences (no file dependencies).

No analog in the reference. This loader exists because a TPU framework must be
benchmarkable and testable without multi-GB datasets on disk: it simulates a
spinning multi-beam LiDAR moving through a procedurally generated world
(buildings + ground), with exact ground-truth poses and per-point azimuth
timestamps, so the full pipeline (deskew, ICP, metrics) runs end-to-end
anywhere. Used by bench.py and the e2e tests.

The simulation is rolling-shutter correct: each azimuth column is raycast from
the sensor pose at that instant (constant-velocity interpolation along the
trajectory), and points are reported in the body frame at their capture time —
exactly the distortion the deskewing step (reference Preprocessing.cpp:58-84)
exists to undo. `gt_poses[i]` is the END-of-scan pose of scan i, matching the
deskew-toward-scan-end convention `exp((t-1)*omega)`.
"""

from __future__ import annotations

import numpy as np


def _hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def _se3_log(t):
    """4x4 -> twist [v, w] (closed form, small-angle safe)."""
    r = t[:3, :3]
    cos_theta = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    skew = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    if theta < 1e-8:
        w = skew / 2.0
        v_inv = np.eye(3)
    else:
        w = theta / (2.0 * np.sin(theta)) * skew
        half = theta / 2.0
        coeff = (1.0 - half * np.cos(half) / np.sin(half)) / (theta * theta)
        v_inv = np.eye(3) - 0.5 * _hat(w) + coeff * (_hat(w) @ _hat(w))
    v = v_inv @ t[:3, 3]
    return np.concatenate([v, w])


def _se3_exp_batch(twist: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """exp(scale_k * twist) for many scalar scales -> (K, 4, 4) (Rodrigues)."""
    tw = scales[:, None] * twist[None, :]
    v, w = tw[:, :3], tw[:, 3:]
    theta = np.linalg.norm(w, axis=1)
    k = np.zeros((len(tw), 3, 3))
    k[:, 0, 1], k[:, 0, 2] = -w[:, 2], w[:, 1]
    k[:, 1, 0], k[:, 1, 2] = w[:, 2], -w[:, 0]
    k[:, 2, 0], k[:, 2, 1] = -w[:, 1], w[:, 0]
    with np.errstate(invalid="ignore", divide="ignore"):
        a = np.where(theta > 1e-8, np.sin(theta) / theta, 1.0 - theta**2 / 6)
        b = np.where(theta > 1e-8, (1 - np.cos(theta)) / theta**2, 0.5)
        c = np.where(theta > 1e-8, (1 - a) / theta**2, 1.0 / 6.0)
    k2 = k @ k
    eye = np.tile(np.eye(3), (len(tw), 1, 1))
    rot = eye + a[:, None, None] * k + b[:, None, None] * k2
    vmat = eye + b[:, None, None] * k + c[:, None, None] * k2
    out = np.tile(np.eye(4), (len(tw), 1, 1))
    out[:, :3, :3] = rot
    out[:, :3, 3] = np.einsum("kij,kj->ki", vmat, v)
    return out


def _terrain_height(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Gentle terrain height field (slopes < ~0.1). A perfectly flat plane
    would let the scan's ground rings re-match themselves at zero motion and
    cancel the walls' pull ("ring lock") — real roads always have crown,
    curvature, and texture, and this models that."""
    return (
        0.4 * np.sin(0.09 * x) * np.cos(0.075 * y)
        + 0.25 * np.sin(0.031 * x + 1.0)
        + 0.2 * np.cos(0.043 * y + 2.0)
        # Fine-scale roughness (asphalt/grass): breaks the coherence of the
        # scan's ground rings, which on smooth ground drag the estimate back
        # toward zero motion by ~half the ground mass.
        + 0.08 * np.sin(0.9 * x) * np.sin(0.83 * y + 0.5)
        + 0.05 * np.cos(1.7 * x + 0.3) * np.sin(1.3 * y)
    )


def _make_world(rng: np.random.Generator, trajectory_xy: np.ndarray,
                n_buildings: int, n_posts: int):
    """(lo, hi) axis-aligned boxes: buildings offset from the trajectory plus
    small posts (street furniture) close to the path, so unambiguous features
    exist within sensor range along the whole drive."""
    boxes = []
    n_anchor = len(trajectory_xy)
    for _ in range(n_buildings):
        anchor = trajectory_xy[rng.integers(0, n_anchor)]
        c = anchor + rng.uniform(-60.0, 60.0, 2)
        half = rng.uniform(4.0, 14.0, 2)
        h = rng.uniform(4.0, 18.0)
        z0 = _terrain_height(np.array([c[0]]), np.array([c[1]]))[0]
        boxes.append(
            (
                np.array([c[0] - half[0], c[1] - half[1], z0 - 1.0]),
                np.array([c[0] + half[0], c[1] + half[1], z0 + h]),
            )
        )
    for _ in range(n_posts):
        anchor = trajectory_xy[rng.integers(0, n_anchor)]
        c = anchor + rng.uniform(-18.0, 18.0, 2)
        half = rng.uniform(0.15, 0.5, 2)
        h = rng.uniform(1.0, 4.0)
        z0 = _terrain_height(np.array([c[0]]), np.array([c[1]]))[0]
        boxes.append(
            (
                np.array([c[0] - half[0], c[1] - half[1], z0 - 0.5]),
                np.array([c[0] + half[0], c[1] + half[1], z0 + h]),
            )
        )
    return boxes


class SyntheticDataset:
    """Spinning LiDAR through a procedural city block, motion-distorted.

    `data_dir` is ignored (factory compatibility); `sequence` seeds world and
    trajectory. `distort=False` renders idealized static snapshots with no
    per-point timestamps (like KITTI odometry's pre-deskewed scans).
    """

    def __init__(
        self,
        data_dir=None,
        sequence=0,
        *_,
        n_scans: int = 100,
        n_beams: int = 64,
        n_azimuth: int = 1024,
        max_range: float = 100.0,
        speed: float = 1.0,
        accel_frames: int = 10,
        distort: bool = True,
        noise: float = 0.02,
        **__,
    ):
        seq = int(sequence) if str(sequence).isdigit() else 0
        self.sequence_id = f"synthetic_{seq:02d}"
        self._n_scans = n_scans
        self._n_beams = n_beams
        self._n_azimuth = n_azimuth
        self._max_range = max_range
        self._distort = distort
        self._noise = noise
        rng = np.random.default_rng(1234 + seq)
        self._noise_seed = 5678 + seq

        # Smooth wandering trajectory; gt_poses[i] = END-of-scan-i pose.
        # The vehicle accelerates from standstill (like every real benchmark
        # sequence): voxel-hash NN search reaches only adjacent voxels, so a
        # cold-start jump of a full cruise-speed frame could never latch —
        # in the reference either (VoxelHashMap.cpp:46-70 neighborhood).
        self.gt_poses = np.tile(np.eye(4), (n_scans, 1, 1))
        pose = np.eye(4)
        heading = 0.0
        for i in range(n_scans):
            self.gt_poses[i] = pose
            v = speed * min(1.0, (i + 1) / max(accel_frames, 1))
            heading_rate = 0.02 * np.sin(i * 0.05) * (v / max(speed, 1e-9))
            heading += heading_rate
            yaw = np.array(
                [
                    [np.cos(heading_rate), -np.sin(heading_rate), 0],
                    [np.sin(heading_rate), np.cos(heading_rate), 0],
                    [0, 0, 1],
                ]
            )
            step = np.array([v * np.cos(heading), v * np.sin(heading), 0.0])
            new_pose = pose.copy()
            new_pose[:3, :3] = pose[:3, :3] @ yaw
            new_pose[:3, 3] = pose[:3, 3] + step
            pose = new_pose
        # Vehicle follows the terrain height. Rendering uses the world-frame
        # poses; the exposed gt_poses are re-based to the first pose (every
        # reference loader does the same, e.g. mulran.py:80-81).
        xy = self.gt_poses[:, :2, 3]
        self.gt_poses[:, 2, 3] = _terrain_height(xy[:, 0], xy[:, 1])
        self._render_poses = self.gt_poses
        self.gt_poses = np.linalg.inv(self._render_poses[0]) @ self._render_poses

        self._boxes = _make_world(
            rng, trajectory_xy=xy, n_buildings=60, n_posts=140
        )

        # Precompute the body-frame ray directions (beams x azimuth).
        az = np.linspace(0, 2 * np.pi, n_azimuth, endpoint=False)
        elev = np.deg2rad(np.linspace(-24.0, 2.0, n_beams))
        az_g, el_g = np.meshgrid(az, elev)
        az_f, el_f = az_g.ravel(), el_g.ravel()
        self._dirs_body = np.stack(
            [np.cos(el_f) * np.cos(az_f), np.cos(el_f) * np.sin(az_f), np.sin(el_f)],
            axis=1,
        )
        self._stamps = az_f / (2 * np.pi)  # azimuth time in [0, 1)

    def __len__(self):
        return self._n_scans

    def _raycast(self, origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        """Per-ray ranges against the terrain height field + building AABBs."""
        n = dirs.shape[0]
        t_hit = np.full(n, self._max_range + 1.0)

        # Terrain: fixed-point iteration of o_z + t d_z = h(o_xy + t d_xy);
        # converges in a few steps for |grad h| << |d_z/d_xy| slopes.
        dz = dirs[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ground = (_terrain_height(origins[:, 0], origins[:, 1]) - origins[:, 2]) / dz
            for _ in range(6):
                gx = origins[:, 0] + t_ground * dirs[:, 0]
                gy = origins[:, 1] + t_ground * dirs[:, 1]
                t_ground = (_terrain_height(gx, gy) - origins[:, 2]) / dz
        ok = (dz < -1e-6) & (t_ground > 0.1) & np.isfinite(t_ground)
        t_hit = np.where(ok, np.minimum(t_hit, t_ground), t_hit)

        for lo, hi in self._boxes:
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = (lo[None, :] - origins) / dirs
                t2 = (hi[None, :] - origins) / dirs
            tmin = np.nanmax(np.minimum(t1, t2), axis=1)
            tmax = np.nanmin(np.maximum(t1, t2), axis=1)
            hit = (tmax >= tmin) & (tmin > 0.1)
            t_hit = np.where(hit, np.minimum(t_hit, tmin), t_hit)
        return t_hit

    def _poses_during_scan(self, idx: int) -> np.ndarray:
        """Sensor pose at each azimuth stamp: T_i @ exp((t-1) * log(delta))."""
        t_end = self._render_poses[idx]
        if idx == 0 or not self._distort:
            return np.tile(t_end, (len(self._stamps), 1, 1))
        delta = np.linalg.inv(self._render_poses[idx - 1]) @ t_end
        omega = _se3_log(delta)
        local = _se3_exp_batch(omega, self._stamps - 1.0)
        return t_end[None, :, :] @ local

    def __getitem__(self, idx):
        poses = self._poses_during_scan(idx)  # (R, 4, 4) world_T_body(t)
        sensor_off = np.array([0.0, 0.0, 1.8])
        origins = poses[:, :3, 3] + poses[:, :3, :3] @ sensor_off
        dirs_world = np.einsum("rij,rj->ri", poses[:, :3, :3], self._dirs_body)

        t = self._raycast(origins, dirs_world)
        rng = np.random.default_rng(self._noise_seed + idx)
        t = t + rng.normal(0.0, self._noise, size=t.shape)
        hit = t < self._max_range

        # Report each point in the BODY frame at its capture time, sensor
        # offset included — exactly what a real driver outputs.
        points_body = self._dirs_body[hit] * t[hit, None] + sensor_off
        if not self._distort:
            return points_body.astype(np.float64), np.array([])
        return points_body.astype(np.float64), self._stamps[hit].astype(np.float64)
