"""Procedural synthetic LiDAR sequences (no file dependencies).

No analog in the reference. This loader exists because a TPU framework must be
benchmarkable and testable without multi-GB datasets on disk: it simulates a
spinning 64-beam LiDAR moving through a procedurally generated world
(buildings + ground + poles), with exact ground-truth poses and per-point
azimuth timestamps, so the full pipeline (deskew, ICP, metrics) can run
end-to-end anywhere. Used by bench.py and the e2e tests.
"""

from __future__ import annotations

import numpy as np


def _make_world(rng: np.random.Generator, extent: float, n_buildings: int):
    """Return a list of (center2d, half_sizes2d, height) axis-aligned buildings."""
    buildings = []
    for _ in range(n_buildings):
        c = rng.uniform(-extent, extent, 2)
        half = rng.uniform(4.0, 14.0, 2)
        h = rng.uniform(4.0, 18.0)
        buildings.append((c, half, h))
    return buildings


class SyntheticDataset:
    """64-beam spinning LiDAR through a procedural city block.

    Args mirror the loader convention: `data_dir` is ignored (kept for factory
    compatibility); `sequence` seeds the world and trajectory.
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
        **__,
    ):
        seq = int(sequence) if str(sequence).isdigit() else 0
        self.sequence_id = f"synthetic_{seq:02d}"
        self._n_scans = n_scans
        self._n_beams = n_beams
        self._n_azimuth = n_azimuth
        self._max_range = max_range
        rng = np.random.default_rng(1234 + seq)
        self._buildings = _make_world(rng, extent=120.0, n_buildings=60)
        self._noise_rng_seed = 5678 + seq

        # Smooth wandering trajectory with exact GT.
        self.gt_poses = np.tile(np.eye(4), (n_scans, 1, 1))
        pose = np.eye(4)
        heading = 0.0
        for i in range(n_scans):
            self.gt_poses[i] = pose
            heading_rate = 0.02 * np.sin(i * 0.05)
            heading += heading_rate
            c, s = np.cos(heading), np.sin(heading)
            delta = np.eye(4)
            delta[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]) @ pose[:3, :3].T @ pose[:3, :3]
            step = np.array([speed * c, speed * s, 0.0])
            new_pose = pose.copy()
            yaw = np.array([[np.cos(heading_rate), -np.sin(heading_rate), 0],
                            [np.sin(heading_rate), np.cos(heading_rate), 0],
                            [0, 0, 1]])
            new_pose[:3, :3] = pose[:3, :3] @ yaw
            new_pose[:3, 3] = pose[:3, 3] + step
            pose = new_pose

    def __len__(self):
        return self._n_scans

    def _raycast(self, origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        """Ranges of rays from origin against ground plane + building AABBs."""
        n = dirs.shape[0]
        t_hit = np.full(n, self._max_range + 1.0)

        # Ground plane z = 0 (sensor at z ~ 1.8).
        dz = dirs[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ground = -origin[2] / dz
        ok = (dz < -1e-6) & (t_ground > 0.1)
        t_hit = np.where(ok, np.minimum(t_hit, t_ground), t_hit)

        # Building AABBs ([cx-hx, cx+hx] x [cy-hy, cy+hy] x [0, h]), slab method.
        for c, half, h in self._buildings:
            lo = np.array([c[0] - half[0], c[1] - half[1], 0.0]) - origin
            hi = np.array([c[0] + half[0], c[1] + half[1], h]) - origin
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = lo / dirs
                t2 = hi / dirs
            tmin = np.nanmax(np.minimum(t1, t2), axis=1)
            tmax = np.nanmin(np.maximum(t1, t2), axis=1)
            hit = (tmax >= tmin) & (tmax > 0.1) & (tmin > 0.1)
            t_hit = np.where(hit, np.minimum(t_hit, tmin), t_hit)
        return t_hit

    def __getitem__(self, idx):
        pose = self.gt_poses[idx]
        origin = pose[:3, 3] + np.array([0.0, 0.0, 1.8])

        az = np.linspace(0, 2 * np.pi, self._n_azimuth, endpoint=False)
        elev = np.deg2rad(np.linspace(-24.0, 2.0, self._n_beams))
        az_g, el_g = np.meshgrid(az, elev)  # (beams, azimuth)
        az_f, el_f = az_g.ravel(), el_g.ravel()
        dirs_body = np.stack(
            [np.cos(el_f) * np.cos(az_f), np.cos(el_f) * np.sin(az_f), np.sin(el_f)],
            axis=1,
        )
        dirs_world = dirs_body @ pose[:3, :3].T

        t = self._raycast(origin, dirs_world)
        rng = np.random.default_rng(self._noise_rng_seed + idx)
        t = t + rng.normal(0.0, 0.02, size=t.shape)  # 2 cm range noise
        hit = t < self._max_range

        points_body = dirs_body[hit] * t[hit, None]
        # sensor offset: convert to body frame at z=1.8
        points_body[:, 2] += 1.8
        # Azimuth column timestamps in [0, 1) like a spinning LiDAR
        # (reference mulran.py:54-58 / ouster.py pattern).
        stamps = (az_f[hit] / (2 * np.pi)).astype(np.float64)
        return points_body.astype(np.float64), stamps
