"""Float64 numpy oracles implementing the reference semantics for tests.

Each function re-implements the documented behavior of the reference C++ core
(see SURVEY.md section 2.1) directly from its math, so kernel tests compare the
TPU implementation against an independent small-scale reimplementation.
"""

import numpy as np
from scipy.linalg import expm, logm
from scipy.spatial.transform import Rotation


def se3_exp(twist):
    v, w = twist[:3], twist[3:]
    xi = np.zeros((4, 4))
    xi[:3, :3] = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    xi[:3, 3] = v
    return expm(xi)


def se3_log(pose):
    xi = np.real(logm(pose))
    w = np.array([xi[2, 1], xi[0, 2], xi[1, 0]])
    return np.concatenate([xi[:3, 3], w])


def _se3_exp_batch(twists):
    """exp of (N, 6) twists -> (N, 4, 4), closed-form Rodrigues in float64.

    Matches scipy expm to ~1e-13; vectorized so the long-horizon oracle run
    (hundreds of frames x thousands of points) is feasible.
    """
    twists = np.asarray(twists, np.float64)
    v, w = twists[:, :3], twists[:, 3:]
    theta = np.linalg.norm(w, axis=1)
    k = np.zeros((len(twists), 3, 3))
    k[:, 0, 1], k[:, 0, 2] = -w[:, 2], w[:, 1]
    k[:, 1, 0], k[:, 1, 2] = w[:, 2], -w[:, 0]
    k[:, 2, 0], k[:, 2, 1] = -w[:, 1], w[:, 0]
    with np.errstate(invalid="ignore", divide="ignore"):
        a = np.where(theta > 1e-10, np.sin(theta) / theta, 1.0 - theta**2 / 6)
        b = np.where(theta > 1e-10, (1 - np.cos(theta)) / theta**2, 0.5)
        c = np.where(theta > 1e-10, (theta - np.sin(theta)) / theta**3, 1.0 / 6)
    k2 = k @ k
    eye = np.broadcast_to(np.eye(3), (len(twists), 3, 3))
    rot = eye + a[:, None, None] * k + b[:, None, None] * k2
    vmat = eye + b[:, None, None] * k + c[:, None, None] * k2
    out = np.tile(np.eye(4), (len(twists), 1, 1))
    out[:, :3, :3] = rot
    out[:, :3, 3] = np.einsum("nij,nj->ni", vmat, v)
    return out


def deskew(points, timestamps, relative_motion):
    """Reference Preprocessing.cpp:58-84: normalize stamps, exp((t-1)*omega)*p."""
    t = np.asarray(timestamps, np.float64)
    t = (t - t.min()) / (t.max() - t.min())
    omega = se3_log(np.asarray(relative_motion, np.float64))
    poses = _se3_exp_batch((t - 1.0)[:, None] * omega[None, :])
    return np.einsum("nij,nj->ni", poses[:, :3, :3],
                     np.asarray(points, np.float64)) + poses[:, :3, 3]


def range_crop(points, min_range, max_range):
    r = np.linalg.norm(points, axis=-1)
    return (r < max_range) & (r > min_range)


def voxel_downsample(points, voxel_size):
    """First-point-wins with lowest-original-index semantics (the deterministic
    flavor of reference VoxelUtils.cpp:7-21 documented in SURVEY.md section 7)."""
    keys = np.floor(points / voxel_size).astype(np.int64)
    seen = {}
    for i, k in enumerate(map(tuple, keys)):
        if k not in seen:
            seen[k] = i
    idx = sorted(seen.values())
    return points[idx]


class VoxelMapOracle:
    """Reference VoxelHashMap semantics (VoxelHashMap.cpp:33-133) in pure Python."""

    def __init__(self, voxel_size, max_distance, max_points_per_voxel):
        self.voxel_size = voxel_size
        self.max_distance = max_distance
        self.max_points = max_points_per_voxel
        self.map_resolution = np.sqrt(voxel_size**2 / max_points_per_voxel)
        self.voxels = {}
        self._stacked = {}  # cache: voxel key -> np.stack(bucket)

    def add_points(self, points):
        for p in points:
            k = tuple(np.floor(p / self.voxel_size).astype(np.int64))
            bucket = self.voxels.setdefault(k, [])
            if len(bucket) >= self.max_points:
                continue
            if bucket and np.min(
                np.linalg.norm(np.stack(bucket) - p, axis=1)
            ) < self.map_resolution:
                continue
            bucket.append(np.asarray(p, np.float64))
            self._stacked.pop(k, None)

    def remove_far(self, origin):
        dead = [
            k
            for k, pts in self.voxels.items()
            if np.linalg.norm(pts[0] - origin) >= self.max_distance
        ]
        for k in dead:
            del self.voxels[k]
            self._stacked.pop(k, None)

    def update(self, points, pose):
        world = points @ pose[:3, :3].T + pose[:3, 3]
        self.add_points(world)
        self.remove_far(pose[:3, 3])

    def point_cloud(self):
        if not self.voxels:
            return np.zeros((0, 3))
        return np.concatenate([np.stack(v) for v in self.voxels.values()])

    def empty(self):
        return not self.voxels

    def get_closest_neighbor(self, query):
        """27-voxel probe + brute-force min (VoxelHashMap.cpp:46-70).

        Vectorized (cached per-voxel arrays; candidates concatenated in the
        same neighbor/iteration order as the scalar loop, so the strict-`<`
        first-minimum tie-break is preserved exactly).
        """
        base = np.floor(query / self.voxel_size).astype(np.int64)
        cands = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    k = (base[0] + dx, base[1] + dy, base[2] + dz)
                    bucket = self.voxels.get(k)
                    if not bucket:
                        continue
                    arr = self._stacked.get(k)
                    if arr is None or len(arr) != len(bucket):
                        arr = np.stack(bucket)
                        self._stacked[k] = arr
                    cands.append(arr)
        if not cands:
            return None, np.inf
        allc = np.concatenate(cands)
        d = np.linalg.norm(allc - query, axis=1)
        i = int(np.argmin(d))
        return allc[i], float(d[i])


def hat(w):
    return np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def build_linear_system(source, targets, kernel_scale):
    """Reference BuildLinearSystem (Registration.cpp:80-121), world-frame levers."""
    jtj = np.zeros((6, 6))
    jtr = np.zeros(6)
    for s, t in zip(source, targets):
        r = s - t
        jac = np.concatenate([np.eye(3), -hat(s)], axis=1)
        w = kernel_scale**2 / (kernel_scale + r @ r) ** 2
        jtj += w * jac.T @ jac
        jtr += w * jac.T @ r
    return jtj, jtr


def align_points_to_map(
    vmap_oracle, points, initial_guess, max_distance, kernel_scale,
    max_iterations=500, convergence=1e-4,
):
    """Reference AlignPointsToMap (Registration.cpp:138-167) in float64."""
    if vmap_oracle.empty():
        return np.asarray(initial_guess, np.float64)
    src = points @ initial_guess[:3, :3].T + initial_guess[:3, 3]
    t_icp = np.eye(4)
    for _ in range(max_iterations):
        pairs_s, pairs_t = [], []
        for p in src:
            nn, d = vmap_oracle.get_closest_neighbor(p)
            if d < max_distance:
                pairs_s.append(p)
                pairs_t.append(nn)
        jtj, jtr = build_linear_system(np.array(pairs_s), np.array(pairs_t), kernel_scale)
        dx = np.linalg.solve(jtj, -jtr)
        est = se3_exp(dx)
        src = src @ est[:3, :3].T + est[:3, 3]
        t_icp = est @ t_icp
        if np.linalg.norm(dx) < convergence:
            break
    return t_icp @ initial_guess


class ThresholdOracle:
    """Reference AdaptiveThreshold (Threshold.cpp:30-51)."""

    def __init__(self, initial_threshold, min_motion_th, max_range):
        self.min_motion_th = min_motion_th
        self.max_range = max_range
        self.model_sse = initial_threshold**2
        self.num_samples = 1

    def compute_threshold(self):
        return np.sqrt(self.model_sse / self.num_samples)

    def update_model_deviation(self, deviation):
        theta = Rotation.from_matrix(deviation[:3, :3]).magnitude()
        model_error = np.linalg.norm(deviation[:3, 3]) + 2.0 * self.max_range * np.sin(
            theta / 2.0
        )
        if model_error > self.min_motion_th:
            self.model_sse += model_error**2
            self.num_samples += 1
