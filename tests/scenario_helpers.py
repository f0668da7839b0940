"""Shared machinery for the five BASELINE.json scenario tests: on-disk dataset
fixture writers (KITTI / KITTI-raw / MulRan / NCD formats, generated from the
deterministic synthetic simulator) and a float64 oracle pipeline runner
implementing the full reference per-frame loop (KissICP.cpp:35-68)."""

import numpy as np

import oracle
from kiss_icp_tpu.datasets.synthetic import SyntheticDataset

_KITTI_ANGLE = np.deg2rad(0.205)


def inverse_correct_kitti_scan(pts: np.ndarray) -> np.ndarray:
    """Inverse of datasets.kitti.correct_kitti_scan: rotate each point by
    -0.205 deg about p x z_hat (the axis is invariant under the correction, so
    the roundtrip is exact to fp precision)."""
    pts = np.asarray(pts, np.float64)
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(pts, z)
    norm = np.linalg.norm(axis, axis=1, keepdims=True)
    axis = np.divide(axis, norm, out=np.zeros_like(axis), where=norm > 0)
    c, s = np.cos(-_KITTI_ANGLE), np.sin(-_KITTI_ANGLE)
    kxp = np.cross(axis, pts)
    kdotp = np.sum(axis * pts, axis=1, keepdims=True)
    return pts * c + kxp * s + axis * kdotp * (1.0 - c)


def make_drive(n_scans, *, seq=0, n_beams=32, n_azimuth=512, max_range=50.0,
               speed=0.5, distort=False):
    """Deterministic synthetic drive (scans in sensor frame + GT poses)."""
    return SyntheticDataset(
        sequence=seq, n_scans=n_scans, n_beams=n_beams, n_azimuth=n_azimuth,
        max_range=max_range, speed=speed, accel_frames=8, distort=distort,
    )


def write_kitti_tree(root, drive, seq="00"):
    """KITTI odometry layout from a synthetic drive. Scans are written
    inverse-corrected so the loader's 0.205-degree correction reproduces the
    simulated geometry bit-for-bit(ish); GT poses are written in the camera
    frame through a nontrivial Tr, as on disk in the real benchmark."""
    seq_dir = root / "sequences" / seq
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    n = len(drive)
    for i in range(n):
        pts, _ = drive[i]
        raw = np.zeros((len(pts), 4), np.float32)
        raw[:, :3] = inverse_correct_kitti_scan(pts)
        raw.tofile(velo / f"{i:06d}.bin")
    tr = np.array(
        [[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.3]], np.float64
    )
    tr4 = np.eye(4)
    tr4[:3] = tr
    (seq_dir / "calib.txt").write_text(
        "P0: " + " ".join(["1"] * 12) + "\nTr: " + " ".join(map(str, tr.ravel()))
    )
    (seq_dir / "times.txt").write_text("\n".join(f"{0.1*i}" for i in range(n)))
    poses_cam = tr4 @ drive.gt_poses[:n] @ np.linalg.inv(tr4)
    (root / "poses").mkdir(exist_ok=True)
    np.savetxt(root / "poses" / f"{seq}.txt",
               poses_cam[:, :3, :].reshape(n, 12))
    return root


def write_kitti_raw_tree(root, drive, seq="00"):
    """KITTI raw layout (velodyne_points + oxts + imu calib) for sequence 00's
    drive mapping 2011_10_03/2011_10_03_drive_0027_sync."""
    date = "2011_10_03"
    drive_dir = root / date / f"{date}_drive_0027_sync"
    velo = drive_dir / "velodyne_points" / "data"
    oxts = drive_dir / "oxts" / "data"
    velo.mkdir(parents=True)
    oxts.mkdir(parents=True)
    n = len(drive)
    for i in range(n):
        pts, _ = drive[i]
        raw = np.zeros((len(pts), 4), np.float32)
        raw[:, :3] = inverse_correct_kitti_scan(pts)
        raw.tofile(velo / f"{i:010d}.bin")
        # OXTS: identity-ish GPS track (GT is not compared in this scenario;
        # the raw loader mainly exercises azimuth stamps + deskew).
        lat = 49.0 + 1e-7 * i
        (oxts / f"{i:010d}.txt").write_text(
            f"{lat} 8.43 112.8 0.0 0.0 0.0" + " 0.0" * 24
        )
    (root / date).mkdir(exist_ok=True)
    (root / date / "calib_imu_to_velo.txt").write_text(
        "calib_time: 01-Jan-2011 00:00:00\n"
        "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n"
    )
    return root


def write_mulran_tree(root, drive):
    """MulRan layout: Ouster/<stamp>.bin (64x1024 x,y,z,i) + global_pose.csv."""
    seq = root / "KAIST01"
    (seq / "Ouster").mkdir(parents=True)
    n = len(drive)
    n_pts = 64 * 1024
    for i in range(n):
        pts, _ = drive[i]
        raw = np.zeros((n_pts, 4), np.float32)
        m = min(len(pts), n_pts)
        raw[:m, :3] = pts[:m]
        raw.tofile(seq / "Ouster" / f"{100000000 * (i + 1)}.bin")
    rows = []
    for i in range(n):
        pose34 = drive.gt_poses[i][:3]
        rows.append([100000000 * (i + 1)] + list(pose34.ravel()))
    np.savetxt(seq / "global_pose.csv", np.array(rows), delimiter=",")
    return seq


def write_ncd_tree(root, drive):
    """Newer College layout: ouster_scan/cloud_<sec>_<nsec>.pcd + GT csv.

    Clouds are zero-padded to the loader's fixed 64x1024 Ouster shape (padding
    lands at the origin, below min_range, so the crop removes it for both the
    pipeline and the oracle)."""
    seq = root / "ncd01"
    scans = seq / "raw_format" / "ouster_scan"
    scans.mkdir(parents=True)
    n = len(drive)
    n_pts = 64 * 1024
    for i in range(n):
        pts, _ = drive[i]
        padded = np.zeros((n_pts, 3), np.float32)
        m = min(len(pts), n_pts)
        padded[:m] = pts[:m]
        _write_pcd(scans / f"cloud_{i + 1}_000000000.pcd", padded)
    from scipy.spatial.transform import Rotation

    lines = ["#sec, nsec, x, y, z, qx, qy, qz, qw"]
    for i in range(n):
        p = drive.gt_poses[i]
        q = Rotation.from_matrix(p[:3, :3]).as_quat()
        t = p[:3, 3]
        lines.append(
            f"{i + 1}, 0, {t[0]}, {t[1]}, {t[2]}, {q[0]}, {q[1]}, {q[2]}, {q[3]}"
        )
    (seq / "ground_truth").mkdir()
    (seq / "ground_truth" / "registered_poses.csv").write_text("\n".join(lines))
    return seq


def _write_pcd(path, pts):
    header = (
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {len(pts)}\nHEIGHT 1\nPOINTS {len(pts)}\nDATA binary\n"
    )
    rec = np.rec.fromarrays(
        [pts[:, 0], pts[:, 1], pts[:, 2]], formats="<f4,<f4,<f4", names="x,y,z"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


def run_oracle_pipeline(frames, cfg):
    """Float64 reference pipeline (KissICP.cpp:35-68) over [(points, stamps)].

    Returns (n, 4, 4) poses. The golden trajectory each scenario's TPU
    pipeline is compared against.
    """
    v = float(cfg.mapping.voxel_size)
    vm = oracle.VoxelMapOracle(
        v, float(cfg.data.max_range), int(cfg.mapping.max_points_per_voxel)
    )
    thr = oracle.ThresholdOracle(
        float(cfg.adaptive_threshold.initial_threshold),
        float(cfg.adaptive_threshold.min_motion_th),
        float(cfg.data.max_range),
    )
    fixed = cfg.adaptive_threshold.fixed_threshold
    last_pose = np.eye(4)
    last_delta = np.eye(4)
    poses = []
    for pts, ts in frames:
        pts = np.asarray(pts, np.float64)
        if (cfg.data.deskew and ts is not None and len(ts) == len(pts)
                and np.ptp(ts) > 0):
            pts = oracle.deskew(pts, ts, last_delta)
        keep = oracle.range_crop(pts, float(cfg.data.min_range),
                                 float(cfg.data.max_range))
        fd = oracle.voxel_downsample(pts[keep], 0.5 * v)
        src = oracle.voxel_downsample(fd, 1.5 * v)
        sigma = float(fixed) if fixed is not None else thr.compute_threshold()
        guess = last_pose @ last_delta
        new = oracle.align_points_to_map(
            vm, src, guess, 3.0 * sigma, sigma,
            max_iterations=int(cfg.registration.max_num_iterations),
            convergence=float(cfg.registration.convergence_criterion),
        )
        thr.update_model_deviation(np.linalg.inv(guess) @ new)
        vm.update(fd, new)
        last_delta = np.linalg.inv(last_pose) @ new
        last_pose = new
        poses.append(new)
    return np.stack(poses)
