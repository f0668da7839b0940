"""Property-based tests (hypothesis) of the core op algebra.

The oracle tests pin exact reference parity on specific inputs; these pin
the INVARIANTS on randomized inputs: SE(3) group laws and exp/log
round-trips, downsample subset/uniqueness/lowest-index semantics, the
adaptive-threshold recurrence vs a float64 oracle, and the voxel map's
query answers being both honest (distance = |q - neighbor|) and optimal
over the stored points in the 27-neighborhood.

Shapes are FIXED per test (hypothesis varies values only) so each jitted op
compiles once per run; deadlines are disabled accordingly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import assume, given, settings, strategies as st  # noqa: E402
from hypothesis.extra.numpy import arrays  # noqa: E402

from kiss_icp_tpu.ops import hash_map as hm
from kiss_icp_tpu.ops import se3, threshold, voxel

import os  # noqa: E402

# KISS_PROP_EXAMPLES raises the example budget for one-off deep fuzz runs
# (default keeps the suite fast).
SET = settings(deadline=None,
               max_examples=int(os.environ.get("KISS_PROP_EXAMPLES", "30")))

finite = dict(allow_nan=False, allow_infinity=False)
twists = arrays(np.float32, (6,),
                elements=st.floats(-2.0, 2.0, width=32, **finite))
points_small = arrays(np.float32, (64, 3),
                      elements=st.floats(-20.0, 20.0, width=32, **finite))


@SET
@given(twists)
def test_se3_exp_is_rigid(xi):
    t = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    r = t[:3, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=2e-6)
    assert abs(np.linalg.det(r) - 1.0) < 5e-6
    np.testing.assert_array_equal(t[3], [0, 0, 0, 1])


@SET
@given(twists)
def test_se3_exp_log_roundtrip(xi):
    # Keep |w| below pi where log is unique.
    w = xi[3:]
    n = np.linalg.norm(w)
    if n > 3.0:
        xi = np.concatenate([xi[:3], w * (3.0 / n)]).astype(np.float32)
    back = np.asarray(se3.se3_log(se3.se3_exp(jnp.asarray(xi))))
    np.testing.assert_allclose(back, xi, atol=5e-5, rtol=5e-4)


@SET
@given(twists, twists)
def test_se3_group_laws(a, b):
    ta, tb = se3.se3_exp(jnp.asarray(a)), se3.se3_exp(jnp.asarray(b))
    # inverse
    np.testing.assert_allclose(
        np.asarray(ta @ se3.inverse(ta)), np.eye(4), atol=1e-5)
    # associativity of compose with inverse round trip
    ab = np.asarray(se3.inverse(tb) @ (tb @ ta))
    np.testing.assert_allclose(ab, np.asarray(ta), atol=1e-5)


@SET
@given(twists, points_small)
def test_transform_inverse_restores_points(xi, pts):
    t = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.transform(se3.inverse(t), se3.transform(t, jnp.asarray(pts))))
    np.testing.assert_allclose(back, pts, atol=2e-4)


@SET
@given(twists)
def test_orthonormalize_projects_and_is_stable(xi):
    t = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    noisy = t.copy()
    noisy[:3, :3] += 1e-3 * np.arange(9, dtype=np.float32).reshape(3, 3) / 9.0
    fixed = np.asarray(se3.orthonormalize(jnp.asarray(noisy)))
    r = fixed[:3, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)
    twice = np.asarray(se3.orthonormalize(jnp.asarray(fixed)))
    np.testing.assert_allclose(twice, fixed, atol=1e-6)
    np.testing.assert_allclose(fixed[:3, 3], noisy[:3, 3])  # translation kept


@SET
@given(points_small, st.floats(0.3, 3.0))
def test_downsample_subset_unique_lowest_index(pts, vsize):
    # Two knife edges a numpy-f64 oracle cannot share with the device, both
    # measure-zero for sensor data and self-consistent across the pipeline
    # (downsample/insert/query all use the same point_to_voxel):
    #   * XLA flushes subnormals: floor(-1e-38 / v) is voxel 0 on device,
    #     voxel -1 in numpy — snap near-zero coordinates away;
    #   * XLA rewrites p / v into p * (1/v): a point EXACTLY on a voxel
    #     face (p = m*v) can floor one voxel lower — discard examples
    #     within 1e-4 of a nonzero face.
    pts = np.where(np.abs(pts) < 1e-3, 0.0, pts).astype(np.float32)
    q = pts.astype(np.float64) / vsize
    frac = np.abs(q - np.round(q))
    assume(bool(np.all((frac > 1e-4) | (np.round(q) == 0))))
    valid = np.ones(len(pts), bool)
    out = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(valid),
                                 voxel_size=float(vsize), capacity=128)
    opts = np.asarray(out.points)[np.asarray(out.valid)]
    assert int(np.asarray(out.num_dropped)) == 0
    keys_in = np.floor(pts / vsize).astype(np.int64)
    keys_out = np.floor(opts / vsize).astype(np.int64)
    # one output per occupied voxel, exactly
    uin = {tuple(k) for k in keys_in}
    uout = [tuple(k) for k in keys_out]
    assert len(uout) == len(set(uout)) == len(uin)
    # each output IS the lowest-index input of its voxel (reference
    # VoxelUtils.cpp first-point-wins, made deterministic)
    first = {}
    for i, k in enumerate(map(tuple, keys_in)):
        first.setdefault(k, pts[i])
    for k, p in zip(uout, opts):
        np.testing.assert_array_equal(p, first[k])


@SET
@given(st.lists(st.floats(0.0, 3.0, **finite), min_size=1, max_size=40),
       st.floats(0.05, 0.5))
def test_threshold_recurrence_matches_f64_oracle(errors, min_motion):
    """Feed translation-only model deviations; compare against the
    reference recurrence (Threshold.cpp:30-51) in float64."""
    state = threshold.init_state(2.0)
    sse, num = 2.0**2, 1
    for e in errors:
        dev = np.eye(4, dtype=np.float32)
        dev[0, 3] = e
        state = threshold.update_model_deviation(
            state, jnp.asarray(dev), max_range=100.0,
            min_motion_th=float(min_motion))
        # The gate compares in f32 on device; an error within f32 epsilon of
        # min_motion flips the branch vs a float64 compare (hypothesis found
        # e = min_motion + 1e-17). Mirror the gate's precision; the
        # accumulation stays float64.
        if np.float32(e) > np.float32(min_motion):
            sse += float(np.float32(e)) ** 2
            num += 1
        np.testing.assert_allclose(
            float(threshold.compute_threshold(state)),
            np.sqrt(sse / num), rtol=2e-4)


CFG = hm.MapConfig(voxel_size=1.0, max_distance=100.0, max_points_per_voxel=8,
                   capacity_log2=13, probe_length=16, group_capacity=16)


@SET
@given(points_small, points_small)
def test_map_query_honest_and_optimal(store_pts, queries):
    """Whatever the map stored, every query answer must be (a) honest — the
    reported distance IS the distance to the returned neighbor — and
    (b) optimal — no STORED point in the query's 27-voxel neighborhood is
    closer."""
    # Snap |x| < 1e-3 to zero — same XLA subnormal-flush boundary delta as in
    # the downsample property above (floor(-1e-38) is -1 in numpy f64 but 0
    # on device); physically meaningless.
    store_pts = np.where(np.abs(store_pts) < 1e-3, 0.0, store_pts).astype(np.float32)
    queries = np.where(np.abs(queries) < 1e-3, 0.0, queries).astype(np.float32)
    m = hm.create_map(CFG)
    m, _ = hm.insert(CFG, m, jnp.asarray(store_pts),
                     jnp.ones(len(store_pts), bool))
    q = hm.query_nearest(CFG, m, jnp.asarray(queries),
                         jnp.ones(len(queries), bool))
    dist = np.asarray(q.distances)
    nn = np.asarray(q.neighbors)

    stored, mask = hm.extract_points(CFG, m)
    stored = np.asarray(stored)[np.asarray(mask)]
    skeys = np.floor(stored / CFG.voxel_size).astype(np.int64)

    for i, query in enumerate(queries):
        qk = np.floor(query / CFG.voxel_size).astype(np.int64)
        in_hood = np.all(np.abs(skeys - qk) <= 1, axis=1)
        best = (np.linalg.norm(stored[in_hood] - query, axis=1).min()
                if in_hood.any() else np.inf)
        if np.isfinite(dist[i]):
            np.testing.assert_allclose(
                dist[i], np.linalg.norm(nn[i] - query), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(dist[i], best, rtol=1e-5, atol=1e-5)
        else:
            assert not in_hood.any()


# ---------------------------------------------------------------------------
# Closed-loop robustness fuzz: whatever the sensor produces — NaN floods,
# empty frames, kilometer-scale outliers, duplicate points — the pose stream
# stays finite and SE(3)-valid (the degraded-mode guard, odometry.py).
# ---------------------------------------------------------------------------

from kiss_icp_tpu import odometry  # noqa: E402
from kiss_icp_tpu.config.schema import KISSConfig  # noqa: E402


def _fuzz_config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 1.0
    cfg.engine.max_points_per_frame = 256
    cfg.engine.frame_capacity = 256
    cfg.engine.source_capacity = 128
    cfg.engine.map_capacity_log2 = 11
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 6
    return cfg


_FUZZ_CFG = _fuzz_config()
_FUZZ_STEP = None


def _fuzz_step():
    global _FUZZ_STEP
    if _FUZZ_STEP is None:
        _FUZZ_STEP = odometry.make_step(_FUZZ_CFG)
    return _FUZZ_STEP


@settings(deadline=None, max_examples=15)
@given(
    arrays(np.float32, (4, 256, 3),
           elements=st.one_of(
               st.floats(-1e4, 1e4, width=32, **finite),
               st.just(float("nan")))),
    arrays(np.bool_, (4, 256), elements=st.booleans()),
)
def test_register_frame_survives_garbage(pts, valid):
    step = _fuzz_step()
    state = odometry.init_state(_FUZZ_CFG)
    ts = np.zeros((256,), np.float32)
    for i in range(4):
        state, res = step(state, jnp.asarray(pts[i]), jnp.asarray(ts),
                          jnp.asarray(valid[i]))
        pose = np.asarray(res.pose)
        assert np.all(np.isfinite(pose)), pose
        r = pose[:3, :3]
        np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-4)
        assert np.all(np.isfinite(np.asarray(res.sigma)))
