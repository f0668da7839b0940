"""Intra-frame sharded ICP: one sequence, its points split across devices.

Explicit `shard_map` formulation of the plan in SURVEY.md section 2.2 (P3):
each device holds a shard of the source points and a replica of the voxel map,
runs the 27-voxel NN association and the Geman-McClure (JTJ, JTr) contraction
locally, and the 6x6+6+1 partials combine with `jax.lax.psum` over ICI — the
TPU equivalent of the reference's tbb::parallel_reduce
(cpp/kiss_icp/core/Registration.cpp:101-118). The solve and pose update run
replicated (the payload is 43 scalars; broadcasting beats a distributed
solve at any scale).

The implicit-sharding path (parallel/batch.py) lets XLA derive the same
collectives from sharding annotations; this module is the explicit version
for single-sequence latency scaling and serves as the template for future
map-sharded (halo-exchange) operation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from kiss_icp_tpu.ops import hash_map, registration, se3

PTS_AXIS = "pts"


def make_sharded_align(
    cfg: hash_map.MapConfig,
    mesh: Mesh,
    *,
    max_iterations: int,
    convergence: float,
    axis: str = PTS_AXIS,
):
    """Compile an `align(map, points (N,3), valid (N,), guess, max_dist, sigma)
    -> AlignResult` with the point axis sharded over `axis` of `mesh`.

    N must be divisible by the mesh's `axis` extent. The map and the pose are
    replicated on every device.
    """

    def _align_shard(m, points, valid, guess, max_distance, kernel_scale):
        # Runs per device on a (N/devices, 3) shard; map/pose replicated.
        guess = guess.astype(jnp.float32)

        def query_fn(src):
            q = hash_map.query_nearest(cfg, m, src, valid)
            return q.distances, q.neighbors

        def reduce_fn(ls):
            # The distributed reduction: 6x6 + 6 + 1 scalars over ICI.
            return registration.LinearSystem(
                jax.lax.psum(ls.jtj, axis),
                jax.lax.psum(ls.jtr, axis),
                jax.lax.psum(ls.num_correspondences, axis),
            )

        t_icp, iters = registration.gauss_newton_loop(
            points, valid, guess, max_distance, kernel_scale,
            query_fn=query_fn, max_iterations=max_iterations,
            convergence=convergence, reduce_fn=reduce_fn,
        )

        q = hash_map.query_nearest(cfg, m, se3.transform(t_icp @ guess, points), valid)
        n_corr = jax.lax.psum(
            jnp.sum((q.found & (q.distances < max_distance)).astype(jnp.int32)), axis
        )
        empty = hash_map.is_empty(m)
        pose = jnp.where(empty, guess, t_icp @ guess)
        return registration.AlignResult(pose, jnp.where(empty, 0, iters), n_corr,
                                        jnp.zeros((), jnp.int32))

    replicated = P()
    sharded = P(axis)
    mapped = shard_map(
        _align_shard,
        mesh=mesh,
        in_specs=(replicated, sharded, sharded, replicated, replicated, replicated),
        out_specs=replicated,
    )
    return jax.jit(mapped)
