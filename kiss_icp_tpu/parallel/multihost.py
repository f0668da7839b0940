"""Multi-host (DCN) execution: span the batched odometry runner across hosts.

The reference is a single-process CPU pipeline (SURVEY.md section 2.2: no
distributed execution of any kind); this module is the TPU-native scale-out
entry named in SURVEY.md section 2.2 ("DCN across hosts via `jax.distributed`").

Model: pure data parallelism over sequences. Every host runs this same
program; `jax.distributed.initialize` wires the processes into one JAX
runtime whose `jax.devices()` spans all hosts; the ("seq", "pts") mesh from
`parallel.batch` then covers the global device set, the sequence batch axis
shards over it (ICI within hosts, DCN between — XLA routes collectives by
mesh layout), and each host feeds only the sequences that live on its local
devices (`jax.make_array_from_process_local_data`). Per-sequence state is
tiny (pose 4x4 + threshold scalars + the voxel map tensor), so there is no
parameter-server or checkpoint-sharding concern.

Environment contract (mirrors standard JAX multi-process launch):

    KISS_COORDINATOR  host:port of process 0 (e.g. "10.0.0.1:8476")
    KISS_NUM_PROCESSES  total process count
    KISS_PROCESS_ID     this process's rank in [0, num_processes)

With none of these set (or num_processes == 1) everything degrades to the
single-process path — the same code runs on a laptop, one TPU host, or a
multi-host pod slice. Validated single-process on the virtual CPU mesh
(tests/test_multihost.py); the driver's dryrun exercises the same code path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.parallel import batch as pbatch


@dataclass(frozen=True)
class MultihostSpec:
    coordinator: Optional[str]
    num_processes: int
    process_id: int

    @property
    def is_multiprocess(self) -> bool:
        return self.num_processes > 1


def spec_from_env(environ=None) -> MultihostSpec:
    """Read the launch topology from the environment (see module docstring)."""
    env = os.environ if environ is None else environ
    return MultihostSpec(
        coordinator=env.get("KISS_COORDINATOR"),
        num_processes=int(env.get("KISS_NUM_PROCESSES", "1")),
        process_id=int(env.get("KISS_PROCESS_ID", "0")),
    )


def initialize_from_env(environ=None) -> MultihostSpec:
    """`jax.distributed.initialize` when launched multi-process; no-op else.

    Must run before any other JAX call in the process (backend init is
    one-shot). Returns the parsed spec either way.
    """
    spec = spec_from_env(environ)
    if spec.is_multiprocess:
        if not spec.coordinator:
            raise ValueError(
                "KISS_NUM_PROCESSES > 1 requires KISS_COORDINATOR=host:port"
            )
        jax.distributed.initialize(
            coordinator_address=spec.coordinator,
            num_processes=spec.num_processes,
            process_id=spec.process_id,
        )
    return spec


class MultihostBatchedOdometry:
    """B sequences advancing in lockstep across all hosts' devices.

    Each host calls `register_frames` with the scans of its LOCAL sequences
    (global batch B = num_hosts * local batch when evenly spread); the jitted
    step runs one SPMD program over the global mesh. Poses come back
    replicated, so every host sees the full (B, 4, 4) result.
    """

    def __init__(self, config: KISSConfig, global_batch: int,
                 mesh: Optional[Mesh] = None):
        self.config = config
        self.batch = global_batch
        self.mesh = mesh if mesh is not None else pbatch.make_mesh()
        # Same counter contract as BatchedOdometry/KissICP: readable before
        # the first register_frames (code-review r4c).
        self.last_input_dropped = 0
        self.total_input_dropped = 0
        self._cap = int(config.engine.max_points_per_frame)
        self._data_sharding = NamedSharding(
            self.mesh, P(pbatch.SEQ_AXIS, pbatch.PTS_AXIS)
        )
        self._step = pbatch.make_batched_step(config, self.mesh)
        # Poses come out of the step sharded over "seq"; across processes the
        # remote shards are non-addressable, so a host read needs an explicit
        # replication (XLA lowers this to an all-gather over the mesh).
        self._replicate = jax.jit(
            lambda x: x, out_shardings=NamedSharding(self.mesh, P())
        )
        self.state = jax.device_put(
            pbatch.init_batched_state(config, global_batch),
            pbatch.batched_state_sharding(self.mesh),
        )

    @property
    def local_batch(self) -> int:
        """Sequences this process must feed (global batch / process count)."""
        return self.batch // jax.process_count()

    def _global_array(self, local: np.ndarray):
        """Assemble the global sharded input from this host's local slice."""
        return jax.make_array_from_process_local_data(self._data_sharding, local)

    def register_frames(self, frames, timestamps=None) -> np.ndarray:
        """frames: list of `local_batch` (N_i, 3) scans from this host's
        sequences. Returns the global (B, 4, 4) poses. Oversized scans are
        stride-subsampled with drop accounting (`total_input_dropped`)."""
        from kiss_icp_tpu import odometry as odom

        lb = self.local_batch
        assert len(frames) == lb, (len(frames), lb)
        pts = np.zeros((lb, self._cap, 3), np.float32)
        ts = np.zeros((lb, self._cap), np.float32)
        valid = np.zeros((lb, self._cap), bool)
        self.last_input_dropped = 0
        for i, f in enumerate(frames):
            t = None if timestamps is None else timestamps[i]
            f, t, dropped = odom.subsample_to_capacity(f, t, self._cap)
            self.last_input_dropped += dropped
            n = len(f)
            pts[i, :n] = f[:, :3]
            valid[i, :n] = True
            if t is not None and len(t) == n:
                ts[i, :n] = np.asarray(t)
        self.total_input_dropped += self.last_input_dropped
        self.state, result = self._step(
            self.state,
            self._global_array(pts),
            self._global_array(ts),
            self._global_array(valid),
        )
        replicated = self._replicate(result.pose)
        return np.asarray(replicated.addressable_data(0))


def launch_info() -> str:
    """One-line description of the active topology (for logs)."""
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
