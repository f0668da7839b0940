"""Configuration schema for the TPU-native KISS-ICP framework.

Mirrors the reference's layered pydantic config (python/kiss_icp/config/config.py:28-48
and parser.py:41-90) with plain dataclasses (no pydantic dependency), and adds an
`engine` section with the TPU-specific static capacities: on TPU every buffer has a
fixed shape, so point budgets / map capacity / probe length are first-class config.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class DataConfig:
    max_range: float = 100.0
    min_range: float = 0.0
    deskew: bool = True


@dataclass
class MappingConfig:
    voxel_size: Optional[float] = None  # default: derived as max_range / 100
    max_points_per_voxel: int = 20


@dataclass
class RegistrationConfig:
    max_num_iterations: int = 500
    convergence_criterion: float = 1e-4
    # Kept for config-file compatibility with the reference; on TPU parallelism is
    # XLA's concern, not a thread count.
    max_num_threads: int = 0


@dataclass
class AdaptiveThresholdConfig:
    fixed_threshold: Optional[float] = None
    initial_threshold: float = 2.0
    min_motion_th: float = 0.1


@dataclass
class EngineConfig:
    """TPU static-shape / capacity plan (no analog in the reference: robin_map and
    std::vector grow dynamically; XLA programs cannot — see SURVEY.md section 7)."""

    # Padded capacity for raw input scans (points per frame).
    max_points_per_frame: int = 131072
    # Capacity of the 0.5*voxel downsampled cloud used for map updates.
    frame_capacity: int = 65536
    # Capacity of the 1.5*voxel downsampled cloud used as ICP source ("keypoints").
    source_capacity: int = 8192
    # Voxel hash-map capacity as log2 of slot count (open addressing, linear
    # probing). 2^19 slots keeps the load factor ~0.2 for a 100 m / 1 m-voxel
    # local map, making probe-window overflow negligible.
    map_capacity_log2: int = 19
    # Linear-probe window length (slots scanned per lookup; contiguous in memory).
    probe_length: int = 16
    # Max same-frame insert candidates considered per map voxel.
    group_capacity: int = 16
    # Donate the odometry state buffers to the jitted step (in-place updates).
    donate_state: bool = True
    # Fused Pallas kernel for the ICP normal-equation build
    # (ops/pallas_kernels.build_linear_system_pallas). "auto" (default)
    # compiles it on TPU — measured +12% frames/s over the jnp einsum — and
    # keeps the jnp path elsewhere (interpret mode is for tests, not
    # production CPU runs). True/False force one path; True off-TPU runs the
    # kernel interpreted (slow, test-only).
    use_pallas: object = "auto"
    # Point-store layout of the voxel map: "f32" absolute coordinates, or
    # "u16" voxel-relative 16-bit fixed point (~15 um resolution at 1 m
    # voxels) — halves the bytes of the NN gather, the pipeline's hottest op,
    # and the map's HBM footprint. See ops/hash_map.MapConfig.storage.
    map_storage: str = "f32"
    # Data-association (27-voxel NN) execution strategy:
    #   "gather27"     — flat (N, 27, K/P) gathers from the sparse hash map.
    #   "loop27"       — sequential loop over the 27 offsets, (N, P)-shaped
    #                    intermediates (27x less HBM between fusions).
    #   "compact"      — flat gathers against the per-frame compacted live-
    #                    voxel view (ops/compact_map.py).
    #   "compact_loop" — neighbor loop against the compacted view.
    #   "pallas_fused" — XLA gather + fused Pallas candidate evaluation
    #                    (ops/pallas_nn.py; distances agree to ulp level).
    # The first four are bit-identical in results; they differ only in how
    # XLA schedules memory traffic. Default picked by TPU A/B in bench.py.
    # The compact* modes are only competitive while the map is sparsely
    # occupied: at FULL occupancy the per-frame compaction dominates
    # (measured 228-914 fps vs gather27's ~1100-1240 on the 240-frame soak,
    # BASELINE.md round 3) — keep the default for long drives.
    #   "cached"       — gather each source point's `assoc_cache_size`
    #                    nearest candidates ONCE, iterate GN re-selecting
    #                    within the cache, re-gather only when any point
    #                    moved more than `assoc_refresh_dist` since the last
    #                    gather. NOT bit-identical to the others (association
    #                    may differ for points whose true NN left the cached
    #                    top-C); trajectory parity vs the exact modes is
    #                    pinned by tests/test_cached_assoc.py.
    nn_mode: str = "gather27"
    # Candidates cached per source point by nn_mode="cached".
    assoc_cache_size: int = 8
    # Re-gather threshold (meters of per-point motion since the last gather)
    # for nn_mode="cached"; <= 0 derives 0.25 * voxel_size.
    assoc_refresh_dist: float = -1.0
    # Live-voxel capacity (log2) of the compacted query view ("compact*"
    # modes). Must exceed the number of occupied map voxels; overflow is
    # surfaced through FrameResult.num_dropped_map_voxels.
    nn_live_capacity_log2: int = 15
    # Probe window of the compacted view's fingerprint index (its hash table
    # is sized at live_capacity * 4, load factor 0.25, so 8 suffices).
    nn_probe_length: int = 8
    # Frames advanced per device execution by the pipeline driver (lax.scan
    # chunking). 0 = auto (the default): headless runs pick a production
    # chunk (16, clamped to the sequence length) and get the software-
    # pipelined chunked driver; a live visualizer forces per-frame mode
    # (it must see every frame's clouds). 1 = force streaming (one
    # execution per frame, per-frame host latency — the ROS/latency shape);
    # >1 = explicit chunk. Chunking keeps the odometry state on-device
    # across the chunk, amortizing per-execution host overhead chunk-fold;
    # the reference's whole-loop driver (python/kiss_icp/pipeline.py:97-113)
    # has no such knob because its per-frame host cost is just C++ call
    # overhead.
    pipeline_chunk: int = 0
    # Deskew-refinement passes (0 = reference semantics). Each pass
    # re-deskews the RAW scan with the motion ICP just estimated (instead of
    # the constant-velocity prediction the first pass used), re-downsamples,
    # and re-registers from the already-converged pose — removing the
    # prediction residual from both the pose estimate and the points that
    # feed the map. Costs roughly one extra preprocess+downsample and a
    # short ICP per pass; with deskew off or no per-point stamps it
    # converges in O(1) extra iterations (harmless no-op). Single-device and
    # chunked engines only; the sharded/pod engines ignore it.
    # MEASURED (tools/error_budget.py, 240-frame bench drive): re-registering
    # the re-deskewed cloud feeds estimate noise back through the deskew warp
    # and DEGRADES the KITTI segment error (0.75% vs 0.53% baseline) — keep 0
    # unless your sensor's motion is grossly non-constant within a scan.
    deskew_refine: int = 0
    # Damped variant: re-deskew only the MAP-UPDATE cloud with the estimated
    # delta (the pose estimate is untouched; refined points reach future
    # frames through the voxel slabs). One extra deskew+downsample per frame.
    deskew_refine_map: bool = False
    # GN iterations executed per ICP while_loop trip. EXACTLY equivalent to
    # 1 (the loop body freezes converged state, so extra sub-iterations
    # pass through; same trajectory, same iteration count) while paying the
    # while_loop's per-trip control overhead 1/unroll as often — a lever on
    # the ~40 us/iteration serial latency floor the capacity ablation
    # identified (docs/ARCHITECTURE.md). Cost: up to unroll-1 wasted frozen
    # body evaluations per solve at convergence. Default from the bench A/B.
    gn_unroll: int = 1
    # Ground-plane attitude stabilization strength (0 = off, reference
    # semantics). Each frame the lowest-annulus ground plane is fitted in
    # the body frame and the pose rotated by this fraction of the measured
    # tilt so the ground normal stays vertical (ops/ground.py). Fixes the
    # slow pitch/roll drift of point-to-point ICP on ground-dominated
    # scans (measured round 5: 13.6 m of quadratic z drift over a 586 m
    # feature-poor drive — the f64 reference algorithm drifts identically;
    # with alignment 0.1 the drift collapses, see BASELINE.md round 5).
    # Assumes a gravity-aligned odometry frame (automotive datasets).
    # Applied by every engine (single-device, chunked, map-sharded, pod —
    # the correction is replicated deterministic math, no collectives).
    ground_align: float = 0.0
    # Rolling-origin re-base trigger, in voxels (inf-norm of the local pose
    # translation). The map's packed voxel keys and fixed-point storage
    # bound the world to ±16383 voxels per axis (ops/voxel.in_envelope);
    # when the pose passes this many voxels from the local origin the
    # engine re-expresses map + pose in a shifted origin (hash_map.rebase)
    # so arbitrarily long drives never leave the envelope — the reference's
    # unbounded robin_map keys (VoxelUtils.hpp:32-41) need no analog. The
    # default triggers every ~4 km at 1 m voxels, far inside the envelope
    # yet rare enough that the O(capacity) table rebuild is free in
    # amortized terms. 0 disables auto-rebase (out-of-envelope points then
    # drop LOUDLY via the num_oob_points counter).
    rebase_trigger_voxels: int = 4096
    # Shard the voxel map's slots over this many devices (power of two).
    # 1 = replicated map (single-device path). >1 selects the map-sharded
    # engine (parallel/sharded_map.py): per-device map memory drops by the
    # shard count; NN answers combine over a ppermute ring and the normal
    # equations psum over the mesh. Requires >= map_shards devices.
    map_shards: int = 1

    @property
    def map_capacity(self) -> int:
        return 1 << self.map_capacity_log2


@dataclass
class KISSConfig:
    out_dir: str = "results"
    data: DataConfig = field(default_factory=DataConfig)
    registration: RegistrationConfig = field(default_factory=RegistrationConfig)
    mapping: MappingConfig = field(default_factory=MappingConfig)
    adaptive_threshold: AdaptiveThresholdConfig = field(default_factory=AdaptiveThresholdConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)


def _update_dataclass(obj: Any, values: Dict[str, Any], path: str = "") -> None:
    field_names = {f.name for f in dataclasses.fields(obj)}
    for key, val in values.items():
        # Real fields only: `hasattr` also matched read-only properties
        # (e.g. engine.map_capacity), which then failed with an opaque
        # "can't set attribute" instead of naming the unknown key.
        if key not in field_names:
            raise ValueError(f"Unknown config key: {path}{key}")
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur):
            if not isinstance(val, dict):
                raise ValueError(
                    f"Config section '{path}{key}' must be a mapping, got "
                    f"{type(val).__name__} ({val!r})"
                )
            _update_dataclass(cur, val, path=f"{path}{key}.")
        else:
            # Coerce to the current value's scalar type: YAML/env sources
            # deliver strings/ints where the schema holds floats/bools (the
            # reference's pydantic loader coerced; an uncoerced "100" max_range
            # would crash far away inside jitted code).
            if cur is not None and val is not None \
                    and not isinstance(val, type(cur)):
                try:
                    if isinstance(cur, bool):
                        if isinstance(val, str):
                            val = val.strip().lower() in ("1", "true", "yes",
                                                          "on")
                        else:
                            val = bool(val)
                    elif isinstance(cur, int):
                        val = int(val)
                    elif isinstance(cur, float):
                        val = float(val)
                    elif isinstance(cur, str):
                        val = str(val)
                except (TypeError, ValueError) as e:
                    raise ValueError(
                        f"Config key '{path}{key}' expects "
                        f"{type(cur).__name__}, got {val!r}"
                    ) from e
            setattr(obj, key, val)


def config_from_dict(values: Dict[str, Any]) -> KISSConfig:
    cfg = KISSConfig()
    _update_dataclass(cfg, values or {})
    return cfg


def config_to_dict(cfg: KISSConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
