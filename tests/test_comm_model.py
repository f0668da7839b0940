"""Static communication model of the distributed programs (VERDICT r3 #7).

The collective traffic of the map-sharded GN loop is a pure function of the
config and the mesh — these tests pin the model (sharded_map.ring_payload_
bytes / expected_collective_permutes, published in docs/SCALING.md) against
the actually-lowered StableHLO: op counts, payload shapes, and the locality
of every collective-permute (rings must stay within a map row — a permute
crossing the "seq" axis would put NN traffic on DCN in a multi-host pod).
"""

import re
from collections import Counter

import numpy as np
import jax
from jax.sharding import Mesh

from kiss_icp_tpu.config.schema import KISSConfig
from kiss_icp_tpu.parallel import pod, sharded_map

S_CAP = 512


def _config():
    cfg = KISSConfig()
    cfg.data.max_range = 50.0
    cfg.data.min_range = 1.0
    cfg.mapping.voxel_size = 0.5
    cfg.engine.max_points_per_frame = 2048
    cfg.engine.frame_capacity = 2048
    cfg.engine.source_capacity = S_CAP
    cfg.engine.map_capacity_log2 = 14
    cfg.engine.donate_state = False
    cfg.registration.max_num_iterations = 12
    return cfg


def _permute_ops(txt):
    """(operand tensor type, source_target_pairs) of every collective_permute."""
    ops = []
    for m in re.finditer(
        r'collective_permute"\([^)]*\).*?source_target_pairs = '
        r"dense<\[(.*?)\]> : tensor<[^>]*>.*?: \(tensor<([^>]+)>\)",
        txt,
    ):
        pairs = [
            tuple(int(v) for v in p.split(","))
            for p in re.findall(r"\[(\d+,\s*\d+)\]", m.group(1))
        ]
        ops.append((m.group(2), pairs))
    return ops


def _all_reduce_shapes(txt):
    # all_reduce is a region op: the type annotation follows the reducer
    # block's closing brace.
    return re.findall(r'all_reduce".*?\}\) : \(tensor<([^>]+)>\)', txt,
                      re.DOTALL)


def _model_shapes():
    """Expected ring payload tensor types: d2 (S,) f32, nn (S,3) f32,
    shard-id (S,) i32."""
    return {f"{S_CAP}xf32", f"{S_CAP}x3xf32", f"{S_CAP}xi32"}


def test_map_sharded_collectives_match_model():
    d = 4
    cfg = _config()
    mesh = Mesh(np.asarray(jax.devices())[:d].reshape(d), ("map",))
    step = sharded_map.make_map_sharded_step(cfg, mesh)
    state = sharded_map.init_sharded_state(cfg, mesh)
    pts = np.zeros((2048, 3), np.float32)
    ts = np.zeros((2048,), np.float32)
    valid = np.ones((2048,), bool)
    txt = step.lower(state, pts, ts, valid).as_text()

    ops = _permute_ops(txt)
    # Count: 3(D-1) inside the GN while body + 2(D-1) in the post-loop
    # diagnostic ring (unused neighbor payload dead-code-eliminated).
    assert len(ops) == sharded_map.expected_collective_permutes(d), (
        len(ops), Counter(t for t, _ in ops))
    # Payloads: exactly the modeled three arrays, nothing bigger.
    assert {t for t, _ in ops} <= _model_shapes(), Counter(t for t, _ in ops)
    # Every permute is the full one-hop ring over the map axis.
    ring = {(i, (i + 1) % d) for i in range(d)}
    for t, pairs in ops:
        assert set(pairs) == ring, (t, pairs)

    # Per-iteration ring bytes = (D-1) hops x 20 B per source row.
    assert sharded_map.ring_payload_bytes(cfg, d) == (d - 1) * S_CAP * 20
    # In-loop ring ops per iteration.
    assert sharded_map.ring_collective_permutes_per_gn_iteration(d) == 3 * (d - 1)

    # The psum'd payloads are latency-class, never bandwidth-class: the
    # largest all-reduce is the 6x6 normal matrix.
    def elems(t):
        dims = [int(x) for x in re.findall(r"(\d+)x", t)]
        return int(np.prod(dims)) if dims else 1

    ar = _all_reduce_shapes(txt)
    assert ar, "expected psum'd normal equations"
    assert max(elems(t) for t in ar) <= 36, Counter(ar)


def test_pod_collectives_stay_on_map_rows():
    """The composed ("seq", "map") program must keep every NN ring inside a
    map row (ICI in a real pod) and cross the seq axis only with the scalar
    any-active psum — sequences exchange no point data (that independence is
    what makes seq the DCN axis; docs/SCALING.md)."""
    s, d = 2, 4
    cfg = _config()
    mesh = pod.make_pod_mesh(s, d)
    step = pod.make_pod_chunked_step(cfg, mesh)
    state = pod.init_pod_state(cfg, mesh, batch=s)
    k, n = 2, 2048
    pts = np.zeros((s, k, n, 3), np.float32)
    ts = np.zeros((s, k, n), np.float32)
    valid = np.ones((s, k, n), bool)
    txt = step.lower(state, pts, ts, valid).as_text()

    ops = _permute_ops(txt)
    assert len(ops) == sharded_map.expected_collective_permutes(d), (
        len(ops), Counter(t for t, _ in ops))
    assert {t for t, _ in ops} <= _model_shapes(), Counter(t for t, _ in ops)
    # Mesh (seq=2, map=4) on devices 0..7: row r owns ids {4r .. 4r+3}; a
    # ring pair must never leave its row.
    for t, pairs in ops:
        for a, b in pairs:
            assert a // d == b // d, (
                f"collective_permute {t} crosses the seq axis: {pairs}")

    # all_reduce payloads stay scalar/tiny across BOTH axes: the seq axis
    # carries only the GN loop's any-active flag (sync_axis), the map axis
    # the normal equations.
    def elems(t):
        dims = [int(x) for x in re.findall(r"(\d+)x", t)]
        return int(np.prod(dims)) if dims else 1

    ar = _all_reduce_shapes(txt)
    assert ar and max(elems(t) for t in ar) <= 36, Counter(ar)
