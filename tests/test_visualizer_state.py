"""Headless tests of the visualizer control state machine (the logic the
reference only exercises inside a live polyscope window,
tools/visualizer.py:167-296)."""

import datetime

import numpy as np
from scipy.spatial.transform import Rotation

from kiss_icp_tpu.tools.visualizer_state import VisualizerState


def _pose(yaw=0.5, t=(10.0, 3.0, 1.0)):
    p = np.eye(4)
    p[:3, :3] = Rotation.from_euler("z", yaw).as_matrix()
    p[:3, 3] = t
    return p


def test_play_pause_toggle():
    st = VisualizerState()
    assert not st.play_mode
    st.toggle_play()
    assert st.play_mode
    st.toggle_play()
    assert not st.play_mode


def test_blocking_until_step():
    """Paused: the tick loop runs until a STEP arrives, then returns once."""
    st = VisualizerState()
    ticks = []

    def tick():
        ticks.append(1)
        if len(ticks) == 5:
            st.request_step()

    st.run_blocking_ticks(tick)
    assert len(ticks) == 5


def test_blocking_released_by_play():
    st = VisualizerState()
    ticks = []

    def tick():
        ticks.append(1)
        if len(ticks) == 3:
            st.toggle_play()

    st.run_blocking_ticks(tick)
    assert len(ticks) == 3 and st.play_mode

    # In play mode: exactly one tick per frame, no blocking.
    st.run_blocking_ticks(tick)
    assert len(ticks) == 4


def test_blocking_released_by_quit():
    st = VisualizerState()

    def tick():
        st.request_quit()

    st.run_blocking_ticks(tick)
    assert st.quit_requested


def test_step_ignored_while_playing():
    st = VisualizerState(play_mode=True)
    st.request_step()
    assert not st._step_requested


def test_local_view_transforms():
    """Egocentric: frame/keypoints at origin, map moved by pose^-1."""
    st = VisualizerState()
    pose = _pose()
    st.on_new_frame(pose)
    np.testing.assert_allclose(st.frame_view().transform, np.eye(4))
    np.testing.assert_allclose(st.keypoints_view().transform, np.eye(4))
    np.testing.assert_allclose(st.map_view().transform, np.linalg.inv(pose))
    assert not st.show_trajectory


def test_global_view_transforms():
    st = VisualizerState()
    pose = _pose()
    st.on_new_frame(pose)
    st.toggle_global_view()
    np.testing.assert_allclose(st.frame_view().transform, pose)
    np.testing.assert_allclose(st.keypoints_view().transform, pose)
    np.testing.assert_allclose(st.map_view().transform, np.eye(4))
    assert st.show_trajectory


def test_trajectory_accumulates():
    st = VisualizerState()
    for i in range(4):
        st.on_new_frame(_pose(t=(float(i), 0, 0)))
    traj = st.trajectory_points()
    assert traj.shape == (4, 3)
    np.testing.assert_allclose(traj[:, 0], [0, 1, 2, 3])


def test_info_panel_sorted_short_labels_first():
    st = VisualizerState()
    st.on_new_frame(np.eye(4), infos={"longer_label": 2, "fps": 1, "medium": 3})
    assert list(st.vis_infos) == ["fps", "medium", "longer_label"]


def test_pick_trajectory_pose():
    st = VisualizerState()
    st.on_new_frame(_pose(t=(1.5, -2.25, 0.125)))
    st.pick_trajectory_pose(0)
    assert "1.500" in st.selected_pose and "-2.250" in st.selected_pose
    st.pick_trajectory_pose(99)
    assert st.selected_pose == ""


def test_screenshot_filename_format():
    now = datetime.datetime(2026, 8, 17, 12, 34, 56)
    assert VisualizerState.screenshot_filename(now) == (
        "kiss_icp_tpu_2026-08-17_12-34-56.jpg"
    )


def test_cloud_toggles_and_sizes_flow_into_views():
    st = VisualizerState()
    st.show_map = False
    st.map_size = 0.3
    view = st.map_view()
    assert not view.enabled
    assert view.size == 0.3
