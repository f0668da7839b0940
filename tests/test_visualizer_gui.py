"""Drive the interactive Kissualizer against a faithful fake polyscope.

VERDICT r3 next #4: the polyscope GUI shell (tools/visualizer.py) had never
executed — an API mismatch or a plain Python bug would only surface on a
user's machine (and one did: the `key` helper was shadowed by the info-panel
loop variable, so every tick after the first frame raised TypeError).

The fake mirrors the exact polyscope/imgui surface the REFERENCE viewer uses
(/root/reference/python/kiss_icp/tools/visualizer.py:96-271: init/
set_user_callback/register_point_cloud/frame_tick/get_selection/imgui
Button/IsKeyPressed/SliderFloat/Checkbox/ColorEdit3/TreeNodeEx), scripted per
tick, so every keyboard shortcut, button, slider, and the pick path runs for
real through Kissualizer.update().
"""

import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Fake imgui: one-shot per-tick events (keys, buttons, widget edits).
# ---------------------------------------------------------------------------

class FakeIO:
    def __init__(self):
        self.WantTextInput = False
        self.WantCaptureMouse = False
        self.MouseClicked = [False, False]


class FakeImgui(types.ModuleType):
    # Distinct sentinels; Kissualizer only compares identity via IsKeyPressed.
    (ImGuiKey_Space, ImGuiKey_N, ImGuiKey_S, ImGuiKey_G, ImGuiKey_C,
     ImGuiKey_Q, ImGuiKey_Escape) = range(7)
    ImGuiTreeNodeFlags_DefaultOpen = 1 << 5

    def __init__(self):
        super().__init__("polyscope.imgui")
        self.io = FakeIO()
        self.pressed_keys = set()
        self.clicked_buttons = set()
        self.slider_edits = {}    # label -> new value (one-shot)
        self.checkbox_edits = {}  # label -> new value (one-shot)
        self.color_edit = None    # new color (one-shot)
        self.texts = []           # TextUnformatted log (accumulates)
        self.buttons_seen = []

    def GetIO(self):
        return self.io

    def IsKeyPressed(self, k):
        return k in self.pressed_keys

    def Button(self, label):
        self.buttons_seen.append(label)
        return label in self.clicked_buttons

    def SameLine(self):
        pass

    def Separator(self):
        pass

    def TreeNodeEx(self, label, flags=0):
        return True

    def TextUnformatted(self, s):
        self.texts.append(s)

    def TreePop(self):
        pass

    def SliderFloat(self, label, value, v_min, v_max):
        assert v_min < v_max
        if label in self.slider_edits:
            return True, self.slider_edits.pop(label)
        return False, value

    def Checkbox(self, label, value):
        if label in self.checkbox_edits:
            return True, self.checkbox_edits.pop(label)
        return False, value

    def ColorEdit3(self, label, color):
        assert len(color) == 3
        if self.color_edit is not None:
            c, self.color_edit = self.color_edit, None
            return True, c
        return False, color

    def clear_tick_events(self):
        self.pressed_keys.clear()
        self.clicked_buttons.clear()
        self.io.MouseClicked = [False, False]


class FakeCloud:
    def __init__(self, name, points, color):
        points = np.asarray(points)
        assert points.ndim == 2 and points.shape[1] == 3, points.shape
        assert np.issubdtype(points.dtype, np.floating)
        self.name, self.points, self.color = name, points, color
        self.radius = None
        self.transform = np.eye(4)
        self.enabled = True

    def set_radius(self, r, relative=None):
        assert relative is False  # reference passes absolute sizes
        self.radius = float(r)

    def set_transform(self, t):
        t = np.asarray(t, np.float64)
        assert t.shape == (4, 4)
        self.transform = t

    def set_enabled(self, e):
        self.enabled = bool(e)


class FakePolyscope(types.ModuleType):
    def __init__(self, gui):
        super().__init__("polyscope")
        self.imgui = gui
        self._gui = gui
        self.inited = False
        self.clouds = {}
        self.user_callback = None
        self.background = None
        self.program_name = None
        self.ticks = 0
        self.screenshots = []
        self.camera_resets = 0
        self.unshown = False
        self.close_requested = False
        self.selection = None
        self.on_tick = {}  # tick index (1-based) -> callable injecting events

    def set_program_name(self, n):
        self.program_name = n

    def init(self):
        self.inited = True

    def set_ground_plane_mode(self, mode):
        assert mode in ("none", "tile", "tile_reflection", "shadow_only")

    def set_background_color(self, color):
        assert len(color) == 3
        self.background = tuple(float(c) for c in color)

    def set_verbosity(self, v):
        pass

    def set_user_callback(self, cb):
        self.user_callback = cb

    def set_build_default_gui_panels(self, b):
        pass

    def register_point_cloud(self, name, points, color=None,
                             point_render_mode=None):
        assert point_render_mode in (None, "quad", "sphere")
        cloud = FakeCloud(name, points, color)
        self.clouds[name] = cloud
        return cloud

    def has_point_cloud(self, name):
        return name in self.clouds

    def get_point_cloud(self, name):
        return self.clouds[name]

    def remove_point_cloud(self, name):
        del self.clouds[name]

    def frame_tick(self):
        self.ticks += 1
        if self.ticks in self.on_tick:
            self.on_tick.pop(self.ticks)()
        if self.user_callback is not None:
            self.user_callback()
        self._gui.clear_tick_events()
        if self.ticks > 500:
            raise AssertionError("GUI loop never released (500 ticks)")

    def window_requests_close(self):
        return self.close_requested

    def unshow(self):
        self.unshown = True

    def screenshot(self, filename):
        self.screenshots.append(filename)

    def reset_camera_to_home_view(self):
        self.camera_resets += 1

    def get_selection(self):
        return self.selection


class FakeOdometry:
    def __init__(self, map_points):
        self._map = np.asarray(map_points)

    def local_map_points(self):
        return self._map


@pytest.fixture()
def viz(monkeypatch):
    gui = FakeImgui()
    ps = FakePolyscope(gui)
    monkeypatch.setitem(sys.modules, "polyscope", ps)
    monkeypatch.setitem(sys.modules, "polyscope.imgui", gui)
    from kiss_icp_tpu.tools.visualizer import Kissualizer

    k = Kissualizer()
    return k, ps, gui


def _pose(x=0.0, y=0.0):
    p = np.eye(4)
    p[0, 3], p[1, 3] = x, y
    return p


def _frame_data(n=50, m=200):
    rng = np.random.default_rng(3)
    return (rng.normal(size=(n, 3)), rng.normal(size=(n // 2, 3)),
            FakeOdometry(rng.normal(size=(m, 3))))


def _update(k, ps, pose=None, **kw):
    frame, keypoints, odom = _frame_data(**kw)
    k.update(frame, keypoints, odom, _pose() if pose is None else pose)
    return frame, keypoints, odom


def test_init_wires_polyscope(viz):
    k, ps, gui = viz
    assert ps.inited
    assert ps.user_callback is not None
    assert ps.background == k.state.background_color
    assert "Visualizer" in ps.program_name


def test_update_registers_clouds_and_blocks_until_play(viz):
    k, ps, gui = viz
    # Paused (default): the update blocks in frame_tick loop until PLAY.
    ps.on_tick[3] = lambda: gui.pressed_keys.add(gui.ImGuiKey_Space)
    frame, keypoints, odom = _update(k, ps)
    assert ps.ticks == 3 and k.state.play_mode
    assert set(ps.clouds) == {"frame", "keypoints", "local_map"}
    np.testing.assert_array_equal(ps.clouds["frame"].points, frame)
    np.testing.assert_array_equal(ps.clouds["keypoints"].points, keypoints)
    np.testing.assert_array_equal(ps.clouds["local_map"].points,
                                  odom.local_map_points())
    # Local (egocentric) view: frame at origin, map moved by pose^-1.
    np.testing.assert_array_equal(ps.clouds["frame"].transform, np.eye(4))
    assert not ps.has_point_cloud("trajectory")
    # Info panel rendered the frame counters.
    assert any(t.startswith("frame: 1") for t in gui.texts)
    # In play mode the next update costs exactly one tick.
    _update(k, ps)
    assert ps.ticks == 4


def test_step_advances_one_frame_while_paused(viz):
    k, ps, gui = viz
    ps.on_tick[2] = lambda: gui.clicked_buttons.add("STEP")
    _update(k, ps)
    assert ps.ticks == 2 and not k.state.play_mode
    # Next update blocks again (still paused) until the N key steps.
    ps.on_tick[4] = lambda: gui.pressed_keys.add(gui.ImGuiKey_N)
    _update(k, ps)
    assert ps.ticks == 4


def test_screenshot_key(viz):
    k, ps, gui = viz

    def shot_then_play():
        gui.pressed_keys.add(gui.ImGuiKey_S)
        gui.pressed_keys.add(gui.ImGuiKey_Space)

    ps.on_tick[1] = shot_then_play
    _update(k, ps)
    assert len(ps.screenshots) == 1
    assert ps.screenshots[0].startswith("kiss_icp_tpu_")
    assert ps.screenshots[0].endswith(".jpg")


def test_global_view_toggle_places_clouds_in_world(viz):
    k, ps, gui = viz
    pose = _pose(10.0, -4.0)
    ps.on_tick[1] = lambda: gui.pressed_keys.add(gui.ImGuiKey_Space)
    _update(k, ps, pose=pose)
    ps.on_tick[2] = lambda: gui.pressed_keys.add(gui.ImGuiKey_G)
    _update(k, ps, pose=pose)
    assert k.state.global_view
    assert ps.camera_resets == 1
    np.testing.assert_array_equal(ps.clouds["frame"].transform, pose)
    np.testing.assert_array_equal(ps.clouds["keypoints"].transform, pose)
    np.testing.assert_array_equal(ps.clouds["local_map"].transform, np.eye(4))
    # Trajectory appears in global view, one point per registered frame.
    assert ps.has_point_cloud("trajectory")
    assert ps.clouds["trajectory"].points.shape == (2, 3)
    # Toggling back removes it and restores egocentric transforms.
    ps.on_tick[3] = lambda: gui.clicked_buttons.add("LOCAL VIEW")
    _update(k, ps, pose=pose)
    assert not k.state.global_view
    assert not ps.has_point_cloud("trajectory")
    np.testing.assert_array_equal(ps.clouds["frame"].transform, np.eye(4))
    np.testing.assert_allclose(ps.clouds["local_map"].transform,
                               np.linalg.inv(pose))


def test_center_viewpoint_button(viz):
    k, ps, gui = viz

    def center_then_play():
        gui.clicked_buttons.add("CENTER")
        gui.pressed_keys.add(gui.ImGuiKey_Space)

    ps.on_tick[1] = center_then_play
    _update(k, ps)
    assert ps.camera_resets == 1


def test_sliders_and_toggles_apply_to_clouds(viz):
    k, ps, gui = viz

    def edit_then_play():
        gui.slider_edits["##frame_size"] = 0.33
        gui.checkbox_edits["Local Map"] = False
        gui.pressed_keys.add(gui.ImGuiKey_Space)

    ps.on_tick[1] = edit_then_play
    _update(k, ps)
    assert k.state.frame_size == 0.33
    assert not k.state.show_map
    # _apply_view pushed the edits onto the live structures.
    assert ps.clouds["frame"].radius == 0.33
    assert not ps.clouds["local_map"].enabled
    assert ps.clouds["keypoints"].enabled


def test_background_color_edit(viz):
    k, ps, gui = viz

    def edit_then_play():
        gui.color_edit = (0.9, 0.8, 0.7)
        gui.pressed_keys.add(gui.ImGuiKey_Space)

    ps.on_tick[1] = edit_then_play
    _update(k, ps)
    assert k.state.background_color == (0.9, 0.8, 0.7)
    assert ps.background == (0.9, 0.8, 0.7)


def test_quit_key_exits_pipeline(viz):
    k, ps, gui = viz
    ps.on_tick[1] = lambda: gui.pressed_keys.add(gui.ImGuiKey_Q)
    with pytest.raises(SystemExit):
        _update(k, ps)
    assert ps.unshown


def test_window_close_quits_paused_session(viz):
    k, ps, gui = viz

    def close():
        ps.close_requested = True

    ps.on_tick[2] = close
    with pytest.raises(SystemExit):
        _update(k, ps)
    assert ps.unshown


def test_text_input_focus_suppresses_shortcuts(viz):
    k, ps, gui = viz

    def typing_q():
        gui.io.WantTextInput = True
        gui.pressed_keys.add(gui.ImGuiKey_Q)

    def release_and_play():
        gui.io.WantTextInput = False
        gui.pressed_keys.add(gui.ImGuiKey_Space)

    ps.on_tick[1] = typing_q
    ps.on_tick[2] = release_and_play
    _update(k, ps)  # no SystemExit: the Q went to the text field
    assert not k.state.quit_requested


def test_trajectory_pose_picking(viz):
    k, ps, gui = viz
    ps.on_tick[1] = lambda: gui.pressed_keys.add(gui.ImGuiKey_Space)
    _update(k, ps, pose=_pose(1.0, 2.0))
    ps.on_tick[2] = lambda: gui.pressed_keys.add(gui.ImGuiKey_G)
    _update(k, ps, pose=_pose(3.0, 4.0))

    class Pick:
        is_hit = True
        structure_name = "trajectory"
        structure_data = {"index": 1}

    def click():
        gui.io.MouseClicked = [True, False]
        ps.selection = Pick()

    ps.on_tick[3] = click
    _update(k, ps, pose=_pose(5.0, 6.0))
    assert "3.000" in k.state.selected_pose  # trajectory[1] = (3, 4, z)

    # A click the GUI consumed (WantCaptureMouse) must not clear it.
    def gui_click():
        gui.io.MouseClicked = [True, False]
        gui.io.WantCaptureMouse = True

    ps.on_tick[4] = gui_click
    _update(k, ps, pose=_pose(7.0, 8.0))
    assert "3.000" in k.state.selected_pose

    # A scene click off the trajectory clears the selection.
    class Miss:
        is_hit = False
        structure_name = ""
        structure_data = {}

    def miss_click():
        gui.io.WantCaptureMouse = False
        gui.io.MouseClicked = [True, False]
        ps.selection = Miss()

    ps.on_tick[5] = miss_click
    _update(k, ps, pose=_pose(9.0, 10.0))
    assert k.state.selected_pose == ""


def test_missing_polyscope_raises_importerror(monkeypatch):
    for name in ("polyscope", "polyscope.imgui"):
        monkeypatch.setitem(sys.modules, name, None)
    from kiss_icp_tpu.tools.visualizer import Kissualizer

    with pytest.raises(ImportError, match="polyscope"):
        Kissualizer()
