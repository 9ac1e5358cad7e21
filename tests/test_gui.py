"""Headless GUI handler coverage: gui/app.py's event logic driven through a stub
Qt (PyQt5 is not installed in this environment). Covers the reference's
interaction model (GUI/app_interface.py:244-341): click -> trajectory preview,
double-click -> selection, Backspace -> reset, arrows -> frame navigation,
RUN -> one synthesis request with the selected ids.
"""
import sys
import types

import numpy as np
import pytest


class _Signal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self):
        for fn in self._slots:
            fn()


class _QWidgetBase:
    def __init__(self, *a, **k):
        pass

    def setWindowTitle(self, *a):
        pass

    def setCentralWidget(self, *a):
        pass

    def show(self):
        pass


class _QLabel(_QWidgetBase):
    def __init__(self):
        self.pixmaps = []

    def setPixmap(self, p):
        self.pixmaps.append(p)

    def mapFrom(self, _w, pos):
        return pos


class _QPushButton(_QWidgetBase):
    def __init__(self, *_):
        self.clicked = _Signal()


class _QVBoxLayout:
    def __init__(self, *_):
        pass

    def addWidget(self, *_):
        pass


class _QMessageBox:
    infos = []

    @classmethod
    def information(cls, *a):
        cls.infos.append(a)


class _QApplication:
    def __init__(self, *_):
        pass

    def exec_(self):
        return 0


class _Pos:
    def __init__(self, x, y):
        self._x, self._y = x, y

    def x(self):
        return self._x

    def y(self):
        return self._y


class _Event:
    def __init__(self, x=0, y=0, key=None):
        self._pos = _Pos(x, y)
        self._key = key

    def pos(self):
        return self._pos

    def key(self):
        return self._key


@pytest.fixture
def stub_qt(monkeypatch):
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.Qt = types.SimpleNamespace(Key_Backspace=1, Key_Right=2, Key_Left=3)
    qtgui = types.ModuleType("PyQt5.QtGui")

    class _QImage:
        Format_RGB888 = 0

        def __init__(self, *a):
            pass

    qtgui.QImage = _QImage
    qtgui.QPixmap = types.SimpleNamespace(fromImage=lambda img: img)
    qtw = types.ModuleType("PyQt5.QtWidgets")
    qtw.QMainWindow = _QWidgetBase
    qtw.QLabel = _QLabel
    qtw.QPushButton = _QPushButton
    qtw.QWidget = _QWidgetBase
    qtw.QVBoxLayout = _QVBoxLayout
    qtw.QMessageBox = _QMessageBox
    qtw.QApplication = _QApplication
    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore, pyqt5.QtGui, pyqt5.QtWidgets = qtcore, qtgui, qtw
    for name, mod in (("PyQt5", pyqt5), ("PyQt5.QtCore", qtcore),
                      ("PyQt5.QtGui", qtgui), ("PyQt5.QtWidgets", qtw)):
        monkeypatch.setitem(sys.modules, name, mod)
    _QMessageBox.infos = []
    return pyqt5


class _FakeReader:
    def read(self, frame_id):
        if frame_id > 20:
            return None
        return np.zeros((120, 160, 3), np.float32)


class _FakeService:
    """Stands in for SceneService: same attributes the GUI touches."""

    last = None

    def __init__(self, cfg):
        _FakeService.last = self
        self.frame_hw = (120, 160)
        rows = []
        for f in range(1, 21):
            rows.append([f, 7, 10 + f, 20, 40, 30, ])
            rows.append([f, 9, 100, 60, 30, 25, ])
        self.trajectories = np.asarray(rows, np.float64)
        self.reader = _FakeReader()
        self.requests = []

    def run_request(self, frame_id, ids):
        self.requests.append((frame_id, list(ids)))
        return [f"/tmp/out_{frame_id}_{i}.png" for i in ids]


@pytest.fixture
def window(stub_qt, monkeypatch):
    from future_urban_scene_generation_tpu.pipeline import service as svc
    from future_urban_scene_generation_tpu.gui import app as gui_app

    monkeypatch.setattr(svc, "SceneService", _FakeService)
    cfg = types.SimpleNamespace(frame_id=1, bbox_scale=1.0)
    _app, win = gui_app.launch_gui(cfg, exec_loop=False)
    return win


def test_click_previews_trajectory(window):
    assert window.preview_id is None
    window.mousePressEvent(_Event(x=15, y=25))  # inside vehicle 7's bbox
    assert window.preview_id == 7
    window.mousePressEvent(_Event(x=5, y=5))  # empty space clears the preview
    assert window.preview_id is None


def test_double_click_selects_and_backspace_resets(window):
    window.mouseDoubleClickEvent(_Event(x=15, y=25))
    window.mouseDoubleClickEvent(_Event(x=110, y=70))
    assert window.selected_ids == [7, 9]
    window.mouseDoubleClickEvent(_Event(x=15, y=25))  # no duplicate selection
    assert window.selected_ids == [7, 9]
    window.keyPressEvent(_Event(key=1))  # Backspace
    assert window.selected_ids == []


def test_arrow_keys_navigate_frames(window):
    assert window.frame_id == 1
    window.keyPressEvent(_Event(key=2))  # Right
    window.keyPressEvent(_Event(key=2))
    assert window.frame_id == 3
    window.keyPressEvent(_Event(key=3))  # Left
    assert window.frame_id == 2
    window.keyPressEvent(_Event(key=3))
    window.keyPressEvent(_Event(key=3))  # clamps at 1
    assert window.frame_id == 1


def test_run_dispatches_selected_ids(window):
    svc = _FakeService.last
    window.perform_test()  # nothing selected: no request
    assert svc.requests == []
    window.mouseDoubleClickEvent(_Event(x=15, y=25))
    window.keyPressEvent(_Event(key=2))  # advance to frame 2
    window.perform_test()
    # The RUN handler sends the CURRENT frame + selection to the service once,
    # then shows the result paths (GUI/app_interface.py:218-242).
    assert svc.requests == [(2, [7])]
    assert len(_QMessageBox.infos) == 1
    assert len(window.label.pixmaps) > 0  # refresh rendered frames throughout
