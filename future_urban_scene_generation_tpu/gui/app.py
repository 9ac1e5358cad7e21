"""Optional Qt GUI mirroring the reference's interaction model.

Parity target: GUI/app_interface.py:23-341 — frame navigation with arrow keys,
click to preview a vehicle's future trajectory, double-click to select vehicles,
Backspace to reset the selection, RUN to synthesize. The pipeline behind the RUN
button is the same SceneService the headless CLI uses; the GUI is pure presentation
and never touches device code directly.

PyQt5 is an optional dependency; importing this module without it raises ImportError
and the CLI falls back to headless mode.
"""
from __future__ import annotations

import numpy as np

from future_urban_scene_generation_tpu.utils.bbox import BoundingBox


def launch_gui(cfg, exec_loop: bool = True):
    """Build and run the GUI. ``exec_loop=False`` returns the (app, window) pair
    without entering the Qt event loop — the headless handler tests drive events
    on the window directly (PyQt5 is absent in CI; tests inject a stub Qt)."""
    import sys

    from PyQt5 import QtCore, QtGui, QtWidgets

    from future_urban_scene_generation_tpu.pipeline.service import SceneService
    from future_urban_scene_generation_tpu.utils import video as vio

    service = SceneService(cfg)

    class MainWindow(QtWidgets.QMainWindow):
        def __init__(self):
            super().__init__()
            self.setWindowTitle("Future scene synthesis (TPU)")
            self.frame_id = max(1, cfg.frame_id)
            self.selected_ids = []
            self.preview_id = None
            self.label = QtWidgets.QLabel()
            self.run_btn = QtWidgets.QPushButton("RUN")
            self.run_btn.clicked.connect(self.perform_test)
            central = QtWidgets.QWidget()
            layout = QtWidgets.QVBoxLayout(central)
            layout.addWidget(self.label)
            layout.addWidget(self.run_btn)
            self.setCentralWidget(central)
            self.refresh()

        def current_bboxes(self):
            rows = service.trajectories[service.trajectories[:, 0] == self.frame_id]
            h, w = service.frame_hw
            return {
                int(r[1]): BoundingBox(
                    *r[2:6], bounds=(0, w - 1, 0, h - 1), scale=cfg.bbox_scale
                )
                for r in rows
            }

        def refresh(self):
            frame = service.reader.read(self.frame_id)
            if frame is None:
                return
            img = (frame * 255).astype(np.uint8).copy()
            for vid, bbox in self.current_bboxes().items():
                color = (0, 255, 0) if vid in self.selected_ids else (255, 0, 0)
                try:
                    bbox.draw(img, color)
                except Exception:
                    pass
            if self.preview_id is not None:
                h, w = service.frame_hw
                rows = vio.select_future_track(
                    service.trajectories, self.preview_id, self.frame_id, stride=1,
                    steps=60,
                )
                pts = [
                    BoundingBox(*r[2:6], bounds=(0, w - 1, 0, h - 1),
                                scale=cfg.bbox_scale).mid_bottom
                    for r in rows
                ]
                try:
                    import cv2

                    for a, b in zip(pts[:-1], pts[1:]):
                        cv2.line(img, tuple(map(int, a)), tuple(map(int, b)),
                                 (255, 255, 0), 2)
                except ImportError:
                    pass
            h, w, _ = img.shape
            qimg = QtGui.QImage(img.tobytes(), w, h, 3 * w, QtGui.QImage.Format_RGB888)
            self.label.setPixmap(QtGui.QPixmap.fromImage(qimg))

        def mousePressEvent(self, event):
            # Single click previews the clicked vehicle's future trajectory as a
            # mid-bottom polyline (GUI/app_interface.py:244-273).
            pos = self.label.mapFrom(self, event.pos())
            point = (pos.x(), pos.y())
            for vid, bbox in self.current_bboxes().items():
                if bbox.contains(point):
                    self.preview_id = vid
                    break
            else:
                self.preview_id = None
            self.refresh()

        def mouseDoubleClickEvent(self, event):  # select vehicle
            pos = self.label.mapFrom(self, event.pos())
            point = (pos.x(), pos.y())
            for vid, bbox in self.current_bboxes().items():
                if bbox.contains(point) and vid not in self.selected_ids:
                    self.selected_ids.append(vid)
                    break
            self.refresh()

        def keyPressEvent(self, event):
            if event.key() == QtCore.Qt.Key_Backspace:
                self.selected_ids = []
            elif event.key() == QtCore.Qt.Key_Right:
                self.frame_id += 1
            elif event.key() == QtCore.Qt.Key_Left:
                self.frame_id = max(1, self.frame_id - 1)
            self.refresh()

        def perform_test(self):
            if not self.selected_ids:
                return
            paths = service.run_request(self.frame_id, self.selected_ids)
            QtWidgets.QMessageBox.information(
                self, "Done", "\n".join(str(p) for p in paths[:6])
            )

    app = QtWidgets.QApplication(sys.argv)
    window = MainWindow()
    window.show()
    if not exec_loop:
        return app, window
    return app.exec_()
