"""Web GUI coverage: the stdlib HTTP server + presentation logic in gui/web.py,
driven end-to-end over real sockets with a fake SceneService.

The interaction model mirrors the reference GUI (GUI/app_interface.py:218-341):
boxes per frame (click hit-testing), trajectory preview polyline, selection
highlighting, RUN -> one synthesis request over the selected ids. Unlike the Qt
tests (tests/test_gui.py, stub-Qt), these exercise the full transport: request
parsing, PNG encoding, JSON marshalling, and error paths.
"""
import json
import threading
import urllib.request

import numpy as np
import pytest

from future_urban_scene_generation_tpu.gui import web

pytestmark = pytest.mark.smoke

FRAME_HW = (120, 160)


class _FakeReader:
    def read(self, frame_id):
        if frame_id > 20:
            return None
        return np.zeros(FRAME_HW + (3,), np.float32)


class _FakeService:
    """Same attribute surface of SceneService that the GUI layer touches."""

    def __init__(self, tmp_path=None):
        self.frame_hw = FRAME_HW
        rows = []
        for f in range(1, 21):
            rows.append([f, 7, 10 + f, 20, 40, 30])
            rows.append([f, 9, 100, 60, 30, 25])
        self.trajectories = np.asarray(rows, np.float64)
        self.reader = _FakeReader()
        self.requests = []
        self._tmp = tmp_path

    def run_request(self, frame_id, ids):
        self.requests.append((frame_id, list(ids)))
        paths = []
        for i in ids:
            p = self._tmp / f"out_{frame_id}_{i}.png"
            p.write_bytes(web.encode_png(
                np.full((8, 8, 3), i, np.uint8)))
            paths.append(p)
        return paths


class _Cfg:
    frame_id = 1
    bbox_scale = 1.0


@pytest.fixture
def server(tmp_path):
    svc = _FakeService(tmp_path)
    srv = web.make_server(_Cfg(), port=0, service=svc)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv, svc, base
    srv.shutdown()
    srv.server_close()
    thread.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_index_serves_page(server):
    _srv, _svc, base = server
    status, ctype, body = _get(base + "/")
    assert status == 200 and ctype.startswith("text/html")
    page = body.decode()
    assert "RUN" in page and "dblclick" in page and "Backspace" in page
    assert "let frameId = 1," in page  # cfg.frame_id threaded into the page


def test_boxes_json(server):
    _srv, _svc, base = server
    status, ctype, body = _get(base + "/boxes/3")
    assert status == 200 and ctype == "application/json"
    boxes = {b["id"]: b for b in json.loads(body)}
    assert set(boxes) == {7, 9}
    assert boxes[7]["x0"] == 13 and boxes[7]["y0"] == 20  # x_min = 10 + f


def test_frame_png_plain_and_annotated(server):
    _srv, _svc, base = server
    for q in ("", "?preview=7&selected=9", "?preview=9", "?selected=7,9"):
        status, ctype, body = _get(base + "/frame/2.png" + q)
        assert status == 200 and ctype == "image/png"
        assert body.startswith(b"\x89PNG\r\n\x1a\n")


def test_out_of_range_frame_is_404(server):
    _srv, _svc, base = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base + "/frame/999.png")
    assert exc.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base + "/nonsense")
    assert exc.value.code == 404


def test_run_roundtrip_and_results(server):
    srv, svc, base = server
    req = urllib.request.Request(
        base + "/run", method="POST",
        data=json.dumps({"frame_id": 4, "ids": [7, 9]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        out = json.loads(resp.read())
    assert svc.requests == [(4, [7, 9])]
    assert len(out["outputs"]) == 2
    status, ctype, body = _get(base + "/results/1.png")
    assert status == 200 and ctype == "image/png"
    assert body.startswith(b"\x89PNG")
    # Results index is bounded by the last run.
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base + "/results/5.png")
    assert exc.value.code == 404


def test_hit_test_matches_reference_iteration(tmp_path):
    gui = web.WebGUI(_Cfg(), service=_FakeService(tmp_path))
    assert gui.hit_test(1, 15, 25) == 7  # inside vehicle 7's box at frame 1
    assert gui.hit_test(1, 110, 70) == 9
    assert gui.hit_test(1, 1, 1) is None


def test_encode_png_stdlib_fallback_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (13, 17, 3), np.uint8)
    # Force the zlib path by calling the internals the way the fallback does:
    # decode with cv2 (independent codec) and compare exactly.
    import struct
    import zlib

    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    cv2 = pytest.importorskip("cv2")
    decoded = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decoded[..., ::-1], img)


def test_draw_helpers_clip_to_bounds():
    img = np.zeros((10, 10, 3), np.uint8)
    web._draw_rect(img, (-5, -5, 20, 20), (255, 0, 0))
    web._draw_polyline(img, [(-3, 5), (15, 5)], (0, 255, 0))
    assert img[5, 5, 1] == 255  # polyline passes through the middle
    assert img.shape == (10, 10, 3)  # no exception, clipped in place
