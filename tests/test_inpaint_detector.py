"""Inpainting stage + segmenter interface."""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models.detector import (
    BackgroundDiffSegmenter,
    MeshSilhouetteSegmenter,
)
from future_urban_scene_generation_tpu.models.edgeconnect import (
    EdgeGenerator,
    InpaintGenerator,
)
from future_urban_scene_generation_tpu.pipeline import inpaint
import pytest

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow


def _params():
    key = jax.random.PRNGKey(0)
    eg = EdgeGenerator().init(key, jnp.zeros((1, 64, 64, 3)))
    ig = InpaintGenerator().init(key, jnp.zeros((1, 64, 64, 4)))
    return eg, ig


def test_context_window_matches_reference_bbox_math():
    from future_urban_scene_generation_tpu.utils.bbox import BoundingBox

    bbox = [60.0, 100.0, 120.0, 140.0]  # xyxy
    win = inpaint.context_window(jnp.asarray(bbox), (240, 320))
    ref = BoundingBox(60, 100, 60, 40, bounds=(0, 319, 0, 239), scale=1.3).xyxy
    assert float(win.x_start) == ref[0]
    assert float(win.y_start) == ref[1]
    assert float(win.x_start + win.w) == ref[2]
    assert float(win.y_start + win.h) == ref[3]


def test_erase_vehicle_changes_masked_region_only():
    eg, ig = _params()
    rng = np.random.RandomState(17)
    frame = jnp.asarray(rng.rand(120, 160, 3).astype(np.float32))
    mask = np.zeros((120, 160), bool)
    mask[50:80, 60:100] = True
    bbox = jnp.asarray([60.0, 50.0, 100.0, 80.0])
    out = np.asarray(
        inpaint.erase_vehicle(eg, ig, frame, bbox, jnp.asarray(mask), sigma=2.0)
    )
    assert np.isfinite(out).all()
    # Far outside the context window: untouched.
    assert np.array_equal(out[:20], np.asarray(frame)[:20])
    # The masked interior was replaced (random-weight generator output differs).
    assert np.abs(out[60:70, 70:90] - np.asarray(frame)[60:70, 70:90]).mean() > 1e-3


def test_background_diff_segmenter():
    rng = np.random.RandomState(18)
    bg = jnp.asarray(rng.rand(64, 64, 3).astype(np.float32) * 0.1)
    frame = np.asarray(bg).copy()
    frame[20:40, 25:45] += 0.5
    seg = BackgroundDiffSegmenter(bg, threshold=0.3, dilate_ksize=0)
    mask = np.asarray(seg(jnp.asarray(frame), jnp.asarray([20.0, 15.0, 50.0, 45.0])))
    assert mask[30, 35]
    assert not mask[5, 5]
    assert not mask[30, 55]  # outside bbox


def test_mesh_silhouette_segmenter_dilates():
    sil = np.zeros((64, 64), bool)
    sil[30:34, 30:34] = True
    seg = MeshSilhouetteSegmenter(dilate_ksize=8)
    mask = np.asarray(seg(None, None, silhouette_frame=jnp.asarray(sil)))
    assert mask.sum() > sil.sum()
    assert mask[28, 30]  # grown
