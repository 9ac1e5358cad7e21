"""Golden tests for colorspace ops against OpenCV (the reference's implementation)."""
import cv2
import numpy as np
import pytest

from future_urban_scene_generation_tpu.ops import colorspace as cs


@pytest.fixture(scope="module")
def rgb_u8():
    return np.random.RandomState(0).randint(0, 256, (64, 48, 3), dtype=np.uint8)


def test_rgb_to_lab_matches_cv2(rgb_u8):
    lab_cv = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2LAB).astype(np.float32)
    lab = np.asarray(cs.rgb_to_lab(rgb_u8.astype(np.float32) / 255.0)) * 255.0
    # cv2's uint8 LUT path quantizes; allow ±2.5 uint8 steps.
    assert np.max(np.abs(lab - lab_cv)) <= 2.5


def test_lab_to_rgb_matches_cv2(rgb_u8):
    lab_u8 = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2LAB)
    rgb_cv = cv2.cvtColor(lab_u8, cv2.COLOR_LAB2RGB).astype(np.float32)
    rgb = np.asarray(cs.lab_to_rgb(lab_u8.astype(np.float32) / 255.0)) * 255.0
    assert np.max(np.abs(rgb - rgb_cv)) <= 3.0 + 1e-3


def test_lab_round_trip(rgb_u8):
    x = rgb_u8.astype(np.float32) / 255.0
    back = np.asarray(cs.lab_to_rgb(cs.rgb_to_lab(x)))
    assert np.max(np.abs(back - x)) < 0.01


def test_bgr_helpers_consistent(rgb_u8):
    x = rgb_u8.astype(np.float32) / 255.0
    assert np.allclose(
        np.asarray(cs.bgr_to_lab(x[..., ::-1])), np.asarray(cs.rgb_to_lab(x)), atol=1e-6
    )


def test_rgb_to_gray_matches_cv2(rgb_u8):
    gray_cv = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2GRAY).astype(np.float32)
    gray = np.asarray(cs.rgb_to_gray(rgb_u8.astype(np.float32) / 255.0))[..., 0] * 255.0
    assert np.max(np.abs(gray - gray_cv)) <= 1.0


def test_batched_shapes(rgb_u8):
    x = np.stack([rgb_u8, rgb_u8]).astype(np.float32) / 255.0
    assert cs.rgb_to_lab(x).shape == x.shape
    assert cs.rgb_to_gray(x).shape == x.shape[:-1] + (1,)
