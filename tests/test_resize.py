"""Golden tests for the resamplers against cv2.resize and torch F.interpolate."""
import cv2
import numpy as np
import torch
import torch.nn.functional as F

from future_urban_scene_generation_tpu.ops import resize as rz

rng = np.random.RandomState(1)


def _cv2_resize(img, out_hw):
    return cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)


def test_bilinear_upscale_matches_cv2():
    img = rng.rand(37, 53, 3).astype(np.float32)
    ours = np.asarray(rz.resize_bilinear(img, (256, 256)))
    ref = _cv2_resize(img, (256, 256))
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_bilinear_downscale_matches_cv2():
    img = rng.rand(257, 311, 3).astype(np.float32)
    ours = np.asarray(rz.resize_bilinear(img, (64, 96)))
    ref = _cv2_resize(img, (64, 96))
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_bilinear_batched():
    img = rng.rand(2, 5, 33, 41, 3).astype(np.float32)
    out = np.asarray(rz.resize_bilinear(img, (64, 64)))
    assert out.shape == (2, 5, 64, 64, 3)
    ref = _cv2_resize(img[1, 4], (64, 64))
    assert np.max(np.abs(out[1, 4] - ref)) < 1e-4


def test_nearest_matches_torch():
    img = rng.rand(12, 64, 64, 3).astype(np.float32)
    ours = np.asarray(rz.resize_nearest(img, (256, 256)))
    ref = (
        F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), (256, 256))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert np.array_equal(ours, ref)


def test_nearest_downscale_matches_torch():
    img = rng.rand(1, 100, 100, 3).astype(np.float32)
    ours = np.asarray(rz.resize_nearest(img, (47, 31)))
    ref = (
        F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), (47, 31))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert np.array_equal(ours, ref)


def test_upsample2x_matches_torch():
    img = rng.rand(2, 16, 16, 5).astype(np.float32)
    ours = np.asarray(rz.upsample2x_nearest(img))
    ref = (
        F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert np.array_equal(ours, ref)
