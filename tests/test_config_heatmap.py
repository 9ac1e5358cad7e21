"""Config tree + training-time heatmap utilities."""
import numpy as np
import torch
import jax.numpy as jnp

from future_urban_scene_generation_tpu.config import EdgeConnectConfig, PipelineConfig
from future_urban_scene_generation_tpu.ops import heatmap as hm


def test_edgeconnect_config_defaults_match_reference():
    # edgeconnect/config.py:31-66 defaults.
    cfg = EdgeConnectConfig()
    assert cfg.sigma == 2.0
    assert cfg.fm_loss_weight == 10.0
    assert cfg.inpaint_adv_loss_weight == 0.01
    assert cfg.gan_loss == "nsgan"
    assert cfg.lr == 1e-4 and cfg.d2g_lr == 0.1
    assert (cfg.beta1, cfg.beta2) == (0.0, 0.9)


def test_edgeconnect_yaml_override(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text("SIGMA: 1.5\nGAN_LOSS: lsgan\nLR: 0.0002\n")
    cfg = EdgeConnectConfig.from_yaml(p)
    assert cfg.sigma == 1.5
    assert cfg.gan_loss == "lsgan"
    assert cfg.lr == 2e-4
    assert cfg.fm_loss_weight == 10.0  # untouched default


def test_pipeline_config_inference_overrides(tmp_path):
    ckpt = tmp_path / "ckpts"
    (ckpt / "inpainting").mkdir(parents=True)
    (ckpt / "inpainting" / "config.yml").write_text("MODE: 1\nSIGMA: 3\n")
    cfg = PipelineConfig(checkpoints_dir=ckpt, inpaint_model=2)
    cfg.load_edgeconnect_yaml()
    # utils/inpaint_utils.py:15-17 forces MODE=2, MODEL=args, INPUT_SIZE=0.
    assert cfg.edgeconnect.mode == 2
    assert cfg.edgeconnect.model == 2
    assert cfg.edgeconnect.input_size == 0
    assert cfg.edgeconnect.sigma == 3


def test_kpoint_heatmap_matches_reference_formula():
    # utils/keypoint_utils.py:45-56 (numpy oracle).
    kp = np.array([0.3, 0.6])
    sigma = 4.0
    map_h = map_w = 32
    x, y = kp[0] * map_w, kp[1] * map_h
    xy = np.mgrid[:map_w, :map_h].transpose(2, 1, 0)
    ref = np.exp(-np.sum((xy - (x, y)) ** 2, -1) / sigma**2)
    ref /= ref.max() + np.finfo("float32").eps
    ours = np.asarray(hm.kpoint_to_heatmap(jnp.asarray(kp, jnp.float32), (32, 32), sigma))
    assert np.abs(ours - ref).max() < 1e-5


def test_kpoint_heatmap_missing():
    out = np.asarray(hm.kpoint_to_heatmap(jnp.asarray([-1.0, 0.5]), (16, 16), 2.0))
    assert out.sum() == 0.0


def test_heatmaps_batch_shape():
    kps = jnp.asarray(np.random.RandomState(0).rand(12, 2), jnp.float32)
    maps = hm.heatmaps_from_kpoints(kps, (64, 64), 2.0)
    assert maps.shape == (64, 64, 12)
    assert float(maps.max()) <= 1.0
