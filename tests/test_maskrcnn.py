"""Mask R-CNN parity: reduced-config torch mirror + golden geometry math.

torchvision is absent in this image, so the mirror below re-builds the reduced
architecture from torch.nn primitives with torchvision's exact state-dict key
layout (maskrcnn/inference.py:19-24 loads ``maskrcnn_resnet50_fpn``); the anchor /
box-coder / level-mapper math is tested against closed-form numpy re-derivations
of the torchvision formulas.
"""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models import maskrcnn as mr
import pytest

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow

rng = np.random.RandomState(7)


# ---------------------------------------------------------------------------
# Reduced torch mirror (torchvision key layout)
# ---------------------------------------------------------------------------

def _bn(c):
    bn = tnn.BatchNorm2d(c)
    bn.running_mean.data = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1)
    bn.running_var.data = torch.from_numpy(
        (rng.rand(c).astype(np.float32) * 0.5 + 0.5)
    )
    bn.weight.data = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1 + 1.0)
    bn.bias.data = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1)
    return bn


class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride, downsample):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = _bn(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _bn(planes * 4)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False), _bn(planes * 4)
            )
        else:
            self.downsample = None

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        idn = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + idn)


class TBody(tnn.Module):
    def __init__(self, width=8):
        super().__init__()
        w = width
        self.conv1 = tnn.Conv2d(3, w, 7, 2, 3, bias=False)
        self.bn1 = _bn(w)
        for stage in range(4):
            planes = w * 2 ** stage
            cin = w if stage == 0 else w * 2 ** (stage - 1) * 4
            stride = 1 if stage == 0 else 2
            setattr(
                self, f"layer{stage + 1}",
                tnn.Sequential(TBottleneck(cin, planes, stride, True)),
            )

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            outs.append(x)
        return outs


class TFpn(tnn.Module):
    def __init__(self, chans, out=16):
        super().__init__()
        self.inner_blocks = tnn.ModuleList([tnn.Conv2d(c, out, 1) for c in chans])
        self.layer_blocks = tnn.ModuleList(
            [tnn.Conv2d(out, out, 3, padding=1) for _ in chans]
        )

    def forward(self, feats):
        inners = [blk(f) for blk, f in zip(self.inner_blocks, feats)]
        merged = [inners[-1]]
        for inner in inners[-2::-1]:
            up = F.interpolate(merged[0], scale_factor=2, mode="nearest")
            merged.insert(0, inner + up[:, :, : inner.shape[2], : inner.shape[3]])
        outs = [blk(m) for blk, m in zip(self.layer_blocks, merged)]
        outs.append(F.max_pool2d(outs[-1], 1, 2, 0))
        return outs


class TBackbone(tnn.Module):
    def __init__(self, width=8, out=16):
        super().__init__()
        self.body = TBody(width)
        self.fpn = TFpn([width * 2 ** s * 4 for s in range(4)], out)

    def forward(self, x):
        return self.fpn(self.body(x))


class TRPNHead(tnn.Module):
    def __init__(self, c=16, a=3):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)
        self.cls_logits = tnn.Conv2d(c, a, 1)
        self.bbox_pred = tnn.Conv2d(c, a * 4, 1)

    def forward(self, feats):
        logits, deltas = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            logits.append(self.cls_logits(t))
            deltas.append(self.bbox_pred(t))
        return logits, deltas


class TRPN(tnn.Module):
    def __init__(self, c=16):
        super().__init__()
        self.head = TRPNHead(c)


class TBoxHead(tnn.Module):
    def __init__(self, c=16, rep=32):
        super().__init__()
        self.fc6 = tnn.Linear(c * 49, rep)
        self.fc7 = tnn.Linear(rep, rep)

    def forward(self, x):
        x = x.flatten(1)
        return F.relu(self.fc7(F.relu(self.fc6(x))))


class TBoxPredictor(tnn.Module):
    def __init__(self, rep=32, nc=5):
        super().__init__()
        self.cls_score = tnn.Linear(rep, nc)
        self.bbox_pred = tnn.Linear(rep, nc * 4)


class TMaskHead(tnn.Module):
    def __init__(self, c=16):
        super().__init__()
        for i in range(1, 5):
            setattr(self, f"mask_fcn{i}", tnn.Conv2d(c, c, 3, padding=1))

    def forward(self, x):
        for i in range(1, 5):
            x = F.relu(getattr(self, f"mask_fcn{i}")(x))
        return x


class TMaskPredictor(tnn.Module):
    def __init__(self, c=16, nc=5):
        super().__init__()
        self.conv5_mask = tnn.ConvTranspose2d(c, c, 2, 2, 0)
        self.mask_fcn_logits = tnn.Conv2d(c, nc, 1)


class TRoiHeads(tnn.Module):
    def __init__(self, c=16, rep=32, nc=5):
        super().__init__()
        self.box_head = TBoxHead(c, rep)
        self.box_predictor = TBoxPredictor(rep, nc)
        self.mask_head = TMaskHead(c)
        self.mask_predictor = TMaskPredictor(c, nc)


class TMaskRCNN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()
        self.rpn = TRPN()
        self.roi_heads = TRoiHeads()


def _setup():
    tmodel = TMaskRCNN().eval()
    params = mr.convert_maskrcnn(tmodel.state_dict())
    jmodel = mr.MaskRCNN(
        num_classes=5, layers=(1, 1, 1, 1), width=8, out_channels=16,
        representation_size=32,
    )
    return tmodel, jmodel, params


def test_backbone_and_rpn_parity():
    tmodel, jmodel, params = _setup()
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        tfeats = tmodel.backbone(xt)
        tlogits, tdeltas = tmodel.rpn.head(tfeats)

    jfeats = jmodel.apply(params, jnp.asarray(x), method=mr.MaskRCNN.features)
    assert len(jfeats) == 5
    for tf, jf in zip(tfeats, jfeats):
        ref = tf.numpy().transpose(0, 2, 3, 1)
        assert np.abs(np.asarray(jf) - ref).max() < 2e-4, jf.shape

    jlogits, jdeltas = jmodel.apply(params, jfeats, method=mr.MaskRCNN.rpn_head)
    for tl, jl in zip(tlogits, jlogits):
        assert np.abs(np.asarray(jl) - tl.numpy().transpose(0, 2, 3, 1)).max() < 2e-4
    for td, jd in zip(tdeltas, jdeltas):
        assert np.abs(np.asarray(jd) - td.numpy().transpose(0, 2, 3, 1)).max() < 2e-4


def test_box_and_mask_head_parity():
    tmodel, jmodel, params = _setup()
    pooled = rng.rand(6, 7, 7, 16).astype(np.float32)
    pooled_t = torch.from_numpy(pooled.transpose(0, 3, 1, 2))
    with torch.no_grad():
        feat = tmodel.roi_heads.box_head(pooled_t)
        tscores = tmodel.roi_heads.box_predictor.cls_score(feat).numpy()
        tboxes = tmodel.roi_heads.box_predictor.bbox_pred(feat).numpy()
    jscores, jboxes = jmodel.apply(
        params, jnp.asarray(pooled), method=mr.MaskRCNN.box_heads
    )
    assert np.abs(np.asarray(jscores) - tscores).max() < 2e-4
    assert np.abs(np.asarray(jboxes) - tboxes).max() < 2e-4

    mp = rng.rand(4, 14, 14, 16).astype(np.float32)
    mp_t = torch.from_numpy(mp.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = tmodel.roi_heads.mask_head(mp_t)
        h = F.relu(tmodel.roi_heads.mask_predictor.conv5_mask(h))
        tmask = tmodel.roi_heads.mask_predictor.mask_fcn_logits(h).numpy()
    jmask = jmodel.apply(params, jnp.asarray(mp), method=mr.MaskRCNN.mask_heads)
    assert np.abs(np.asarray(jmask) - tmask.transpose(0, 2, 3, 1)).max() < 2e-4


# ---------------------------------------------------------------------------
# Geometry golden math (torchvision formulas re-derived in numpy)
# ---------------------------------------------------------------------------

def test_cell_anchors_golden():
    # torchvision generate_anchors: ws = sqrt(1/ratio)*size, hs = sqrt(ratio)*size,
    # rounded.
    got = np.asarray(mr.cell_anchors(64.0))
    for i, r in enumerate((0.5, 1.0, 2.0)):
        w = 64.0 * math.sqrt(1.0 / r)
        h = 64.0 * math.sqrt(r)
        exp = np.round(np.array([-w / 2, -h / 2, w / 2, h / 2]))
        np.testing.assert_allclose(got[i], exp)


def test_grid_anchors_layout():
    a = np.asarray(mr.grid_anchors(2, 3, 16, 32.0))
    assert a.shape == (2 * 3 * 3, 4)
    # Anchor 0 of cell (0,0) vs cell (0,1): shifted by stride in x.
    np.testing.assert_allclose(a[3] - a[0], [16, 0, 16, 0])
    # Cell (1,0) starts after one full row (3 cells * 3 anchors).
    np.testing.assert_allclose(a[9] - a[0], [0, 16, 0, 16])


def test_decode_boxes_golden():
    anchors = np.array([[10.0, 20.0, 50.0, 80.0]], np.float32)
    deltas = np.array([[0.1, -0.2, 0.3, 0.05]], np.float32)
    w, h = 40.0, 60.0
    cx, cy = 30.0, 50.0
    ncx = 0.1 * w + cx
    ncy = -0.2 * h + cy
    nw = math.exp(0.3) * w
    nh = math.exp(0.05) * h
    exp = [ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2]
    got = np.asarray(mr.decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)))[0]
    np.testing.assert_allclose(got, exp, rtol=1e-5)
    # Weighted variant divides the deltas first.
    got_w = np.asarray(
        mr.decode_boxes(
            jnp.asarray(deltas * np.array([10, 10, 5, 5], np.float32)),
            jnp.asarray(anchors), weights=(10.0, 10.0, 5.0, 5.0),
        )
    )[0]
    np.testing.assert_allclose(got_w, exp, rtol=1e-5)
    # dw/dh clamp at log(1000/16).
    big = np.array([[0.0, 0.0, 50.0, 0.0]], np.float32)
    got_big = np.asarray(mr.decode_boxes(jnp.asarray(big), jnp.asarray(anchors)))[0]
    assert (got_big[2] - got_big[0]) <= 40.0 * 1000 / 16 + 1


def test_fpn_level_mapping():
    # Canonical 224^2 box -> level 4 -> index 2 (p4).
    boxes = jnp.asarray(
        np.array(
            [
                [0, 0, 224, 224],
                [0, 0, 56, 56],    # 1/4 scale -> level 2 (p2)
                [0, 0, 112, 112],  # -> level 3
                [0, 0, 448, 448],  # -> level 5
                [0, 0, 2000, 2000],  # clamps at 5
                [0, 0, 4, 4],        # clamps at 2
            ],
            np.float32,
        )
    )
    lvls = np.asarray(mr.fpn_level(boxes))
    np.testing.assert_array_equal(lvls, [2, 0, 1, 3, 3, 0])


def test_infer_smoke_static_shapes():
    _, jmodel, params = _setup()
    img = jnp.asarray(rng.rand(128, 128, 3).astype(np.float32))
    det = mr.maskrcnn_infer(
        params, img, model=jmodel, pre_nms_top_n=50, post_nms_top_n=20,
        detections_per_img=8,
    )
    assert det.boxes.shape == (8, 4)
    assert det.masks.shape == (8, 28, 28)
    assert bool(jnp.isfinite(det.boxes).all())
    assert bool((det.scores >= 0).all())
    # Boxes are clipped to the image.
    assert float(det.boxes.min()) >= 0 and float(det.boxes.max()) <= 128


def test_maskrcnn_segmenter():
    from future_urban_scene_generation_tpu.models.detector import MaskRCNNSegmenter

    _, jmodel, params = _setup()
    seg = MaskRCNNSegmenter(
        params, model=jmodel, classes=(1, 2, 3, 4), min_iou=0.0,
        input_hw=(128, 128), mask_threshold=0.0,
    )
    frame = jnp.asarray(rng.rand(96, 160, 3).astype(np.float32))
    mask = seg(frame, jnp.asarray(np.float32([0, 0, 160, 96])))
    assert mask.shape == (96, 160) and mask.dtype == bool
    # With an impossible IoU gate nothing qualifies -> all-false mask.
    seg_none = MaskRCNNSegmenter(
        params, model=jmodel, classes=(1,), min_iou=1.1, input_hw=(128, 128)
    )
    mask2 = seg_none(frame, jnp.asarray(np.float32([0, 0, 160, 96])))
    assert not bool(mask2.any())
