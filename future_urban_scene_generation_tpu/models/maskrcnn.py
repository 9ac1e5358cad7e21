"""Mask R-CNN (ResNet50-FPN) — the reference's vehicle detector, TPU-native.

The reference calls torchvision's ``maskrcnn_resnet50_fpn(pretrained=True)`` for
instance masks (maskrcnn/inference.py:19-24, 41-64). This module re-implements the
detector with static shapes end-to-end so the whole inference path jits: fixed
proposal/detection counts with validity masks instead of data-dependent filtering.

Naming mirrors torchvision's state-dict paths through the mechanical converter
(models/convert.py): ``backbone.body.layer1.0.conv1.weight`` lands at flax path
``backbone/body/layer1_0/conv1/kernel`` etc., so ``convert_maskrcnn`` is a thin
wrapper over ``convert_state_dict``. BatchNorms are torchvision FrozenBatchNorm2d —
inference-mode ``TorchBatchNorm`` (running stats resident in params).

Geometry (anchors, box decoding, FPN level assignment, NMS thresholds) follows the
torchvision detection defaults the reference relies on:
  * anchors: sizes (32, 64, 128, 256, 512) x aspect (0.5, 1, 2) on strides
    (4, 8, 16, 32, 64);
  * RPN: 1000 pre-NMS top-k per level, IoU 0.7 NMS, 1000 post-NMS (eval);
  * box decode weights (1, 1, 1, 1) for RPN and (10, 10, 5, 5) for the box head,
    dw/dh clamped to log(1000/16);
  * RoIAlign (aligned=False in torchvision detection!) 7x7 for boxes / 14x14 for
    masks at level k = floor(4 + log2(sqrt(area)/224)) clamped to [2, 5];
  * postprocess: score > 0.05, per-class IoU-0.5 NMS, top 100 detections.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from future_urban_scene_generation_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    TorchLinear,
)
from future_urban_scene_generation_tpu.ops.detection import nms_static, roi_align


# ---------------------------------------------------------------------------
# Backbone: ResNet-50 body + FPN
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """torchvision resnet Bottleneck: 1x1 -> 3x3(stride) -> 1x1(4x), frozen BN."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = TorchConv(self.planes, 1, use_bias=False, name="conv1")(x)
        out = jax.nn.relu(TorchBatchNorm(self.planes, name="bn1")(out))
        out = TorchConv(
            self.planes, 3, self.stride, 1, use_bias=False, name="conv2"
        )(out)
        out = jax.nn.relu(TorchBatchNorm(self.planes, name="bn2")(out))
        out = TorchConv(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = TorchBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            idn = TorchConv(
                self.planes * 4, 1, self.stride, use_bias=False, name="downsample_0"
            )(x)
            idn = TorchBatchNorm(self.planes * 4, name="downsample_1")(idn)
        else:
            idn = x
        return jax.nn.relu(out + idn)


class ResNetBody(nn.Module):
    """ResNet trunk returning the four stage outputs (c2, c3, c4, c5)."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)  # ResNet-50
    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = TorchConv(w, 7, 2, 3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(TorchBatchNorm(w, name="bn1")(x))
        # torch MaxPool2d(3, 2, padding=1): pad with -inf then pool.
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs = []
        for stage, blocks in enumerate(self.layers):
            planes = w * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x)
            outs.append(x)
        return tuple(outs)


class FPN(nn.Module):
    """Feature Pyramid Network (inner 1x1 + layer 3x3, top-down nearest)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        inners = [
            TorchConv(self.out_channels, 1, name=f"inner_blocks_{i}")(f)
            for i, f in enumerate(feats)
        ]
        # Top-down pathway: upsample 2x nearest, add.
        merged = [inners[-1]]
        for inner in inners[-2::-1]:
            up = merged[0]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            up = up[:, : inner.shape[1], : inner.shape[2]]
            merged.insert(0, inner + up)
        outs = [
            TorchConv(self.out_channels, 3, padding=1, name=f"layer_blocks_{i}")(m)
            for i, m in enumerate(merged)
        ]
        # Extra P6 for the RPN: stride-2 max pool of P5 (LastLevelMaxPool).
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]


class Backbone(nn.Module):
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    out_channels: int = 256

    @nn.compact
    def __call__(self, x):
        feats = ResNetBody(self.layers, self.width, name="body")(x)
        return FPN(self.out_channels, name="fpn")(feats)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        conv = TorchConv(feats[0].shape[-1], 3, padding=1, name="conv")
        cls = TorchConv(self.num_anchors, 1, name="cls_logits")
        bbox = TorchConv(self.num_anchors * 4, 1, name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            t = jax.nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(bbox(t))
        return logits, deltas


class BoxHead(nn.Module):
    """TwoMLPHead: flatten (C, 7, 7 in torch order!) -> fc6 -> fc7."""

    representation_size: int = 1024

    @nn.compact
    def __call__(self, x):
        # x: (N, 7, 7, C). torch flattens (C, 7, 7); permute to match fc6's kernel
        # (the converter's flatten_linear fix handles the kernel side — here we keep
        # the canonical torch flatten order so converted weights apply unchanged).
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)
        x = jax.nn.relu(TorchLinear(self.representation_size, name="fc6")(x))
        return jax.nn.relu(TorchLinear(self.representation_size, name="fc7")(x))


class BoxPredictor(nn.Module):
    num_classes: int = 91

    @nn.compact
    def __call__(self, x):
        scores = TorchLinear(self.num_classes, name="cls_score")(x)
        deltas = TorchLinear(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    dim: int = 256

    @nn.compact
    def __call__(self, x):
        for i in range(1, 5):
            x = jax.nn.relu(
                TorchConv(self.dim, 3, padding=1, name=f"mask_fcn{i}")(x)
            )
        return x


class MaskPredictor(nn.Module):
    num_classes: int = 91
    dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(
            TorchConvTranspose(self.dim, 2, 2, 0, name="conv5_mask")(x)
        )
        return TorchConv(self.num_classes, 1, name="mask_fcn_logits")(x)


class RPN(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        return RPNHead(self.num_anchors, name="head")(feats)


class RoiHeads(nn.Module):
    num_classes: int = 91
    mask_dim: int = 256
    representation_size: int = 1024

    def setup(self):
        self.box_head = BoxHead(self.representation_size)
        self.box_predictor = BoxPredictor(self.num_classes)
        self.mask_head = MaskHead(self.mask_dim)
        self.mask_predictor = MaskPredictor(self.num_classes, self.mask_dim)

    def box_forward(self, pooled):
        return self.box_predictor(self.box_head(pooled))

    def mask_forward(self, pooled):
        return self.mask_predictor(self.mask_head(pooled))

    def __call__(self, pooled):  # pragma: no cover - init path
        return self.box_forward(pooled), self.mask_forward(
            jnp.zeros((1, 14, 14, self.mask_dim))
        )


class MaskRCNN(nn.Module):
    """Parameter container with torchvision-mirroring module paths."""

    num_classes: int = 91
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    out_channels: int = 256
    representation_size: int = 1024
    # bf16 runs convs/heads on the MXU at half the HBM traffic; all box
    # decoding / NMS / score math stays f32 in the driver below.
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = Backbone(self.layers, self.width, self.out_channels)
        self.rpn = RPN()
        self.roi_heads = RoiHeads(
            self.num_classes,
            mask_dim=self.out_channels,
            representation_size=self.representation_size,
        )

    def __call__(self, images):  # init path: touch every submodule once
        feats = self.backbone(images)
        logits, deltas = self.rpn(feats)
        pooled = jnp.zeros((1, 7, 7, self.out_channels))
        box_out = self.roi_heads.box_forward(pooled)
        mask_out = self.roi_heads.mask_forward(
            jnp.zeros((1, 14, 14, self.out_channels))
        )
        return feats, logits, deltas, box_out, mask_out

    # Sub-applies used by the functional inference driver below.
    def features(self, images):
        return self.backbone(images.astype(self.compute_dtype))

    def rpn_head(self, feats):
        return self.rpn(feats)

    def box_heads(self, pooled):
        return self.roi_heads.box_forward(pooled)

    def mask_heads(self, pooled):
        return self.roi_heads.mask_forward(pooled)


# ---------------------------------------------------------------------------
# Anchors + box coding (torchvision AnchorGenerator / BoxCoder math)
# ---------------------------------------------------------------------------

ANCHOR_SIZES = (32.0, 64.0, 128.0, 256.0, 512.0)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
STRIDES = (4, 8, 16, 32, 64)
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def cell_anchors(size: float, ratios: Sequence[float] = ASPECT_RATIOS) -> jnp.ndarray:
    """Zero-centered anchors for one level: (A, 4) xyxy (torchvision generate_anchors)."""
    ratios = jnp.asarray(ratios, jnp.float32)
    h_ratios = jnp.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = w_ratios * size
    hs = h_ratios * size
    # torchvision rounds the base anchors (AnchorGenerator.generate_anchors).
    return jnp.round(jnp.stack([-ws, -hs, ws, hs], axis=1) / 2.0)


def grid_anchors(feat_h: int, feat_w: int, stride: int, size: float) -> jnp.ndarray:
    """All anchors for one FPN level: (H*W*A, 4) in image coordinates."""
    base = cell_anchors(size)  # (A, 4)
    shifts_x = jnp.arange(feat_w, dtype=jnp.float32) * stride
    shifts_y = jnp.arange(feat_h, dtype=jnp.float32) * stride
    sx, sy = jnp.meshgrid(shifts_x, shifts_y)
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """torchvision BoxCoder.decode: (N, 4) deltas x (N, 4) xyxy anchors."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, i] for i in range(4))
    dw = jnp.minimum(dw / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(dh / wh, BBOX_XFORM_CLIP)
    pred_ctr_x = dx / wx * widths + ctr_x
    pred_ctr_y = dy / wy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=1,
    )


def clip_boxes(boxes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    x0 = jnp.clip(boxes[:, 0], 0, w)
    y0 = jnp.clip(boxes[:, 1], 0, h)
    x1 = jnp.clip(boxes[:, 2], 0, w)
    y1 = jnp.clip(boxes[:, 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=1)


def fpn_level(boxes: jnp.ndarray, canonical_scale: float = 224.0,
              canonical_level: int = 4) -> jnp.ndarray:
    """torchvision LevelMapper: k = floor(k0 + log2(sqrt(area)/s0 + eps)), clamped
    to [2, 5]; returned as index 0..3 into (p2, p3, p4, p5)."""
    scales = jnp.sqrt(
        jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(scales / canonical_scale + 1e-6)
    )
    return jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2


def multilevel_roi_align(feats, boxes: jnp.ndarray, output_size: int) -> jnp.ndarray:
    """RoIAlign over the (p2..p5) pyramid with per-box level assignment.

    torchvision detection uses aligned=False RoIAlign (MultiScaleRoIAlign default);
    our ops.roi_align implements aligned=True. aligned=False adds +0.5*scale to the
    continuous coordinates — apply the shift here so numerics match torchvision.
    Static: pools every level for every box, selects by level mask (4x FLOPs on the
    box head's 1000 RoIs; XLA overlaps the four passes and the cost is dwarfed by
    the backbone).
    """
    levels = fpn_level(boxes)
    out = None
    for i in range(4):
        scale = 1.0 / STRIDES[i]
        # aligned=False == aligned=True on boxes shifted by +0.5/scale pixels.
        shifted = boxes + 0.5 / scale
        pooled = roi_align(
            feats[i][0], shifted, output_size=output_size,
            spatial_scale=scale, sampling_ratio=2,
        )
        sel = (levels == i).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


# ---------------------------------------------------------------------------
# Inference driver (static shapes)
# ---------------------------------------------------------------------------

class Detections(NamedTuple):
    boxes: jnp.ndarray   # (D, 4) xyxy, image coords
    scores: jnp.ndarray  # (D,)
    labels: jnp.ndarray  # (D,) int32
    masks: jnp.ndarray   # (D, 28, 28) probabilities in box frame
    valid: jnp.ndarray   # (D,) bool


IMAGE_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGE_STD = jnp.asarray([0.229, 0.224, 0.225])


def _topk_pad(scores, k):
    k = min(k, scores.shape[0])
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


@partial(
    jax.jit,
    static_argnames=(
        "model", "pre_nms_top_n", "post_nms_top_n", "score_thresh",
        "detections_per_img",
    ),
)
def maskrcnn_infer(
    params,
    image: jnp.ndarray,
    model: MaskRCNN = None,
    pre_nms_top_n: int = 1000,
    post_nms_top_n: int = 1000,
    score_thresh: float = 0.05,
    detections_per_img: int = 100,
) -> Detections:
    """Full single-image inference. ``image`` is (H, W, 3) RGB in [0, 1] with H, W
    multiples of 64 (the caller resizes; GeneralizedRCNNTransform's min/max-size
    resize is the documented preprocessing delta — PARITY.md)."""
    model = model or MaskRCNN()
    h, w, _ = image.shape
    x = ((image - IMAGE_MEAN) / IMAGE_STD)[None]

    feats = model.apply(params, x, method=MaskRCNN.features)
    logits, deltas = model.apply(params, feats, method=MaskRCNN.rpn_head)

    # --- RPN proposals: per-level top-k, decode, clip, NMS. -----------------
    all_boxes, all_scores, all_lvl = [], [], []
    for i, (lg, dl) in enumerate(zip(logits, deltas)):
        fh, fw = lg.shape[1:3]
        anchors = grid_anchors(fh, fw, STRIDES[i], ANCHOR_SIZES[i])
        # NHWC channels flatten to (H, W, A) order — the same ordering
        # torchvision's permute_and_flatten produces, matching grid_anchors.
        scores = lg[0].reshape(-1).astype(jnp.float32)
        dl_hw = dl[0].reshape(fh * fw, -1, 4).reshape(-1, 4).astype(jnp.float32)
        k = min(pre_nms_top_n, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        boxes = decode_boxes(dl_hw[top_idx], anchors[top_idx])
        boxes = clip_boxes(boxes, h, w)
        # Remove tiny boxes by zeroing their score (static shape).
        ws = boxes[:, 2] - boxes[:, 0]
        hs = boxes[:, 3] - boxes[:, 1]
        keep_size = (ws >= 1e-3) & (hs >= 1e-3)
        scores_lvl = jnp.where(keep_size, jax.nn.sigmoid(top_scores), -1.0)
        idx, valid = nms_static(
            boxes, scores_lvl, iou_threshold=0.7, score_threshold=-0.5,
            max_outputs=min(post_nms_top_n, k),
        )
        sel = jnp.clip(idx, 0)
        all_boxes.append(boxes[sel])
        all_scores.append(jnp.where(valid, scores_lvl[sel], -1.0))
    proposals = jnp.concatenate(all_boxes, axis=0)
    prop_scores = jnp.concatenate(all_scores, axis=0)
    k = min(post_nms_top_n, prop_scores.shape[0])
    _, keep = jax.lax.top_k(prop_scores, k)
    proposals = proposals[keep]

    # --- Box head. ----------------------------------------------------------
    pooled = multilevel_roi_align(feats, proposals, 7)
    class_logits, box_deltas = model.apply(
        params, pooled, method=MaskRCNN.box_heads
    )
    class_logits = class_logits.astype(jnp.float32)
    box_deltas = box_deltas.astype(jnp.float32)
    probs = jax.nn.softmax(class_logits, axis=-1)  # (N, C)
    n, num_classes = probs.shape
    box_deltas = box_deltas.reshape(n, num_classes, 4)

    # Per-class decode (skip background 0), flatten (N * (C-1)).
    cls_ids = jnp.arange(1, num_classes)
    boxes_pc = jax.vmap(
        lambda c: clip_boxes(
            decode_boxes(box_deltas[:, c], proposals, weights=(10.0, 10.0, 5.0, 5.0)),
            h, w,
        )
    )(cls_ids)  # (C-1, N, 4)
    scores_pc = probs[:, 1:].T  # (C-1, N)
    ws = boxes_pc[..., 2] - boxes_pc[..., 0]
    hs = boxes_pc[..., 3] - boxes_pc[..., 1]
    scores_pc = jnp.where(
        (scores_pc > score_thresh) & (ws >= 1e-2) & (hs >= 1e-2), scores_pc, -1.0
    )

    # Batched per-class NMS: offset boxes by class so one NMS call suffices
    # (torchvision batched_nms trick). nms_static materializes the full pairwise
    # IoU matrix, and N*(C-1) candidates is ~90k for COCO — a 90k^2 f32 matrix
    # (32 GB) that OOMs HBM. Only score-positive boxes can survive NMS and
    # torchvision keeps at most `detections_per_img`, so prefilter to the top
    # `nms_candidates` scores first (a safe superset: candidates beyond it are
    # all below the 100th-best post-suppression score in practice).
    flat_boxes = boxes_pc.reshape(-1, 4)
    flat_scores = scores_pc.reshape(-1)
    flat_labels = jnp.repeat(cls_ids, n)
    n_cand = min(1000, flat_scores.shape[0])
    cand_scores, cand_idx = jax.lax.top_k(flat_scores, n_cand)
    cand_boxes = flat_boxes[cand_idx]
    cand_labels = flat_labels[cand_idx]
    offset = cand_labels.astype(jnp.float32)[:, None] * (max(h, w) + 2.0)
    idx, valid = nms_static(
        cand_boxes + offset, cand_scores, iou_threshold=0.5,
        score_threshold=-0.5, max_outputs=detections_per_img,
    )
    sel = jnp.clip(idx, 0)
    det_boxes = cand_boxes[sel]
    det_scores = jnp.where(valid, cand_scores[sel], 0.0)
    det_labels = jnp.where(valid, cand_labels[sel], 0).astype(jnp.int32)

    # --- Mask head on final detections. -------------------------------------
    mask_pooled = multilevel_roi_align(feats, det_boxes, 14)
    mask_logits = model.apply(params, mask_pooled, method=MaskRCNN.mask_heads)
    mask_probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))  # (D, 28, 28, C)
    det_masks = jnp.take_along_axis(
        mask_probs, det_labels[:, None, None, None], axis=-1
    )[..., 0]

    return Detections(det_boxes, det_scores, det_labels, det_masks, valid)


def paste_mask(mask28: jnp.ndarray, box: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Paste one 28x28 box-frame mask into an (h, w) frame (torchvision
    paste_masks_in_image semantics: expand box by 2px-equivalent padding is skipped —
    we resample the raw mask; differences are sub-pixel at vehicle scales)."""
    from future_urban_scene_generation_tpu.ops import crop as cr

    x0, y0, x1, y1 = box
    win = cr.Window(x0, y0, jnp.maximum(x1 - x0, 1.0), jnp.maximum(y1 - y0, 1.0))
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    inside = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)
    pasted = cr.stitch(jnp.zeros((h, w, 1)), mask28[..., None], win, inside)
    return pasted[..., 0]


def convert_maskrcnn(state_dict) -> dict:
    """torchvision maskrcnn_resnet50_fpn state dict -> flax params for MaskRCNN.

    Newer torchvision wraps FPN/RPN convs in Conv2dNormActivation
    (``inner_blocks.0.0.weight``); normalize to the flat names this module uses.
    fc6 consumes the (C, 7, 7) torch-order flatten — BoxHead permutes activations
    to torch order before the matmul, so the kernel converts with a plain
    transpose (no flatten fix needed).
    """
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict

    sd = {}
    for key, v in state_dict.items():
        k = key
        for pat in ("inner_blocks.", "layer_blocks."):
            # "...inner_blocks.0.0.weight" -> "...inner_blocks.0.weight"
            if pat in k:
                head, tail = k.split(pat, 1)
                parts = tail.split(".")
                if len(parts) >= 3 and parts[0].isdigit() and parts[1] == "0":
                    k = head + pat + parts[0] + "." + ".".join(parts[2:])
        if ".head.conv.0.0." in k:  # newer RPN head Conv2dNormActivation
            k = k.replace(".head.conv.0.0.", ".head.conv.")
        sd[k] = v
    # conv5_mask is a ConvTranspose2d — square kernel, so the converter must be
    # told explicitly (its (in, out, kh, kw) layout transposes differently).
    return convert_state_dict(
        sd, convt_keys=("roi_heads.mask_predictor.conv5_mask.weight",)
    )
