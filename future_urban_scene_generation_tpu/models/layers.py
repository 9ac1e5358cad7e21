"""Torch-convention neural building blocks in Flax (NHWC, XLA/MXU-friendly).

Every reference network is a CNN built from a small set of torch layers. This module
provides flax.linen equivalents whose numerics match torch exactly (verified in
tests/test_layers.py), so converted checkpoints reproduce reference activations:

* zero / reflection padding + cross-correlation conv (torch Conv2d);
* transposed conv with torch's (k, s, p, output_padding) arithmetic;
* instance norm (affine-free, biased variance — torch InstanceNorm2d defaults);
* the Warp&Learn custom "LayerNorm" that normalizes over ALL dims per sample with an
  UNBIASED std and divides by (std + eps) (warp_learn/models.py:15-35);
* batch norm with running stats (inference mode);
* weight-normalized conv (torch weight_norm dim=0 — per-output-channel norm);
* TF-ordered depth<->space (the VUNet gist code, NOT torch.pixel_shuffle — verified
  empirically: channel groups are (r1, r2, c));
* torch-convention pooling (max 2x2; count_include_pad=False average pool).

All modules run in NHWC with HWIO kernels: the natural TPU layout, with the conversion
from torch's NCHW/OIHW done once at checkpoint-conversion time.
"""
from __future__ import annotations

import threading as _threading
from contextlib import contextmanager as _contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# Padding + activations
# ---------------------------------------------------------------------------

def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """torch nn.ReflectionPad2d(pad) on NHWC."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def zero_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def activation(name: Optional[str]):
    """Named activation matching the reference's choices."""
    return {
        None: lambda x: x,
        "none": lambda x: x,
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
        "elu": jax.nn.elu,
        "selu": jax.nn.selu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
    }[name]


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

# conv_general_dilated with few input channels runs the MXU lane-starved on TPU:
# the contraction tiles pad the channel (lane) dim to 128, so a 21-channel 7x7
# stem measured 6% MXU utilization (18 ms of a 55 ms ICN forward at batch 24).
# _conv_small_cin_matmul reformulates such stride-1 convs as a tap-stacked
# matmul with contraction dim k*k*C (im2col concat + one (N*H*W, k²C) @ (k²C, O)
# matmul) to fill the lanes. MEASURED SLOWER IN CONTEXT on v5e (scene trace:
# ICN 59 -> 91 ms, VUNet 26 -> 34 ms with it wired into TorchConv/MyConv): the
# k²-times-larger im2col intermediate's HBM round trip (~3.2 GB for the ICN
# stem at batch 24) costs more than the lane starvation it removes. Kept (with
# its parity test) as the documented dead end; NOT wired into TorchConv.
def _conv_small_cin_matmul(x: jnp.ndarray, kernel: jnp.ndarray, padding: int):
    """Stride-1 zero-padded conv as tap-stacked matmul. x (N,H,W,C) NHWC,
    kernel (k,k,C,O) HWIO; returns (N,H,W,O) (same spatial size as lax conv
    with symmetric ``padding``)."""
    n, h, w, c = x.shape
    k = kernel.shape[0]
    p = padding
    out_h = h + 2 * p - (k - 1)
    out_w = w + 2 * p - (k - 1)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    cols = [
        xp[:, ky:ky + out_h, kx:kx + out_w, :]
        for ky in range(k)
        for kx in range(k)
    ]
    xcol = jnp.concatenate(cols, axis=-1)  # (N, out_h, out_w, k²C)
    kmat = kernel.reshape(k * k * c, -1)  # (ky, kx, c) order matches cols
    return xcol @ kmat


def _conv_small_cout_packed(x, w, padding: int):
    """Tiny-C_out conv via row-tap output packing (pure XLA).

    A k x k conv with C_out = 3 wastes the MXU's 128-lane output tiles (the ICN
    head traced 6.7 ms at ~2% output utilization). Reformulate as a 1 x k conv
    whose k*C_out outputs carry one row-tap each, then sum k row-shifted slices:

      y[r, c, o] = sum_ky y_taps[r + ky, c, ky*C_out + o],
      y_taps = conv_1xk(x_padded, K_packed),  K_packed[0, kx, ci, ky*C_out+o]
             = K[ky, kx, ci, o]

    k x C_out output lanes instead of C_out: ~k-fold better output-tile
    utilization; the shift-sum epilogue is one fused elementwise pass.
    """
    k = w.shape[0]
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h_out = xp.shape[1] - (k - 1)
    k_packed = jnp.transpose(w, (1, 2, 0, 3)).reshape(
        1, k, w.shape[2], k * cout
    )
    y_taps = jax.lax.conv_general_dilated(
        xp, k_packed, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, Hp, W_out, k*cout)
    out = y_taps[:, 0:h_out, :, 0:cout]
    for ky in range(1, k):
        out = out + y_taps[:, ky:ky + h_out, :, ky * cout:(ky + 1) * cout]
    return out


def _pallas_kernels_enabled() -> bool:
    """MODEL_SPEC gate for opaque Pallas fast paths (lazy import: stages sits
    above this module in the layering, so read its spec dict at trace time
    only). synthesize_scene_sharded disables it: pallas_call lowers to a
    custom call with no SPMD sharding rule, so under a NamedSharding-driven
    mesh it could fail to partition or silently replicate."""
    try:
        from future_urban_scene_generation_tpu.pipeline.stages import MODEL_SPEC

        return bool(MODEL_SPEC.get("pallas_kernels", True))
    except Exception:
        return True


# Trace-time scope state. Thread-LOCAL: concurrent tracing threads (e.g. a
# service compiling two buckets at once) must not leak suppress/fold scopes
# into each other's traces (ADVICE r3) — the counters key trace-time branch
# decisions, never runtime values.
_TRACE_SCOPES = _threading.local()


@_contextmanager
def suppress_quantization():
    """Trace-time scope that keeps convs on the float path regardless of
    MODEL_SPEC["quantized_convs"]. VUNet's decoder is weight-normed with no
    post-conv renormalization, so per-conv int8 rounding compounds through the
    stack (measured 20.1 dB vs f32 even with per-channel activation scales —
    below the serving quality bar); stages wraps the VUNet forwards in this
    scope so the int8 tier quantizes only the trunks that hold quality (ICN's
    instance-normed resnet re-centers after every conv: >27 dB)."""
    _TRACE_SCOPES.quant_suppress = getattr(_TRACE_SCOPES, "quant_suppress", 0) + 1
    try:
        yield
    finally:
        _TRACE_SCOPES.quant_suppress -= 1


def _quantized_convs_enabled():
    """Trace-time read of MODEL_SPEC["quantized_convs"] (spec_key() makes any
    flip a retrace, exactly like the pallas_kernels knob above)."""
    if getattr(_TRACE_SCOPES, "quant_suppress", 0):
        return False
    try:
        from future_urban_scene_generation_tpu.pipeline.stages import MODEL_SPEC

        return bool(MODEL_SPEC.get("quantized_convs", False))
    except Exception:
        return False


def _int8_conv(x, w, stride: int, padding: int, dilation: int = 1):
    """Post-training-quantized conv: int8 MXU pass with dynamic scales.

    v5e's MXU runs int8 at ~2x the bf16 rate; the generator trunks (ICN resnet
    blocks, VUNet decoder) are conv-compute-bound, so this is the serving
    throughput lever past bf16. Symmetric quantization, zero-point free:
    a per-INPUT-CHANNEL activation scale taken from the live max-abs
    (self-calibrating — no calibration corpus, correct for any checkpoint),
    folded exactly into the weight before the per-OUTPUT-CHANNEL weight
    quantization: y = sum_c (x_c/s_c)(s_c w_c) — the contraction is invariant,
    so per-channel activation ranges cost nothing (per-TENSOR activation
    scales measured 18.5 dB on VUNet's weight-normed decoder, whose channel
    ranges vary wildly; per-channel reads the same activation bytes and the
    fold touches only the tiny weight tensor). The int32 accumulator is
    exact, so the only error is the two roundings; quality is pinned in
    tests/test_int8_inference.py and the knob (MODEL_SPEC["quantized_convs"])
    is OFF by default — the parity/crossval tiers always run the float path.
    """
    ax = tuple(range(x.ndim - 1))
    sx = jnp.maximum(
        jnp.max(jnp.abs(x), axis=ax).astype(jnp.float32), 1e-12
    ) * (1.0 / 127.0)  # (C_in,)
    w_eff = w.astype(jnp.float32) * sx[None, None, :, None]
    sw = jnp.maximum(
        jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)), 1e-12
    ) * (1.0 / 127.0)  # (C_out,)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w_eff / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sw).astype(x.dtype)


def _int8_conv_transpose(x, w, pad_lo: int, pad_hi: int, stride: int):
    """Transposed-conv variant of :func:`_int8_conv` (input-dilated forward
    conv with pre-flipped kernel, matching TorchConvTranspose's lowering).
    Same quantization scheme; the zero rows/cols injected by lhs_dilation
    quantize exactly (0 -> 0), so only the two roundings differ from float."""
    ax = tuple(range(x.ndim - 1))
    sx = jnp.maximum(
        jnp.max(jnp.abs(x), axis=ax).astype(jnp.float32), 1e-12
    ) * (1.0 / 127.0)
    w_eff = w.astype(jnp.float32) * sx[None, None, :, None]
    sw = jnp.maximum(
        jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)), 1e-12
    ) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(w_eff / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sw).astype(x.dtype)


def _int8_eligible(x, w):
    """int8 only pays where the MXU is the bottleneck: both channel axes wide
    enough to tile (the lane-starved stems keep their Pallas/packed paths, and
    tiny heads aren't worth the quantize/dequantize passes)."""
    return (
        _quantized_convs_enabled()
        and x.dtype in (jnp.bfloat16, jnp.float32)
        and x.shape[-1] >= 32
        and w.shape[-1] >= 32
    )


def _dispatch_conv_impl(x, w, stride: int, padding: int, dilation: int = 1):
    """Route a conv through the Pallas small-C_in kernel when it wins.

    The Pallas path (ops/pallas_conv.py) applies on TPU for stride-1
    undilated k>1 convs with C_in <= 32 — the lane-starved stems where
    `conv_general_dilated` measured 6% MXU utilization (ICN 21-channel 7x7
    stem: 18 ms -> ~6 ms at batch 24). Everything else (and every CPU trace,
    where the torch-parity tests run) uses the XLA conv.
    """
    k = w.shape[0]
    # Gate on the kernel's per-dot contraction width k*C: the Pallas kernel
    # contracts k*C lanes per ky-slice, so k*C must fill a 128-lane tile to
    # beat XLA (ICN stem: 7*21 = 147 — conv 18 -> 7 ms standalone, ~2 ms net
    # in the scene after the host-side NCHW transpose and the lost norm-stat
    # epilogue fusion). Measured exclusions: 3x3 stems with k*C ~ 9-28 are MORE
    # starved inside the kernel than in XLA's conv (scene 67 -> 60 fps), and
    # VUNet's 3x3 C=32 convs (k*C = 96) traced vunet_decode 26 -> 44 ms.
    if (
        stride == 1
        and dilation == 1
        and k > 1
        # The kernel's fixed rows+8 VMEM slab supports taps up to k = 9; the
        # gate below would otherwise admit e.g. an 11x11 C_in=12 conv
        # (k*C = 132) whose ky tap slices fall off the slab at trace time.
        and k <= 9
        and x.shape[-1] <= 32
        and k * x.shape[-1] >= 128
        # bf16 only: the kernel's VMEM budget (channels-major image block +
        # per-ky im2col + f32 accumulator) fits at ~9 MB in bf16 but OOMs the
        # 16 MB scoped-vmem limit in f32 at batch > 1 (found by the f32 demo:
        # 18.28M requested). f32 mode keeps the XLA conv.
        and x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and _pallas_kernels_enabled()
    ):
        from future_urban_scene_generation_tpu.ops.pallas_conv import (
            conv_small_cin_v2,
        )

        if padding:
            x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        # v2 = output-lane-packed kernel: 3.87 vs 7.97 ms/conv for the ICN
        # stem at batch 24 on the chip (N = k*C_out = 448 output lanes per dot
        # vs 64, and no per-tap lane shifts — see ops/pallas_conv.py).
        return conv_small_cin_v2(x, w)
    if _int8_eligible(x, w):
        return _int8_conv(x, w, stride, padding, dilation)
    # NOT dispatched (measured dead ends, helpers + parity tests kept):
    # _conv1x1_width_folded won standalone (1.61 vs 2.59 ms at
    # (24,256,256,32) bf16) but dispatching it for the VUNet NiNs cost the
    # SCENE ~16 ms (143.0 -> 115.8 fps) — the fold reshape forces layout
    # changes/transposes around every call site that dwarf the matmul win.
    # _conv_phase_packed (2x2 output phases as a stride-2 conv) lost even
    # standalone: 4.4/4.1 vs 3.8/2.8 ms — the (k+1)²/k² MAC overhead
    # dominates. Same lesson three ways: lane-fill wins at the op level do
    # not survive the surrounding layout graph; only whole-region folding
    # gets close (see width_fold_region — 142.0 vs 143.0, kept off).
    # Output packing applies only to genuinely tiny C_out heads: relaxing the
    # gate to k*C_out <= 128 (capturing VUNet's 3x3 C_out=32 residual convs)
    # measured NO win (71.3 vs 73.5 fps) — those convs are input-bound at
    # C_in=64 and the extra k*C_out-channel tap tensor costs more than the
    # output-lane gain.
    if (
        stride == 1
        and dilation == 1
        and k > 1
        and w.shape[-1] <= 12
        and x.shape[-1] >= 32
        and jax.default_backend() == "tpu"
    ):
        return _conv_small_cout_packed(x, w, padding)
    return _xla_conv(x, w, stride, padding, dilation)


def _xla_conv(x, w, stride: int, padding: int, dilation: int = 1):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_phase_packed(x, w, padding: int):
    """Odd-k stride-1 SAME conv as a (k+1)x(k+1) STRIDE-2 conv emitting all four
    2x2 output phases in the channel dim, + depth-to-space.

    Why: convs with C_out in [16, 32] run the MXU at <=25% output-lane fill AND
    their <=32-channel NHWC intermediates get lane-PADDED 4x in HBM layout
    (trace: bf16[24,256,256,32]{3,0,2,1:T(8,128)} — a plain copy of that tensor
    measured 0.9 ms = padded-bytes x HBM speed). Packing the 2x2 pixel phases
    into channels makes N = 4*C_out (64-128 lanes) and the conv output unpadded,
    at (k+1)^2/k^2 (1.78x for k=3) extra MACs from the kernel's zero corners.
    Same multiplies/adds modulo those zeros — value-equal to _xla_conv
    (tests/test_layers.py), so the custom-VJP backward stays correct.

    Requires: odd k, padding == k//2, even H and W.
    """
    k = w.shape[0]
    h = k // 2
    n, H, W, _ = x.shape
    o = w.shape[-1]
    k2 = jnp.zeros((k + 1, k + 1, w.shape[2], 4 * o), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            blk = (a * 2 + b) * o
            k2 = k2.at[a:a + k, b:b + k, :, blk:blk + o].add(w)
    z = jax.lax.conv_general_dilated(
        x, k2, (2, 2), ((h, h), (h, h)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (n, H/2, W/2, 4*o), channels ordered (a, b, o)
    y = z.reshape(n, H // 2, W // 2, 2, 2, o)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, H, W, o)


# ---------------------------------------------------------------------------
# Width-folded compute regions (VUNet 256² tail)
#
# Tensors with <= 32 channels carry a 4x lane-PADDED HBM layout on TPU
# (T(8,128) tiling pads the minor channel dim to 128) and run convs at <= 25%
# MXU lane fill. Folding 4 adjacent width pixels into channels — a FREE
# reshape, channels being minor — makes every intermediate 64-128 channels
# wide. Chip A/B at (24, 256, 256, 32) bf16: 3x3 conv 2.60 vs 3.82 ms (64->32)
# and 2.16 vs 2.68 (32->32) when the chain STAYS folded; per-conv fold/unfold
# loses (5.3/3.8 ms — the relayout copies dominate), hence a trace-time REGION:
# code inside width_fold_region() sees folded arrays, and TorchConv/WNConv
# reinterpret their inputs accordingly (params keep reference shapes).
# ---------------------------------------------------------------------------

_WIDTH_FOLD_FORCE: Optional[bool] = None


@_contextmanager
def width_fold_region():
    """Trace-time scope: conv inputs inside are 4-pixel width-folded.
    Thread-local like suppress_quantization (see _TRACE_SCOPES)."""
    _TRACE_SCOPES.width_fold = getattr(_TRACE_SCOPES, "width_fold", 0) + 1
    try:
        yield
    finally:
        _TRACE_SCOPES.width_fold -= 1


def width_fold_active() -> bool:
    return getattr(_TRACE_SCOPES, "width_fold", 0) > 0


@_contextmanager
def force_width_fold(value: bool):
    """Test hook: force width_fold_wanted() on/off regardless of backend."""
    global _WIDTH_FOLD_FORCE
    old = _WIDTH_FOLD_FORCE
    _WIDTH_FOLD_FORCE = value
    try:
        yield
    finally:
        _WIDTH_FOLD_FORCE = old


def width_fold_wanted() -> bool:
    """Whether models should enter width-folded regions.

    OFF by default — a fully-measured probe, kept with its tests: the folded
    VUNet 256² stage cut each 3x3 conv to ~1.2 ms (from 2.0-3.7) but the
    region boundaries gave it all back on the chip — scene bench 134.7 fps
    with interleaved skip concats, 142.0 after group-structured kernels +
    folded head vs 143.0 unfolded. The residual losses are the enc-side
    unfold before the stride-2 DownSample and the lost conv epilogue fusions;
    folding the entire <=32-channel subgraph (stride-2 folded convs included)
    is the remaining idea if this stage ever dominates again."""
    if _WIDTH_FOLD_FORCE is not None:
        return _WIDTH_FOLD_FORCE
    return False


def fold_width4(x: jnp.ndarray) -> jnp.ndarray:
    """(n, H, W, C) -> (n, H, W/4, 4C); channels minor, so this is free."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 4, 4 * c)


def unfold_width4(x4: jnp.ndarray) -> jnp.ndarray:
    """(n, H, W/4, 4C) -> (n, H, W, C)."""
    n, h, w4, c4 = x4.shape
    return x4.reshape(n, h, w4 * 4, c4 // 4)


def depth_to_space_folded(z: jnp.ndarray) -> jnp.ndarray:
    """depth_to_space(z, 2) emitted directly in width-folded form:
    (n, h, w, 4o) -> (n, 2h, w/2, 4o) with channels (f, o), f the width-fold
    phase. Writes the compact folded layout instead of a 4x-padded NHWC
    tensor. Equals fold_width4(depth_to_space(z, 2)) (tested)."""
    n, h, w, c4 = z.shape
    o = c4 // 4
    z7 = z.reshape(n, h, w // 2, 2, 2, 2, o)  # (n, i, j', f2, a, b, o)
    y = z7.transpose(0, 1, 4, 2, 3, 5, 6)  # (n, i, a, j', f2, b, o)
    return y.reshape(n, 2 * h, w // 2, 4 * o)


def concat_folded(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of two width-folded tensors, matching
    fold_width4(concatenate([unfold(a), unfold(b)], -1)) — i.e. interleaved per
    fold phase, so fold-aware convs see the standard (f, c) channel order.

    NOTE: the interleave is a real relayout (~1.2 ms at (24,256,64,128) — it
    showed up as the top data-formatting copies in the scene trace). The fold
    region avoids it: Residual concatenates folded tensors PLAINLY and tells
    the conv the group split via fold_groups(); the kernel is built
    group-structured instead (free at trace time). This helper remains for
    tests/documentation of the equivalence."""
    n, h, w4, ca = a.shape
    cb = b.shape[-1]
    ai = a.reshape(n, h, w4, 4, ca // 4)
    bi = b.reshape(n, h, w4, 4, cb // 4)
    return jnp.concatenate([ai, bi], axis=-1).reshape(n, h, w4, ca + cb)


_FOLD_GROUPS: Optional[Tuple[int, ...]] = None


@_contextmanager
def fold_groups(sizes: Tuple[int, ...]):
    """Trace-time hint: the folded conv input inside this scope is a PLAIN
    concat of independently-folded tensors with these (unfolded) channel
    counts; the conv builds its folded kernel per group to match."""
    global _FOLD_GROUPS
    old = _FOLD_GROUPS
    _FOLD_GROUPS = tuple(sizes)
    try:
        yield
    finally:
        _FOLD_GROUPS = old


def _blockdiag4(wm: jnp.ndarray) -> jnp.ndarray:
    """(C, O) -> (4C, 4O) block-diagonal."""
    c, o = wm.shape
    w4 = jnp.zeros((4 * c, 4 * o), wm.dtype)
    for i in range(4):
        w4 = w4.at[i * c:(i + 1) * c, i * o:(i + 1) * o].set(wm)
    return w4


def _conv_on_folded(x4: jnp.ndarray, w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Stride-1 conv applied to an already width-folded tensor. k=1 becomes a
    block-diagonal matmul; k=3 a 25%-dense folded-kernel conv (see
    _conv3x3_width_folded). Value-equal to the unfolded conv (tested).

    Honors fold_groups(): when the folded input is a plain concat of
    independently-folded tensors, the kernel's input-channel axis is built
    per group (the data interleave this replaces measured ~1.2 ms/concat)."""
    k = w.shape[0]
    groups = _FOLD_GROUPS
    if groups is None:
        groups = (w.shape[2],)
    assert sum(groups) == w.shape[2], (groups, w.shape)
    if k == 1:
        off = 0
        blocks = []
        for g in groups:
            blocks.append(_blockdiag4(w[0, 0, off:off + g, :]))
            off += g
        w4 = jnp.concatenate(blocks, axis=0)  # (4*C_total, 4*O)
        return jax.lax.dot_general(
            x4, w4, dimension_numbers=(((3,), (0,)), ((), ())),
        )
    if k == 3 and padding == 1:
        off = 0
        kfs = []
        for g in groups:
            kfs.append(_fold_kernel_width4(w[:, :, off:off + g, :]))
            off += g
        return jax.lax.conv_general_dilated(
            x4, jnp.concatenate(kfs, axis=2), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    raise NotImplementedError(
        f"width-folded conv supports k=1 or k=3 SAME, got k={k} pad={padding}"
    )


def _fold_kernel_width4(w):
    """(k, k, C, O) -> (k, 3, 4C, 4O) kernel for a conv over 4-pixel width-folded
    tensors: Kf[dy, m+1, f*C+c, e*O+o] = w[dy, dx+h, c, o] where dx = 4m+f-e,
    kept when |dx| <= h (k odd, h = k//2 <= 1 supported — wider k needs more
    folded-width taps)."""
    k, _, c, o = w.shape
    h = k // 2
    kf = jnp.zeros((k, 3, 4 * c, 4 * o), w.dtype)
    for m in (-1, 0, 1):
        for f in range(4):
            for e in range(4):
                dx = 4 * m + f - e
                if abs(dx) <= h:
                    kf = kf.at[:, m + 1, f * c:(f + 1) * c, e * o:(e + 1) * o].add(
                        w[:, dx + h]
                    )
    return kf


def _conv3x3_width_folded(x4, w):
    """3x3 stride-1 SAME conv operating directly on a width-folded tensor
    (n, H, W/4, 4C) -> (n, H, W/4, 4O). The folded kernel is 25% dense (4x the
    MACs) but the contraction/output lanes are 4C/4O wide and every
    intermediate stays unpadded in HBM."""
    return jax.lax.conv_general_dilated(
        x4, _fold_kernel_width4(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv1x1_width_folded(x, w):
    """1x1 conv with C_out in [16, 32] as a block-diagonal matmul over
    4-pixel-folded width: (n,H,W,C) -> (n,H,W/4,4C) is a FREE reshape (channels
    minor), the (4C, 4O) block-diag weight fills 64-128 output lanes, and the
    fold sidesteps the 4x lane padding of <=32-channel tensors entirely.
    Requires W % 4 == 0."""
    n, H, W, c = x.shape
    o = w.shape[-1]
    y4 = jax.lax.dot_general(
        x.reshape(n, H, W // 4, 4 * c), _blockdiag4(w.reshape(c, o)),
        dimension_numbers=(((3,), (0,)), ((), ())),
    )
    return y4.reshape(n, H, W, o)


from functools import partial as _partial  # noqa: E402 — local alias


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dispatch_conv(x, w, stride: int, padding: int, dilation: int = 1):
    """_dispatch_conv_impl with a custom VJP: pl.pallas_call has no JVP/VJP
    rule, and every trainer differentiates TorchConv/WNConv (value_and_grad in
    pipeline/training.py), so bf16 TPU training would otherwise fail at trace
    time on any gated stem conv. The backward pass is the XLA conv's own VJP —
    the Pallas forward is value-equivalent (parity-tested), so the gradients
    are the gradients of the same function."""
    return _dispatch_conv_impl(x, w, stride, padding, dilation)


def _dispatch_conv_fwd(x, w, stride, padding, dilation):
    return _dispatch_conv(x, w, stride, padding, dilation), (x, w)


def _dispatch_conv_bwd(stride, padding, dilation, residuals, g):
    x, w = residuals
    _, vjp = jax.vjp(lambda x_, w_: _xla_conv(x_, w_, stride, padding, dilation), x, w)
    return vjp(g)


_dispatch_conv.defvjp(_dispatch_conv_fwd, _dispatch_conv_bwd)


class TorchConv(nn.Module):
    """torch nn.Conv2d equivalent: zero padding, cross-correlation, bias.

    kernel param layout is HWIO (converted once from torch OIHW). Params live at this
    module's own level (kernel/bias) so flax param paths mirror torch state-dict keys
    one-to-one — the mechanical checkpoint converter depends on this.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        folded = width_fold_active()
        in_ch = x.shape[-1] // 4 if folded else x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_ch, self.features)
        )
        if folded:
            assert self.stride == 1 and self.dilation == 1, "fold region: stride-1 only"
            out = _conv_on_folded(x, kernel.astype(x.dtype), self.padding)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
                out = out + jnp.tile(bias.astype(out.dtype), 4)
            return out
        out = _dispatch_conv(
            x, kernel.astype(x.dtype), self.stride, self.padding, self.dilation
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class TorchLinear(nn.Module):
    """torch nn.Linear: kernel stored (in, out) (transposed from torch at conversion)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        out = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class TorchConvTranspose(nn.Module):
    """torch nn.ConvTranspose2d(k, s, p, output_padding) equivalent.

    Implemented as an input-dilated forward convolution with spatially flipped,
    in/out-swapped kernels: out = conv(dilate_s(x), flip(W)), padded (k-1-p) low and
    (k-1-p+op) high. kernel param layout: (kh, kw, in, out) — torch's (in, out, kh, kw)
    moved to spatial-major at conversion time.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
        )
        w = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        if _int8_eligible(x, w):
            out = _int8_conv_transpose(x, w, lo, hi, self.stride)
        else:
            out = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding=((lo, hi), (lo, hi)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class SNConv(nn.Module):
    """Spectral-normalized conv with torch semantics (training mode).

    torch's spectral_norm(dim=0): W_mat = W.view(out, -1); one power iteration per
    forward updates u (stored, no gradient); w_eff = W / sigma with
    sigma = u^T W_mat v. The iteration state lives in the 'spectral' variable
    collection — pass ``mutable=["spectral"]`` during training steps; without it the
    stored u is used read-only (torch eval mode). Inference from converted reference
    checkpoints uses plain TorchConv with folded weights instead (models/convert.py).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (k, k, in_ch, self.features)
        )
        w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (self.features,))
            ),
        )
        u = jax.lax.stop_gradient(u_var.value)
        v = _l2_normalize(w_mat.T @ u)
        u_new = _l2_normalize(w_mat @ v)
        u_new = jax.lax.stop_gradient(u_new)
        v = jax.lax.stop_gradient(v)
        sigma = u_new @ (w_mat @ v)
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u_var.value = u_new
        w = kernel / sigma
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


class SNConvTranspose(nn.Module):
    """Spectral-normalized transposed conv with torch semantics (training mode).

    torch wraps ConvTranspose2d with spectral_norm(dim=1) — dim 1 is the
    out-channel axis of torch's (in, out, kh, kw) layout, so
    W_mat = W.permute(1, 0, 2, 3).reshape(out, -1). Our kernel is stored
    (kh, kw, in, out) (see TorchConvTranspose); the equivalent flatten is
    transpose(3, 2, 0, 1) — the same convention models/convert.py's
    fold_spectral_norm uses when folding reference checkpoints. Iteration state
    lives in the 'spectral' collection like SNConv.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (k, k, in_ch, self.features)
        )
        w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params"), (self.features,))
            ),
        )
        u = jax.lax.stop_gradient(u_var.value)
        v = _l2_normalize(w_mat.T @ u)
        u_new = _l2_normalize(w_mat @ v)
        u_new = jax.lax.stop_gradient(u_new)
        v = jax.lax.stop_gradient(v)
        sigma = u_new @ (w_mat @ v)
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            u_var.value = u_new
        w = jnp.flip(kernel / sigma, axis=(0, 1))
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


def _l2_normalize(v, eps: float = 1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class WNConv(nn.Module):
    """Weight-normalized conv (torch weight_norm(conv, dim=0)): w = g * v / ||v||,
    norm taken per output channel over (kh, kw, in). Used throughout VUNet
    (vunet/layers.py:21-39)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        folded = width_fold_active()
        in_ch = x.shape[-1] // 4 if folded else x.shape[-1]
        k = self.kernel_size
        v = self.param("v", nn.initializers.lecun_normal(), (k, k, in_ch, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        # Normalization always in f32 (param dtype); only the effective weight is
        # cast, so bf16 activations get full-precision weight norms.
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-24)
        w = (v / norm * g).astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if folded:
            assert self.stride == 1, "fold region: stride-1 only"
            out = _conv_on_folded(x, w, self.padding)
            return out + jnp.tile(bias.astype(out.dtype), 4)
        out = _dispatch_conv(x, w, self.stride, self.padding)
        return out + bias.astype(out.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d(C) defaults: affine=False, biased variance, per-sample
    per-channel normalization over spatial dims."""
    # Single-pass statistics (E[x], E[x^2] reduce in one fusion — jnp.var's
    # two-pass form measured 2-3x more reduce traffic in the scene trace) in f32;
    # the normalize arithmetic runs in the input dtype (bf16 in serving mode).
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


class WarpLearnLayerNorm(nn.Module):
    """The ICN's custom LayerNorm (warp_learn/models.py:15-35): per-sample statistics
    over ALL of (H, W, C), UNBIASED std, divides by (std + eps), per-channel affine."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        n = x[0].size
        x32 = x.astype(jnp.float32)
        # Note: the full (H, W, C) reduce here is NOT a bottleneck — profiling the
        # ICN on v5e shows XLA fuses these statistics into the producing
        # convolution's epilogue (one "convolution fusion" op); a hand-decomposed
        # spatial-first reduce compiles to the identical program.
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0) * (n / max(n - 1, 1))
        scale = 1.0 / (jnp.sqrt(var) + self.eps)
        gamma = self.param("gamma", nn.initializers.uniform(scale=1.0), (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        xn = (x - mean.astype(x.dtype)) * scale.astype(x.dtype)
        return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """torch nn.BatchNorm2d with params-resident running stats.

    Inference (train=False): normalize by the stored running stats — matching eval()
    of a converted torch checkpoint exactly. Training (train=True): normalize by the
    batch statistics and `sow` them into the 'bn_stats' collection; the trainer
    EMA-updates the params' running stats from the sown values (torch momentum
    semantics) — see pipeline/training.update_bn_running_stats.
    """

    features: int
    eps: float = 1e-5
    train: bool = False

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        if self.train:
            axes = tuple(range(x.ndim - 1))
            batch_mean = jnp.mean(x, axis=axes)
            batch_var = jnp.var(x, axis=axes)
            self.sow("bn_stats", "mean", batch_mean)
            self.sow("bn_stats", "var", batch_var)
            mean, var = batch_mean, batch_var
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


# ---------------------------------------------------------------------------
# Pooling / resampling
# ---------------------------------------------------------------------------

def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MaxPool2d(2, stride=2)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def avg_pool_torch(
    x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1
) -> jnp.ndarray:
    """torch nn.AvgPool2d(window, stride, padding, count_include_pad=False)
    (the multi-scale discriminator's downsampler, warp_learn/models.py:217)."""
    sums = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return sums / counts


def depth_to_space(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """VUNet's DepthToSpace (vunet/layers.py:173-196): TF channel ordering — channel
    groups are (r1, r2, c), NOT torch.pixel_shuffle's (c, r1, r2). NHWC."""
    b, h, w, c = x.shape
    c_out = c // (block * block)
    x = x.reshape(b, h, w, block, block, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, r1, w, r2, c
    return x.reshape(b, h * block, w * block, c_out)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Inverse of depth_to_space (vunet/layers.py:199-221)."""
    b, h, w, c = x.shape
    h_out, w_out = h // block, w // block
    x = x.reshape(b, h_out, block, w_out, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h', w', r1, r2, c
    return x.reshape(b, h_out, w_out, block * block * c)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch nn.AdaptiveAvgPool2d on NHWC: output cell (i, j) averages input window
    [floor(i*H/oh), ceil((i+1)*H/oh)) x [floor(j*W/ow), ceil((j+1)*W/ow))."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        y0, y1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            x0, x1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[..., y0:y1, x0:x1, :], axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def upsample2x_nearest_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=2) (nearest) on NHWC."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def upconv2x_nearest_reflect_reference(x: jnp.ndarray, kernel: jnp.ndarray):
    """Reference composition: nearest-2x upsample -> ReflectionPad2d(2) -> 5x5
    conv (no bias). The ICN decoder's up stages (warp_learn/models.py:171-180:
    Upsample + Conv2dBlock(k=5, pad=2, reflect)) compute exactly this."""
    u = upsample2x_nearest_nhwc(x)
    u = jnp.pad(u, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return _xla_conv(u, kernel.astype(x.dtype), 1, 0)


# Row-collapse matrices for the phase decomposition below: output row p = 2i+a
# reads upsampled rows 2i+a-2 .. 2i+a+2, and upsampled row r holds x[r // 2],
# so the five 5-tap rows collapse onto source rows {i-1, i, i+1} with
# phase-dependent multiplicity: a=0 -> (K0+K1, K2+K3, K4), a=1 -> (K0, K1+K2,
# K3+K4). Same along columns.
_UPC_M = (
    ((1, 1, 0, 0, 0), (0, 0, 1, 1, 0), (0, 0, 0, 0, 1)),  # phase 0
    ((1, 0, 0, 0, 0), (0, 1, 1, 0, 0), (0, 0, 0, 1, 1)),  # phase 1
)


def upconv2x_nearest_reflect(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """nearest-2x upsample -> reflect-pad(2) -> 5x5 conv, WITHOUT materializing
    the upsampled tensor: one 3x3 conv emitting 4 phase-packed output groups +
    depth-to-space. Exact (not approximate) vs the reference composition.

    Because nearest upsampling repeats each source pixel 2x2, every output
    phase (a, b) of the 5x5 conv touches only a 3x3 neighborhood of SOURCE
    pixels, with taps summed per the collapse matrices above — so the whole
    stage is a single dense (3*3*C_in) x (4*C_out) MXU contraction at source
    resolution: 36 tap-applications per source pixel instead of 100, and the
    4x-larger upsampled intermediate never hits HBM. The collapse assumes
    x[i-1], x[i+1] neighbors exist, which fails in the first/last source
    row/col where the reflect padding of the UPSAMPLED field interleaves
    x[0]/x[1] differently; those 2-pixel output borders are recomputed exactly
    from 6-row/col gathered strips that reproduce the padded upsampled field
    the true taps read. Used by the ICN decoder (models/icn.py); parity vs the
    reference composition is pinned in tests/test_layers.py.
    """
    n, h, w, c = x.shape
    o = kernel.shape[-1]
    if kernel.shape[0] != 5 or kernel.shape[1] != 5 or h < 4 or w < 4:
        return upconv2x_nearest_reflect_reference(x, kernel)

    m0 = jnp.asarray(_UPC_M[0], kernel.dtype)
    m1 = jnp.asarray(_UPC_M[1], kernel.dtype)
    phases = [
        jnp.einsum("ak,bl,klio->abio", ma, mb, kernel)
        for ma in (m0, m1)
        for mb in (m0, m1)
    ]
    kp = jnp.concatenate(phases, axis=-1).astype(x.dtype)  # (3, 3, C, 4*O)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # The phase-packed contraction is the stage's MXU bulk — quantize it under
    # the int8 serving tier like every other trunk conv (borders stay float).
    main_conv = _int8_conv if _int8_eligible(xp, kp) else _xla_conv
    y4 = main_conv(xp, kp, 1, 0)  # (N, H, W, 4*O), groups ordered (a, b, o)
    y = (
        y4.reshape(n, h, w, 2, 2, o)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * h, 2 * w, o)
    )

    # Border restoration: the first/last two output rows/cols re-run the true
    # 5x5 conv over the exact 6-row (or 6-col) slice of the padded upsampled
    # field they read — e.g. output rows 0..1 read padded rows -2..3 =
    # [x1, x0, x0, x0, x1, x1] (reflect pad of the upsampled field is
    # u[2]=x[1], u[1]=x[0]). Column strips span the full (row-padded) height,
    # so they are exact in the corners too.
    kc = kernel.astype(x.dtype)
    top_idx = jnp.array([1, 0, 0, 0, 1, 1])
    bot_idx = jnp.array([h - 2, h - 2, h - 1, h - 1, h - 1, h - 2])
    rgt_idx = jnp.array([w - 2, w - 2, w - 1, w - 1, w - 1, w - 2])

    def row_strip(idx):
        xs = jnp.repeat(x[:, idx], 2, axis=2)
        xs = jnp.pad(xs, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
        return _xla_conv(xs, kc, 1, 0)  # (N, 2, 2W, O)

    def col_strip(idx):
        xs = jnp.repeat(x[:, :, idx], 2, axis=1)
        xs = jnp.pad(xs, ((0, 0), (2, 2), (0, 0), (0, 0)), mode="reflect")
        return _xla_conv(xs, kc, 1, 0)  # (N, 2H, 2, O)

    y = y.at[:, :2].set(row_strip(top_idx))
    y = y.at[:, -2:].set(row_strip(bot_idx))
    y = y.at[:, :, :2].set(col_strip(top_idx))
    y = y.at[:, :, -2:].set(col_strip(rgt_idx))
    return y


def dropout2d(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    """torch nn.Dropout2d: zeroes entire channels per sample, scales by 1/(1-p)."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), 0.0)
