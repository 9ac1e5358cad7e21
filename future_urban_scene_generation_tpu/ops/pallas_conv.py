"""Pallas TPU kernel for small-input-channel stride-1 convolutions.

Why: `lax.conv_general_dilated` runs lane-starved when C_in is far below 128 —
the ICN's 21-channel 7x7 stem traced at 18 ms (6% MXU) of a 59 ms batch-24
forward, and every generator stem (VUNet 3/6ch, EdgeConnect 3-4ch, VGG 3ch) has
the same shape problem. The standard fix is an im2col matmul whose contraction
dim is k²·C (1029 for the ICN stem), but materializing the k²-size im2col in
HBM loses more than it gains (measured: ICN 59 -> 91 ms — see
models/layers._conv_small_cin_matmul).

This kernel builds the im2col **in VMEM**, where the k² blowup never touches
HBM. Layout choices are driven by Mosaic's vector-layout rules (lane-dim
reshapes must stay 128-aligned, so NHWC channel unpacking is out):

* the input arrives channels-major (N, C, Hp, Wp): width is the lane dim, so a
  (ky, kx) tap is a plain sublane/lane slice (C, rows, w_out) — no reshape;
* the 49 tap slices concatenate along the MAJOR axis into A = (k²C, rows,
  w_out), entirely in VMEM (~4 MB for the ICN stem tile);
* per output row, `dot_general` contracts A[:, r, :] over its major dim with
  the (k²C, O) kernel matrix: contraction length k²C keeps the MXU lanes full
  (vs C/128 for the direct conv), f32 accumulation, cast on store.

Scope: stride 1, no dilation, pre-padded input (Conv2dBlock applies its own
reflect/zero padding first), C_in small (the win disappears once C_in ~ 128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _conv_kernel(x_ref, k_ref, o_ref, *, kk: int, cin: int, w_out: int,
                 rows: int):
    """One (n, row-tile) step.

    x_ref: (1, C, Hp, Wp) channels-major image; k_ref: (kk, kk*C, O) with rows
    of each k_ref[ky] in (kx, ci) tap order; o_ref: (1, rows*w_out, O).

    VMEM budget note: accumulating per-ky keeps the live im2col slice at
    (kk*C, rows, w_out) (~0.6 MB for the ICN stem) instead of the full
    (kk²*C, ...) (~4 MB) — the full-concat variant OOMed VMEM next to the
    ~4 MB image block.
    """
    base = pl.program_id(1) * rows
    # One sublane-ALIGNED load per tile (dynamic sublane offsets must be
    # 8-multiples); the ky offsets are then static in-register slices.
    slab = x_ref[0, :, pl.ds(base, rows + 8), :]  # (C, rows + 8, Wp)
    acc = jnp.zeros((rows * w_out, k_ref.shape[-1]), jnp.float32)
    for ky in range(kk):
        taps = [slab[:, ky:ky + rows, kx:kx + w_out] for kx in range(kk)]
        a = jnp.concatenate(taps, axis=0)  # (kk*C, rows, w_out)
        a2 = a.reshape(kk * cin, rows * w_out)  # merge sublane x lane dims
        acc = acc + jax.lax.dot_general(
            a2, k_ref[ky],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


def _conv_kernel_v2(x_ref, k_ref, o_ref, *, kk: int, cin: int, w_out: int,
                    rows: int, wp: int):
    """One (n, row-tile) step — kx packed into the OUTPUT lanes.

    x_ref: (1, Hp, C, Wp) rows-major; k_ref: (kk*C, kk*O) with rows in
    (ky, ci) order and cols in (kx, o) order; o_ref: (1, rows*w_out, O).

    vs _conv_kernel: each dot emits N = kk*O lanes (448 for the ICN stem =
    87.5% fill of the 128-lane output tiles, vs 64 = 50% for the per-ky
    variant), and the im2col needs NO kx lane shifts — per output row the
    (kk*C, Wp) tap matrix assembles from kk free major-dim picks + sublane
    concat, and the kx taps are recovered afterwards by a kk-term shift-sum
    over the partial-product table. The dot contracts the full padded width
    Wp (w_out + kk - 1), a <3% MAC overhead at 256-wide tiles. (A single
    merged (kk*C, rows*Wp) dot per tile is layout-illegal: Mosaic can't merge
    a sublane dim into a non-128-aligned lane dim, and 3D dot_general is
    likewise unsupported — hence the per-row loop.)
    """
    base = pl.program_id(1) * rows
    slab = x_ref[0, pl.ds(base, rows + 8), :, :]  # (rows + 8, C, Wp)
    cout = o_ref.shape[-1]
    for r in range(rows):
        # (kk*C, Wp): ky taps for output row r — major-dim picks, no shifts.
        lhs = jnp.concatenate([slab[r + ky] for ky in range(kk)], axis=0)
        p = jax.lax.dot_general(
            lhs, k_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Wp, kk*O): partial products for every kx at every width position
        # y[u, o] = sum_kx p[u + kx, kx*O + o] — align each kx block back
        # onto the output window and sum.
        acc = p[0:w_out, 0:cout]
        for kx in range(1, kk):
            acc = acc + p[kx:kx + w_out, kx * cout:(kx + 1) * cout]
        o_ref[0, pl.ds(r * w_out, w_out), :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def conv_small_cin_v2(x: jnp.ndarray, kernel: jnp.ndarray, rows: int = 8,
                      interpret: bool = False) -> jnp.ndarray:
    """Stride-1 VALID conv, output-lane-packed variant (see _conv_kernel_v2).

    x (N, Hp, Wp, C) -> (N, Hp-k+1, Wp-k+1, O). Same contract as
    conv_small_cin; kernel layout differs ((ky,ci) x (kx,o) matrix).
    """
    n, hp, wp, cin = x.shape
    kk = kernel.shape[0]
    cout = kernel.shape[-1]
    h_out = hp - kk + 1
    w_out = wp - kk + 1

    pad_h = (-h_out) % rows
    extra = max(0, ((h_out + pad_h) - rows) + rows + 8 - (hp + pad_h))
    if pad_h or extra:
        x = jnp.pad(x, ((0, 0), (0, pad_h + extra), (0, 0), (0, 0)))
        hp += pad_h + extra
    n_tiles = (h_out + pad_h) // rows

    xc = jnp.transpose(x, (0, 1, 3, 2))  # (N, Hp, C, Wp) — lanes = width
    # (ky, kx, ci, o) -> rows (ky, ci), cols (kx, o).
    kmat = jnp.transpose(kernel, (0, 2, 1, 3)).reshape(
        kk * cin, kk * cout
    ).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel_v2, kk=kk, cin=cin, w_out=w_out, rows=rows, wp=wp
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, hp, cin, wp), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((kk * cin, kk * cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows * w_out, cout), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, (h_out + pad_h) * w_out, cout), x.dtype
        ),
        interpret=interpret,
    )(xc, kmat)
    return out.reshape(n, h_out + pad_h, w_out, cout)[:, :h_out]


def _conv_kernel_v2_fused(sk_ref, ce_ref, pl_ref, k_ref, o_ref, *, kk: int,
                          w_out: int, rows: int, n_planes: int):
    """_conv_kernel_v2 body over a channel-concat input assembled IN VMEM.

    The ICN stem's 21-channel input is [dst sketch(3) | central crop(3) |
    n_planes warped planes(3 each)] (warp_learn/models.py:323-366). Feeding the
    three pieces through separate BlockSpecs instead of one pre-concatenated
    tensor removes the host-program concat + layout transpose that XLA
    materializes as ~16 ms of dynamic-update-slices and copies at batch 48
    (V=8 scene trace, docs/SERVING.md) — the concat here is a per-tile VMEM
    sublane shuffle on ~90K elements. Channel order matches the concat path
    exactly, so the per-row dots see identical 147-row operands (bit-identical
    output).

    sk_ref/ce_ref: (1, Hp, 3, Wp); pl_ref: (1, Hp, 3*n_planes, Wp) — the
    planes pre-merged into one channels-major piece (keeps the VMEM block at
    16 padded sublanes instead of n_planes separate 3->8-padded blocks);
    k_ref: (kk*21, kk*O) as in _conv_kernel_v2.
    """
    del n_planes
    base = pl.program_id(1) * rows
    span = pl.ds(base, rows + 8)
    slab = jnp.concatenate(
        [sk_ref[0, span], ce_ref[0, span], pl_ref[0, span]], axis=1
    )  # (rows + 8, C_total, Wp)
    cout = o_ref.shape[-1]
    for r in range(rows):
        lhs = jnp.concatenate([slab[r + ky] for ky in range(kk)], axis=0)
        p = jax.lax.dot_general(
            lhs, k_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = p[0:w_out, 0:cout]
        for kx in range(1, kk):
            acc = acc + p[kx:kx + w_out, kx * cout:(kx + 1) * cout]
        o_ref[0, pl.ds(r * w_out, w_out), :] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pad", "s_repeat", "rows", "interpret")
)
def icn_stem_conv_fused(sketch: jnp.ndarray, central: jnp.ndarray,
                        planes: jnp.ndarray, kernel: jnp.ndarray, *,
                        pad: int = 3, s_repeat: int = 1, rows: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """ICN stem conv over [sketch | central | planes] WITHOUT materializing the
    21-channel concat (see _conv_kernel_v2_fused).

    sketch (N, H, W, 3), central (N // s_repeat, H, W, 3), planes
    (N, P, H, W, 3) — all UNpadded NHWC; this wrapper reflect-pads each piece
    by ``pad`` (the stem's ReflectionPad2d, warp_learn/models.py:132) and
    transposes width into the lane dim per piece. ``central`` is indexed
    i -> i // s_repeat by the grid, replacing the (V,) -> (V*S,) jnp.repeat
    copy the batch path needed. kernel (k, k, 3*(2+P), O) HWIO, channel order
    [sketch, central, plane_0.., plane_{P-1}]. Returns (N, H, W, O) for
    pad == k//2.
    """
    n, h, w_in, _ = sketch.shape
    n_planes = planes.shape[1]
    kk = kernel.shape[0]
    cin = kernel.shape[2]
    cout = kernel.shape[-1]
    assert cin == 3 * (2 + n_planes), (cin, n_planes)
    assert n % s_repeat == 0 and central.shape[0] == n // s_repeat
    hp = h + 2 * pad
    wp = w_in + 2 * pad
    h_out = hp - kk + 1
    w_out = wp - kk + 1

    pad_h = (-h_out) % rows
    extra = max(0, ((h_out + pad_h) - rows) + rows + 8 - (hp + pad_h))

    def prep(x):  # (M, H, W, 3) -> (M, Hp + pad_h + extra, 3, Wp)
        x = jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
        )
        x = jnp.pad(x, ((0, 0), (0, pad_h + extra), (0, 0), (0, 0)))
        return jnp.transpose(x, (0, 1, 3, 2))

    sk = prep(sketch)
    ce = prep(central)
    # Planes -> (N, Hp, P*3, Wp): one transpose, then a free contiguous-dim
    # merge of (P, 3) into the channel axis (channel order plane0.rgb,
    # plane1.rgb, ... — identical to the concat path's moveaxis+reshape).
    pls = jnp.pad(
        planes, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)),
        mode="reflect",
    )
    pls = jnp.pad(pls, ((0, 0), (0, 0), (0, pad_h + extra), (0, 0), (0, 0)))
    pls = jnp.transpose(pls, (0, 2, 1, 4, 3))
    hpp = hp + pad_h + extra
    pls = pls.reshape(n, hpp, n_planes * 3, wp)
    n_tiles = (h_out + pad_h) // rows

    kmat = jnp.transpose(kernel, (0, 2, 1, 3)).reshape(
        kk * cin, kk * cout
    ).astype(sketch.dtype)

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel_v2_fused, kk=kk, w_out=w_out, rows=rows,
            n_planes=n_planes,
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, hpp, 3, wp), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec(
                (1, hpp, 3, wp),
                lambda i, j, s=s_repeat: (i // s, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, hpp, n_planes * 3, wp), lambda i, j: (i, 0, 0, 0)
            ),
            pl.BlockSpec((kk * cin, kk * cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows * w_out, cout), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, (h_out + pad_h) * w_out, cout), sketch.dtype
        ),
        interpret=interpret,
    )(sk, ce, pls, kmat)
    return out.reshape(n, h_out + pad_h, w_out, cout)[:, :h_out]


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def conv_small_cin(x: jnp.ndarray, kernel: jnp.ndarray, rows: int = 8,
                   interpret: bool = False) -> jnp.ndarray:
    """Stride-1 VALID conv of a pre-padded NHWC input with an HWIO kernel.

    x (N, Hp, Wp, C) -> (N, Hp-k+1, Wp-k+1, O).
    """
    n, hp, wp, cin = x.shape
    kk = kernel.shape[0]
    cout = kernel.shape[-1]
    h_out = hp - kk + 1
    w_out = wp - kk + 1

    pad_h = (-h_out) % rows
    # The kernel loads (rows + 8) sublanes per tile (aligned-load + in-register
    # ky shifts); guarantee the last tile's load stays in bounds.
    extra = max(0, ((h_out + pad_h) - rows) + rows + 8 - (hp + pad_h))
    if pad_h or extra:
        x = jnp.pad(x, ((0, 0), (0, pad_h + extra), (0, 0), (0, 0)))
        hp += pad_h + extra
    n_tiles = (h_out + pad_h) // rows

    xc = jnp.transpose(x, (0, 3, 1, 2))  # (N, C, Hp, Wp) — lanes = width
    # kernel (ky, kx, ci, o) -> (ky, kx*ci, o): per-ky matrices whose row order
    # matches the kx-major tap concatenation above.
    kmat = kernel.reshape(kk, kk * cin, cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, kk=kk, cin=cin, w_out=w_out, rows=rows
        ),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, cin, hp, wp), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((kk, kk * cin, cout), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows * w_out, cout), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, (h_out + pad_h) * w_out, cout), x.dtype
        ),
        interpret=interpret,
    )(xc, kmat)
    return out.reshape(n, h_out + pad_h, w_out, cout)[:, :h_out]
