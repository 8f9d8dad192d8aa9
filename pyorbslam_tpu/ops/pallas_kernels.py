"""Pallas TPU kernels for the frontend hot loops.

The jnp formulation of FAST materializes ~40 full-image intermediates
(16 circle diffs + rolling minima), each a round-trip through HBM.  The
Pallas kernel streams the image once: each grid program DMAs one row
stripe (plus a 3-pixel halo — overlapping stripes need a manual DMA, not
a BlockSpec) into VMEM and evaluates the complete FAST-9/16
corner-strength arithmetic on the VPU while the data is on-chip —
identical math to :func:`pyorbslam_tpu.ops.fast.fast_score_map`
(tests/test_pallas.py checks equality), at a fraction of the memory
traffic.

Measured on v5e the kernel is within noise of the jnp path (~1.7-2.0 ms
for a 376x1241 level): XLA's producer fusion already keeps the diff/min
arithmetic on-chip, so the single-pass advantage doesn't materialize for
this op alone.  It is kept (opt-in via PYORBSLAM_PALLAS_FAST=1, bit-exact
vs the jnp path in the interior, tested compiled on hardware) as the
scaffold for the real win: fusing cell-fallback masking, NMS, and
per-bucket top-k into the same VMEM-resident pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyorbslam_tpu.ops.fast import CIRCLE_OFFSETS

_TILE_H = 64
_HALO = 3
_STRIPE = _TILE_H + 8  # halo rows padded so DMA slices stay sublane-aligned


def _fast_kernel(img_hbm, out_ref, stripe, sem):
    i = pl.program_id(0)
    tile_h = out_ref.shape[0]

    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, _STRIPE), :],
        stripe,
        sem,
    )
    dma.start()
    dma.wait()

    center = stripe[_HALO:_HALO + tile_h, :]

    diffs = []
    for dx, dy in CIRCLE_OFFSETS:
        dy = int(dy)
        dx = int(dx)
        shifted = stripe[_HALO + dy:_HALO + dy + tile_h, :]
        if dx != 0:
            # circular column shift (Mosaic-native, non-negative shift);
            # the <=3 wrapped columns land in the border that the
            # detector masks anyway
            w = shifted.shape[1]
            shifted = pltpu.roll(shifted, shift=(w - dx) % w, axis=1)
        diffs.append(shifted - center)

    def arc_strength(vals):
        # max over the 16 circular arcs of (min over 9 consecutive)
        m3 = [jnp.minimum(jnp.minimum(vals[i], vals[(i + 1) % 16]),
                          vals[(i + 2) % 16]) for i in range(16)]
        m9 = [jnp.minimum(jnp.minimum(m3[i], m3[(i + 3) % 16]),
                          m3[(i + 6) % 16]) for i in range(16)]
        out = m9[0]
        for i2 in range(1, 16):
            out = jnp.maximum(out, m9[i2])
        return out

    bright = arc_strength(diffs)
    dark = arc_strength([-d for d in diffs])
    out_ref[:, :] = jnp.maximum(jnp.maximum(bright, dark), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for fast.fast_score_map (float32 (H, W)).

    Column edges differ from the jnp version only inside a 3-px border
    (the kernel zero-fills column shifts; the jnp path edge-pads) — both
    are discarded by the detector's 16-px border mask.
    """
    h, w = img.shape
    hp = -(-h // _TILE_H) * _TILE_H
    wp = -(-w // 128) * 128
    # 3 halo rows on top (edge), 5 on the bottom (3 halo + 2 alignment)
    padded = jnp.pad(img, ((_HALO, _STRIPE - _TILE_H - _HALO), (0, 0)), mode="edge")
    padded = jnp.pad(padded, ((0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        _fast_kernel,
        grid=(hp // _TILE_H,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (_TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_STRIPE, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:h, :w]


# ---------------------------------------------------------------------------
# rBRIEF descriptor kernel
# ---------------------------------------------------------------------------
#
# The jnp descriptor path is one big XLA gather: 512 rotated samples x N
# keypoints from the blurred level image (~1M gathered elements per image,
# the dominant frontend cost after the moment-map change).  TPUs hate
# scattered gathers but love matmuls, so the kernel reformulates sampling
# as selection algebra:
#
#   per keypoint: DMA a 48x64 window around the keypoint into VMEM, then
#     vals = rowsum( (RowOneHot @ W) * ColOneHot )
#   where RowOneHot[j] selects row ry[j] (48-wide) and ColOneHot[j]
#   selects column rx[j] (64-wide) of the rotated pattern point j.
#   RowOneHot @ W is an MXU matmul; everything else is VPU compares.
#
# Keypoints are processed K at a time per grid program with the window
# DMAs issued back-to-back (keypoint coords arrive via scalar prefetch).

_BRIEF_K = 8          # keypoints per grid program
# DMA source offsets must be tile-aligned (8 sublanes / 128 lanes), so the
# window origin is rounded down and the residual offset is added to the
# per-keypoint sample indices instead.
_WIN_R = 56           # 45-px rotated reach + up to 7 rows of alignment slack
_WIN_C = 256          # 45-px reach + alignment slack, 128-multiple width
_WIN_OFF = 22         # nominal top-left is (y - 3, x - 3): BORDER(19) - 22


def _brief_kernel(xy_ref, cos_ref, sin_ref, patx_ref, paty_ref, img_hbm, out_ref,
                  win, sems):
    """patx/paty: (512, 128) with the pattern coordinate replicated along
    lanes — (512, 1) column vectors scalarize into SMEM, so per-pattern
    arithmetic stays lane-aligned.  The compute loop is a fori_loop (the
    fully unrolled form overflowed the 1 MB SMEM scalar budget)."""
    # xy/cos/sin arrive as per-program SMEM blocks (whole-array scalar
    # prefetch overflowed the ~1 MB SMEM budget)
    for k in range(_BRIEF_K):
        y0 = xy_ref[k, 1] + 19 - _WIN_OFF
        x0 = xy_ref[k, 0] + 19 - _WIN_OFF
        y_al = pl.multiple_of((y0 // 8) * 8, 8)
        x_al = pl.multiple_of((x0 // 128) * 128, 128)
        dma = pltpu.make_async_copy(
            img_hbm.at[pl.ds(y_al, _WIN_R), pl.ds(x_al, _WIN_C)],
            win.at[pl.ds(k * _WIN_R, _WIN_R), :],
            sems.at[k],
        )
        dma.start()

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (512, _WIN_R), 1)
    col_lo = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    col_hi = col_lo + 128

    px = patx_ref[:, :]                     # (512, 128) replicated
    py = paty_ref[:, :]

    def body(k, carry):
        a = cos_ref[k, 0]
        b = sin_ref[k, 0]
        y0 = xy_ref[k, 1] + 19 - _WIN_OFF
        x0 = xy_ref[k, 0] + 19 - _WIN_OFF
        ry_off = y0 - (y0 // 8) * 8
        rx_off = x0 - (x0 // 128) * 128

        # reference GET_VALUE rounding (computeOrbDescriptor:108-147)
        ry = jnp.round(px * b + py * a).astype(jnp.int32) + (_WIN_OFF + ry_off)
        rx = jnp.round(px * a - py * b).astype(jnp.int32) + (_WIN_OFF + rx_off)

        row_sel = (row_iota == ry[:, :_WIN_R]).astype(jnp.float32)
        sel_lo = (col_lo == rx).astype(jnp.float32)
        sel_hi = (col_hi == rx).astype(jnp.float32)

        pltpu.make_async_copy(
            img_hbm.at[pl.ds(0, _WIN_R), pl.ds(0, _WIN_C)],
            win.at[pl.ds(0, _WIN_R), :],
            sems.at[k],
        ).wait()

        wk = win[pl.ds(pl.multiple_of(k * _WIN_R, 8), _WIN_R), :]
        # HIGHEST: the MXU's default bf16 passes truncate the blurred
        # image's fractional intensities and flip near-tie BRIEF bits;
        # full-f32 passes make the one-hot selection exact
        m = jnp.dot(row_sel, wk, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        vals = jnp.sum(m[:, :128] * sel_lo + m[:, 128:] * sel_hi,
                       axis=1, keepdims=True)            # (512, 1)
        out_ref[pl.ds(k, 1), :] = vals.reshape(1, 512)
        return carry

    jax.lax.fori_loop(0, _BRIEF_K, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_descriptors_pallas(
    padded_blurred: jnp.ndarray,   # (H + 38, W + 38) float32 (BORDER = 19)
    xy: jnp.ndarray,               # (N, 2) int32 level coords
    angle_deg: jnp.ndarray,        # (N,) float32
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for orb_descriptor.brief_descriptors."""
    from pyorbslam_tpu.ops.orb_descriptor import brief_pattern

    n = xy.shape[0]
    n_pad = -(-n // _BRIEF_K) * _BRIEF_K
    xy_p = jnp.pad(xy, ((0, n_pad - n), (0, 0)))
    rad = jnp.pad(angle_deg, (0, n_pad - n)) * jnp.float32(np.pi / 180.0)
    cos_p = jnp.cos(rad)[:, None]   # 2-D: rank-1 SMEM blocks need 128-multiples
    sin_p = jnp.sin(rad)[:, None]

    # slack so every aligned keypoint window stays in range
    img = jnp.pad(padded_blurred, ((0, 64), (0, 256)))

    pattern = np.asarray(brief_pattern(), np.float32)   # (512, 2)
    # interleave so pairs sit at rows (2j, 2j+1); replicate along lanes
    patx = jnp.asarray(np.repeat(pattern[:, 0:1], 128, axis=1))
    paty = jnp.asarray(np.repeat(pattern[:, 1:2], 128, axis=1))

    vals = pl.pallas_call(
        _brief_kernel,
        grid=(n_pad // _BRIEF_K,),
        in_specs=[
            pl.BlockSpec((_BRIEF_K, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),              # xy
            pl.BlockSpec((_BRIEF_K, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),              # cos
            pl.BlockSpec((_BRIEF_K, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),              # sin
            pl.BlockSpec(memory_space=pltpu.VMEM),              # patx
            pl.BlockSpec(memory_space=pltpu.VMEM),              # paty
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # image
        ],
        out_specs=pl.BlockSpec(
            (_BRIEF_K, 512), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_BRIEF_K * _WIN_R, _WIN_C), jnp.float32),
            pltpu.SemaphoreType.DMA((_BRIEF_K,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_pad, 512), jnp.float32),
        interpret=interpret,
    )(xy_p.astype(jnp.int32), cos_p, sin_p, patx, paty, img)

    # pair-compare + pack -> uint32 words outside the kernel (fused by XLA)
    bits = vals[:n, 0::2] < vals[:n, 1::2]
    words = bits.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# rBRIEF on the extraction canvas (atlas path)
# ---------------------------------------------------------------------------
#
# Same selection-algebra sampling as above, with two changes that matter:
#   * keypoint coords are direct canvas indices (the canvas already embeds
#     every level's 19 px border), so there is no border offset; and
#   * the canvas is the u8-ROUNDED blurred working image (integers 0..255
#     are exact in bfloat16's 8 significand bits), so the one-hot selection
#     matmul runs at the MXU's native bf16 precision and is still exact —
#     no HIGHEST multi-pass needed.

_REACH = 19           # max |rounded rotated pattern offset| (asserted below)
_WIN_R2 = 64          # 2*19+1 rows + up to 15 rows of bf16 sublane alignment
_WIN_C2 = 256         # 128 lane-alignment slack + 39 + headroom


def _brief_canvas_kernel(xy_ref, cos_ref, sin_ref, patx_ref, paty_ref,
                         img_hbm, out_ref, win, sems):
    for k in range(_BRIEF_K):
        y_al = pl.multiple_of((((xy_ref[k, 1] - _REACH) // 16) * 16), 16)
        x_al = pl.multiple_of(((((xy_ref[k, 0] - _REACH) // 128) * 128)), 128)
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(y_al, _WIN_R2), pl.ds(x_al, _WIN_C2)],
            win.at[pl.ds(k * _WIN_R2, _WIN_R2), :],
            sems.at[k],
        ).start()

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (512, _WIN_R2), 1)
    col_lo = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    col_hi = col_lo + 128
    px = patx_ref[:, :]
    py = paty_ref[:, :]

    def body(k, carry):
        a = cos_ref[k, 0]
        b = sin_ref[k, 0]
        y0 = xy_ref[k, 1] - _REACH
        x0 = xy_ref[k, 0] - _REACH
        ry_off = y0 - (y0 // 16) * 16 + _REACH
        rx_off = x0 - (x0 // 128) * 128 + _REACH

        ry = jnp.round(px * b + py * a).astype(jnp.int32) + ry_off
        rx = jnp.round(px * a - py * b).astype(jnp.int32) + rx_off

        row_sel = (row_iota == ry[:, :_WIN_R2]).astype(jnp.bfloat16)
        sel_lo = (col_lo == rx).astype(jnp.float32)
        sel_hi = (col_hi == rx).astype(jnp.float32)

        pltpu.make_async_copy(
            img_hbm.at[pl.ds(0, _WIN_R2), pl.ds(0, _WIN_C2)],
            win.at[pl.ds(0, _WIN_R2), :],
            sems.at[k],
        ).wait()
        wk = win[pl.ds(pl.multiple_of(k * _WIN_R2, 16), _WIN_R2), :]
        m = jnp.dot(row_sel, wk, preferred_element_type=jnp.float32)
        vals = jnp.sum(m[:, :128] * sel_lo + m[:, 128:] * sel_hi,
                       axis=1, keepdims=True)
        out_ref[pl.ds(k, 1), :] = vals.reshape(1, 512)
        return carry

    jax.lax.fori_loop(0, _BRIEF_K, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_descriptors_canvas(
    blur_canvas: jnp.ndarray,      # (Hc, Wc) f32 u8-rounded blurred canvas
    xy: jnp.ndarray,               # (N, 2) int32 canvas coords
    angle_deg: jnp.ndarray,        # (N,) float32
    interpret: bool = False,
) -> jnp.ndarray:
    from pyorbslam_tpu.ops.orb_descriptor import brief_pattern

    pattern = np.asarray(brief_pattern(), np.float32)
    assert float(np.ceil(np.hypot(pattern[:, 0], pattern[:, 1]).max())) <= _REACH

    n = xy.shape[0]
    n_pad = -(-n // _BRIEF_K) * _BRIEF_K
    xy_p = jnp.clip(jnp.pad(xy, ((0, n_pad - n), (0, 0))), _REACH, None)
    rad = jnp.pad(angle_deg, (0, n_pad - n)) * jnp.float32(np.pi / 180.0)
    cos_p = jnp.cos(rad)[:, None]
    sin_p = jnp.sin(rad)[:, None]

    # bf16 canvas (integers <= 255 are exact) + alignment slack so every
    # aligned window read stays in range
    hc, wc = blur_canvas.shape
    img = jnp.pad(blur_canvas.astype(jnp.bfloat16), ((0, 64), (0, 384)))

    patx = jnp.asarray(np.repeat(pattern[:, 0:1], 128, axis=1))
    paty = jnp.asarray(np.repeat(pattern[:, 1:2], 128, axis=1))

    vals = pl.pallas_call(
        _brief_canvas_kernel,
        grid=(n_pad // _BRIEF_K,),
        in_specs=[
            pl.BlockSpec((_BRIEF_K, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BRIEF_K, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BRIEF_K, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (_BRIEF_K, 512), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_BRIEF_K * _WIN_R2, _WIN_C2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_BRIEF_K,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_pad, 512), jnp.float32),
        interpret=interpret,
    )(xy_p.astype(jnp.int32), cos_p, sin_p, patx, paty, img)

    bits = vals[:n, 0::2] < vals[:n, 1::2]
    words = bits.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
