"""Pallas TPU kernel for RAFT's windowed correlation lookup.

The per-iteration hot op of RAFT is: for every query pixel n, correlate
its feature f0[n] against a (2r+1)^2 window of the (pooled) second
feature map around the current flow estimate
(reference: correlation_volumes.py:48-83). Both XLA formulations are
gather-bound on TPU (row gathers over [HW, C] — ~2.2 s/frame at
440x1024); this kernel removes every gather:

 - the window offsets are INTEGERS, so all (2r+1)^2 samples at one query
   share a single bilinear fractional part — four constant-weight taps
   of an integer grid, exactly like the KLT kernels;
 - the feature map is stored as a 2D ``[h, w*C]`` VMEM array, so a
   window's column offset is ``x0*C`` — always 128-lane aligned for C a
   multiple of 128 — and loads are plain aligned vector loads;
 - the channel contraction is one [16, 8C] x [8C, 8] matmul against a
   block-diagonal ones matrix after multiplying in f0 (MXU);
 - dynamic row/tap indexing is absorbed by iota-built one-hot
   contractions (no sublane rotates, no reshapes of unaligned tiles —
   both miscompile in Mosaic for some shapes).

Zero-padding semantics match _bilinear_zeros: each of the four taps
contributes 0 where its integer coordinate leaves the feature map.

The kernel emits per-level 8x8 tap blocks (lane q = oy*8 + ox); the
wrapper crops them to the canonical (2r+1)^2 ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8        # queries per inner step (sublane alignment)
TILE_N = 1024    # queries per grid program (multiple of GROUP;
                 # 1D SMEM operands must match XLA's {0:T(1024)} tiling)
WIN_PX = 8       # window pixels per axis (supports radius <= 3)
WIN_ROWS = 16    # rows loaded (WIN_PX + 8 for sublane alignment)
KPAD = WIN_PX * WIN_PX  # padded taps per level (8x8 lanes)


def _kernel(*refs, radius: int, shapes, c: int, n_item: int):
    # shapes: per level (hl, wl, hp) with hp the PADDED row count, a
    # multiple of 8 plus 8 — so hp - WIN_ROWS is 8-aligned and the
    # aligned-window clamp below is provably a multiple of 8 (asserting
    # alignment on a non-multiple silently miscompiles the load).
    # Batch handling: fmaps are stacked [B*hp_l, wp_l*C] and queries are
    # batch-major with n_item (a TILE_N multiple) slots per item, so a
    # grid program serves exactly one batch item — its index is
    # tile_base // n_item and its level-l rows start at that times hp_l
    # (hp_l is a multiple of 8, so alignment survives the offset).
    levels = len(shapes)
    fmaps = refs[:levels]                 # each [B * hp_l, wp_l * C]
    f0_ref, cx_ref, cy_ref, out_ref = refs[levels:]

    # Block-diagonal ones: contracts lanes [8C] -> 8 pixel columns.
    pix = jax.lax.broadcasted_iota(jnp.int32, (WIN_PX * c, WIN_PX), 0) // c
    col = jax.lax.broadcasted_iota(jnp.int32, (WIN_PX * c, WIN_PX), 1)
    ones_s = (pix == col).astype(jnp.float32)

    # Row-selection iotas ([WIN_PX, WIN_ROWS]).
    sel_i = jax.lax.broadcasted_iota(jnp.int32, (WIN_PX, WIN_ROWS), 0)
    sel_r = jax.lax.broadcasted_iota(jnp.int32, (WIN_PX, WIN_ROWS), 1)

    # Flat tap lanes q = oy*8 + ox on [8, KPAD] / [1, KPAD] grids.
    q8 = jax.lax.broadcasted_iota(jnp.int32, (WIN_PX, KPAD), 1)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (WIN_PX, KPAD), 0)
    q1 = jax.lax.broadcasted_iota(jnp.int32, (1, KPAD), 1)
    oy_q = q1 // WIN_PX            # [1, KPAD]
    ox_q = q1 % WIN_PX

    tile_base = pl.program_id(0) * TILE_N
    b_idx = tile_base // n_item

    def one_group(g, _):
        n0 = pl.multiple_of(g * GROUP, GROUP)
        f0 = f0_ref[pl.ds(n0, GROUP), :]          # [GROUP, C] (aligned)

        per_level = []
        for lvl in range(levels):
            hl, wl, hp = shapes[lvl]
            inv = 1.0 / float(1 << lvl)
            rows = []
            for m in range(GROUP):
                cx = cx_ref[n0 + m] * inv
                cy = cy_ref[n0 + m] * inv
                x0 = jnp.floor(cx).astype(jnp.int32)
                y0 = jnp.floor(cy).astype(jnp.int32)
                fx = cx - jnp.floor(cx)
                fy = cy - jnp.floor(cy)

                xb = jnp.clip(x0 - radius, 0, max(wl - WIN_PX, 0))
                rb = jnp.clip(y0 - radius, 0, max(hl - WIN_PX, 0))
                rb8 = pl.multiple_of(
                    jnp.minimum((rb // 8) * 8, hp - WIN_ROWS)
                    + b_idx * hp, 8)
                lane0 = pl.multiple_of(xb * c, c)
                block = fmaps[lvl][pl.ds(rb8, WIN_ROWS),
                                   pl.ds(lane0, WIN_PX * c)]

                # Contract channels: d[row, px] = <block px, f0[m]>.
                f0m = f0[m:m + 1, :]                           # [1, C]
                f0t = jnp.concatenate([f0m] * WIN_PX, axis=1)  # [1, 8C]
                d = jax.lax.dot_general(
                    block * f0t, ones_s, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [16, 8]

                # Select the 8 window rows starting at rb - rb8 via a
                # one-hot matmul (no dynamic sublane ops).
                rsel = (sel_r == sel_i
                        + (rb - (rb8 - b_idx * hp))).astype(jnp.float32)
                d8 = jax.lax.dot_general(
                    rsel, d, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [8, 8]

                # Tap grid origin in window/global coords.
                ybase = y0 - radius - rb                       # scalar
                xbase = x0 - radius - xb

                def tap_row(dy, dx):
                    """[1, KPAD] tap values d8[iy(q), ix(q)] with
                    zero-padding masks, via two one-hot contractions."""
                    iy = jnp.clip(ybase + dy + q8 // WIN_PX, 0,
                                  WIN_PX - 1)                  # [8, KPAD]
                    ix = jnp.clip(xbase + dx + q8 % WIN_PX, 0,
                                  WIN_PX - 1)
                    a = (r8 == iy).astype(jnp.float32)         # [8, KPAD]
                    bsel = (r8 == ix).astype(jnp.float32)      # [8, KPAD]
                    t = jax.lax.dot_general(
                        d8, a, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [8c, KPAD]
                    vals = jnp.sum(t * bsel, axis=0,
                                   keepdims=True)              # [1, KPAD]
                    vy = y0 - radius + dy + oy_q               # [1, KPAD]
                    vx = x0 - radius + dx + ox_q
                    ok = ((vy >= 0) & (vy < hl) & (vx >= 0) & (vx < wl))
                    return jnp.where(ok, vals, 0.0)

                v = ((1 - fy) * (1 - fx) * tap_row(0, 0)
                     + (1 - fy) * fx * tap_row(0, 1)
                     + fy * (1 - fx) * tap_row(1, 0)
                     + fy * fx * tap_row(1, 1))                # [1, KPAD]
                rows.append(v)
            per_level.append(jnp.concatenate(rows, axis=0))    # [8, KPAD]

        out = jnp.concatenate(per_level, axis=1)               # [8, L*KPAD]
        out_ref[pl.ds(n0, GROUP), :] = out
        return 0

    jax.lax.fori_loop(0, TILE_N // GROUP, one_group, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_correlation_pallas_batched(fmap0, fmap1_pyramid, locations,
                                      radius: int, interpret: bool = False):
    """Windowed correlation lookup, batched in ONE kernel instance.

    Args:
      fmap0: ``[B, H, W, C]`` query features (C padded to 128 internally).
      fmap1_pyramid: list of ``[B, h_l, w_l, C]`` pooled target features.
      locations: ``[B, H, W, 2]`` (x, y) lookup centers at level-0 scale.

    Returns:
      ``[B, H, W, L*(2r+1)^2]`` correlations (scaled by 1/sqrt(C)),
      ordering identical to lookup_correlation / lookup_correlation_otf.

    The batch folds into the query grid (batch-major, one grid program
    per item) and into the stacked level rows — ``jax.vmap`` of the
    unbatched call cannot lower (1D SMEM operands have no batched block
    mapping), and a Python loop compiled B kernel copies (VERDICT r1
    item 7).
    """
    if radius > 3:
        raise ValueError("kernel supports radius <= 3 (8-px windows)")
    bsz, h, w, c_in = fmap0.shape
    levels = len(fmap1_pyramid)
    k = 2 * radius + 1
    c = ((max(c_in, 128) + 127) // 128) * 128

    # All B stacked target pyramids stay VMEM-resident; chunk the batch
    # when the stacked footprint would blow the ~16MB VMEM budget (each
    # chunk re-enters this function below the bound and reuses one
    # compiled kernel for equal chunk sizes).
    per_item = sum((((fm.shape[1] + 7) // 8 * 8 + 8)
                    * max(WIN_PX, fm.shape[2]) * c * 4)
                   for fm in fmap1_pyramid)
    max_b = max(1, int(12e6 // max(per_item, 1)))
    if bsz > max_b:
        outs = [lookup_correlation_pallas_batched(
                    fmap0[i:i + max_b],
                    [fm[i:i + max_b] for fm in fmap1_pyramid],
                    locations[i:i + max_b], radius, interpret=interpret)
                for i in range(0, bsz, max_b)]
        return jnp.concatenate(outs, axis=0)

    n = h * w
    n_item = ((n + TILE_N - 1) // TILE_N) * TILE_N
    scale = 1.0 / jnp.sqrt(jnp.asarray(c_in, jnp.float32))
    f0 = fmap0.reshape(bsz, n, c_in) * scale
    f0 = jnp.pad(f0, ((0, 0), (0, n_item - n), (0, c - c_in)))
    f0 = f0.reshape(bsz * n_item, c)

    fmaps = []
    shapes = []
    for fm in fmap1_pyramid:
        _, hl, wl, _ = fm.shape
        # Rows padded to round8(hl) + 8: every aligned 16-row window a
        # clamped query needs then fits, and hp - 16 is 8-aligned.
        hp = ((hl + 7) // 8) * 8 + 8
        fm = jnp.pad(fm, ((0, 0), (0, hp - hl), (0, max(WIN_PX - wl, 0)),
                          (0, c - c_in)))
        wp = fm.shape[2]
        fmaps.append(fm.reshape(bsz * hp, wp * c))
        shapes.append((hl, wl, hp))

    locs = jnp.pad(locations.reshape(bsz, n, 2),
                   ((0, 0), (0, n_item - n), (0, 0)))
    cx = locs[..., 0].reshape(bsz * n_item)
    cy = locs[..., 1].reshape(bsz * n_item)

    kernel = functools.partial(_kernel, radius=radius,
                               shapes=tuple(shapes), c=c, n_item=n_item)
    smem_vec = pl.BlockSpec((TILE_N,), lambda i: (i,),
                            memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz * n_item // TILE_N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * levels
        + [pl.BlockSpec((TILE_N, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           smem_vec, smem_vec],
        out_specs=pl.BlockSpec((TILE_N, levels * KPAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * n_item, levels * KPAD),
                                       jnp.float32),
        interpret=interpret,
    )(*fmaps, f0, cx, cy)
    out = out.reshape(bsz, n_item, levels, WIN_PX, WIN_PX)
    out = out[:, :n, :, :k, :k]
    return out.reshape(bsz, h, w, levels * k * k)


def lookup_correlation_pallas(fmap0, fmap1_pyramid, locations, radius: int,
                              interpret: bool = False):
    """Single-item convenience wrapper over the batched kernel."""
    out = lookup_correlation_pallas_batched(
        fmap0[None], [fm[None] for fm in fmap1_pyramid], locations[None],
        radius, interpret=interpret)
    return out[0]
