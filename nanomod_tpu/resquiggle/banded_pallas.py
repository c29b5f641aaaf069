"""Pallas TPU kernel for the banded affine-gap aligner.

Same recurrences as banded.banded_sw (see that module for the math and the
closed-form deletion recurrence), implemented as a Mosaic kernel:

  * grid = (reads/8, M/ROWS_PER_STEP): 8 reads ride the sublane axis, the
    band rides the lanes, and rows advance ROWS_PER_STEP at a time along the
    sequential minor grid axis with a statically-unrolled inner loop (Mosaic
    block shapes must be (8, 128)-aligned, which also rules out
    sliding-window lane slices);
  * substitution scores arrive pre-skewed and pre-scored from one XLA
    gather+compare (sub[b, i, k] = score(read[b,i], ref[b,i+k]));
  * H/F carry rows and best-cell trackers live in VMEM scratch across grid
    steps — no XLA loop overhead, no HBM carry traffic;
  * the intra-row deletion recurrence uses the closed form via a
    doubling-shift running max.

Traceback codes stream out as int32 blocks (cast to uint8 by the wrapper).
The lax.scan implementation remains the reference; tests compare them
cell-for-cell.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9   # python float: folds to an immediate in the kernel
READS_PER_PROG = 8
ROWS_PER_STEP = 32


def _shift_left_lanes(x, fill):
    """x[:, k] := x[:, k+1]; last lane := fill  (predecessor at band k+1)."""
    w = x.shape[-1]
    rolled = pltpu.roll(x, shift=w - 1, axis=1)   # == circular shift by -1
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == w - 1, fill, rolled)


def _shift_right_lanes(x, fill, amount=1):
    w = x.shape[-1]
    rolled = pltpu.roll(x, shift=amount, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < amount, fill, rolled)


def _cummax_lanes(x):
    """Inclusive running max along lanes via log2(W) doubling steps."""
    w = x.shape[-1]
    step = 1
    while step < w:
        x = jnp.maximum(x, _shift_right_lanes(x, NEG, step))
        step *= 2
    return x


def _kernel(sub_ref, len_ref, tb_ref, best_ref, bi_ref, bk_ref,
            h_s, f_s, best_s, bi_s, bk_s, *, w, go, ge):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        f_s[:] = jnp.full_like(f_s, NEG)
        best_s[:] = jnp.zeros_like(best_s)
        bi_s[:] = jnp.zeros_like(bi_s)
        bk_s[:] = jnp.zeros_like(bk_s)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (READS_PER_PROG, w), 1)
    karange = lanes.astype(jnp.float32)
    read_len = len_ref[:]                        # [8, 1] int32

    for r in range(ROWS_PER_STEP):               # static unroll
        row = j * ROWS_PER_STEP + r
        sub = sub_ref[:, r, :]                   # [8, W] f32

        h_prev = h_s[:]
        f_prev = f_s[:]
        h_up = _shift_left_lanes(h_prev, NEG)
        f_up = _shift_left_lanes(f_prev, NEG)
        f_cur = jnp.maximum(h_up + go, f_up + ge)
        h_noe = jnp.maximum(jnp.maximum(h_prev + sub, f_cur), 0.0)

        a = h_noe - ge * karange
        cm_shift = _shift_right_lanes(_cummax_lanes(a), NEG, 1)
        e_cur = ge * karange + (go - ge) + cm_shift
        h_cur = jnp.maximum(h_noe, e_cur)

        valid = row < read_len                   # [8, 1]
        h_cur = jnp.where(valid, h_cur, 0.0)
        f_cur = jnp.where(valid, f_cur, NEG)

        src = jnp.where(
            h_cur <= 0.0, 0,
            jnp.where(e_cur >= h_noe, 2,
                      jnp.where(f_cur >= jnp.maximum(h_prev + sub, 0.0), 3, 1)))
        h_noe_shift = _shift_right_lanes(h_noe, NEG, 1)
        e_ext = e_cur > h_noe_shift + go + 1e-4
        f_ext = f_cur > h_up + go + 1e-4
        bits = (src.astype(jnp.int32)
                | (e_ext.astype(jnp.int32) << 2)
                | (f_ext.astype(jnp.int32) << 3))

        tb_ref[:, r, :] = bits

        # best-cell tracking (first max lane, matching jnp.argmax)
        row_best = jnp.max(h_cur, axis=1, keepdims=True)          # [8, 1]
        isbest = h_cur == row_best
        row_bk = jnp.min(jnp.where(isbest, lanes, w), axis=1, keepdims=True)
        improve = row_best > best_s[:]
        best_s[:] = jnp.where(improve, row_best, best_s[:])
        bi_s[:] = jnp.where(improve, row, bi_s[:])
        bk_s[:] = jnp.where(improve, row_bk, bk_s[:])

        h_s[:] = h_cur
        f_s[:] = f_cur

    @pl.when(j == n_j - 1)
    def _():
        best_ref[:] = best_s[:]
        bi_ref[:] = bi_s[:]
        bk_ref[:] = bk_s[:]


@partial(jax.jit, static_argnames=("match", "mismatch", "go", "ge"))
def banded_sw_pallas(read_codes, ref_window_codes, read_len, *,
                     match=2, mismatch=-3, go=-5, ge=-2):
    """Pallas drop-in for banded.banded_sw (same outputs).

    read_codes [B, M] uint8, ref_window_codes [B, M + W] uint8,
    read_len [B] int32; B must be a multiple of 8 and M of 8.
    """
    bsz, m = read_codes.shape
    w = ref_window_codes.shape[1] - m
    assert bsz % READS_PER_PROG == 0 and m % ROWS_PER_STEP == 0

    read_i = read_codes.astype(jnp.int32)
    ref_i = ref_window_codes.astype(jnp.int32)
    len_i = read_len.astype(jnp.int32)[:, None]

    # pre-skewed, pre-scored substitutions (one XLA gather + compare):
    # sub[b, i, k] = score(read[b, i], ref[b, i + k])
    idx = jnp.arange(m)[:, None] + jnp.arange(w)[None, :]          # [M, W]
    refskew = jnp.take(ref_i, idx, axis=1)                         # [B, M, W]
    rc = read_i[:, :, None]
    is_match = (refskew == rc) & (rc < 4) & (refskew < 4)
    sub = jnp.where(is_match, jnp.float32(match), jnp.float32(mismatch))

    grid = (bsz // READS_PER_PROG, m // ROWS_PER_STEP)
    kernel = partial(_kernel, w=w, go=float(go), ge=float(ge))
    interpret = jax.default_backend() == "cpu"

    tb, best, bi, bk = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((READS_PER_PROG, ROWS_PER_STEP, w),
                         lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((READS_PER_PROG, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((READS_PER_PROG, ROWS_PER_STEP, w),
                         lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((READS_PER_PROG, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((READS_PER_PROG, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((READS_PER_PROG, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, m, w), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((READS_PER_PROG, w), jnp.float32),
            pltpu.VMEM((READS_PER_PROG, w), jnp.float32),
            pltpu.VMEM((READS_PER_PROG, 1), jnp.float32),
            pltpu.VMEM((READS_PER_PROG, 1), jnp.int32),
            pltpu.VMEM((READS_PER_PROG, 1), jnp.int32),
        ],
        interpret=interpret,
    )(sub, len_i)

    return (tb.astype(jnp.uint8), best[:, 0], bi[:, 0], bk[:, 0])
