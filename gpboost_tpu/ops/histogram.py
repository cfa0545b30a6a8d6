"""Pallas TPU kernel: gradient/hessian/count histograms for tree learning.

The hot op of the boosting engine (reference: src/LightGBM/io/dense_bin.hpp
ConstructHistogram inner loops; the OpenCL/CUDA variants in
treelearner/ocl/histogram*.cl and kernels/histogram_16_64_256.cu).

TPU formulation: hist[f, c, b] = sum_r stats[c, r] * 1{bins[f, r] == b} over
rows r in the target leaf. The one-hot expansion (B, R) is generated INSIDE the
kernel in VMEM per (feature, row-block) tile and immediately contracted on the
MXU — it never touches HBM, so the kernel's memory traffic is just the bin
codes + stats (~13 bytes/row vs ~4 KB/row for a materialized one-hot).

Layouts are transposed (feature-major bins (p, n), stats (3, n)) so the lane
dimension is the long row axis. Grid = (feature_chunks, row_blocks) with rows
innermost; the output block is revisited across row blocks and accumulated
in place.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(bins_ref, node_ref, stats_ref, target_ref, out_ref, *,
                 feat_chunk, num_bins):
    i = pl.program_id(1)  # row-block index (innermost)
    target = target_ref[0, 0]
    w = (node_ref[0, :] == target)
    sw = jnp.where(w[None, :], stats_ref[:, :], 0.0)            # (3, R)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (num_bins, 1), 0)

    parts = []
    for f in range(feat_chunk):
        onehot = (iota_b == bins_ref[f, :][None, :]).astype(jnp.float32)
        # (3, R) x (B, R) -> (3, B) on the MXU
        res = jax.lax.dot_general(
            sw, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        parts.append(res)
    partial_hist = jnp.stack(parts)                              # (Fc, 3, B)

    @pl.when(i == 0)
    def _():
        out_ref[...] = partial_hist

    @pl.when(i > 0)
    def _():
        out_ref[...] = out_ref[...] + partial_hist


def _hist_block_rows_kernel(bins_ref, stats_ref, out_ref, bt_ref, *,
                            feat_chunk, num_bins):
    """Row-major block histogram: bins_ref (R, Fc) int (positional layout —
    rows of the physically partitioned bin matrix), stats_ref (R, 8) f32
    ([grad, hess, count, 0...] with out-of-segment rows zeroed), out
    (Fc, B, 8). The one-hot is built (R, B) and contracted over the shared
    sublane dim R on the MXU. Features are walked with a fori_loop (NOT a
    python unroll): the (R, B) one-hot buffer is reused sequentially, so
    the scoped-VMEM footprint stays ~2 buffers regardless of Fc (a python
    unroll keeps many iterations' one-hots live and OOMs the 16 MB scope)."""
    sw = stats_ref[...]
    bt_ref[...] = bins_ref[...].astype(jnp.int32).T              # (Fc, R)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (num_bins, 1), 0)

    def body(f, carry):
        col = bt_ref[pl.ds(f, 1), :]                             # (1, R)
        onehot = (iota_b == col).astype(jnp.float32)             # (B, R)
        # (8, R) x (B, R) -> (8, B): stat channels on the sublane axis and
        # bins on the 128-lane axis — the (B, 8) orientation would put the
        # 8-wide channel axis in lanes, padding every block 16x and blowing
        # the 16 MB scoped-VMEM limit
        res = jax.lax.dot_general(
            sw, onehot, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (8, B)
        out_ref[pl.ds(f, 1), :, :] = res[None]
        return carry

    jax.lax.fori_loop(0, feat_chunk, body, 0)


@partial(jax.jit, static_argnums=(2, 3))
def hist_block_rows_pallas(bins_blk, stats_blk, num_bins, feat_chunk=8):
    """Histogram (p, num_bins, 8) f32 of ONE positional row block:
    bins_blk (R, p) uint8/int32, stats_blk (R, 8) f32 (masked rows zeroed)."""
    R, p = bins_blk.shape
    assert p % feat_chunk == 0
    # Mosaic requires lane-dim blocks to be a multiple of 128 or the whole
    # axis (pallas/mosaic/lowering.py _check_block_mappings)
    assert feat_chunk == p or feat_chunk % 128 == 0, \
        f"feat_chunk {feat_chunk} must equal p ({p}) or be a multiple of 128"
    kernel = partial(_hist_block_rows_kernel, feat_chunk=feat_chunk,
                     num_bins=num_bins)
    return pl.pallas_call(
        kernel,
        grid=(p // feat_chunk,),
        in_specs=[
            pl.BlockSpec((R, feat_chunk), lambda j: (j * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda j: (j * 0, j * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((feat_chunk, 8, num_bins),
                               lambda j: (j, j * 0, j * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 8, num_bins), jnp.float32),
        scratch_shapes=[pltpu.VMEM((feat_chunk, R), jnp.int32)],
    )(bins_blk, stats_blk).transpose(0, 2, 1)


def _hist_block_kernel(bins_ref, stats_ref, out_ref, *, feat_chunk, num_bins):
    """Single row-block histogram: rows are pre-gathered/masked by the caller
    (leaf-partitioned construction, serial_tree_learner.cpp:325 +
    data_partition.hpp semantics — only the target leaf's rows are scanned)."""
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (num_bins, 1), 0)
    parts = []
    for f in range(feat_chunk):
        onehot = (iota_b == bins_ref[f, :][None, :]).astype(jnp.float32)
        res = jax.lax.dot_general(
            stats_ref[:, :], onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        parts.append(res)
    out_ref[...] = jnp.stack(parts)


@partial(jax.jit, static_argnums=(2, 3))
def hist_block_pallas(bins_blk, stats_blk, num_bins, feat_chunk=8):
    """Histogram (p, 3, num_bins) f32 of ONE row block: bins_blk (p, R) int32,
    stats_blk (3, R) f32 with out-of-segment rows already zeroed."""
    p, R = bins_blk.shape
    assert p % feat_chunk == 0
    kernel = partial(_hist_block_kernel, feat_chunk=feat_chunk,
                     num_bins=num_bins)
    return pl.pallas_call(
        kernel,
        grid=(p // feat_chunk,),
        in_specs=[
            # j*0 instead of literal 0: this toolchain's Mosaic rejects index
            # maps mixing literal i64 constants with i32 grid indices
            pl.BlockSpec((feat_chunk, R), lambda j: (j, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R), lambda j: (j * 0, j * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((feat_chunk, 3, num_bins),
                               lambda j: (j, j * 0, j * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 3, num_bins), jnp.float32),
    )(bins_blk, stats_blk)


@partial(jax.jit, static_argnums=(4, 5, 6))
def hist_pallas(bins_T, node, stats_T, target, num_bins, feat_chunk=8,
                row_block=2048):
    """Histogram (p, 3, num_bins) f32 for rows with node == target.

    bins_T (p, n) int32, node (1, n) int32, stats_T (3, n) f32,
    target () int32. p must be a multiple of feat_chunk and n of row_block
    (pad with a sentinel node value).
    """
    p, n = bins_T.shape
    assert p % feat_chunk == 0 and n % row_block == 0
    grid = (p // feat_chunk, n // row_block)
    kernel = partial(_hist_kernel, feat_chunk=feat_chunk, num_bins=num_bins)
    target_arr = jnp.reshape(target, (1, 1)).astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # NB: constant block indices are written as j*0 / i*0 — this
            # toolchain's Mosaic rejects index maps mixing literal i64
            # constants with i32 grid indices in one return
            pl.BlockSpec((feat_chunk, row_block), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_block), lambda j, i: (j * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, row_block), lambda j, i: (j * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (j * 0, i * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((feat_chunk, 3, num_bins),
                               lambda j, i: (j, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 3, num_bins), jnp.float32),
    )(bins_T, node, stats_T, target_arr)
