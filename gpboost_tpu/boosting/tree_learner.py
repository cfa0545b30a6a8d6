"""Leaf-wise histogram tree learner — whole-tree growth in ONE jitted program.

Reference: src/LightGBM/treelearner/serial_tree_learner.cpp:159 (Train loop:
ConstructHistograms -> FindBestSplits -> SplitInner), feature_histogram.hpp
(per-bin gain with L2), the histogram-subtraction trick.

TPU-first design: the reference drives each split from the host with dynamic
row partitions; here the ENTIRE leaf-wise growth of a tree is a single
jax.lax.fori_loop compiled once — zero host round-trips per split:

  state: node_of_row (n,), per-leaf histograms (L, p, 3, B [grad,hess,count]),
         per-leaf best-split arrays, split records.
  step:  argmax leaf gain -> masked partition update -> ONE histogram over the
         full data for the left child -> sibling via subtraction -> re-evaluate
         both leaves.

Histograms use the Pallas kernel (ops/histogram.py) on TPU — the one-hot
expansion lives only in VMEM — and a blocked einsum elsewhere. The tree
structure is rebuilt on the host from the recorded split sequence.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .tree import Tree
from ..ops.histogram import hist_pallas


def _hist_einsum(bins_T, node, stats_T, target, num_bins, row_block,
                 vma=()):
    """(p, 3, B) histogram via blocked one-hot einsum (non-TPU backends).

    vma: mesh axis names to mark the scan carry as device-varying over —
    required when called on per-device shards inside shard_map (the voting
    learner), where the accumulator must carry the same varying-manual-axes
    type as the data."""
    p, n = bins_T.shape
    nb = n // row_block
    bins_r = bins_T.reshape(p, nb, row_block)
    stats_r = stats_T.reshape(3, nb, row_block)
    node_r = node.reshape(nb, row_block)
    bvals = jnp.arange(num_bins, dtype=bins_T.dtype)

    def body(acc, i):
        b = jax.lax.dynamic_index_in_dim(bins_r, i, axis=1, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(stats_r, i, axis=1, keepdims=False)
        l = jax.lax.dynamic_index_in_dim(node_r, i, axis=0, keepdims=False)
        w = (l == target).astype(s.dtype)
        onehot = (b[:, :, None] == bvals[None, None, :]).astype(s.dtype)
        acc = acc + jnp.einsum("cr,prb->pcb", s * w[None, :], onehot)
        return acc, None

    init = jnp.zeros((p, 3, num_bins), stats_T.dtype)
    if vma:
        try:
            init = jax.lax.pcast(init, vma, to="varying")
        except (AttributeError, TypeError):    # older jax spellings
            init = jax.lax.pvary(init, vma)
    hist, _ = jax.lax.scan(body, init, jnp.arange(nb))
    return hist


def _thresholded(G, l1):
    """ThresholdL1 (feature_histogram.hpp ThresholdL1): soft-threshold the
    gradient sum for L1 regularization."""
    return jnp.sign(G) * jnp.maximum(jnp.abs(G) - l1, 0.0)


def _cat_order(hist_f, cat_smooth=10.0):
    """Bin ordering for the categorical sorted-prefix split search: sort
    bins by G/(H+cat_smooth) (feature_histogram.hpp:384 ctr_fun). Bins with
    fewer than cat_smooth data points do not participate (the reference's
    filter at feature_histogram.hpp:375-378 reuses cat_smooth as the count
    threshold) — they sort last, i.e. land on the right/default side."""
    g, h, c = hist_f[..., 0, :], hist_f[..., 1, :], hist_f[..., 2, :]
    ratio = g / (h + cat_smooth)
    ratio = jnp.where(c >= jnp.maximum(cat_smooth, 1.0), ratio, jnp.inf)
    return jnp.argsort(ratio, axis=-1)


def _cat_used(hist_f, cat_smooth):
    """(...,) number of participating bins (count >= cat_smooth)."""
    c = hist_f[..., 2, :]
    return jnp.sum((c >= jnp.maximum(cat_smooth, 1.0)).astype(jnp.float32),
                   axis=-1)


def _smoothed_output(G, H, C, lambda_l2, lambda_l1, path_smooth, parent_out):
    """Leaf output with path smoothing (feature_histogram.hpp
    CalculateSplittedLeafOutput with path_smooth): the raw output shrunk
    toward the parent's output by ps/(n+ps)."""
    raw = -_thresholded(G, lambda_l1) / (H + lambda_l2)
    f = C / jnp.maximum(C + path_smooth, 1e-10)
    return f * raw + (1.0 - f) * parent_out


def _gain_at(hist, f, b, lambda_l2, lambda_l1):
    """Split gain of the specific (feature, bin) pair — used to record the
    gain of FORCED splits (serial_tree_learner.cpp:453 ForceSplits), which
    are not the leaf's gain-argmax."""
    g = hist[f, 0, :]
    h = hist[f, 1, :]
    G = jnp.sum(g)
    H = jnp.sum(h)
    GL = jnp.cumsum(g)[b]
    HL = jnp.cumsum(h)[b]
    return (_thresholded(GL, lambda_l1) ** 2 / (HL + lambda_l2)
            + _thresholded(G - GL, lambda_l1) ** 2 / (H - HL + lambda_l2)
            - _thresholded(G, lambda_l1) ** 2 / (H + lambda_l2))


def _best_split_of_hist(hist, lambda_l2, min_data, min_hess, min_gain,
                        feat_mask=None, lambda_l1=0.0, monotone=None,
                        cat_mask=None, path_smooth=0.0, parent_out=0.0,
                        cegb_coupled=None, cegb_split=0.0, cegb_used=None,
                        extra_key=None, feat_hi=None, cegb_lazy_pen=None,
                        cat_params=None, nan_bin=None):
    """(best_gain, best_feat, best_bin_code) over all (feature, bin) pairs;
    hist (p, 3, B). gain = TL1(GL)^2/(HL+l2) + TL1(GR)^2/(HR+l2)
    - TL1(G)^2/(H+l2) (feature_histogram.hpp GetSplitGains with L1/L2).
    With path_smooth > 0 the gain is evaluated at the SMOOTHED child
    outputs: gain_side = -(2 G w + (H+l2) w^2), w shrunk toward the
    parent's output (feature_histogram.hpp GetLeafGainGivenOutput).

    monotone (p,) in {-1,0,+1}: monotone-constraint directions
    (monotone_constraints.hpp) — a split on a +1 feature is valid only when
    left_output <= right_output (and mirrored for -1).

    nan_bin: static per-feature tuple of missing-bin indices (-1 = none).
    When given, numeric features with a missing bin are searched in BOTH
    missing directions — the reference's two FindBestThresholdSequentially
    scans (feature_histogram.hpp:167-190, REVERSE missing-left vs forward
    missing-right) — and the returned bin code packs the direction:
    code = bin + B * default_left."""
    G = jnp.sum(hist[:, 0, :], axis=1, keepdims=True)
    H = jnp.sum(hist[:, 1, :], axis=1, keepdims=True)
    C = jnp.sum(hist[:, 2, :], axis=1, keepdims=True)
    GL0 = jnp.cumsum(hist[:, 0, :], axis=1)
    HL0 = jnp.cumsum(hist[:, 1, :], axis=1)
    CL0 = jnp.cumsum(hist[:, 2, :], axis=1)
    GL, HL, CL = GL0, HL0, CL0
    l2_child = lambda_l2
    cat_valid = None
    if cat_mask is not None:
        # categorical features: prefix scan in G/H-sorted bin order; bin
        # index b then encodes "the first b+1 sorted bins go left".
        # cat_params = [cat_smooth, cat_l2, max_cat_threshold,
        # min_data_per_group] (config.h; feature_histogram.hpp:376-443):
        # only bins with >= cat_smooth data participate, children get the
        # extra cat_l2 ridge, the prefix is capped at max_cat_threshold on
        # its SHORTER side (the reference's two-direction scan — gain is
        # left/right symmetric, so one forward scan with a two-sided cap
        # covers both), and both sides need min_data_per_group rows.
        csm = cat_params[0] if cat_params is not None else 10.0
        cl2 = cat_params[1] if cat_params is not None else 10.0
        mct = cat_params[2] if cat_params is not None else 32.0
        mdpg = cat_params[3] if cat_params is not None else 100.0
        order = _cat_order(hist, csm)                     # (p, B)
        gs = jnp.take_along_axis(hist[:, 0, :], order, axis=1)
        hs = jnp.take_along_axis(hist[:, 1, :], order, axis=1)
        cs = jnp.take_along_axis(hist[:, 2, :], order, axis=1)
        cm = cat_mask[:, None] > 0
        GL = jnp.where(cm, jnp.cumsum(gs, axis=1), GL)
        HL = jnp.where(cm, jnp.cumsum(hs, axis=1), HL)
        CL = jnp.where(cm, jnp.cumsum(cs, axis=1), CL)
        l2_child = jnp.where(cm, lambda_l2 + cl2, lambda_l2)
        used = _cat_used(hist, csm)[:, None]              # (p, 1)
        pos1 = jnp.arange(hist.shape[2], dtype=jnp.float32)[None, :] + 1.0
        max_num_cat = jnp.minimum(mct, jnp.floor((used + 1.0) / 2.0))
        cat_valid = ((pos1 < used)
                     & (jnp.minimum(pos1, used - pos1) <= max_num_cat)
                     & (CL >= mdpg) & (C - CL >= mdpg))
    def gain_valid(GLx, HLx, CLx, l2c):
        GR = G - GLx
        HR = H - HLx
        if path_smooth <= 0.0:      # static Python float
            gain = (_thresholded(GLx, lambda_l1) ** 2 / (HLx + l2c)
                    + _thresholded(GR, lambda_l1) ** 2 / (HR + l2c)
                    - _thresholded(G, lambda_l1) ** 2 / (H + lambda_l2))
        else:
            CR = C - CLx
            wl = _smoothed_output(GLx, HLx, CLx, l2c, lambda_l1,
                                  path_smooth, parent_out)
            wr = _smoothed_output(GR, HR, CR, l2c, lambda_l1,
                                  path_smooth, parent_out)
            wp = parent_out

            def leaf_gain(Gs, Hs, w, l2s):
                return -(2.0 * Gs * w + (Hs + l2s) * w * w)

            gain = (leaf_gain(GLx, HLx, wl, l2c)
                    + leaf_gain(GR, HR, wr, l2c)
                    - leaf_gain(G, H, wp, lambda_l2))
        valid = ((CLx >= min_data) & (C - CLx >= min_data)
                 & (HLx >= min_hess) & (H - HLx >= min_hess))
        if monotone is not None:
            wlm = -_thresholded(GLx, lambda_l1) / (HLx + l2c)
            wrm = -_thresholded(GR, lambda_l1) / (HR + l2c)
            m = monotone[:, None]
            valid = valid & jnp.where(
                m == 0, True, jnp.where(m > 0, wlm <= wrm, wlm >= wrm))
        return gain, valid

    gain, valid = gain_valid(GL, HL, CL, l2_child)
    if cat_valid is not None:
        valid = valid & jnp.where(cm, cat_valid, True)
    dirs = [(gain, valid)]
    if nan_bin is not None:
        # missing-left direction (the reference's REVERSE scan, default_left
        # = true): the missing bin's stats move to the left side of every
        # threshold below it; only numeric features with a missing bin
        # participate
        nb = jnp.asarray(np.asarray(nan_bin, dtype=np.int32))
        has = (nb >= 0)[:, None]
        nbc = jnp.maximum(nb, 0)[:, None]
        g_nan = jnp.take_along_axis(hist[:, 0, :], nbc, axis=1)
        h_nan = jnp.take_along_axis(hist[:, 1, :], nbc, axis=1)
        c_nan = jnp.take_along_axis(hist[:, 2, :], nbc, axis=1)
        zero = jnp.zeros((), hist.dtype)
        GL_l = GL0 + jnp.where(has, g_nan, zero)
        HL_l = HL0 + jnp.where(has, h_nan, zero)
        CL_l = CL0 + jnp.where(has, c_nan, zero)
        gain_l, valid_l = gain_valid(GL_l, HL_l, CL_l, lambda_l2)
        pos = jnp.arange(hist.shape[2], dtype=jnp.int32)[None, :]
        valid_l = valid_l & has & (pos < nb[:, None])
        if cat_mask is not None:
            valid_l = valid_l & ~(cat_mask[:, None] > 0)
        dirs.append((gain_l, valid_l))
    gain = jnp.stack([g for g, _ in dirs])          # (D, p, B)
    valid = jnp.stack([v for _, v in dirs])
    if extra_key is not None:
        # extra_trees (config.h extra_trees; feature_histogram.hpp USE_RAND):
        # ONE uniformly random threshold per feature per node is considered
        # instead of the full scan; feat_hi is each feature's largest
        # candidate bin
        pB = hist.shape[0]
        uu = jax.random.uniform(extra_key, (pB,))
        t = jnp.minimum((uu * (feat_hi.astype(jnp.float32) + 1.0)
                         ).astype(jnp.int32), feat_hi)
        sel = jnp.arange(hist.shape[2])[None, :] == t[:, None]
        gain = jnp.where(sel[None], gain, -jnp.inf)
    if cegb_coupled is not None:
        # cost-effective gradient boosting
        # (cost_effective_gradient_boosting.hpp:70-74 DetailGain): gain is
        # penalized by tradeoff*penalty_split*num_data_in_leaf plus, for a
        # feature not yet used anywhere in the model, the coupled per-
        # feature penalty. In-tree usage updates come through cegb_used.
        gain = gain - (cegb_coupled * (1.0 - cegb_used))[None, :, None] \
            - cegb_split * C[None]
    if cegb_lazy_pen is not None:
        # lazy (on-demand) per-row feature-acquisition costs
        # (cost_effective_gradient_boosting.hpp:126-151
        # CalculateOndemandCosts): penalty = tradeoff * penalty_lazy[f] *
        # (#rows in this leaf that have never used feature f) — the per-
        # feature totals are precomputed by the caller per leaf
        gain = gain - cegb_lazy_pen[None, :, None]
    if feat_mask is not None:
        valid = valid & (feat_mask[None, :, None] > 0)
    gain = jnp.where(valid & (gain > min_gain), gain, -jnp.inf)
    flat = jnp.argmax(gain)
    _, p, B = gain.shape
    rem = flat % (p * B)
    # bin code packs the missing direction: code = bin + B * default_left
    return (gain.reshape(-1)[flat], rem // B,
            rem % B + B * (flat // (p * B)))


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 17, 18, 19),
         static_argnames=("nan_bin",))
def _grow_tree(bins_T, node0, stats_T, num_bins, num_leaves, max_depth,
               use_pallas, row_block, feat_chunk,
               lambda_l2, min_data, min_hess, min_gain, feat_mask,
               lambda_l1, monotone, cat_mask, mesh=None, par_mode="data",
               path_smooth=0.0, cat_params=None, nan_bin=None):
    """Grow one leaf-wise tree; returns (split records, leaf values, rows).

    feat_mask (p,) 0/1 implements per-tree column sampling (feature_fraction):
    masked features get -inf split gains.

    mesh: optional Mesh with a 'data' axis — rows are sharded over it and
    histograms are psum-merged across devices, the TPU-native equivalent of
    the reference's data-parallel tree learner
    (src/LightGBM/treelearner/data_parallel_tree_learner.cpp:267 histogram
    ReduceScatter). With the einsum path GSPMD inserts the collective from
    the input shardings; the Pallas kernel is wrapped in shard_map + psum."""
    p, n = bins_T.shape
    L = num_leaves

    def hist_fn(node, target):
        if use_pallas:
            if mesh is not None:
                from jax.sharding import PartitionSpec as P
                try:
                    from jax import shard_map
                except ImportError:      # older jax
                    from jax.experimental.shard_map import shard_map

                if par_mode == "feature":
                    # features sharded: each device builds the histogram of
                    # its own feature shard — no collective; the split
                    # argmax downstream merges via GSPMD
                    def local_hist_f(b, nd, st, tgt):
                        return hist_pallas(b, nd, st, tgt[0], num_bins,
                                           feat_chunk, row_block)

                    return shard_map(
                        local_hist_f, mesh=mesh,
                        in_specs=(P("data", None), P(None), P(None),
                                  P(None)),
                        out_specs=P("data", None, None))(
                            bins_T, node[None, :], stats_T,
                            jnp.reshape(target, (1,)).astype(jnp.int32))

                def local_hist(b, nd, st, tgt):
                    h = hist_pallas(b, nd, st, tgt[0], num_bins,
                                    feat_chunk, row_block)
                    return jax.lax.psum(h, "data")

                return shard_map(
                    local_hist, mesh=mesh,
                    in_specs=(P(None, "data"), P(None, "data"),
                              P(None, "data"), P(None)),
                    out_specs=P(None))(
                        bins_T, node[None, :], stats_T,
                        jnp.reshape(target, (1,)).astype(jnp.int32))
            return hist_pallas(bins_T, node[None, :], stats_T, target,
                               num_bins, feat_chunk, row_block)
        return _hist_einsum(bins_T, node, stats_T, target, num_bins, row_block)

    csm_app = cat_params[0] if cat_params is not None else 10.0

    def best_of(hist, parent_out):
        return _best_split_of_hist(hist, lambda_l2, min_data, min_hess,
                                   min_gain, feat_mask, lambda_l1, monotone,
                                   cat_mask, path_smooth, parent_out,
                                   cat_params=cat_params, nan_bin=nan_bin)

    nb_route = None if nan_bin is None else jnp.asarray(
        np.asarray(nan_bin, dtype=np.int32))

    def raw_out(hist):
        G = jnp.sum(hist[0, 0, :])
        H = jnp.sum(hist[0, 1, :])
        return -_thresholded(G, lambda_l1) / (H + lambda_l2)

    def child_out(hist, C_leaf, parent_out):
        if path_smooth <= 0.0:
            return raw_out(hist)
        G = jnp.sum(hist[0, 0, :])
        H = jnp.sum(hist[0, 1, :])
        return _smoothed_output(G, H, C_leaf, lambda_l2, lambda_l1,
                                path_smooth, parent_out)

    hist0 = hist_fn(node0, jnp.int32(0))
    out0 = raw_out(hist0)
    g0, f0, b0 = best_of(hist0, out0)

    leaf_out = jnp.zeros((L,), hist0.dtype).at[0].set(
        out0.astype(hist0.dtype))
    leaf_hist = jnp.zeros((L, p, 3, num_bins), hist0.dtype).at[0].set(hist0)
    leaf_gain = jnp.full((L,), -jnp.inf).at[0].set(g0)
    leaf_feat = jnp.zeros((L,), jnp.int32).at[0].set(f0.astype(jnp.int32))
    leaf_bin = jnp.zeros((L,), jnp.int32).at[0].set(b0.astype(jnp.int32))
    leaf_depth = jnp.zeros((L,), jnp.int32)
    rec = jnp.full((L - 1, 4), -1, jnp.int32)   # (parent_slot, feat, bin, ok)
    rec_gain = jnp.zeros((L - 1,), hist0.dtype)  # split gains (importance)
    n_words = -(-num_bins // 32)
    rec_cat = jnp.zeros((L - 1, n_words), jnp.uint32)  # left-bin bitsets

    def split_step(s, carry):
        (node, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
         leaf_out, rec, rec_gain, rec_cat) = carry
        l = jnp.argmax(leaf_gain).astype(jnp.int32)
        ok = jnp.isfinite(leaf_gain[l])
        f = leaf_feat[l]
        b = leaf_bin[l]
        new_slot = jnp.int32(s + 1)

        gain_l = leaf_gain[l]

        def do_split(args):
            (node, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
             leaf_out, rec, rec_gain, rec_cat) = args
            feat_col = jnp.take(bins_T, f, axis=0)           # (n,)
            in_leaf = node == l
            is_cat = cat_mask[f] > 0
            # decode the packed missing direction: code = bin + B * dl
            dl = b >= num_bins
            br = b - jnp.where(dl, num_bins, 0)
            # categorical: rank of each bin in this leaf's G/H ordering;
            # the recorded bin index b means "ranks <= b go left"
            order_f = _cat_order(leaf_hist[l, f], csm_app)  # (B,)
            rank = jnp.argsort(order_f)                      # bin -> rank
            go_right_cat = rank[feat_col] > br
            go_right_num = feat_col > br
            if nb_route is not None:
                nbf = nb_route[f]
                go_right_num = jnp.where((nbf >= 0) & (feat_col == nbf),
                                         ~dl, go_right_num)
            go_right = jnp.where(is_cat, go_right_cat, go_right_num)
            node2 = jnp.where(in_leaf & go_right, new_slot, node)
            left_bins = (rank <= br) & is_cat                # (B,) bool
            lb = left_bins.astype(jnp.uint32)
            n_words_ = rec_cat.shape[1]
            pad = n_words_ * 32 - lb.shape[0]
            lb = jnp.pad(lb, (0, pad))
            words = jnp.sum(lb.reshape(n_words_, 32)
                            << jnp.arange(32, dtype=jnp.uint32)[None, :],
                            axis=1).astype(jnp.uint32)
            hist_left = hist_fn(node2, l)
            hist_right = leaf_hist[l] - hist_left
            d = leaf_depth[l] + 1
            pout = leaf_out[l]
            cl_cnt = jnp.sum(hist_left[0, 2, :])
            cr_cnt = jnp.sum(hist_right[0, 2, :])
            out_l = child_out(hist_left, cl_cnt, pout)
            out_r = child_out(hist_right, cr_cnt, pout)
            leaf_out = leaf_out.at[l].set(out_l.astype(leaf_out.dtype)) \
                               .at[new_slot].set(out_r.astype(leaf_out.dtype))
            gl, fl, bl = best_of(hist_left, out_l)
            gr, fr, br = best_of(hist_right, out_r)
            depth_ok = d < max_depth
            gl = jnp.where(depth_ok, gl, -jnp.inf)
            gr = jnp.where(depth_ok, gr, -jnp.inf)
            leaf_hist = leaf_hist.at[l].set(hist_left).at[new_slot].set(hist_right)
            leaf_gain = leaf_gain.at[l].set(gl).at[new_slot].set(gr)
            leaf_feat = leaf_feat.at[l].set(fl.astype(jnp.int32)) \
                                 .at[new_slot].set(fr.astype(jnp.int32))
            leaf_bin = leaf_bin.at[l].set(bl.astype(jnp.int32)) \
                               .at[new_slot].set(br.astype(jnp.int32))
            leaf_depth = leaf_depth.at[l].set(d).at[new_slot].set(d)
            rec2 = rec.at[s].set(jnp.stack([l, f, b, jnp.int32(1)]))
            rec_gain2 = rec_gain.at[s].set(gain_l.astype(rec_gain.dtype))
            rec_cat2 = rec_cat.at[s].set(words)
            return (node2, leaf_hist, leaf_gain, leaf_feat, leaf_bin,
                    leaf_depth, leaf_out, rec2, rec_gain2, rec_cat2)

        return jax.lax.cond(ok, do_split, lambda a: a,
                            (node, leaf_hist, leaf_gain, leaf_feat,
                             leaf_bin, leaf_depth, leaf_out, rec, rec_gain,
                             rec_cat))

    carry = (node0, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
             leaf_out, rec, rec_gain, rec_cat)
    carry = jax.lax.fori_loop(0, L - 1, split_step, carry)
    (node, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth, leaf_out,
     rec, rec_gain, rec_cat) = carry
    # totals from one feature's bins (every feature's bins sum to the totals)
    Gs = jnp.sum(leaf_hist[:, 0, 0, :], axis=1)
    Hs = jnp.sum(leaf_hist[:, 0, 1, :], axis=1)
    Cs = jnp.sum(leaf_hist[:, 0, 2, :], axis=1)
    if path_smooth <= 0.0:
        leaf_values = jnp.where(
            Cs > 0, -_thresholded(Gs, lambda_l1) / (Hs + lambda_l2), 0.0)
    else:
        leaf_values = jnp.where(Cs > 0, leaf_out, 0.0)
    return rec, leaf_values, node, rec_gain, rec_cat


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 15, 16))
def _grow_tree_voting(bins_T, node0, stats_T, num_bins, num_leaves, max_depth,
                      use_pallas, row_block, feat_chunk, lambda_l2, min_data,
                      min_hess, min_gain, feat_mask, lambda_l1, mesh, top_k):
    """Voting-parallel (PV-tree) leaf-wise growth
    (src/LightGBM/treelearner/voting_parallel_tree_learner.cpp:465).

    The reference bounds inter-worker bandwidth by exchanging only the
    histograms of a VOTED feature subset instead of reduce-scattering all p
    of them: each worker finds its local per-feature best gains, votes for
    its top-k features, the global top-2k vote winners' histograms are
    all-reduced, and the best split is taken among those. On TPU the same
    shape maps onto a mesh: the whole growth loop runs inside shard_map with
    per-device LOCAL leaf histograms; each split psums a (p,)-vector of
    votes plus only the selected (2k, 3, B) histogram block over ICI —
    O(2k·B) instead of O(p·B) collective bytes per split.

    Exact when 2*top_k >= p (every feature is selected, so the merged
    search equals the data-parallel one); an approximation otherwise, like
    the reference. Categorical features / monotone constraints /
    path smoothing are not supported in this mode."""
    p, n = bins_T.shape
    L = num_leaves
    S = int(min(2 * top_k, p))
    K = int(min(top_k, p))

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:                     # older jax
        from jax.experimental.shard_map import shard_map

    def gain_mat(hist, fmask):
        """Masked (p', B) split-gain matrix of a (p', 3, B) histogram
        (feature_histogram.hpp GetSplitGains with L1/L2)."""
        G = jnp.sum(hist[:, 0, :], axis=1, keepdims=True)
        H = jnp.sum(hist[:, 1, :], axis=1, keepdims=True)
        C = jnp.sum(hist[:, 2, :], axis=1, keepdims=True)
        GL = jnp.cumsum(hist[:, 0, :], axis=1)
        HL = jnp.cumsum(hist[:, 1, :], axis=1)
        CL = jnp.cumsum(hist[:, 2, :], axis=1)
        GR, HR = G - GL, H - HL
        gain = (_thresholded(GL, lambda_l1) ** 2 / (HL + lambda_l2)
                + _thresholded(GR, lambda_l1) ** 2 / (HR + lambda_l2)
                - _thresholded(G, lambda_l1) ** 2 / (H + lambda_l2))
        valid = ((CL >= min_data) & (C - CL >= min_data)
                 & (HL >= min_hess) & (H - HL >= min_hess)
                 & (fmask[:, None] > 0))
        return jnp.where(valid & (gain > min_gain), gain, -jnp.inf)

    def run(bins_loc, node0_loc, stats_loc):
        def hist_loc(node, target):
            if use_pallas:
                return hist_pallas(bins_loc, node[None, :], stats_loc,
                                   target, num_bins, feat_chunk, row_block)
            return _hist_einsum(bins_loc, node, stats_loc, target,
                                num_bins, row_block, vma=("data",))

        def voted_best(local_hist):
            # local per-feature best gains -> top-k vote (LocalVoting) ->
            # global top-2k set (GlobalVoting, ties broken by summed local
            # gains) -> all-reduce ONLY the selected histograms -> exact
            # best split among them
            gfeat = jnp.max(gain_mat(local_hist, feat_mask), axis=1)  # (p,)
            topv, topi = jax.lax.top_k(gfeat, K)
            votes = jnp.zeros((p,), jnp.float32).at[topi].add(
                jnp.isfinite(topv).astype(jnp.float32))
            votes = jax.lax.psum(votes, "data")
            gsum = jax.lax.psum(
                jnp.where(jnp.isfinite(gfeat), gfeat, 0.0), "data")
            score = (votes.astype(jnp.float64) * 1e14
                     + jnp.clip(gsum.astype(jnp.float64), 0.0, 1e13))
            _, sel = jax.lax.top_k(score, S)                  # (S,) ids
            hsel = jax.lax.psum(jnp.take(local_hist, sel, axis=0), "data")
            gm = gain_mat(hsel, jnp.take(feat_mask, sel))
            flat = jnp.argmax(gm)
            B = gm.shape[1]
            return (gm.reshape(-1)[flat],
                    sel[flat // B].astype(jnp.int32),
                    (flat % B).astype(jnp.int32))

        hist0 = hist_loc(node0_loc, jnp.int32(0))
        g0, f0, b0 = voted_best(hist0)
        leaf_hist = jnp.zeros((L, p, 3, num_bins), hist0.dtype) \
                       .at[0].set(hist0)                      # LOCAL hists
        leaf_gain = jnp.full((L,), -jnp.inf).at[0].set(g0)
        leaf_feat = jnp.zeros((L,), jnp.int32).at[0].set(f0)
        leaf_bin = jnp.zeros((L,), jnp.int32).at[0].set(b0)
        leaf_depth = jnp.zeros((L,), jnp.int32)
        rec = jnp.full((L - 1, 4), -1, jnp.int32)
        rec_gain = jnp.zeros((L - 1,), hist0.dtype)

        def split_step(s, carry):
            (node, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
             rec, rec_gain) = carry
            l = jnp.argmax(leaf_gain).astype(jnp.int32)
            ok = jnp.isfinite(leaf_gain[l])
            f = leaf_feat[l]
            b = leaf_bin[l]
            new_slot = jnp.int32(s + 1)
            gain_l = leaf_gain[l]

            def do_split(args):
                (node, leaf_hist, leaf_gain, leaf_feat, leaf_bin,
                 leaf_depth, rec, rec_gain) = args
                feat_col = jnp.take(bins_loc, f, axis=0)      # (n_loc,)
                node2 = jnp.where((node == l) & (feat_col > b),
                                  new_slot, node)
                hist_left = hist_loc(node2, l)
                hist_right = leaf_hist[l] - hist_left
                d = leaf_depth[l] + 1
                gl, fl, bl = voted_best(hist_left)
                gr, fr, br = voted_best(hist_right)
                depth_ok = d < max_depth
                gl = jnp.where(depth_ok, gl, -jnp.inf)
                gr = jnp.where(depth_ok, gr, -jnp.inf)
                leaf_hist = leaf_hist.at[l].set(hist_left) \
                                     .at[new_slot].set(hist_right)
                leaf_gain = leaf_gain.at[l].set(gl).at[new_slot].set(gr)
                leaf_feat = leaf_feat.at[l].set(fl).at[new_slot].set(fr)
                leaf_bin = leaf_bin.at[l].set(bl).at[new_slot].set(br)
                leaf_depth = leaf_depth.at[l].set(d).at[new_slot].set(d)
                rec2 = rec.at[s].set(jnp.stack([l, f, b, jnp.int32(1)]))
                rec_gain2 = rec_gain.at[s].set(
                    gain_l.astype(rec_gain.dtype))
                return (node2, leaf_hist, leaf_gain, leaf_feat, leaf_bin,
                        leaf_depth, rec2, rec_gain2)

            return jax.lax.cond(ok, do_split, lambda a: a,
                                (node, leaf_hist, leaf_gain, leaf_feat,
                                 leaf_bin, leaf_depth, rec, rec_gain))

        carry = (node0_loc, leaf_hist, leaf_gain, leaf_feat, leaf_bin,
                 leaf_depth, rec, rec_gain)
        carry = jax.lax.fori_loop(0, L - 1, split_step, carry)
        (node, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
         rec, rec_gain) = carry
        # per-leaf totals from one feature's bins, merged across devices
        tot = jax.lax.psum(jnp.sum(leaf_hist[:, 0, :, :], axis=-1), "data")
        Gs, Hs, Cs = tot[:, 0], tot[:, 1], tot[:, 2]
        leaf_values = jnp.where(
            Cs > 0, -_thresholded(Gs, lambda_l1) / (Hs + lambda_l2), 0.0)
        return rec, leaf_values, node, rec_gain

    rec, leaf_values, node, rec_gain = shard_map(
        run, mesh=mesh,
        in_specs=(P(None, "data"), P("data"), P(None, "data")),
        out_specs=(P(), P(), P("data"), P()))(bins_T, node0, stats_T)
    n_words = -(-num_bins // 32)
    rec_cat = jnp.zeros((L - 1, n_words), jnp.uint32)
    return rec, leaf_values, node, rec_gain, rec_cat


def _grow_tree_partitioned_impl(bins_pos, stats_pos, num_bins, num_leaves,
                                max_depth, use_pallas, row_block, feat_chunk,
                                lambda_l2, min_data, min_hess, min_gain,
                                feat_mask, lambda_l1, monotone, cat_mask,
                                path_smooth=0.0, cegb_coupled=None,
                                cegb_split=0.0, cegb_used0=None,
                                extra_key0=None, feat_hi=None,
                                forced=None, cegb_lazy=None,
                                lazy_used0=None, cat_params=None,
                                inter_groups=None, nan_bin=None):
    """Leaf-partitioned leaf-wise growth (single device). Pure traceable
    function — also called from inside the multi-round lax.scan fast paths
    (gbdt.py Booster.update_many / update_many_gpboost), where ONE device
    dispatch grows a whole block of trees.

    The reference maintains a row partition so each split's histogram scans
    only the SMALLER child's rows (serial_tree_learner.cpp:325 +
    data_partition.hpp). TPU formulation: the data is PHYSICALLY
    row-partitioned — bins_pos (n_pad, p_pad) uint8 and stats_pos (n_pad, 8)
    f32 [grad, hess, count, 0pad] live in position order with each leaf
    owning one contiguous position segment. A split re-partitions its
    segment with two cumsums + one streamed row permutation (scatter of
    whole rows — no lane-dimension gathers anywhere), and the smaller
    child's histogram is a dynamic-trip fori_loop of CONTIGUOUS
    dynamic_slice row blocks, so the memory system sees pure streams into
    the MXU one-hot contraction. A 255-leaf tree therefore costs
    sum-of-smaller-child-sizes, not 254 full-data scans.

    Row identities travel with the rows (row_ids); the final row -> leaf
    assignment is reconstructed with one scatter at the end.
    """
    from ..ops.histogram import hist_block_rows_pallas

    n_pad, p = bins_pos.shape
    L = num_leaves
    rb = row_block
    pos_iota = jnp.arange(n_pad, dtype=jnp.int32)

    def hist_block(bins_blk, stats_blk):
        if use_pallas:
            return hist_block_rows_pallas(bins_blk, stats_blk, num_bins,
                                          feat_chunk)
        bvals = jnp.arange(num_bins, dtype=jnp.int32)
        onehot = (bins_blk.astype(jnp.int32)[:, :, None]
                  == bvals[None, None, :]).astype(jnp.float32)
        return jnp.einsum("rc,rfb->fbc", stats_blk, onehot)

    def hist_segment(bins_p, stats_p, s0, cnt):
        """Histogram (p, 3, B) over positions [s0, s0 + cnt)."""
        b0 = (s0 // rb).astype(jnp.int32)
        b1 = ((s0 + cnt + rb - 1) // rb).astype(jnp.int32)

        def body(i, acc):
            start = i * rb
            zero = jnp.int32(0)
            bb = jax.lax.dynamic_slice(bins_p, (start, zero), (rb, p))
            sb = jax.lax.dynamic_slice(stats_p, (start, zero), (rb, 8))
            pos = start + pos_iota[:rb]
            valid = (pos >= s0) & (pos < s0 + cnt)
            sb = sb * valid[:, None].astype(sb.dtype)
            return acc + hist_block(bb, sb)

        acc = jax.lax.fori_loop(b0, b1, body,
                                jnp.zeros((p, num_bins, 8), jnp.float32))
        return jnp.transpose(acc, (0, 2, 1))[:, :3, :]

    use_extra = extra_key0 is not None
    use_lazy = cegb_lazy is not None
    csm_app = cat_params[0] if cat_params is not None else 10.0
    # interaction constraints (config.h interaction_constraints;
    # col_sampler.hpp SetUsedFeatureByNode): inter_groups (K, p) is the
    # 0/1 feature membership of each constraint set. A leaf's allowed
    # features are the union of the constraint sets that contain EVERY
    # feature already used on its root path — tracked as a per-leaf
    # active-group mask, intersected with {k: f in S_k} at each split.
    use_ic = inter_groups is not None
    Kg = inter_groups.shape[0] if use_ic else 1

    def allow_of(grp_row):
        return jnp.where((grp_row @ inter_groups) > 0, 1.0, 0.0) * feat_mask

    def best_of(hist, parent_out, used, key=None, lazy_pen=None, fm=None):
        return _best_split_of_hist(hist, lambda_l2, min_data, min_hess,
                                   min_gain,
                                   feat_mask if fm is None else fm,
                                   lambda_l1, monotone,
                                   cat_mask, path_smooth, parent_out,
                                   cegb_coupled, cegb_split, used,
                                   key if use_extra else None, feat_hi,
                                   lazy_pen, cat_params=cat_params,
                                   nan_bin=nan_bin)

    # per-feature missing-bin ids for routing split rows (static -> device)
    nb_route = None if nan_bin is None else jnp.asarray(
        np.asarray(nan_bin, dtype=np.int32))

    def unused_segment(used_p, s0, cnt):
        """(p,) count of rows in positions [s0, s0+cnt) whose feature f has
        NOT been acquired yet (lazy CEGB; used_p is 1 where acquired,
        including all padding rows). Streamed contiguous row blocks like
        hist_segment — one column-sum matvec per block."""
        b0 = (s0 // rb).astype(jnp.int32)
        b1 = ((s0 + cnt + rb - 1) // rb).astype(jnp.int32)

        def body(i, acc):
            start = i * rb
            ub = jax.lax.dynamic_slice(used_p, (start, jnp.int32(0)),
                                       (rb, p)).astype(jnp.float32)
            pos = start + pos_iota[:rb]
            valid = ((pos >= s0) & (pos < s0 + cnt)).astype(jnp.float32)
            return acc + jnp.sum((1.0 - ub) * valid[:, None], axis=0)

        return jax.lax.fori_loop(b0, b1, body, jnp.zeros((p,), jnp.float32))

    def raw_out(hist):
        G = jnp.sum(hist[0, 0, :])
        H = jnp.sum(hist[0, 1, :])
        return -_thresholded(G, lambda_l1) / (H + lambda_l2)

    def child_out(hist, C_leaf, parent_out):
        if path_smooth <= 0.0:
            return raw_out(hist)
        G = jnp.sum(hist[0, 0, :])
        H = jnp.sum(hist[0, 1, :])
        return _smoothed_output(G, H, C_leaf, lambda_l2, lambda_l1,
                                path_smooth, parent_out)

    row_ids0 = pos_iota                    # identity: position i holds row i
    leaf_of_pos0 = jnp.zeros(n_pad, jnp.int32)
    used0 = cegb_used0 if cegb_used0 is not None \
        else jnp.zeros((p,), jnp.float32)
    key0 = extra_key0 if use_extra else jnp.zeros((2,), jnp.uint32)
    if use_extra:
        key0, kroot = jax.random.split(key0)
    else:
        kroot = key0
    hist0 = hist_segment(bins_pos, stats_pos, jnp.int32(0),
                         jnp.int32(n_pad))
    out0 = raw_out(hist0)
    if use_lazy:
        used_pos0 = lazy_used0
        unused_root = unused_segment(used_pos0, jnp.int32(0),
                                     jnp.int32(n_pad))
        pen0 = cegb_lazy * unused_root
    else:
        used_pos0 = jnp.zeros((1, 1), jnp.uint8)     # untouched placeholder
        unused_root = jnp.zeros((p,), jnp.float32)
        pen0 = None
    leaf_unused = jnp.zeros((L, p), jnp.float32).at[0].set(unused_root)
    leaf_path = jnp.zeros((L, p), jnp.float32)
    leaf_grp = jnp.ones((L, Kg), jnp.float32)
    g0, f0, b0_ = best_of(hist0, out0, used0, kroot, pen0,
                          allow_of(leaf_grp[0]) if use_ic else None)

    leaf_out = jnp.zeros((L,), hist0.dtype).at[0].set(
        out0.astype(hist0.dtype))
    leaf_hist = jnp.zeros((L, p, 3, num_bins), hist0.dtype).at[0].set(hist0)
    leaf_gain = jnp.full((L,), -jnp.inf).at[0].set(g0)
    leaf_feat = jnp.zeros((L,), jnp.int32).at[0].set(f0.astype(jnp.int32))
    leaf_bin = jnp.zeros((L,), jnp.int32).at[0].set(b0_.astype(jnp.int32))
    leaf_depth = jnp.zeros((L,), jnp.int32)
    seg_start = jnp.zeros((L,), jnp.int32)
    seg_cnt = jnp.zeros((L,), jnp.int32).at[0].set(jnp.int32(n_pad))
    rec = jnp.full((L - 1, 4), -1, jnp.int32)
    rec_gain = jnp.zeros((L - 1,), hist0.dtype)
    n_words = -(-num_bins // 32)
    rec_cat = jnp.zeros((L - 1, n_words), jnp.uint32)

    def split_step(s, carry):
        (bins_p, stats_p, row_ids, leaf_of_pos, used, key, seg_start,
         seg_cnt, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
         leaf_out, rec, rec_gain, rec_cat, used_pos, leaf_unused,
         leaf_path, leaf_grp) = carry
        l = jnp.argmax(leaf_gain).astype(jnp.int32)
        ok = jnp.isfinite(leaf_gain[l])
        f = leaf_feat[l]
        b = leaf_bin[l]
        gain_l = leaf_gain[l]
        if forced is not None:
            # ForceSplits (serial_tree_learner.cpp:453): the first
            # len(forced) splits are dictated (slot, feature, bin); slots
            # were pre-assigned on the host in parent-before-child order
            is_f = s < forced.shape[0]
            l = jnp.where(is_f, forced[jnp.minimum(s, forced.shape[0] - 1),
                                       0], l)
            f = jnp.where(is_f, forced[jnp.minimum(s, forced.shape[0] - 1),
                                       1], f)
            b = jnp.where(is_f, forced[jnp.minimum(s, forced.shape[0] - 1),
                                       2], b)
            ok = jnp.where(is_f, True, ok)
            gain_l = jnp.where(is_f,
                               _gain_at(leaf_hist[l], f, b, lambda_l2,
                                        lambda_l1), gain_l)
        new_slot = jnp.int32(s + 1)

        def do_split(args):
            (bins_p, stats_p, row_ids, leaf_of_pos, used, key, seg_start,
             seg_cnt, leaf_hist, leaf_gain, leaf_feat, leaf_bin, leaf_depth,
             leaf_out, rec, rec_gain, rec_cat, used_pos, leaf_unused,
             leaf_path, leaf_grp) = args
            if use_extra:
                key, kl_, kr_ = jax.random.split(key, 3)
            else:
                kl_ = kr_ = key
            s0 = seg_start[l]
            c = seg_cnt[l]
            fcol = jnp.take(bins_p, f, axis=1).astype(jnp.int32)  # (n_pad,)
            is_cat = cat_mask[f] > 0
            # decode the packed missing direction: code = bin + B * dl
            dl = b >= num_bins
            br = b - jnp.where(dl, num_bins, 0)
            order_f = _cat_order(leaf_hist[l, f], csm_app)  # (B,)
            rank = jnp.argsort(order_f)                      # bin -> rank
            go_right_num = fcol > br
            if nb_route is not None:
                nbf = nb_route[f]
                go_right_num = jnp.where((nbf >= 0) & (fcol == nbf),
                                         ~dl, go_right_num)
            go_right = jnp.where(is_cat, rank[fcol] > br, go_right_num)
            left_bins = (rank <= br) & is_cat
            lb = left_bins.astype(jnp.uint32)
            n_words_ = rec_cat.shape[1]
            lb = jnp.pad(lb, (0, n_words_ * 32 - lb.shape[0]))
            words = jnp.sum(lb.reshape(n_words_, 32)
                            << jnp.arange(32, dtype=jnp.uint32)[None, :],
                            axis=1).astype(jnp.uint32)

            # stable in-segment partition: left rows first, then right
            in_seg = (pos_iota >= s0) & (pos_iota < s0 + c)
            gr = go_right & in_seg
            gl = in_seg & ~gr
            cL = jnp.sum(gl.astype(jnp.int32)).astype(jnp.int32)
            posL = s0 + jnp.cumsum(gl.astype(jnp.int32)) - 1
            posR = s0 + cL + jnp.cumsum(gr.astype(jnp.int32)) - 1
            new_pos = jnp.where(gl, posL,
                                jnp.where(gr, posR, pos_iota)).astype(
                                    jnp.int32)
            bins_p2 = bins_p.at[new_pos].set(bins_p)
            stats_p2 = stats_p.at[new_pos].set(stats_p)
            row_ids2 = row_ids.at[new_pos].set(row_ids)
            leaf_of_pos2 = jnp.where(in_seg & (pos_iota >= s0 + cL),
                                     new_slot, leaf_of_pos)

            cR = c - cL
            left_smaller = cL <= cR
            sS = jnp.where(left_smaller, s0, s0 + cL)
            cS = jnp.where(left_smaller, cL, cR)
            hist_small = hist_segment(bins_p2, stats_p2, sS, cS)
            hist_big = leaf_hist[l] - hist_small
            hist_left = jnp.where(left_smaller, hist_small, hist_big)
            hist_right = jnp.where(left_smaller, hist_big, hist_small)

            d = leaf_depth[l] + 1
            pout = leaf_out[l]
            used2 = used.at[f].set(1.0)
            if use_ic:
                # child active sets = parent's active sets that contain f;
                # allowed features = union of the child's active sets
                grp_child = leaf_grp[l] * inter_groups[:, f]
                leaf_grp = leaf_grp.at[l].set(grp_child) \
                                   .at[new_slot].set(grp_child)
                fm_child = allow_of(grp_child)
            else:
                fm_child = None
            out_l = child_out(hist_left, jnp.sum(hist_left[0, 2, :]), pout)
            out_r = child_out(hist_right, jnp.sum(hist_right[0, 2, :]), pout)
            leaf_out = leaf_out.at[l].set(out_l.astype(leaf_out.dtype)) \
                               .at[new_slot].set(out_r.astype(leaf_out.dtype))
            if use_lazy:
                # lazy CEGB: splitting leaf l on f acquires f for ALL its
                # rows (UpdateLeafBestSplits, cegb hpp:111-122) — tracked
                # per-leaf as the path feature set (equivalent, since a
                # row's in-tree marks are exactly its leaf's path). The
                # unacquired-row counts vs PRIOR-tree marks split by
                # smaller-child scan + subtraction like the histograms.
                used_pos = used_pos.at[new_pos].set(used_pos)
                unused_small = unused_segment(used_pos, sS, cS)
                unused_big = leaf_unused[l] - unused_small
                unused_left = jnp.where(left_smaller, unused_small,
                                        unused_big)
                unused_right = jnp.where(left_smaller, unused_big,
                                         unused_small)
                path_child = jnp.maximum(
                    leaf_path[l],
                    (jnp.arange(p) == f).astype(jnp.float32))
                pen_l = cegb_lazy * unused_left * (1.0 - path_child)
                pen_r = cegb_lazy * unused_right * (1.0 - path_child)
                leaf_unused = leaf_unused.at[l].set(unused_left) \
                                         .at[new_slot].set(unused_right)
                leaf_path = leaf_path.at[l].set(path_child) \
                                     .at[new_slot].set(path_child)
            else:
                pen_l = pen_r = None
            gl_g, fl, bl = best_of(hist_left, out_l, used2, kl_, pen_l,
                                   fm_child)
            gr_g, fr, br = best_of(hist_right, out_r, used2, kr_, pen_r,
                                   fm_child)
            depth_ok = d < max_depth
            gl_g = jnp.where(depth_ok, gl_g, -jnp.inf)
            gr_g = jnp.where(depth_ok, gr_g, -jnp.inf)
            leaf_hist = leaf_hist.at[l].set(hist_left) \
                                 .at[new_slot].set(hist_right)
            leaf_gain = leaf_gain.at[l].set(gl_g).at[new_slot].set(gr_g)
            leaf_feat = leaf_feat.at[l].set(fl.astype(jnp.int32)) \
                                 .at[new_slot].set(fr.astype(jnp.int32))
            leaf_bin = leaf_bin.at[l].set(bl.astype(jnp.int32)) \
                               .at[new_slot].set(br.astype(jnp.int32))
            leaf_depth = leaf_depth.at[l].set(d).at[new_slot].set(d)
            seg_start = seg_start.at[l].set(s0).at[new_slot].set(s0 + cL)
            seg_cnt = seg_cnt.at[l].set(cL).at[new_slot].set(cR)
            rec2 = rec.at[s].set(jnp.stack([l, f, b, jnp.int32(1)]))
            rec_gain2 = rec_gain.at[s].set(gain_l.astype(rec_gain.dtype))
            rec_cat2 = rec_cat.at[s].set(words)
            return (bins_p2, stats_p2, row_ids2, leaf_of_pos2, used2, key,
                    seg_start, seg_cnt, leaf_hist, leaf_gain, leaf_feat,
                    leaf_bin, leaf_depth, leaf_out, rec2, rec_gain2,
                    rec_cat2, used_pos, leaf_unused, leaf_path, leaf_grp)

        return jax.lax.cond(ok, do_split, lambda a: a,
                            (bins_p, stats_p, row_ids, leaf_of_pos, used,
                             key, seg_start, seg_cnt, leaf_hist, leaf_gain,
                             leaf_feat, leaf_bin, leaf_depth, leaf_out,
                             rec, rec_gain, rec_cat, used_pos, leaf_unused,
                             leaf_path, leaf_grp))

    carry = (bins_pos, stats_pos, row_ids0, leaf_of_pos0, used0, key0,
             seg_start, seg_cnt, leaf_hist, leaf_gain, leaf_feat, leaf_bin,
             leaf_depth, leaf_out, rec, rec_gain, rec_cat, used_pos0,
             leaf_unused, leaf_path, leaf_grp)
    carry = jax.lax.fori_loop(0, L - 1, split_step, carry)
    (_, _, row_ids, leaf_of_pos, _, _, _, _, leaf_hist, _, _, _, _,
     leaf_out, rec, rec_gain, rec_cat, _, _, leaf_path, _) = carry
    # row -> leaf slot, back in ROW order (one scatter)
    node = jnp.zeros(n_pad, jnp.int32).at[row_ids].set(leaf_of_pos)
    Gs = jnp.sum(leaf_hist[:, 0, 0, :], axis=1)
    Hs = jnp.sum(leaf_hist[:, 0, 1, :], axis=1)
    Cs = jnp.sum(leaf_hist[:, 0, 2, :], axis=1)
    if path_smooth <= 0.0:
        leaf_values = jnp.where(
            Cs > 0, -_thresholded(Gs, lambda_l1) / (Hs + lambda_l2), 0.0)
    else:
        leaf_values = jnp.where(Cs > 0, leaf_out, 0.0)
    out = (rec, leaf_values, node, rec_gain, rec_cat, Cs)
    if use_lazy:
        out = out + (leaf_path,)
    return out


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 16),
         static_argnames=("nan_bin",))
def _grow_tree_partitioned(*args, **kw):
    return _grow_tree_partitioned_impl(*args, **kw)[:5]


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 16),
         static_argnames=("nan_bin",))
def _grow_tree_partitioned_lazy(*args, **kw):
    """Variant returning (..., leaf_path) for lazy CEGB: leaf_path (L, p)
    is the per-leaf set of features used on the leaf's root path, from which
    the caller derives which rows acquired which features this tree."""
    r = _grow_tree_partitioned_impl(*args, **kw)
    return r[:5] + (r[6],)


_POSITIONAL_KERNEL_OK = None


def _positional_kernel_available():
    """Eagerly probe the row-major Pallas histogram kernel once per process;
    fall back to the XLA one-hot einsum path if Mosaic rejects it on this
    backend (keeps training correct even if a toolchain change breaks the
    kernel — the einsum path is slower but identical)."""
    global _POSITIONAL_KERNEL_OK
    if _POSITIONAL_KERNEL_OK is None:
        try:
            from ..ops.histogram import hist_block_rows_pallas
            bb = jnp.zeros((256, 8), jnp.uint8)
            sb = jnp.zeros((256, 8), jnp.float32)
            jax.block_until_ready(hist_block_rows_pallas(bb, sb, 16, 8))
            _POSITIONAL_KERNEL_OK = True
        except Exception as e:      # Mosaic lowering / runtime failure
            from ..utils.log import Log
            Log.warning(f"positional Pallas histogram kernel unavailable "
                        f"({type(e).__name__}); using the XLA einsum path")
            _POSITIONAL_KERNEL_OK = False
    return _POSITIONAL_KERNEL_OK


class SerialTreeLearner:
    """Leaf-wise growth; one compiled program per tree."""

    def __init__(self, dataset, num_leaves=31, max_depth=-1,
                 min_data_in_leaf=20, lambda_l2=0.0, min_sum_hessian_in_leaf=1e-3,
                 min_gain_to_split=0.0, row_block=None, feat_chunk=8,
                 mesh=None, lambda_l1=0.0, monotone_constraints=None,
                 parallel_mode="data", path_smooth=0.0, cegb=None,
                 extra_trees=False, forced_splits=None, top_k=20,
                 cat_params=(10.0, 10.0, 32.0, 100.0),
                 interaction_constraints=None):
        # cat_params = (cat_smooth, cat_l2, max_cat_threshold,
        # min_data_per_group) — config.h categorical-split regularization
        self.cat_params = tuple(float(v) for v in cat_params)
        dataset.construct()
        self.ds = dataset
        self.mappers = getattr(dataset, "learner_mappers", dataset.mappers)
        self.mesh = mesh
        # 'data': rows sharded, histograms psum-merged
        #   (data_parallel_tree_learner.cpp:267). 'feature': the feature
        #   dimension of bins/histograms sharded — the model-parallel axis
        #   for wide p (feature_parallel_tree_learner.cpp:83); the argmax
        #   split merge is GSPMD's collective over the sharded gain array.
        # 'voting': PV-tree — rows sharded like 'data' but only the voted
        #   top-2k features' histograms are psum-merged per split
        #   (voting_parallel_tree_learner.cpp:465).
        self.parallel_mode = parallel_mode if mesh is not None else "data"
        self.top_k = int(top_k)
        n, p = dataset.bins.shape
        import jax as _jax
        self.use_pallas = _jax.default_backend() == "tpu"
        if self.use_pallas and mesh is None:
            self.use_pallas = _positional_kernel_available()
        if row_block is None:
            row_block = 2048 if self.use_pallas else 8192
        self.row_block = int(min(row_block, max(n, 256)))
        self.feat_chunk = min(feat_chunk, max(p, 1))
        if self.use_pallas and mesh is None:
            # Mosaic block rule: the lane (last) dim of a block must be a
            # multiple of 128 or cover the whole axis. Narrow data runs the
            # kernel in ONE grid step over all (padded) features; wide data
            # uses 128-feature chunks.
            self.feat_chunk = -(-p // 8) * 8 if p <= 512 else 128
        data_par = mesh is not None and self.parallel_mode in ("data",
                                                               "voting")
        feat_par = mesh is not None and self.parallel_mode == "feature"
        row_quant = self.row_block * (mesh.size if data_par else 1)
        feat_quant = self.feat_chunk * (mesh.size if feat_par else 1)
        n_pad = -(-n // row_quant) * row_quant
        p_pad = -(-p // feat_quant) * feat_quant
        self.n, self.p, self.n_pad, self.p_pad = n, p, n_pad, p_pad
        self._row_sharding = None
        if mesh is not None:
            # masked full-scan growth over the mesh: feature-major int32
            # layout, rows (data-parallel) or features (feature-parallel)
            # sharded
            bins_T = np.zeros((p_pad, n_pad), dtype=np.int32)
            bins_T[:p, :n] = dataset.bins.T
            self.bins_T = jnp.asarray(bins_T)
            from jax.sharding import NamedSharding, PartitionSpec as P
            if feat_par:
                self._col_sharding = NamedSharding(mesh, P())
                self._row_sharding = NamedSharding(mesh, P())
                self.bins_T = _jax.device_put(
                    self.bins_T, NamedSharding(mesh, P("data", None)))
            else:
                self._col_sharding = NamedSharding(mesh, P(None, "data"))
                self._row_sharding = NamedSharding(mesh, P("data"))
                self.bins_T = _jax.device_put(self.bins_T, self._col_sharding)
        else:
            # single-device leaf-partitioned growth: POSITIONAL row-major
            # uint8 layout (rows get physically re-partitioned per split;
            # padded rows carry zero stats). uint8 holds max_bin <= 255;
            # larger bin counts fall back to int32 rows.
            bdt = np.uint8 if int(dataset.num_bins) <= 256 else np.int32
            bins_pos = np.zeros((n_pad, p_pad), dtype=bdt)
            bins_pos[:n, :p] = dataset.bins
            self.bins_pos = jnp.asarray(bins_pos)
        self.num_bins = int(dataset.num_bins)
        self.num_leaves = int(num_leaves)
        self.max_depth = max_depth if max_depth and max_depth > 0 else 10 ** 6
        self.min_data_in_leaf = float(min_data_in_leaf)
        self.lambda_l2 = float(lambda_l2)
        self.lambda_l1 = float(lambda_l1)
        cat = np.zeros(self.p_pad, dtype=np.int32)
        for j, m in enumerate(self.mappers):
            if getattr(m, "is_categorical", False):
                cat[j] = 1
        self.cat_mask = cat
        mono = np.zeros(self.p_pad, dtype=np.int32)
        if monotone_constraints is not None:
            mc = np.asarray(monotone_constraints, dtype=np.int32)
            mono[:len(mc)] = mc
        self.monotone = mono
        self.min_sum_hessian = float(min_sum_hessian_in_leaf)
        self.min_gain = float(min_gain_to_split)
        self.path_smooth = float(path_smooth)
        if mesh is not None and self.parallel_mode == "voting":
            if cat.any():
                raise NotImplementedError("categorical features are not "
                                          "supported with "
                                          "tree_learner='voting'")
            if mono.any():
                raise NotImplementedError("monotone constraints are not "
                                          "supported with "
                                          "tree_learner='voting'")
            if self.path_smooth > 0.0:
                raise NotImplementedError("path_smooth is not supported "
                                          "with tree_learner='voting'")
        # cost-effective gradient boosting
        # (cost_effective_gradient_boosting.hpp): dict with 'coupled'
        # (p,)-array of tradeoff-scaled per-feature penalties and 'split'
        # (tradeoff * cegb_penalty_split); None when disabled
        self.cegb = cegb
        if cegb is not None and mesh is not None:
            raise NotImplementedError(
                "CEGB penalties are not supported with a device mesh")
        # lazy CEGB: persistent (n_pad, p_pad) uint8 acquisition matrix —
        # model-wide, like the reference's feature_used_in_data_ bitset
        self._lazy_used_rows = None
        # extra_trees (config.h): one random threshold per feature per node
        self.extra_trees = bool(extra_trees)
        if self.extra_trees and mesh is not None:
            raise NotImplementedError(
                "extra_trees is not supported with a device mesh")
        hi = np.zeros(self.p_pad, dtype=np.int32)
        for j, mp_ in enumerate(self.mappers):
            hi[j] = max(int(mp_.num_bins) - 2, 0)
        self.feat_hi = hi
        # per-feature missing-bin ids (-1 = none): numeric features with a
        # NaN bin get the two-direction split search + default_left routing
        # (feature_histogram.hpp:167-190); categorical missing rides the
        # overflow bin. None when no feature has missing values — the search
        # then skips the second direction entirely.
        nb = np.full(self.p_pad, -1, dtype=np.int32)
        for j, mp_ in enumerate(self.mappers):
            if not getattr(mp_, "is_categorical", False) \
                    and getattr(mp_, "has_nan", False):
                nb[j] = int(mp_.nan_bin)
        self.nan_bin_t = tuple(int(v) for v in nb) if (nb >= 0).any() \
            else None
        # forcedsplits_filename (serial_tree_learner.cpp:453 ForceSplits):
        # nested {feature, threshold, left, right} applied before gain
        # splits; slots pre-assigned in parent-before-child (BFS) order
        # interaction_constraints (config.h; col_sampler.hpp
        # SetUsedFeatureByNode): list of feature-index lists; splits in one
        # branch may only combine features from a single constraint set.
        # Features outside every set are never used (LightGBM semantics).
        self.inter_groups = None
        if interaction_constraints:
            if mesh is not None:
                raise NotImplementedError(
                    "interaction_constraints are not supported with a "
                    "device mesh")
            ig = np.zeros((len(interaction_constraints), self.p_pad),
                          dtype=np.float32)
            for k_, feats in enumerate(interaction_constraints):
                for fj in feats:
                    if not 0 <= int(fj) < self.p:
                        raise ValueError(
                            f"interaction_constraints feature index {fj} "
                            f"out of range [0, {self.p})")
                    ig[k_, int(fj)] = 1.0
            self.inter_groups = ig
        self.forced = None
        if forced_splits is not None:
            if mesh is not None:
                raise NotImplementedError(
                    "forced splits are not supported with a device mesh")
            rows = []
            queue = [(forced_splits, 0)]
            while queue and len(rows) < self.num_leaves - 1:
                nodejs, slot = queue.pop(0)
                fj = int(nodejs["feature"])
                if getattr(self.mappers[fj], "is_categorical", False):
                    raise NotImplementedError(
                        "forced splits on categorical features are not "
                        "supported")
                bj = int(self.mappers[fj].transform(
                    [float(nodejs["threshold"])])[0])
                s_idx = len(rows)
                rows.append((slot, fj, bj))
                if "left" in nodejs and nodejs["left"]:
                    queue.append((nodejs["left"], slot))
                if "right" in nodejs and nodejs["right"]:
                    queue.append((nodejs["right"], s_idx + 1))
            self.forced = np.asarray(rows, dtype=np.int32)

    def train(self, grad, hess, row_mask=None, feat_mask=None,
              cegb_used=None, extra_seed=None):
        """row_mask (n,) 0/1: bagging — out-of-bag rows contribute nothing to
        histograms (grad/hess/count zeroed) but keep their leaf assignment so
        training scores update for every row (LightGBM bagging semantics,
        src/LightGBM/boosting/gbdt.cpp Bagging).
        feat_mask (p,) 0/1: per-tree column sampling (feature_fraction)."""
        n, n_pad = self.n, self.n_pad
        fm = np.zeros(self.p_pad, dtype=np.float32)
        fm[:self.p] = 1.0 if feat_mask is None else \
            np.asarray(feat_mask, dtype=np.float32)
        if self.mesh is None:
            # leaf-partitioned growth (positional layout): histogram cost
            # scales with sum-of-smaller-child sizes, not (num_leaves - 1)*n
            stats_pos = np.zeros((n_pad, 8), dtype=np.float32)
            if row_mask is None:
                stats_pos[:n, 0] = grad
                stats_pos[:n, 1] = hess
                stats_pos[:n, 2] = 1.0
            else:
                # row_mask may carry GOSS amplification weights (>1); the
                # count stays 0/1 so min_data_in_leaf keeps its meaning
                rm = np.asarray(row_mask, dtype=np.float32)
                stats_pos[:n, 0] = grad * rm
                stats_pos[:n, 1] = hess * rm
                stats_pos[:n, 2] = (rm > 0).astype(np.float32)
            if self.cegb is not None:
                cpen = np.zeros(self.p_pad, dtype=np.float32)
                cpen[:len(self.cegb["coupled"])] = self.cegb["coupled"]
                cegb_args = (jnp.asarray(cpen),
                             jnp.float32(self.cegb["split"]),
                             jnp.asarray(np.asarray(
                                 cegb_used if cegb_used is not None
                                 else np.zeros(self.p_pad),
                                 dtype=np.float32)))
            else:
                cegb_args = (None, jnp.float32(0.0), None)
            if self.extra_trees:
                import jax as _jax
                ek = _jax.random.PRNGKey(0 if extra_seed is None
                                         else int(extra_seed))
                extra_args = (ek, jnp.asarray(self.feat_hi))
            else:
                extra_args = (None, None)
            forced_arg = None if self.forced is None \
                else jnp.asarray(self.forced)
            lazy = self.cegb.get("lazy") if self.cegb is not None else None
            grow_args = (
                self.bins_pos, jnp.asarray(stats_pos),
                self.num_bins, self.num_leaves, self.max_depth,
                self.use_pallas, self.row_block, self.feat_chunk,
                jnp.float32(self.lambda_l2),
                jnp.float32(self.min_data_in_leaf),
                jnp.float32(self.min_sum_hessian),
                jnp.float32(self.min_gain),
                jnp.asarray(fm), jnp.float32(self.lambda_l1),
                jnp.asarray(self.monotone), jnp.asarray(self.cat_mask),
                self.path_smooth, *cegb_args, *extra_args, forced_arg)
            cat_p = jnp.asarray(self.cat_params, jnp.float32)
            ig_arg = None if self.inter_groups is None \
                else jnp.asarray(self.inter_groups)
            if lazy is None:
                rec, leaf_values, node, rec_gain, rec_cat = \
                    _grow_tree_partitioned(*grow_args, cat_params=cat_p,
                                           inter_groups=ig_arg,
                                           nan_bin=self.nan_bin_t)
            else:
                lpen = np.zeros(self.p_pad, dtype=np.float32)
                lpen[:len(lazy)] = lazy
                if self._lazy_used_rows is None:
                    u0 = np.ones((n_pad, self.p_pad), dtype=np.uint8)
                    u0[:n, :] = 0         # padding rows count as acquired
                    self._lazy_used_rows = jnp.asarray(u0)
                used_eff = self._lazy_used_rows
                if row_mask is not None:
                    # out-of-bag rows are invisible to the penalty AND the
                    # end-of-tree acquisition marks (the reference's
                    # data_partition holds only bagged rows)
                    inbag = np.zeros(n_pad, dtype=np.uint8)
                    inbag[:n] = (np.asarray(row_mask) > 0)
                    inbag_d = jnp.asarray(inbag)
                    used_eff = jnp.maximum(used_eff,
                                           (1 - inbag_d)[:, None])
                rec, leaf_values, node, rec_gain, rec_cat, leaf_path = \
                    _grow_tree_partitioned_lazy(
                        *grow_args, jnp.asarray(lpen), used_eff,
                        cat_params=cat_p, inter_groups=ig_arg,
                        nan_bin=self.nan_bin_t)
                marks = jnp.take(
                    leaf_path,
                    jnp.clip(node, 0, self.num_leaves - 1), axis=0)
                if row_mask is not None:
                    marks = marks * inbag_d[:, None]
                self._lazy_used_rows = jnp.maximum(
                    self._lazy_used_rows, marks.astype(jnp.uint8))
        else:
            stats_T = np.zeros((3, n_pad), dtype=np.float32)
            if row_mask is None:
                stats_T[0, :n] = grad
                stats_T[1, :n] = hess
                stats_T[2, :n] = 1.0
            else:
                rm = np.asarray(row_mask, dtype=np.float32)
                stats_T[0, :n] = grad * rm
                stats_T[1, :n] = hess * rm
                stats_T[2, :n] = (rm > 0).astype(np.float32)
            node0 = np.zeros(n_pad, dtype=np.int32)
            node0[n:] = self.num_leaves + 7   # sentinel: pads in no leaf
            import jax as _jax
            node0_d = _jax.device_put(jnp.asarray(node0),
                                      self._row_sharding)
            stats_d = _jax.device_put(jnp.asarray(stats_T),
                                      self._col_sharding)
            if self.parallel_mode == "voting":
                rec, leaf_values, node, rec_gain, rec_cat = \
                    _grow_tree_voting(
                        self.bins_T, node0_d, stats_d,
                        self.num_bins, self.num_leaves, self.max_depth,
                        self.use_pallas, self.row_block, self.feat_chunk,
                        jnp.float32(self.lambda_l2),
                        jnp.float32(self.min_data_in_leaf),
                        jnp.float32(self.min_sum_hessian),
                        jnp.float32(self.min_gain),
                        jnp.asarray(fm), jnp.float32(self.lambda_l1),
                        self.mesh, self.top_k)
            else:
                rec, leaf_values, node, rec_gain, rec_cat = _grow_tree(
                    self.bins_T, node0_d, stats_d,
                    self.num_bins, self.num_leaves, self.max_depth,
                    self.use_pallas, self.row_block, self.feat_chunk,
                    jnp.float32(self.lambda_l2),
                    jnp.float32(self.min_data_in_leaf),
                    jnp.float32(self.min_sum_hessian),
                    jnp.float32(self.min_gain),
                    jnp.asarray(fm), jnp.float32(self.lambda_l1),
                    jnp.asarray(self.monotone), jnp.asarray(self.cat_mask),
                    self.mesh, self.parallel_mode, self.path_smooth,
                    cat_params=jnp.asarray(self.cat_params, jnp.float32),
                    nan_bin=self.nan_bin_t)
        slot_of_row = np.asarray(node)[:n]
        cnt = np.bincount(slot_of_row, minlength=self.num_leaves + 8)
        tree, leaf_value_of_slot = self.build_tree(rec, leaf_values, rec_gain,
                                                   rec_cat, cnt)
        return tree, slot_of_row, leaf_value_of_slot

    def build_tree(self, rec, leaf_values, rec_gain, rec_cat, cnt):
        """Host-side tree reconstruction from the device split records.
        cnt: per-slot training row counts (cover, for TreeSHAP) — bincount of
        the final row->slot assignment, or the count statistic of the final
        per-leaf histograms (identical when no bagging)."""
        rec = np.asarray(rec)
        rec_cat = np.asarray(rec_cat)
        rec_gain = np.asarray(rec_gain, dtype=np.float64)
        leaf_values = np.asarray(leaf_values, dtype=np.float64)
        tree = Tree(2 * self.num_leaves)
        tree.leaf_value[0] = leaf_values[0]
        slot_to_node = {0: 0}
        for s in range(self.num_leaves - 1):
            parent_slot, f, b, ok = rec[s]
            if ok != 1:
                break
            node_id = slot_to_node[int(parent_slot)]
            mapper = self.mappers[int(f)]
            # decode the packed missing direction: code = bin + B * dl
            dl = int(b) >= self.num_bins
            b = int(b) - (self.num_bins if dl else 0)
            is_cat_f = bool(self.cat_mask[int(f)])
            mb = int(mapper.nan_bin) if (not is_cat_f and
                                         getattr(mapper, "has_nan", False)) \
                else -1
            thr = mapper.bin_to_threshold(int(b))
            li, ri = tree.split(node_id, int(f), int(b), thr, 0.0, 0.0,
                                default_left=dl, missing_bin=mb)
            tree.split_gain[node_id] = rec_gain[s]
            if self.cat_mask[int(f)]:
                words = rec_cat[s]
                left_bins = np.zeros(len(words) * 32, dtype=bool)
                for w, word in enumerate(words):
                    for bit in range(32):
                        if (int(word) >> bit) & 1:
                            left_bins[32 * w + bit] = True
                left_bins = left_bins[: self.num_bins]
                tree.cat_left_bins[node_id] = left_bins
                tree.cat_left_values[node_id] = mapper.bins_to_values(
                    left_bins)
            slot_to_node[int(parent_slot)] = li
            slot_to_node[s + 1] = ri
        for slot, node_id in slot_to_node.items():
            tree.leaf_value[node_id] = leaf_values[slot]
        if np.any(self.monotone != 0):
            _enforce_monotone(tree, self.monotone)
            for slot, node_id in slot_to_node.items():
                leaf_values[slot] = tree.leaf_value[node_id]
        leaf_value_of_slot = np.zeros(self.num_leaves + 8)
        for slot, node_id in slot_to_node.items():
            leaf_value_of_slot[slot] = tree.leaf_value[node_id]
        tree.slot_to_node = dict(slot_to_node)   # for Newton leaf updates
        # per-node training covers (TreeSHAP); parents precede children in the
        # node numbering, so one reversed pass aggregates internal nodes
        for slot, node_id in slot_to_node.items():
            tree.cover[node_id] = max(float(cnt[slot]), 1e-9)
        for i in range(tree.num_nodes - 1, -1, -1):
            if not tree.is_leaf[i]:
                tree.cover[i] = tree.cover[tree.left[i]] \
                    + tree.cover[tree.right[i]]
        return tree, leaf_value_of_slot


def _enforce_monotone(tree, monotone):
    """Clip leaf values so every monotone-constrained split satisfies
    max(left subtree) <= min(right subtree) for +1 constraints (mirrored for
    -1) — the 'basic' method of monotone_constraints.hpp: split candidates
    were already filtered during growth; this pass guarantees the property
    also holds across nested splits."""

    def leaves_under(node):
        stack, out = [node], []
        while stack:
            i = stack.pop()
            if tree.is_leaf[i]:
                out.append(i)
            else:
                stack.extend([int(tree.left[i]), int(tree.right[i])])
        return out

    def visit(node):
        if tree.is_leaf[node]:
            return
        f = int(tree.split_feature[node])
        li, ri = int(tree.left[node]), int(tree.right[node])
        m = int(monotone[f]) if f < len(monotone) else 0
        if m != 0:
            ll = leaves_under(li)
            rl = leaves_under(ri)
            lv = np.array([tree.leaf_value[i] for i in ll])
            rv = np.array([tree.leaf_value[i] for i in rl])
            mid = 0.5 * (lv.mean() + rv.mean())
            if m > 0:
                for i in ll:
                    tree.leaf_value[i] = min(tree.leaf_value[i], mid)
                for i in rl:
                    tree.leaf_value[i] = max(tree.leaf_value[i], mid)
            else:
                for i in ll:
                    tree.leaf_value[i] = max(tree.leaf_value[i], mid)
                for i in rl:
                    tree.leaf_value[i] = min(tree.leaf_value[i], mid)
        visit(li)
        visit(ri)

    visit(0)
