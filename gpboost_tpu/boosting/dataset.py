"""Dataset: feature quantization for histogram-based tree learning.

Reference: LightGBM's BinMapper / Dataset (include/LightGBM/bin.h:507,
io/bin.cpp:737, io/dataset.cpp) — features are quantized to at most `max_bin`
bins found from (sampled) quantiles of the distinct values; trees then operate
purely on the small integer bin codes. The TPU rebuild keeps binning on the
host (numpy, once) and ships one static (n, num_features) uint8/int32 bin
matrix to the device, where histogram construction is a dense one-hot
contraction (see tree_learner.py) instead of the reference's per-bin scatter
loops.
"""

import numpy as np


class BinMapper:
    """Quantile-based binning of one feature (bin.h FindBin semantics,
    simplified: no exclusive-feature-bundling, NaN -> the last bin)."""

    is_categorical = False

    def __init__(self, values, max_bin=255, min_data_in_bin=3):
        v = np.asarray(values, dtype=np.float64)
        finite = v[np.isfinite(v)]
        uniq = np.unique(finite)
        self.has_nan = bool(np.any(~np.isfinite(v)))
        max_real_bins = max_bin - (1 if self.has_nan else 0)
        if len(uniq) <= max_real_bins:
            # one bin per distinct value
            self.upper_bounds = np.concatenate([
                (uniq[:-1] + uniq[1:]) / 2.0, [np.inf]])
        else:
            qs = np.linspace(0, 1, max_real_bins + 1)[1:-1]
            cuts = np.unique(np.quantile(finite, qs, method="linear"))
            self.upper_bounds = np.concatenate([cuts, [np.inf]])
        self.num_bins = len(self.upper_bounds) + (1 if self.has_nan else 0)
        self.nan_bin = self.num_bins - 1 if self.has_nan else -1

    def transform(self, values):
        v = np.asarray(values, dtype=np.float64)
        from ..native import bin_column
        return bin_column(v, self.upper_bounds,
                          nan_bin=self.nan_bin if self.has_nan else -1)

    def bin_to_threshold(self, b):
        """Real-valued threshold for 'go left if x <= t' at bin boundary b."""
        return float(self.upper_bounds[min(b, len(self.upper_bounds) - 1)]) \
            if b < len(self.upper_bounds) - 1 else np.inf


class CategoricalBinMapper:
    """Categorical feature binning (bin.h CategoricalBin / io/bin.cpp
    categorical FindBin): each of the most frequent categories gets its own
    bin; rare categories and NaN share the overflow bin."""

    is_categorical = True

    def __init__(self, values, max_bin=255):
        v = np.asarray(values, dtype=np.float64)
        finite = v[np.isfinite(v)]
        cats, counts = np.unique(finite, return_counts=True)
        order = np.argsort(-counts, kind="stable")
        keep = cats[order[: max_bin - 1]]
        self.categories = np.sort(keep)            # bin i <-> categories[i]
        self.num_bins = len(self.categories) + 1   # + overflow/NaN bin
        self.other_bin = self.num_bins - 1
        self.has_nan = bool(np.any(~np.isfinite(v)))
        self.nan_bin = self.other_bin

    def transform(self, values):
        v = np.asarray(values, dtype=np.float64)
        idx = np.searchsorted(self.categories, v)
        idx = np.clip(idx, 0, len(self.categories) - 1)
        hit = np.isfinite(v) & (self.categories[idx] == v)
        return np.where(hit, idx, self.other_bin).astype(np.int32)

    def bin_to_threshold(self, b):
        return np.inf

    def bins_to_values(self, bin_mask):
        """Raw category values of the bins selected by a bool mask."""
        sel = np.where(np.asarray(bin_mask[: len(self.categories)]))[0]
        return self.categories[sel]


class Dataset:
    """Training dataset (basic.py:1180 Dataset API subset)."""

    def __init__(self, data, label=None, max_bin=255, weight=None,
                 categorical_feature=None, feature_name=None, params=None,
                 free_raw_data=False, reference=None):
        self.data = np.asarray(data, dtype=np.float64)
        if self.data.ndim == 1:
            self.data = self.data[:, None]
        self.label = None if label is None else np.asarray(label, dtype=np.float64)
        self.weight = None if weight is None else np.asarray(weight, dtype=np.float64)
        self.max_bin = int((params or {}).get("max_bin", max_bin))
        self.feature_name = feature_name
        cf = categorical_feature
        if cf is None:
            cf = (params or {}).get("categorical_feature")
        self.categorical_feature = []
        if cf is not None and cf != "auto":
            for c in ([cf] if np.isscalar(cf) or isinstance(cf, str) else cf):
                if isinstance(c, str):
                    if feature_name and c in feature_name:
                        c = feature_name.index(c)
                    else:
                        c = int(c.replace("Column_", ""))
                self.categorical_feature.append(int(c))
        self.num_data, self.num_features = self.data.shape
        self._reference = reference
        self._constructed = False

    def construct(self):
        if self._constructed:
            return self
        if self._reference is not None:
            self._reference.construct()
            self.mappers = self._reference.mappers
        else:
            self.mappers = [
                CategoricalBinMapper(self.data[:, j], self.max_bin)
                if j in self.categorical_feature
                else BinMapper(self.data[:, j], self.max_bin)
                for j in range(self.num_features)]
        self.bins = np.column_stack([
            m.transform(self.data[:, j]) for j, m in enumerate(self.mappers)])
        self.num_bins = max(m.num_bins for m in self.mappers)
        self._constructed = True
        return self

    def set_label(self, label):
        self.label = np.asarray(label, dtype=np.float64)
        return self

    def get_label(self):
        return self.label

    def num_rows(self):
        return self.num_data

    def num_feature(self):
        return self.num_features
