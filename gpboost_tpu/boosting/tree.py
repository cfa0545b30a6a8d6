"""Decision tree as flat arrays (reference: include/LightGBM/tree.h:721).

Nodes are stored in arrays so prediction is a fixed-depth vectorized descent
(gather chains) instead of pointer chasing — jit/vmap friendly.
"""

import numpy as np


class Tree:
    def __init__(self, max_nodes):
        self.split_feature = np.full(max_nodes, -1, dtype=np.int32)
        self.threshold_bin = np.full(max_nodes, -1, dtype=np.int32)
        self.threshold_real = np.full(max_nodes, np.inf)
        self.left = np.full(max_nodes, -1, dtype=np.int32)
        self.right = np.full(max_nodes, -1, dtype=np.int32)
        self.leaf_value = np.zeros(max_nodes)
        self.is_leaf = np.ones(max_nodes, dtype=bool)
        self.cover = np.zeros(max_nodes)    # training rows through each node
        self.split_gain = np.zeros(max_nodes)
        self.num_nodes = 1
        self.num_leaves = 1
        self.max_depth_used = 0
        self.shrinkage_applied = 1.0

    def split(self, node, feature, bin_threshold, real_threshold,
              left_value, right_value):
        li, ri = self.num_nodes, self.num_nodes + 1
        self.num_nodes += 2
        self.split_feature[node] = feature
        self.threshold_bin[node] = bin_threshold
        self.threshold_real[node] = real_threshold
        self.left[node] = li
        self.right[node] = ri
        self.is_leaf[node] = False
        self.leaf_value[li] = left_value
        self.leaf_value[ri] = right_value
        self.num_leaves += 1
        return li, ri

    def shrinkage(self, rate):
        """tree.h Shrinkage: scale all leaf values."""
        self.leaf_value[self.is_leaf] *= rate
        self.shrinkage_applied *= rate

    def predict_binned(self, bins):
        """Predict from binned features (training data)."""
        return self.leaf_value[self.leaf_index_binned(bins)]

    def leaf_index_binned(self, bins):
        n = len(bins)
        node = np.zeros(n, dtype=np.int32)
        while True:
            active = ~self.is_leaf[node]
            if not np.any(active):
                break
            f = self.split_feature[node[active]]
            go_left = bins[active, f] <= self.threshold_bin[node[active]]
            nxt = np.where(go_left, self.left[node[active]],
                           self.right[node[active]])
            node[active] = nxt
        return node

    def predict_raw(self, X):
        """Predict from raw features (new data); NaN goes right unless the
        split's NaN-bin routing says otherwise (simplified: NaN -> right)."""
        X = np.asarray(X, dtype=np.float64)
        n = len(X)
        node = np.zeros(n, dtype=np.int32)
        while True:
            active = ~self.is_leaf[node]
            if not np.any(active):
                break
            f = self.split_feature[node[active]]
            x = X[active, f]
            go_left = x <= self.threshold_real[node[active]]
            go_left = np.where(np.isfinite(x), go_left, False)
            node[active] = np.where(go_left, self.left[node[active]],
                                    self.right[node[active]])
        return self.leaf_value[node]

    def to_dict(self):
        n = self.num_nodes
        return {
            "split_feature": self.split_feature[:n].tolist(),
            "threshold_real": [None if not np.isfinite(t) else float(t)
                               for t in self.threshold_real[:n]],
            "threshold_bin": self.threshold_bin[:n].tolist(),
            "left": self.left[:n].tolist(),
            "right": self.right[:n].tolist(),
            "leaf_value": self.leaf_value[:n].tolist(),
            "is_leaf": self.is_leaf[:n].tolist(),
            "cover": self.cover[:n].tolist(),
            "split_gain": self.split_gain[:n].tolist(),
        }

    @classmethod
    def from_dict(cls, d):
        n = len(d["leaf_value"])
        t = cls(n)
        t.num_nodes = n
        t.split_feature[:n] = d["split_feature"]
        t.threshold_real[:n] = [np.inf if v is None else v
                                for v in d["threshold_real"]]
        t.threshold_bin[:n] = d["threshold_bin"]
        t.left[:n] = d["left"]
        t.right[:n] = d["right"]
        t.leaf_value[:n] = d["leaf_value"]
        t.is_leaf[:n] = d["is_leaf"]
        if "cover" in d:
            t.cover[:n] = d["cover"]
        if "split_gain" in d:
            t.split_gain[:n] = d["split_gain"]
        t.num_leaves = int(np.sum(t.is_leaf[:n]))
        return t
