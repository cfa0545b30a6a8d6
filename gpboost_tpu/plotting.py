"""Plotting utilities (reference: python-package/gpboost/plotting.py:623).

plot_importance / plot_split_value_histogram / plot_metric via matplotlib;
create_tree_digraph / plot_tree via graphviz (rendering additionally needs
the `dot` executable).
"""

import numpy as np

from .boosting.gbdt import Booster


def _get_ax(ax, figsize, dpi):
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=figsize, dpi=dpi)
    return ax


def plot_importance(booster, ax=None, height=0.2, xlim=None, ylim=None,
                    title="Feature importance", xlabel="Feature importance",
                    ylabel="Features", importance_type="split",
                    max_num_features=None, ignore_zero=True, figsize=None,
                    dpi=None, grid=True, precision=3, **kwargs):
    """Horizontal-bar feature importances (plotting.py:25)."""
    if not isinstance(booster, Booster):
        booster = getattr(booster, "booster_", booster)
    imps = np.asarray(booster.feature_importance(
        importance_type=importance_type), dtype=np.float64)
    names = [f"Column_{i}" for i in range(len(imps))]
    pairs = sorted(zip(imps, names), key=lambda t: t[0])
    if ignore_zero:
        pairs = [p for p in pairs if p[0] > 0]
    if max_num_features is not None and max_num_features > 0:
        pairs = pairs[-max_num_features:]
    values = [p[0] for p in pairs]
    labels = [p[1] for p in pairs]
    ax = _get_ax(ax, figsize, dpi)
    ylocs = np.arange(len(values))
    ax.barh(ylocs, values, align="center", height=height, **kwargs)
    for x, y in zip(values, ylocs):
        ax.text(x + 1, y,
                f"{x:.{precision}f}" if importance_type == "gain"
                else str(int(x)), va="center")
    ax.set_yticks(ylocs)
    ax.set_yticklabels(labels)
    if xlim is not None:
        ax.set_xlim(xlim)
    if ylim is not None:
        ax.set_ylim(ylim)
    else:
        ax.set_ylim(-1, len(values))
    if title:
        ax.set_title(title)
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    ax.grid(grid)
    return ax


def plot_split_value_histogram(booster, feature, bins=None, ax=None,
                               width_coef=0.8, xlim=None, ylim=None,
                               title="Split value histogram for feature with "
                                     "@index/name@ @feature@",
                               xlabel="Feature split value", ylabel="Count",
                               figsize=None, dpi=None, grid=True, **kwargs):
    """Histogram of split threshold values used for one feature
    (plotting.py:141)."""
    if not isinstance(booster, Booster):
        booster = getattr(booster, "booster_", booster)
    if isinstance(feature, str):
        feature = int(feature.replace("Column_", ""))
    values = []
    for tree in booster.trees:
        nt = tree.num_nodes
        sel = (~tree.is_leaf[:nt]) & (tree.split_feature[:nt] == feature)
        values.extend(tree.threshold_real[:nt][sel].tolist())
    if not values:
        raise ValueError(
            f"Cannot plot split value histogram, "
            f"because feature {feature} was not used in splitting")
    values = np.asarray(values)
    ax = _get_ax(ax, figsize, dpi)
    ax.hist(values, bins=bins if bins is not None else
            min(max(10, len(values) // 3), 50), rwidth=width_coef, **kwargs)
    if xlim is not None:
        ax.set_xlim(xlim)
    if ylim is not None:
        ax.set_ylim(ylim)
    if title:
        ax.set_title(title.replace("@feature@", str(feature))
                     .replace("@index/name@", "index"))
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    ax.grid(grid)
    return ax


def plot_metric(booster, metric=None, dataset_names=None, ax=None, xlim=None,
                ylim=None, title="Metric during training", xlabel="Iterations",
                ylabel="auto", figsize=None, dpi=None, grid=True):
    """Plot a metric recorded during training (plotting.py:247). `booster`
    is the evals_result dict passed to train() / a record_evaluation dict."""
    if isinstance(booster, dict):
        eval_results = booster
    else:
        raise TypeError("booster must be the evals_result dict recorded "
                        "during training")
    if not eval_results:
        raise ValueError("eval results cannot be empty")
    ax = _get_ax(ax, figsize, dpi)
    names = dataset_names or list(eval_results.keys())
    chosen_metric = metric
    for nm in names:
        metrics = eval_results[nm]
        if chosen_metric is None:
            chosen_metric = next(iter(metrics))
        if chosen_metric not in metrics:
            continue
        vals = metrics[chosen_metric]
        ax.plot(np.arange(1, len(vals) + 1), vals, label=nm)
    ax.legend(loc="best")
    if xlim is not None:
        ax.set_xlim(xlim)
    if ylim is not None:
        ax.set_ylim(ylim)
    if title:
        ax.set_title(title)
    if xlabel:
        ax.set_xlabel(xlabel)
    ax.set_ylabel(chosen_metric if ylabel == "auto" else ylabel)
    ax.grid(grid)
    return ax


def create_tree_digraph(booster, tree_index=0, show_info=None, precision=3,
                        orientation="horizontal", **kwargs):
    """Build a graphviz Digraph of one tree (plotting.py:468)."""
    import graphviz
    if not isinstance(booster, Booster):
        booster = getattr(booster, "booster_", booster)
    if tree_index >= len(booster.trees):
        raise IndexError(f"tree_index {tree_index} out of range")
    tree = booster.trees[tree_index]
    show_info = show_info or []
    graph = graphviz.Digraph(**kwargs)
    graph.attr(rankdir="LR" if orientation == "horizontal" else "TB")

    def add(node, parent=None, decision=None):
        name = f"node{node}"
        if tree.is_leaf[node]:
            label = f"leaf {node}: {tree.leaf_value[node]:.{precision}f}"
            if "internal_count" in show_info or "leaf_count" in show_info:
                label += f"\ncount: {int(tree.cover[node])}"
            graph.node(name, label=label)
        else:
            label = (f"Column_{tree.split_feature[node]} <= "
                     f"{tree.threshold_real[node]:.{precision}f}")
            if "split_gain" in show_info:
                label += f"\ngain: {tree.split_gain[node]:.{precision}f}"
            if "internal_count" in show_info:
                label += f"\ncount: {int(tree.cover[node])}"
            graph.node(name, label=label, shape="rectangle")
            add(int(tree.left[node]), name, "yes")
            add(int(tree.right[node]), name, "no")
        if parent is not None:
            graph.edge(parent, name, label=decision)

    add(0)
    return graph


def plot_tree(booster, ax=None, tree_index=0, figsize=None, dpi=None,
              show_info=None, precision=3, orientation="horizontal",
              **kwargs):
    """Render one tree with matplotlib (plotting.py:545). Needs the graphviz
    `dot` executable for rasterization."""
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt
    graph = create_tree_digraph(booster, tree_index=tree_index,
                                show_info=show_info, precision=precision,
                                orientation=orientation, **kwargs)
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=figsize, dpi=dpi)
    import io
    try:
        s = graph.pipe(format="png")
    except Exception as e:
        raise RuntimeError(
            "plot_tree requires the graphviz 'dot' executable; "
            "use create_tree_digraph() instead") from e
    img = mpimg.imread(io.BytesIO(s))
    ax.imshow(img)
    ax.axis("off")
    return ax
