"""Random-effect component definitions for the dense model engine.

The reference models the random-effects part as a sum of components
(re_comp.h:34 RECompBase -> RECompGroup / RECompGP): grouped random effects
(intercepts/slopes over a categorical), and Gaussian processes (optionally with
random coefficients). On TPU we represent every component's contribution to the
covariance as a dense structured matrix

    Sigma_j = v_j * (W_j  ∘  K_j(alpha_j))

where K_j is a correlation matrix (all-ones for grouped REs, kernel matrix for
GPs) and W_j a data-dependent weight matrix (same-group indicator for grouped
REs — the Z Z' of re_comp.h:731-744 — and/or outer(z, z) for random
coefficients), so the whole covariance assembles into MXU-friendly dense algebra
instead of the reference's sparse-incidence-matrix formulation.
"""

import numpy as np
import jax.numpy as jnp

from ..ops.cov_fcts import CovarianceFunction


class GPComponent:
    """A Gaussian-process component (re_comp.h:789 RECompGP).

    coords: (n, d) locations. z: optional (n,) random-coefficient covariate.
    """

    kind = "gp"

    def __init__(self, coords, cov_fn: CovarianceFunction, z=None, name="GP"):
        self.coords = np.asarray(coords, dtype=np.float64)
        if self.coords.ndim == 1:
            self.coords = self.coords[:, None]
        self.cov_fn = cov_fn
        self.z = None if z is None else np.asarray(z, dtype=np.float64)
        self.name = name
        self._dist = None

    @property
    def num_cov_par(self):
        return self.cov_fn.num_cov_par

    @property
    def num_range_par(self):
        return self.cov_fn.num_range_par

    def dist_matrix(self):
        if self._dist is None:
            from ..ops.distances import pairwise_dist
            self._dist = np.asarray(pairwise_dist(self.coords, method="direct"))
        return self._dist

    def corr(self, D_or_none, alphas):
        """Correlation matrix on training data given transformed ranges."""
        if hasattr(self.cov_fn, "corr_train"):
            # approximation adapters (VIF) use a dedicated training-block
            # evaluation anchored to the training rows
            return self.cov_fn.corr_train(alphas)
        if self.cov_fn.is_isotropic:
            return self.cov_fn.corr_from_dist(D_or_none, alphas)
        return self.cov_fn.corr_from_coords(
            jnp.asarray(self.coords), jnp.asarray(self.coords), alphas
        )

    def cross_corr(self, coords_pred, alphas):
        if self.cov_fn.is_isotropic:
            from ..ops.distances import pairwise_dist
            D = pairwise_dist(jnp.asarray(self.coords), jnp.asarray(coords_pred))
            return self.cov_fn.corr_from_dist(D, alphas)
        return self.cov_fn.corr_from_coords(
            jnp.asarray(self.coords), jnp.asarray(coords_pred), alphas
        )

    def pred_corr(self, coords_pred, alphas):
        if self.cov_fn.is_isotropic:
            from ..ops.distances import pairwise_dist
            D = pairwise_dist(jnp.asarray(coords_pred))
            return self.cov_fn.corr_from_dist(D, alphas)
        return self.cov_fn.corr_from_coords(
            jnp.asarray(coords_pred), jnp.asarray(coords_pred), alphas
        )


class GroupedComponent:
    """Grouped random effect (re_comp.h:227 RECompGroup).

    group: (n,) categorical codes. z: optional (n,) random-slope covariate.
    Sigma_j[i,l] = v_j * 1{group_i == group_l} (* z_i z_l).
    """

    kind = "grouped"

    def __init__(self, group, z=None, name="Group_1"):
        codes, self.group_levels = _factorize(group)
        self.group_codes = codes.astype(np.int32)
        self.z = None if z is None else np.asarray(z, dtype=np.float64)
        self.name = name

    @property
    def num_cov_par(self):
        return 1

    @property
    def num_range_par(self):
        return 0

    @property
    def num_groups(self):
        return len(self.group_levels)

    def same_group_mask(self, codes_other=None):
        a = self.group_codes
        b = a if codes_other is None else codes_other
        return (a[:, None] == b[None, :]).astype(np.float64)

    def refine_by_cluster(self, cluster_ids):
        """Split levels by cluster id: the same group label in two clusters
        becomes two independent effects (cluster partitioning semantics,
        re_model_template.h:6775 SetUpClusterIds)."""
        ccodes, self._cluster_levels = _factorize(cluster_ids)
        self._base_levels = self.group_levels
        mult = len(self.group_levels)
        combo = ccodes.astype(np.int64) * mult + self.group_codes
        new_codes, combo_levels = _factorize(combo)
        self.group_codes = new_codes.astype(np.int32)
        self.group_levels = combo_levels
        self._refined_mult = mult

    def codes_for_prediction(self, group_values_pred, cluster_ids_pred=None):
        """Map prediction labels to training level codes.

        Returns codes where values < num_groups refer to training levels and
        values >= num_groups are fresh codes shared among equal new labels
        (so new groups are mutually correlated but independent of training —
        re_comp.h:494 AddPredCovMatrices).
        """
        vals = np.asarray(group_values_pred)
        if hasattr(self, "_refined_mult"):
            if cluster_ids_pred is None:
                raise ValueError("cluster_ids_pred not provided")
            gcodes, gseen = _match_levels(self._base_levels, vals)
            ccodes, cseen = _match_levels(self._cluster_levels,
                                          np.asarray(cluster_ids_pred))
            combo = ccodes.astype(np.int64) * self._refined_mult + gcodes
            codes, seen = _match_levels(self.group_levels, combo)
            seen = seen & gseen & cseen
            # unseen (new cluster/group combos): fresh shared codes
            key = combo + (~cseen) * 10**9  # unseen clusters get distinct keys
        else:
            codes, seen = _match_levels(self.group_levels, vals)
            key = vals
        un = ~seen
        out = codes.astype(np.int64)
        if np.any(un):
            _, fresh = np.unique(np.asarray(key)[un], return_inverse=True)
            out[un] = self.num_groups + fresh
        return out


def _factorize(values):
    """Return (codes, uniques) with first-appearance ordering."""
    values = np.asarray(values)
    uniques, codes = np.unique(values, return_inverse=True)
    return codes, uniques


def _match_levels(levels, values):
    """Map values onto sorted-unique `levels`; returns (codes, seen_mask).
    Unseen values get arbitrary in-range codes with seen=False."""
    values = np.asarray(values)
    sorter = np.argsort(levels)
    pos = np.searchsorted(levels, values, sorter=sorter)
    pos = np.clip(pos, 0, len(levels) - 1)
    codes = sorter[pos]
    seen = levels[codes] == values
    return codes.astype(np.int64), seen
