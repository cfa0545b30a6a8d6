"""GPModel — public API mirroring the reference Python package.

Reference: python-package/gpboost/basic.py:4172 (class GPModel) — constructor
signature, fit / neg_log_likelihood / predict / summary methods, parameter
naming. The compute path underneath is the TPU-native engine in models/.
"""

import math

import numpy as np
import jax.numpy as jnp

from .ops.cov_fcts import CovarianceFunction
from .likelihoods import get_likelihood
from .models.components import GPComponent, GroupedComponent
from .models.gaussian_gp import DenseGaussianEngine
from .models.grouped_re import WoodburyGaussianEngine
from .models.laplace import LaplaceDenseEngine
from .models.vecchia import VecchiaGaussianEngine
from .models.fitc import FITCGaussianEngine
from .models.optimize import (OptimConfig, OptimResult, optimize_gaussian,
                              optimize_laplace)

_OPTIM_PARAM_KEYS = {
    "optimizer_cov", "optimizer_coef", "lr_cov", "lr_coef", "use_nesterov_acc",
    "acc_rate_cov", "acc_rate_coef", "momentum_offset", "delta_rel_conv",
    "convergence_criterion", "maxit", "std_dev", "init_cov_pars", "init_coef",
    "estimate_cov_par_index", "trace", "init_aux_pars", "estimate_aux_pars",
    "use_device_optimizer",
    # accepted-but-currently-unused (iterative-methods & misc) keys
    "cg_max_num_it", "cg_max_num_it_tridiag", "cg_delta_conv",
    "cg_preconditioner_type", "num_rand_vec_trace", "reuse_rand_vec_trace",
    "seed_rand_vec_trace", "piv_chol_rank", "init_coef_aux_pars_from_iid_model",
    "nesterov_schedule_version", "nsim_var_pred",
}


class GPModel:
    """Gaussian process and grouped random effects model.

    Mirrors the reference GPModel (basic.py:4172): y = F(X) + Zb + xi with
    Gaussian likelihood; y ~ p(y | G(F(X) + Zb)) for non-Gaussian likelihoods.
    """

    def __init__(self,
                 likelihood="gaussian",
                 group_data=None,
                 group_rand_coef_data=None,
                 ind_effect_group_rand_coef=None,
                 drop_intercept_group_rand_effect=None,
                 gp_coords=None,
                 gp_rand_coef_data=None,
                 cov_function="matern",
                 cov_fct_shape=1.5,
                 gp_approx="none",
                 cov_fct_taper_range=1.0,
                 cov_fct_taper_shape=1.0,
                 num_neighbors=None,
                 vecchia_ordering="random",
                 ind_points_selection="kmeans++",
                 num_ind_points=500,
                 cover_tree_radius=1.0,
                 matrix_inversion_method="auto",
                 seed=0,
                 cluster_ids=None,
                 likelihood_additional_param=None,
                 free_raw_data=False,
                 model_file=None,
                 model_dict=None,
                 likelihood_learning_rate=1.0,
                 dtype="float64",
                 weights=None,
                 num_parallel_devices=None,
                 ):
        """dtype: computation precision ("float64" default for reference
        parity; "float32" runs natively on the TPU MXU/VPU and is the right
        choice for large-n Vecchia workloads — a TPU-specific extension)."""
        if model_file is not None or model_dict is not None:
            self._init_from_dict(model_file, model_dict)
            return
        import jax.numpy as _jnp
        self._dtype = _jnp.float32 if str(dtype) in ("float32", "f32") \
            else _jnp.float64
        # canonicalize pure-name aliases BEFORE engine dispatch so e.g.
        # "regression" selects the Gaussian engines
        # (ParseLikelihoodAlias, likelihoods.h:10210-10317)
        from .likelihoods.base import _ALIASES as _lik_aliases
        likelihood = _lik_aliases.get(likelihood, likelihood)
        self.likelihood = likelihood
        self.gp_approx = gp_approx
        self._coef_override = None
        self._cov_pars_override = None
        self._aux_override = None

        # "auto" (TPU-native default): direct (Cholesky) factorizations while
        # they fit, matrix-free CG + stochastic Lanczos log-dets at scale —
        # so large-n non-Gaussian Vecchia models run O(n*m) BY DEFAULT
        # instead of forming a dense n x n precision. An explicit "cholesky"
        # or "iterative" from the user is always honored (the reference's
        # two values, re_model.h matrix_inversion_method).
        self.matrix_inversion_method = matrix_inversion_method
        self.cov_function_name = cov_function
        self.cov_fct_shape = cov_fct_shape
        self.seed = seed
        self.num_neighbors = num_neighbors
        self.vecchia_ordering = vecchia_ordering
        self.num_ind_points = num_ind_points
        self.ind_points_selection = ind_points_selection
        self.likelihood_additional_param = likelihood_additional_param
        self.cov_fct_taper_range = cov_fct_taper_range
        self.cov_fct_taper_shape = cov_fct_taper_shape
        self.likelihood_learning_rate = likelihood_learning_rate
        # data-parallel distribution over a device mesh (the TPU-native
        # analogue of the reference's num_parallel_threads / distributed
        # learners): per-row arrays are sharded; reductions become psums
        self.num_parallel_devices = num_parallel_devices
        self._mesh = None
        if num_parallel_devices is not None and num_parallel_devices > 1:
            import jax as _jax
            from jax.sharding import Mesh
            devs = _jax.devices()[:int(num_parallel_devices)]
            if len(devs) < int(num_parallel_devices):
                raise ValueError(
                    f"num_parallel_devices={num_parallel_devices} but only "
                    f"{len(devs)} devices are available")
            self._mesh = Mesh(np.asarray(devs), ("data",))

        if group_data is None and gp_coords is None:
            raise ValueError("Both group_data and gp_coords are None. "
                             "Provide at least one random effect.")

        self.components = []
        self._par_names = ["Error_term"] if likelihood == "gaussian" else []

        # grouped random effects first (CreateREComponents order,
        # re_model_template.h:7500)
        self.group_data = None
        if group_data is not None:
            group_data = np.asarray(group_data)
            if group_data.ndim == 1:
                group_data = group_data[:, None]
            self.group_data = group_data
            for ic in range(group_data.shape[1]):
                name = f"Group_{ic + 1}" if group_data.shape[1] > 1 else "Group_1"
                self.components.append(
                    GroupedComponent(group_data[:, ic], name=name))
                self._par_names.append(name)
        self.group_rand_coef_data = None
        if group_rand_coef_data is not None:
            group_rand_coef_data = np.asarray(group_rand_coef_data, dtype=np.float64)
            if group_rand_coef_data.ndim == 1:
                group_rand_coef_data = group_rand_coef_data[:, None]
            self.group_rand_coef_data = group_rand_coef_data
            ind = np.atleast_1d(np.asarray(ind_effect_group_rand_coef)) - 1
            self.ind_effect_group_rand_coef = ind
            for ic in range(group_rand_coef_data.shape[1]):
                base = self.components[int(ind[ic])]
                self.components.append(GroupedComponent(
                    self.group_data[:, int(ind[ic])],
                    z=group_rand_coef_data[:, ic],
                    name=f"Group_rand_coef_{ic + 1}"))
                self._par_names.append(f"Group_rand_coef_{ic + 1}")

        self.gp_coords = None
        if gp_coords is not None:
            gp_coords = np.asarray(gp_coords, dtype=np.float64)
            if gp_coords.ndim == 1:
                gp_coords = gp_coords[:, None]
            self.gp_coords = gp_coords
            # taper smoothness mu = (1 + dim)/2 + taper_shape + 0.5
            # (re_comp.h:1812-1815 GetTaperMu)
            taper_mu = (1.0 + gp_coords.shape[1]) / 2.0 \
                + cov_fct_taper_shape + 0.5
            if cov_function.startswith("ar1_mf_"):
                from .ops.cov_fcts import AR1MultifidelityCovariance
                fid = gp_coords[:, -1]
                if not np.all(np.isin(fid, (0.0, 1.0))):
                    raise ValueError(
                        "The last column of gp_coords must contain only 0 "
                        "(low fidelity) and 1 (high fidelity) for AR1 "
                        "multifidelity covariance functions")
                cov_fn = AR1MultifidelityCovariance(
                    cov_function[len("ar1_mf_"):], shape=cov_fct_shape,
                    dim=gp_coords.shape[1])
            else:
                cov_fn = CovarianceFunction(
                    cov_function, shape=cov_fct_shape, dim=gp_coords.shape[1],
                    taper_range=cov_fct_taper_range, taper_shape=cov_fct_taper_shape,
                    taper_mu=taper_mu)
            if gp_approx in ("full_scale_vecchia",
                             "full_scale_vecchia_correlation_based"):
                from .ops.taper import VIFCovarianceFunction
                from .models.fitc import kmeanspp_indices
                m_ip = min(num_ind_points if num_ind_points else 500,
                           len(gp_coords))
                if ind_points_selection == "random":
                    rng = np.random.RandomState(seed)
                    ip = gp_coords[rng.choice(len(gp_coords), m_ip,
                                              replace=False)]
                else:
                    ip = kmeanspp_indices(gp_coords, m_ip, seed=seed)
                init_al = None
                if gp_approx.endswith("correlation_based"):
                    comp0 = GPComponent(gp_coords, cov_fn)
                    init_al = cov_fn.range_to_transformed(
                        np.asarray(_init_ranges(comp0)))
                cov_fn = VIFCovarianceFunction(
                    cov_fn, ip, gp_coords,
                    num_neighbors if num_neighbors else 30,
                    correlation_based=gp_approx.endswith("correlation_based"),
                    init_alphas=init_al)
            if gp_approx in ("tapering", "full_scale_tapering",
                             "full_scale_tapering_pred_var_exact",
                             "full_scale_tapering_pred_var_exact_stable"):
                from .ops.taper import (TaperedCovarianceFunction,
                                        FSACovarianceFunction)
                taper = CovarianceFunction(
                    "wendland", shape=cov_fct_taper_shape,
                    taper_range=cov_fct_taper_range,
                    taper_shape=cov_fct_taper_shape, taper_mu=taper_mu)
                if gp_approx == "tapering":
                    cov_fn = TaperedCovarianceFunction(cov_fn, taper)
                else:
                    from .models.fitc import kmeanspp_indices
                    m_ip = min(num_ind_points if num_ind_points else 500,
                               len(gp_coords))
                    if ind_points_selection == "random":
                        rng = np.random.RandomState(seed)
                        ip = gp_coords[rng.choice(len(gp_coords), m_ip,
                                                  replace=False)]
                    else:
                        ip = kmeanspp_indices(gp_coords, m_ip, seed=seed)
                    cov_fn = FSACovarianceFunction(cov_fn, taper, ip)
            self.components.append(GPComponent(gp_coords, cov_fn, name="GP"))
            self._par_names.extend(
                _gp_cov_par_names(cov_function, gp_coords.shape[1]))
        self.gp_rand_coef_data = None
        if gp_rand_coef_data is not None:
            gp_rand_coef_data = np.asarray(gp_rand_coef_data, dtype=np.float64)
            if gp_rand_coef_data.ndim == 1:
                gp_rand_coef_data = gp_rand_coef_data[:, None]
            self.gp_rand_coef_data = gp_rand_coef_data
            for ic in range(gp_rand_coef_data.shape[1]):
                cov_fn = CovarianceFunction(
                    cov_function, shape=cov_fct_shape, dim=self.gp_coords.shape[1],
                    taper_range=cov_fct_taper_range, taper_shape=cov_fct_taper_shape)
                self.components.append(GPComponent(
                    self.gp_coords, cov_fn, z=gp_rand_coef_data[:, ic],
                    name=f"GP_rand_coef_nb_{ic + 1}"))
                base = _gp_cov_par_names(cov_function, self.gp_coords.shape[1])
                pre = f"GP_rand_coef_nb_{ic + 1}"
                self._par_names.extend(
                    [pre + "_var"] + [pre + "_" + nm.replace("GP_", "")
                                      for nm in base[1:]])

        self.num_data = (len(self.group_data) if self.group_data is not None
                         else len(self.gp_coords))
        self.cluster_ids = None if cluster_ids is None else np.asarray(cluster_ids)
        self.weights = None if weights is None else np.asarray(
            weights, dtype=np.float64)
        if self.weights is not None and gp_approx not in (
                "none", "vecchia", "fitc"):
            raise NotImplementedError(
                "weights are currently supported for gp_approx in "
                "('none', 'vecchia', 'fitc')")

        # Engine selection (analogue of the reference's matrix-format dispatch,
        # re_model.cpp:77-89): grouped-REs-only Gaussian models get the q-sized
        # Woodbury engine; anything with a GP the dense engine; non-Gaussian
        # likelihoods the Laplace-approximation engine.
        self._likelihood_obj = None
        self._use_woodbury = False
        self._vecchia = gp_approx in ("vecchia",)
        self.vecchia_pred_type = "order_obs_first_cond_obs_only"
        self.num_neighbors_pred = None
        _taper_approxes = ("tapering", "full_scale_tapering",
                           "full_scale_tapering_pred_var_exact",
                           "full_scale_tapering_pred_var_exact_stable",
                           "full_scale_vecchia",
                           "full_scale_vecchia_correlation_based")
        if gp_approx in ("tapering", "full_scale_tapering",
                         "full_scale_tapering_pred_var_exact",
                         "full_scale_tapering_pred_var_exact_stable") \
                and likelihood == "gaussian" \
                and len(self.components) == 1 \
                and self.components[0].kind == "gp" \
                and self.components[0].z is None \
                and self.cluster_ids is None and self.weights is None \
                and self.components[0].cov_fn.base.is_isotropic \
                and (matrix_inversion_method == "iterative"
                     or (matrix_inversion_method == "auto"
                         and self.num_data > 8000)):
            # n-scaling path: sparse tapered residual (+ low-rank inducing
            # part) with CG solves and preconditioned SLQ log-dets
            # (CG_utils.h:505-975 CGFSA/CGTridiagFSA)
            from .models.fsa_iterative import FSAIterativeGaussianEngine
            self._engine = FSAIterativeGaussianEngine(
                self.components, self.num_data, dtype=self._dtype)
            self.num_cov_par = self._engine.num_cov_par
            self.params = OptimConfig()
            self._fit_result = None
            self.y = None
            self.X = None
            self.model_has_been_fitted = False
            return
        elif gp_approx in ("full_scale_vecchia",
                           "full_scale_vecchia_correlation_based") \
                and likelihood == "gaussian" \
                and len(self.components) == 1 \
                and self.components[0].kind == "gp" \
                and self.components[0].z is None \
                and self.cluster_ids is None and self.weights is None \
                and self.components[0].cov_fn.base.is_isotropic \
                and (matrix_inversion_method == "iterative"
                     or (matrix_inversion_method == "auto"
                         and self.num_data > 8000)):
            # FSVA n-scaling path: congruence-by-B CG + SLQ with the vifdu
            # preconditioner (re_model_template.h:5866; CG_utils.h:208-318)
            from .models.fsva_iterative import FSVAIterativeGaussianEngine
            self._engine = FSVAIterativeGaussianEngine(
                self.components, self.num_data, dtype=self._dtype)
            self.num_cov_par = self._engine.num_cov_par
            self.params = OptimConfig()
            self._fit_result = None
            self.y = None
            self.X = None
            self.model_has_been_fitted = False
            return
        if gp_approx in _taper_approxes:
            # the tapered/FSA kernel adapters ride the dense (or Laplace)
            # engine — reset to the plain dense dispatch below
            gp_approx_engine = "none"
        else:
            gp_approx_engine = gp_approx
        gp_approx = gp_approx_engine
        if gp_approx == "vecchia_euclidean":
            # distance-based neighbor selection for ar1_mf models (the plain
            # 'vecchia' re-determines neighbors by correlation there,
            # Vecchia_utils.h:192); our Vecchia engine is distance-based
            gp_approx = "vecchia"
        if gp_approx == "vecchia_latent":
            # Vecchia on the LATENT process for Gaussian data, driven through
            # the non-Gaussian (Laplace) code path with the error variance as
            # a likelihood aux parameter (re_model_template.h:207-210,
            # :615; the Laplace approximation is exact here)
            if likelihood != "gaussian":
                raise ValueError("gp_approx='vecchia_latent' requires "
                                 "likelihood='gaussian'")
            likelihood = "gaussian_latent"
            self.likelihood = "gaussian_latent"
            self._par_names = [nm for nm in self._par_names
                               if nm != "Error_term"]
            gp_approx = "vecchia"
        if gp_approx not in ("none", "vecchia", "fitc"):
            raise NotImplementedError(
                f"gp_approx '{gp_approx}' is not implemented yet "
                "(currently: 'none', 'vecchia', 'vecchia_latent', 'fitc', "
                "'tapering', 'full_scale_tapering')")
        if likelihood != "gaussian" and gp_approx != "none":
            _lik_probe = get_likelihood(likelihood, likelihood_additional_param)
            if getattr(_lik_probe, "num_sets_re", 1) == 2:
                # gaussian_heteroscedastic_fixed_and_random: two sets of
                # random effects (likelihoods.h:474-485). The Vecchia /
                # FITC engines are single-set; run the exact dense Laplace
                # engine (golden-equivalent to the reference's Vecchia at
                # num_neighbors = n-1, ordering 'none').
                gp_approx = "none"
        _has_grouped = any(c.kind == "grouped" for c in self.components)
        _has_gp = any(c.kind == "gp" for c in self.components)
        if gp_approx == "vecchia" and _has_grouped and _has_gp:
            # grouped REs + Vecchia GP: the reference runs the JOINT latent
            # [gp, grouped effects] through the Laplace machinery
            # (grouped_RE_and_vecchia_GP_, re_model_template.h:7042-7045) —
            # exact for a Gaussian likelihood, whose error variance becomes
            # the likelihood aux parameter like vecchia_latent
            if self.cluster_ids is not None:
                raise NotImplementedError(
                    "cluster_ids are not supported with gp_approx='vecchia' "
                    "plus grouped random effects")
            if likelihood == "gaussian":
                likelihood = "gaussian_latent"
                self.likelihood = "gaussian_latent"
                self._par_names = [nm for nm in self._par_names
                                   if nm != "Error_term"]
            self._likelihood_obj = get_likelihood(
                likelihood, likelihood_additional_param)
            from .models.vecchia_grouped import VecchiaGroupedLaplaceEngine
            # auto: matrix-free CG/SLQ at scale (the reference's own default
            # for this case is sparse Cholesky / SSOR-CG,
            # re_model_template.h:7085); dense joint H only while small
            mim = matrix_inversion_method
            if mim == "auto":
                mim = "iterative" if self.num_data > 8000 else "cholesky"
            self._engine = VecchiaGroupedLaplaceEngine(
                self.components, self.num_data, self._likelihood_obj,
                num_neighbors=num_neighbors if num_neighbors else 20,
                vecchia_ordering=vecchia_ordering, seed=seed,
                dtype=self._dtype, weights=self.weights,
                matrix_inversion_method=mim)
            self.num_cov_par = self._engine.num_cov_par
            self.params = OptimConfig()
            self._fit_result = None
            self.y = None
            self.X = None
            self.model_has_been_fitted = False
            return
        if gp_approx in ("vecchia", "fitc"):
            if gp_approx == "vecchia" and likelihood != "gaussian" \
                    and self.cluster_ids is not None:
                raise NotImplementedError(
                    "cluster_ids with gp_approx='vecchia' are supported for "
                    "the Gaussian likelihood only (per-cluster neighbor "
                    "restriction); use gp_approx='fitc' or the dense engine "
                    "for clustered non-Gaussian GPs")
            if likelihood != "gaussian":
                self._likelihood_obj = get_likelihood(
                    likelihood, likelihood_additional_param)
                if gp_approx == "fitc":
                    from .models.fitc_laplace import FITCLaplaceEngine
                    self._engine = FITCLaplaceEngine(
                        self.components, self.num_data, self._likelihood_obj,
                        num_ind_points=num_ind_points,
                        ind_points_selection=ind_points_selection, seed=seed,
                        dtype=self._dtype, weights=self.weights)
                else:
                    from .models.vecchia_laplace import VecchiaLaplaceEngine
                    # auto: the matrix-free O(n*m) CG/SLQ formulation is the
                    # default at scale; dense-precision Cholesky only while
                    # the n x n factorization is cheap (VERDICT: non-Gaussian
                    # Vecchia must not form dense Q by default)
                    mim = matrix_inversion_method
                    if mim == "auto":
                        mim = "iterative" if self.num_data > 8000 \
                            else "cholesky"
                    self._engine = VecchiaLaplaceEngine(
                        self.components, self.num_data, self._likelihood_obj,
                        num_neighbors=num_neighbors if num_neighbors else 20,
                        vecchia_ordering=vecchia_ordering, seed=seed,
                        dtype=self._dtype,
                        matrix_inversion_method=mim, weights=self.weights)
                self.num_cov_par = self._engine.num_cov_par
                self.params = OptimConfig()
                self._fit_result = None
                self.y = None
                self.X = None
                self.model_has_been_fitted = False
                return
            if gp_approx == "vecchia":
                self._engine = VecchiaGaussianEngine(
                    self.components, self.num_data,
                    num_neighbors=num_neighbors if num_neighbors else 20,
                    vecchia_ordering=vecchia_ordering, seed=seed,
                    dtype=self._dtype, mesh=self._mesh,
                    weights=self.weights, cluster_ids=self.cluster_ids)
            else:
                self._engine = FITCGaussianEngine(
                    self.components, self.num_data,
                    num_ind_points=num_ind_points,
                    ind_points_selection=ind_points_selection, seed=seed,
                    dtype=self._dtype, weights=self.weights)
            self.num_cov_par = self._engine.num_cov_par
            self.params = OptimConfig()
            self._fit_result = None
            self.y = None
            self.X = None
            self.model_has_been_fitted = False
            return
        if likelihood != "gaussian":
            self._likelihood_obj = get_likelihood(likelihood,
                                                  likelihood_additional_param)
            eng_weights = self.weights
            if getattr(self._likelihood_obj, "uses_weights_as_trials", False):
                # beta_binomial: `weights` carry the trial counts, which enter
                # the pmf itself rather than multiplying the log density
                self._likelihood_obj.set_trials(self.weights)
                eng_weights = None
            if all(c.kind == "grouped" for c in self.components):
                # RE-scale (q-dimensional) Laplace: O(n + q^3) per Newton
                # step instead of O(n^3) — diagonal O(n + q) for one grouping
                # (likelihoods.h:2959/:3223)
                from .models.grouped_laplace import GroupedRELaplaceEngine
                self._use_woodbury = True   # codes-form prediction data
                self._engine = GroupedRELaplaceEngine(
                    self.components, self.num_data, self._likelihood_obj,
                    cluster_ids=self.cluster_ids, dtype=self._dtype,
                    weights=eng_weights)
            else:
                self._engine = LaplaceDenseEngine(
                    self.components, self.num_data, self._likelihood_obj,
                    cluster_ids=self.cluster_ids, dtype=self._dtype,
                    weights=eng_weights)
            if getattr(self._engine, "num_sets_re", 1) == 2:
                # second-set covariance parameters (same structure,
                # re_model_template.h:4915-4932)
                self._par_names = self._par_names + \
                    [nm + "_set2" for nm in self._par_names]
        else:
            self._use_woodbury = all(c.kind == "grouped"
                                     for c in self.components)
            if self._use_woodbury:
                if self.cluster_ids is not None:
                    # independence across clusters == refining each grouping by
                    # the cluster id (same level in different clusters ->
                    # separate RE)
                    for comp in self.components:
                        comp.refine_by_cluster(self.cluster_ids)
                mim = matrix_inversion_method
                if mim == "auto":
                    q_tot = sum(c.num_groups for c in self.components)
                    mim = "iterative" if q_tot > 20000 else "cholesky"
                self._engine = WoodburyGaussianEngine(
                    self.components, self.num_data, dtype=self._dtype,
                    matrix_inversion_method=mim,
                    weights=self.weights)
            else:
                self._engine = DenseGaussianEngine(
                    self.components, self.num_data,
                    cluster_ids=self.cluster_ids, dtype=self._dtype,
                    weights=self.weights)

        self.num_cov_par = self._engine.num_cov_par

        # state
        self.params = OptimConfig()
        self._fit_result: OptimResult = None
        self.y = None
        self.X = None
        self.model_has_been_fitted = False

    # ------------------------------------------------------------------
    def set_optim_params(self, params):
        if not params:
            return self
        for k, v in params.items():
            if k not in _OPTIM_PARAM_KEYS:
                raise ValueError(f"Unknown parameter '{k}'")
            if hasattr(self.params, k) and k != "init_cov_pars":
                setattr(self.params, k, v)
            elif k == "init_cov_pars":
                self.params.init_cov_pars = None if v is None else np.asarray(v, dtype=np.float64)
        if params.get("init_cov_pars") is not None:
            # re_model.cpp:302-316 SetOptimConfig: init_cov_pars overwrite
            # the model's current covariance parameters immediately, so a
            # predict() without explicit cov_pars uses them until re-fit
            self._cov_pars_override = np.asarray(params["init_cov_pars"],
                                                 dtype=np.float64)
        if params.get("init_aux_pars") is not None:
            self._aux_override = np.asarray(params["init_aux_pars"],
                                            dtype=np.float64)
        if params.get("init_coef") is not None:
            # re_model.cpp:320-324: init_coef overwrites the stored
            # coefficients immediately -> predict() with explicit cov_pars
            # uses these until the next fit() re-estimates them
            self._coef_override = np.asarray(params["init_coef"],
                                             dtype=np.float64)
        # CG / stochastic-trace settings live inside the iterative
        # Vecchia-Laplace engine's jitted graphs -> rebuild on change
        cg_keys = {"num_rand_vec_trace": "num_rand_vec_trace",
                   "cg_max_num_it": "cg_max_num_it",
                   "cg_delta_conv": "cg_delta_conv",
                   "seed_rand_vec_trace": "seed_rand_vec_trace",
                   "nsim_var_pred": "nsim_var_pred",
                   "piv_chol_rank": "piv_chol_rank"}
        eng = getattr(self, "_engine", None)
        iter_keys_passed = [k for k in list(cg_keys)
                            + ["cg_preconditioner_type"] if k in params]
        if iter_keys_passed and eng is not None \
                and getattr(eng, "matrix_inversion_method", None) != "iterative":
            from .utils.log import Log
            Log.warning(f"Parameters {iter_keys_passed} have no effect with "
                    "matrix_inversion_method="
                    f"'{getattr(eng, 'matrix_inversion_method', 'cholesky')}'"
                    " (they configure the iterative CG/Lanczos methods)")
        rebuild = getattr(eng, "_build_jitted_iterative", None) \
            or (getattr(eng, "_build_jitted", None)
                if type(eng).__name__ in ("FSAIterativeGaussianEngine",
                                          "FSVAIterativeGaussianEngine")
                else None)
        if eng is not None \
                and getattr(eng, "matrix_inversion_method", None) == "iterative" \
                and rebuild is not None and iter_keys_passed:
            changed = False
            for k, attr in cg_keys.items():
                if k in params and getattr(eng, attr, None) != params[k]:
                    setattr(eng, attr,
                            type(getattr(eng, attr))(params[k]))
                    changed = True
            if "cg_preconditioner_type" in params \
                    and hasattr(eng, "cg_preconditioner_type"):
                pc = {"Sigma_inv_plus_BtWB": "vadu",
                      "piv_chol_on_Sigma_nn": "pivoted_cholesky",
                      "jacobi": "diagonal",
                      "predictive_process_plus_diagonal": "fitc"}.get(
                          params["cg_preconditioner_type"],
                          params["cg_preconditioner_type"])
                if pc != eng.cg_preconditioner_type:
                    eng.cg_preconditioner_type = pc
                    changed = True
            if changed:
                rebuild()
        return self

    set_optim_coef_params = set_optim_params

    # ------------------------------------------------------------------
    def _default_init_cov_pars(self, y, optimizer_cov="lbfgs"):
        """Data-driven initial values (re_model_template.h:4814 FindInitCovPar)."""
        y = np.asarray(y, dtype=np.float64)
        if self.likelihood == "gaussian":
            var = float(np.var(y, ddof=1))
            pars = [var / 2.0]
            init_marg_var = (var / 2.0) / len(self.components)
        else:
            pars = []
            init_marg_var = (0.1 if optimizer_cov == "nelder_mead" else 1.0) \
                / len(self.components)
        for comp in self.components:
            pars.append(init_marg_var)
            if comp.kind == "gp":
                pars.extend(_init_ranges(comp))
        if getattr(self._engine, "num_sets_re", 1) == 2:
            # second (log-variance) set: variance from the mean-zero
            # log-normal moment equation (e^s2 - 1) e^s2 = marg_var / 2,
            # ranges reused (FindInitCovPar, re_model_template.h:4915-4932)
            pars2 = []
            off = 0
            for comp in self.components:
                v = pars[off]
                pars2.append(
                    np.log((1.0 + np.sqrt(1.0 + 2.0 * v)) / 2.0) / 2.0)
                npar = 1 + (len(_init_ranges(comp)) if comp.kind == "gp"
                            else 0)
                pars2.extend(pars[off + 1: off + npar])
                off += npar
            pars = list(pars) + pars2
        return np.asarray(pars)

    # ------------------------------------------------------------------
    def reset_fit(self):
        """Discard the fitted state so the next ``fit`` starts fresh.

        The model becomes as-if-never-fitted (estimates, stored y/X, and
        summary state are cleared) while every compiled engine executable
        stays cached — a subsequent ``fit`` repeats the full optimization
        without re-compiling. The reference has no direct analogue (each
        ``GPModel`` there is fitted once); here repeated timed/fresh fits
        of one instance are a product workflow (benchmarks, CV loops).
        """
        self._fit_result = None
        self.y = None
        self.X = None
        self.model_has_been_fitted = False
        return self

    def fit(self, y, X=None, params=None, offset=None):
        from .utils.timer import annotate
        with annotate("GPModel.fit"):
            return self._fit_inner(y, X=X, params=params, offset=offset)

    def _fit_inner(self, y, X=None, params=None, offset=None):
        self.set_optim_params(params or {})
        self.X = None if X is None else np.asarray(X, dtype=np.float64)
        cfg = self.params
        if self.likelihood != "gaussian":
            y = self._likelihood_obj.check_y(y)
            self.y = y
            if cfg.init_cov_pars is None:
                cfg = OptimConfig(**{**cfg.__dict__, "init_cov_pars":
                                     self._default_init_cov_pars(y, cfg.optimizer_cov)})
            self._fit_result = optimize_laplace(self._engine, y, cfg, X=self.X,
                                                offset=offset)
        else:
            y = np.asarray(y, dtype=np.float64)
            if offset is not None:
                y = y - np.asarray(offset, dtype=np.float64)
            self.y = y
            if cfg.init_cov_pars is None:
                cfg = OptimConfig(**{**cfg.__dict__, "init_cov_pars":
                                     self._default_init_cov_pars(y, cfg.optimizer_cov)})
            y_fit, X_fit = y, self.X
            if self._vecchia:
                # the Vecchia engine's jitted graphs expect ordering-permuted data
                y_fit = y[self._engine.perm]
                X_fit = None if self.X is None else self.X[self._engine.perm]
            aniso_vecchia = (
                self._vecchia
                and hasattr(self._engine, "redetermine_neighbors")
                and not self._engine.comp.cov_fn.is_isotropic
                and not getattr(self._engine.comp.cov_fn, "needs_coords",
                                False))
            if not aniso_vecchia:
                self._fit_result = optimize_gaussian(self._engine, y_fit,
                                                     cfg, X=X_fit)
            else:
                # anisotropic (ARD/space-time) kernels: interleave chunks of
                # optimization with neighbor re-determination in the
                # range-scaled coordinate space, warm-starting each chunk
                # (UpdateNearestNeighbors, Vecchia_utils.h:354;
                # re_model_template.h:5105)
                budget = cfg.maxit if cfg.maxit else cfg.max_iter
                chunk = max(10, budget // 10)
                total_it = 0
                r = None
                while budget > 0:
                    step_cfg = OptimConfig(**{**cfg.__dict__,
                                              "max_iter": min(chunk, budget)})
                    if r is not None:
                        step_cfg.init_cov_pars = r.cov_pars
                        if r.coef is not None:
                            step_cfg.init_coef = r.coef
                    r = optimize_gaussian(self._engine, y_fit, step_cfg,
                                          X=X_fit)
                    total_it += r.num_it
                    budget -= min(chunk, budget)
                    t_fit = self._engine.transform_pars(r.cov_pars)
                    changed = self._engine.redetermine_neighbors(t_fit[2:])
                    if not changed and r.num_it < min(chunk, budget + chunk):
                        break
                r.num_it = total_it
                self._fit_result = r
        # estimation overwrites the stored cov_pars/coef/aux (re_model.cpp)
        self._coef_override = None
        self._cov_pars_override = None
        self._aux_override = None
        self.model_has_been_fitted = True
        return self

    def set_prediction_data(self, vecchia_pred_type=None, num_neighbors_pred=None,
                            cg_delta_conv_pred=None, nsim_var_pred=None,
                            rank_pred_approx_matrix_lanczos=None):
        """Prediction settings (basic.py GPModel.set_prediction_data)."""
        if vecchia_pred_type is not None:
            self.vecchia_pred_type = vecchia_pred_type
        if num_neighbors_pred is not None:
            self.num_neighbors_pred = num_neighbors_pred
        return self

    def neg_log_likelihood(self, cov_pars=None, y=None, fixed_effects=None, aux_pars=None):
        cov_pars = self._check_cov_pars(cov_pars)
        if self.likelihood != "gaussian":
            y = self._likelihood_obj.check_y(y)
            if aux_pars is None:
                aux_pars = self._aux_override
            if aux_pars is None and self._fit_result is not None:
                aux_pars = self._fit_result.aux_pars
            return self._engine.neg_log_likelihood(
                cov_pars, y, aux_pars=aux_pars, fixed_effects=fixed_effects)
        y = np.asarray(y, dtype=np.float64)
        if fixed_effects is not None:
            y = y - np.asarray(fixed_effects, dtype=np.float64)
        return self._engine.neg_log_likelihood(cov_pars, y)

    def predict_training_data_random_effects(self, predict_var=False,
                                              offset=None):
        """Predict ("estimate") the random effects AT the training points,
        one column per random-effect component (basic.py:6780
        predict_training_data_random_effects; re_model_template.h:4420).

        Returns a pandas DataFrame (n, num_comps) of posterior means — plus
        '<name>_var' columns when predict_var=True (Gaussian dense/grouped
        engines only). For random-coefficient components the column holds the
        latent coefficient (the slope itself), matching the reference.

        offset: fixed effects F for the training data; required when the
        model is driven by the GPBoost algorithm (the Booster passes it).
        """
        import pandas as pd
        r = self._require_fit()
        eng = self._engine
        if not hasattr(eng, "training_re"):
            raise ValueError(
                "predict_training_data_random_effects is not implemented for "
                f"engine {type(eng).__name__}; use predict() instead")
        if self.likelihood == "gaussian":
            resid = np.asarray(self.y, dtype=np.float64).copy()
            if offset is not None:
                resid = resid - np.asarray(offset, dtype=np.float64)
            if r.coef is not None and self.X is not None:
                resid = resid - self.X @ r.coef
            means, vs = eng.training_re(r.cov_pars, resid,
                                        predict_var=predict_var)
        else:
            u = np.log(eng.transform_pars(r.cov_pars))
            if eng.num_aux:
                aux_int = self._likelihood_obj.aux_to_internal(r.aux_pars)
                u = np.concatenate([u, np.log(np.asarray(aux_int,
                                                         dtype=np.float64))])
            a_state = r.mode_state
            if offset is not None or a_state is None:
                nsets = getattr(eng, "num_sets_fe", 1)
                F = np.zeros(self.num_data * nsets)
                if offset is not None:
                    offs = np.asarray(offset, dtype=np.float64)
                    F[: len(offs)] += offs
                if r.coef is not None and self.X is not None:
                    k = self.X.shape[1]
                    F[: self.num_data] += self.X @ r.coef[:k]
                    if nsets == 2:
                        F[self.num_data:] += self.X @ r.coef[k:]
                _, a_state = eng.laplace_nll(
                    u, jnp.asarray(self.y), jnp.asarray(F),
                    a_state if a_state is not None else eng.zero_mode())
            means, vs = eng.training_re(u, a_state, predict_var=predict_var)
        names = []
        for i, comp in enumerate(self.components):
            kind = "Group" if comp.kind == "grouped" else "GP"
            tag = "_rand_coef" if comp.z is not None else ""
            names.append(f"{kind}_{i + 1}{tag}")
        names = names[: means.shape[1]]
        df = pd.DataFrame(means, columns=names)
        if predict_var and vs is not None:
            for j, nm in enumerate(names):
                df[nm + "_var"] = vs[:, j]
        return df

    def get_aux_pars(self):
        r = self._require_fit()
        return None if r.aux_pars is None else r.aux_pars.copy()

    def get_num_aux_pars(self):
        return self._engine.num_aux if self.likelihood != "gaussian" else 0

    def _check_cov_pars(self, cov_pars):
        cov_pars = np.asarray(cov_pars, dtype=np.float64)
        if cov_pars.shape[-1] != self.num_cov_par:
            raise ValueError(
                f"cov_pars has {cov_pars.shape[-1]} entries but the model has "
                f"{self.num_cov_par} covariance parameters "
                f"({', '.join(self._par_names)})")
        return cov_pars

    # ------------------------------------------------------------------
    def get_cov_pars(self, format_pandas=False, std_err=None):
        r = self._require_fit()
        if (std_err if std_err is not None else self.params.std_dev) and \
                r.std_dev_cov_pars is not None:
            return np.vstack([r.cov_pars, r.std_dev_cov_pars])
        return r.cov_pars.copy()

    def get_coef(self, std_err=None):
        r = self._require_fit()
        if std_err and r.std_dev_coef is not None:
            return np.vstack([r.coef, r.std_dev_coef])
        return r.coef

    def get_num_optim_iter(self):
        return self._require_fit().num_it

    def get_num_mode_finding_steps(self):
        """Newton iterations of the last Laplace mode finding
        (re_model.h:153 GetNumModeFindingSteps)."""
        n = getattr(self._engine, "last_num_mode_it", None)
        if n is None:
            raise ValueError("no mode finding has run (Gaussian likelihood "
                             "or model not evaluated yet)")
        return int(n)

    def get_total_num_mode_finding_steps(self):
        return int(getattr(self._engine, "total_num_mode_it", 0))

    def get_num_cg_steps(self):
        """CG iterations of the last iterative solve (re_model.h:145
        GetNumCGSteps; matrix_inversion_method='iterative' engines)."""
        n = getattr(self._engine, "last_num_cg_it", None)
        if n is None:
            raise ValueError("no CG solve has run "
                             "(matrix_inversion_method != 'iterative')")
        return int(n)

    def get_total_num_cg_steps(self):
        """Cumulative CG iterations across all iterative solves of this
        model's lifetime (preconditioner-quality diagnostics)."""
        return int(getattr(self._engine, "total_num_cg_it", 0))

    def get_current_neg_log_likelihood(self):
        return self._require_fit().neg_log_likelihood

    def get_cov_par_names(self):
        return list(self._par_names)

    def _require_fit(self):
        if self._fit_result is None:
            raise RuntimeError("Model has not been fitted")
        return self._fit_result

    # ------------------------------------------------------------------
    def predict(self, y=None, group_data_pred=None, group_rand_coef_data_pred=None,
                gp_coords_pred=None, gp_rand_coef_data_pred=None,
                cluster_ids_pred=None, X_pred=None,
                predict_cov_mat=False, predict_var=False, cov_pars=None,
                predict_response=True, offset=None, offset_pred=None,
                fixed_effects=None, fixed_effects_pred=None,
                sample_posterior=False, sample_prior=False,
                num_post_samples=100, num_prior_samples=None, seed=None):
        """Posterior predictions (basic.py:6187 GPModel.predict).

        sample_posterior / sample_prior draw joint samples of the latent
        predictive distribution at the prediction points — for non-Gaussian
        likelihoods from the Laplace-approximated posterior
        (Sample_Posterior_LaplaceApprox_*, likelihoods.h:8784-9207):
        'posterior_samples' / 'prior_samples' of shape (n_pred, num_samples)."""
        if sample_prior:
            n_s = num_prior_samples or num_post_samples
            pd = self._build_pred_data(group_data_pred,
                                       group_rand_coef_data_pred,
                                       gp_coords_pred, gp_rand_coef_data_pred,
                                       cluster_ids_pred)
            cov_pars_s = np.asarray(
                cov_pars if cov_pars is not None
                else self._require_fit().cov_pars, dtype=np.float64)
            from .models.gaussian_gp import assemble_pred_covs
            t = self._engine.transform_pars(cov_pars_s)
            _, K_pred = assemble_pred_covs(
                self.components, self._engine.par_offsets,
                [cov_pars_s[1 + off] for off in self._engine.par_offsets],
                jnp.asarray(np.log(t[1:])), pd, self.num_data, jnp.float64)
            K = np.asarray(K_pred)
            if predict_response and self.likelihood == "gaussian":
                K = K + cov_pars_s[0] * np.eye(len(K))
            rng = np.random.RandomState(seed)
            L = np.linalg.cholesky(K + 1e-10 * np.eye(len(K)))
            samples = L @ rng.standard_normal((len(K), n_s))
            return {"mu": np.zeros(len(K)), "cov": K, "var": np.diagonal(K),
                    "prior_samples": samples}
        if sample_posterior:
            out = self.predict(
                y=y, group_data_pred=group_data_pred,
                group_rand_coef_data_pred=group_rand_coef_data_pred,
                gp_coords_pred=gp_coords_pred,
                gp_rand_coef_data_pred=gp_rand_coef_data_pred,
                cluster_ids_pred=cluster_ids_pred, X_pred=X_pred,
                predict_cov_mat=True, cov_pars=cov_pars,
                predict_response=predict_response, offset=offset,
                offset_pred=offset_pred, fixed_effects=fixed_effects,
                fixed_effects_pred=fixed_effects_pred)
            rng = np.random.RandomState(seed)
            cov = out["cov"]
            L = np.linalg.cholesky(cov + 1e-10 * np.eye(len(cov)))
            out["posterior_samples"] = out["mu"][:, None] \
                + L @ rng.standard_normal((len(cov), num_post_samples))
            if predict_var and out.get("var") is None:
                out["var"] = np.diagonal(cov).copy()
            if not predict_cov_mat:
                out["cov"] = None
            return out
        if cov_pars is None:
            cov_pars = self._cov_pars_override \
                if self._cov_pars_override is not None \
                else self._require_fit().cov_pars
        cov_pars = self._check_cov_pars(cov_pars)
        if y is None:
            if self.y is None:
                raise ValueError("y not provided and model not fitted with y")
            y = self.y
        y = np.asarray(y, dtype=np.float64)

        if self.likelihood != "gaussian":
            return self._predict_non_gaussian(
                y, group_data_pred, group_rand_coef_data_pred, gp_coords_pred,
                gp_rand_coef_data_pred, cluster_ids_pred, X_pred,
                predict_cov_mat, predict_var, cov_pars, predict_response,
                offset, offset_pred, fixed_effects, fixed_effects_pred)

        resid = y.copy()
        if fixed_effects is not None:
            resid = resid - np.asarray(fixed_effects, dtype=np.float64)
        if offset is not None:
            resid = resid - np.asarray(offset, dtype=np.float64)
        coef = self._coef_override
        if coef is None and self._fit_result is not None \
                and self._fit_result.coef is not None:
            coef = self._fit_result.coef
        if coef is not None and self.X is not None:
            resid = resid - self.X @ coef

        pred_data = self._build_pred_data(
            group_data_pred, group_rand_coef_data_pred, gp_coords_pred,
            gp_rand_coef_data_pred, cluster_ids_pred)

        extra = {}
        if self._vecchia:
            extra = dict(vecchia_pred_type=self.vecchia_pred_type,
                         num_neighbors_pred=self.num_neighbors_pred)
        out = self._engine.predict(
            cov_pars, resid, pred_data,
            predict_var=predict_var, predict_cov_mat=predict_cov_mat,
            predict_response=(predict_response and self.likelihood == "gaussian"),
            **extra)

        if coef is not None and X_pred is not None:
            out["mu"] = out["mu"] + np.asarray(X_pred, dtype=np.float64) @ coef
        if offset_pred is not None:
            out["mu"] = out["mu"] + np.asarray(offset_pred, dtype=np.float64)
        if fixed_effects_pred is not None:
            out["mu"] = out["mu"] + np.asarray(fixed_effects_pred, dtype=np.float64)
        for k in ("cov", "var"):
            if k not in out:
                out[k] = None
        return out

    def _predict_non_gaussian(self, y, group_data_pred, group_rand_coef_data_pred,
                              gp_coords_pred, gp_rand_coef_data_pred,
                              cluster_ids_pred, X_pred, predict_cov_mat,
                              predict_var, cov_pars, predict_response,
                              offset, offset_pred, fixed_effects,
                              fixed_effects_pred):
        n = self.num_data
        nsets = getattr(self._engine, "num_sets_fe", 1)
        F = np.zeros(n * nsets)
        if offset is not None:
            offs = np.asarray(offset, dtype=np.float64)
            F[: len(offs)] += offs
        if fixed_effects is not None:
            fe = np.asarray(fixed_effects, dtype=np.float64)
            F[: len(fe)] += fe
        coef = self._coef_override
        aux_pars = self._aux_override
        a_init = None
        if self._fit_result is not None:
            if coef is None:
                coef = self._fit_result.coef
            if aux_pars is None:
                aux_pars = self._fit_result.aux_pars
            a_init = self._fit_result.mode_state
        if coef is not None and self.X is not None:
            k = self.X.shape[1]
            F[:n] += self.X @ coef[:k]
            if nsets == 2:
                F[n:] += self.X @ coef[k:]
        pred_data = self._build_pred_data(
            group_data_pred, group_rand_coef_data_pred, gp_coords_pred,
            gp_rand_coef_data_pred, cluster_ids_pred)
        # the predicted latent location parameter includes the fixed effects
        # (basic.py:3701-3770: F enters both latent and response predictions)
        n_pred = pred_data["n_pred"]
        F_pred = np.zeros(n_pred * nsets)
        if offset_pred is not None:
            op = np.asarray(offset_pred, dtype=np.float64)
            F_pred[: len(op)] += op
        if fixed_effects_pred is not None:
            fep = np.asarray(fixed_effects_pred, dtype=np.float64)
            F_pred[: len(fep)] += fep
        if coef is not None and X_pred is not None:
            Xp = np.asarray(X_pred, dtype=np.float64)
            k = Xp.shape[1]
            F_pred[:n_pred] += Xp @ coef[:k]
            if nsets == 2:
                F_pred[n_pred:] += Xp @ coef[k:]
        out = self._engine.predict(
            cov_pars, aux_pars, y, F, pred_data, a_init=a_init,
            predict_var=predict_var, predict_cov_mat=predict_cov_mat,
            predict_response=predict_response, F_pred=F_pred)
        for k in ("cov", "var"):
            if k not in out:
                out[k] = None
        return out

    def _build_pred_data(self, group_data_pred, group_rand_coef_data_pred,
                         gp_coords_pred, gp_rand_coef_data_pred, cluster_ids_pred):
        comps = []
        n_pred = None
        ig = 0
        igrc = 0
        igp_rc = 0
        for comp in self.components:
            pd = {}
            if comp.kind == "grouped":
                if group_data_pred is None:
                    raise ValueError("group_data_pred not provided")
                gdp = np.asarray(group_data_pred)
                if gdp.ndim == 1:
                    gdp = gdp[:, None]
                if comp.z is None:
                    col = gdp[:, ig]
                    ig += 1
                    z_pred = None
                else:
                    idx = int(self.ind_effect_group_rand_coef[igrc])
                    col = gdp[:, idx]
                    z_pred = np.asarray(group_rand_coef_data_pred, dtype=np.float64)
                    if z_pred.ndim == 2:
                        z_pred = z_pred[:, igrc]
                    igrc += 1
                codes_pred = comp.codes_for_prediction(col, cluster_ids_pred)
                n_pred = len(codes_pred)
                if self._use_woodbury or getattr(self._engine,
                                                 "wants_codes_pred", False):
                    pd["codes_pred"] = codes_pred
                    pd["z_pred"] = z_pred
                else:
                    cross = (comp.group_codes[:, None]
                             == codes_pred[None, :]).astype(float)
                    predW = (codes_pred[:, None]
                             == codes_pred[None, :]).astype(float)
                    if z_pred is not None:
                        cross = cross * np.outer(comp.z, z_pred)
                        predW = predW * np.outer(z_pred, z_pred)
                    pd["cross_W"] = cross
                    pd["pred_W"] = predW
            else:
                if gp_coords_pred is None:
                    raise ValueError("gp_coords_pred not provided")
                cp = np.asarray(gp_coords_pred, dtype=np.float64)
                if cp.ndim == 1:
                    cp = cp[:, None]
                if self.cov_function_name.startswith("ar1_mf_"):
                    bad = cp[~np.isin(cp[:, -1], (0.0, 1.0)), -1]
                    if len(bad):
                        raise ValueError(
                            "The last column of gp_coords_pred must contain "
                            "only 0 (low fidelity) and 1 (high fidelity), "
                            f"found {bad[0]:g}")
                pd["coords_pred"] = cp
                n_pred = len(cp)
                if comp.z is not None:
                    z_pred = np.asarray(gp_rand_coef_data_pred, dtype=np.float64)
                    if z_pred.ndim == 2:
                        z_pred = z_pred[:, igp_rc]
                    igp_rc += 1
                    pd["cross_W"] = np.outer(comp.z, z_pred)
                    pd["pred_W"] = np.outer(z_pred, z_pred)
                else:
                    pd["cross_W"] = None
                    pd["pred_W"] = None
            comps.append(pd)
        pred_data = {"comps": comps, "n_pred": n_pred,
                     "cross_cluster_mask": None, "pred_cluster_mask": None}
        if self.cluster_ids is not None:
            if cluster_ids_pred is None:
                raise ValueError("cluster_ids_pred not provided")
            cip = np.asarray(cluster_ids_pred)
            pred_data["cross_cluster_mask"] = (
                self.cluster_ids[:, None] == cip[None, :]).astype(float)
            pred_data["pred_cluster_mask"] = (
                cip[:, None] == cip[None, :]).astype(float)
        return pred_data

    # ------------------------------------------------------------------
    def summary(self):
        from .utils.log import _emit, _state
        r = self._require_fit()
        out = ["Covariance parameters (random effects):"]
        names = self._par_names
        if r.std_dev_cov_pars is not None:
            for n_, p, s in zip(names, r.cov_pars, r.std_dev_cov_pars):
                out.append(f"  {n_}: {p:.6g} (std dev {s:.4g})")
        else:
            for n_, p in zip(names, r.cov_pars):
                out.append(f"  {n_}: {p:.6g}")
        if getattr(r, "aux_pars", None) is not None \
                and self._likelihood_obj is not None \
                and self._likelihood_obj.num_aux:
            out.append("Additional parameters (likelihood):")
            for n_, p in zip(self._likelihood_obj.aux_names, r.aux_pars):
                out.append(f"  {n_}: {p:.6g}")
        if r.coef is not None:
            out.append("Linear regression coefficients:")
            for i, b in enumerate(r.coef):
                out.append(f"  Covariate_{i + 1}: {b:.6g}")
        out.append(f"Negative log-likelihood: {r.neg_log_likelihood:.6f}")
        out.append(f"Number of optimization iterations: {r.num_it}")
        _emit("\n".join(out), _state["info_method"])
        return self

    # ------------------------------------------------------------------
    def model_to_dict(self, include_response_data=True):
        """Full state dict (basic.py:6927 model_to_dict schema): covariance /
        aux / coefficient estimates with std errors plus every model-defining
        constructor argument, so a reloaded model predicts under the same
        settings it was fit with."""
        r = self._require_fit()
        d = {
            "likelihood": self.likelihood,
            "cov_function": self.cov_function_name,
            "cov_fct_shape": self.cov_fct_shape,
            "gp_approx": self.gp_approx,
            "cov_pars": r.cov_pars.tolist(),
            "num_optim_iter": r.num_it,
            "neg_log_likelihood": r.neg_log_likelihood,
            "model_has_been_fitted": self.model_has_been_fitted,
            "matrix_inversion_method": self.matrix_inversion_method,
            "seed": self.seed,
        }
        for attr in ("num_neighbors", "vecchia_ordering", "num_ind_points",
                     "ind_points_selection", "cov_fct_taper_range",
                     "cov_fct_taper_shape", "likelihood_additional_param"):
            v = getattr(self, attr, None)
            if v is not None:
                d[attr] = v
        d["vecchia_pred_type"] = self.vecchia_pred_type
        if self.num_neighbors_pred is not None:
            d["num_neighbors_pred"] = self.num_neighbors_pred
        if r.coef is not None:
            d["coefs"] = r.coef.tolist()
        if getattr(r, "aux_pars", None) is not None:
            d["aux_pars"] = np.asarray(r.aux_pars).tolist()
        if getattr(r, "std_dev_cov_pars", None) is not None:
            d["std_dev_cov_pars"] = np.asarray(r.std_dev_cov_pars).tolist()
        if getattr(r, "std_dev_coef", None) is not None:
            d["std_dev_coef"] = np.asarray(r.std_dev_coef).tolist()
        if include_response_data and self.y is not None:
            d["y"] = np.asarray(self.y).tolist()
        if self.X is not None:
            d["X"] = np.asarray(self.X).tolist()
        if self.gp_coords is not None:
            d["gp_coords"] = self.gp_coords.tolist()
        if self.group_data is not None:
            d["group_data"] = self.group_data.tolist()
        if self.group_rand_coef_data is not None:
            d["group_rand_coef_data"] = self.group_rand_coef_data.tolist()
            d["ind_effect_group_rand_coef"] = (
                np.asarray(self.ind_effect_group_rand_coef) + 1).tolist()
        if self.gp_rand_coef_data is not None:
            d["gp_rand_coef_data"] = self.gp_rand_coef_data.tolist()
        if self.cluster_ids is not None:
            d["cluster_ids"] = self.cluster_ids.tolist()
        if self.weights is not None:
            d["weights"] = np.asarray(self.weights).tolist()
        return d

    def save_model(self, filename):
        import json
        with open(filename, "w") as f:
            json.dump(self.model_to_dict(), f)
        return self

    def _init_from_dict(self, model_file, model_dict):
        import json
        if model_dict is None:
            with open(model_file) as f:
                model_dict = json.load(f)
        d = model_dict
        kw = dict(
            likelihood=d["likelihood"],
            gp_coords=None if d.get("gp_coords") is None else np.asarray(d["gp_coords"]),
            group_data=None if d.get("group_data") is None else np.asarray(d["group_data"]),
            cov_function=d["cov_function"],
            cov_fct_shape=d["cov_fct_shape"],
            gp_approx=d.get("gp_approx", "none"),
            cluster_ids=None if d.get("cluster_ids") is None else np.asarray(d["cluster_ids"]),
            matrix_inversion_method=d.get("matrix_inversion_method",
                                          "cholesky"),
            seed=d.get("seed", 0),
        )
        for attr in ("num_neighbors", "vecchia_ordering", "num_ind_points",
                     "ind_points_selection", "cov_fct_taper_range",
                     "cov_fct_taper_shape", "likelihood_additional_param"):
            if d.get(attr) is not None:
                kw[attr] = d[attr]
        if d.get("group_rand_coef_data") is not None:
            kw["group_rand_coef_data"] = np.asarray(d["group_rand_coef_data"])
            kw["ind_effect_group_rand_coef"] = np.asarray(
                d["ind_effect_group_rand_coef"])
        if d.get("gp_rand_coef_data") is not None:
            kw["gp_rand_coef_data"] = np.asarray(d["gp_rand_coef_data"])
        if d.get("weights") is not None:
            kw["weights"] = np.asarray(d["weights"])
        self.__init__(**kw)
        if d.get("vecchia_pred_type"):
            self.vecchia_pred_type = d["vecchia_pred_type"]
        if d.get("num_neighbors_pred") is not None:
            self.num_neighbors_pred = d["num_neighbors_pred"]
        r = OptimResult(cov_pars=np.asarray(d["cov_pars"]),
                        num_it=d.get("num_optim_iter", 0),
                        neg_log_likelihood=d.get("neg_log_likelihood", np.nan),
                        converged=True)
        if d.get("coefs") is not None:
            r.coef = np.asarray(d["coefs"])
        if d.get("aux_pars") is not None:
            r.aux_pars = np.asarray(d["aux_pars"])
        if d.get("std_dev_cov_pars") is not None:
            r.std_dev_cov_pars = np.asarray(d["std_dev_cov_pars"])
        if d.get("std_dev_coef") is not None:
            r.std_dev_coef = np.asarray(d["std_dev_coef"])
        self._fit_result = r
        self.model_has_been_fitted = d.get("model_has_been_fitted", True)
        if d.get("y") is not None:
            self.y = np.asarray(d["y"])
        if d.get("X") is not None:
            self.X = np.asarray(d["X"])


def _gp_cov_par_names(cov_function, dim):
    """Covariance-parameter names for one GP component, mirroring the
    reference (basic.py:5057-5076)."""
    if cov_function.startswith("ar1_mf_"):
        base = _gp_cov_par_names(cov_function[len("ar1_mf_"):], dim - 1)
        return (["low_" + nm for nm in base]
                + ["discrepancy_" + nm for nm in base] + ["rho"])
    if cov_function == "space_time_gneiting":
        return ["sigma2", "a", "c", "alpha", "nu", "beta", "delta"]
    if cov_function == "matern_space_time":
        return ["GP_var", "GP_range_time", "GP_range_space"]
    if cov_function in ("matern_ard", "gaussian_ard"):
        return ["GP_var"] + [f"GP_range_{i + 1}" for i in range(dim)]
    if cov_function in ("wendland", "linear"):
        return ["GP_var"]
    if cov_function == "matern_estimate_shape":
        return ["GP_var", "GP_range", "GP_smoothness"]
    if cov_function == "matern_ard_estimate_shape":
        return ["GP_var"] + [f"GP_range_{i + 1}" for i in range(dim)] \
            + ["GP_smoothness"]
    if cov_function in ("hurst", "hurst_ard"):
        names = ["GP_var", "H"]
        if cov_function == "hurst_ard":
            names += [f"GP_range_{i + 1}" for i in range(1, dim)]
        return names
    return ["GP_var", "GP_range"]


def _init_ranges(comp):
    """Initial transformed->original ranges via the median-distance rule
    (cov_fcts.h:1599-1668 FindInitCovPar)."""
    cf0 = comp.cov_fn
    if getattr(cf0, "cov_fct_type", "").startswith("ar1_mf_"):
        # compose the base rule on the spatial coords for both levels
        # (cov_fcts.h InitializeAR1Multifidelity + base FindInitCovPar);
        # discrepancy variance starts at 1, rho at 0 (transformed 1)
        from .models.components import GPComponent
        base_comp = GPComponent(comp.coords[:, :-1], cf0.base_low)
        base_init = _init_ranges(base_comp)
        return base_init + [1.0] + base_init + [0.0]
    coords = comp.coords
    n = len(coords)
    if n > 1000:
        rng = np.random.RandomState(0)
        idx = rng.choice(n, 1000, replace=False)
        coords = coords[idx]
    cf = comp.cov_fn
    t = cf.cov_fct_type

    def med(x1):
        iu = np.triu_indices(len(x1), k=1)
        d = np.sqrt(((x1[:, None, :] - x1[None, :, :]) ** 2).sum(-1))[iu]
        m = np.median(d)
        return m if m > 0 else np.mean(d)

    if t in ("exponential", "matern", "gaussian", "powered_exponential", "wendland"):
        md = med(coords)
        if t in ("exponential",) or (t == "matern" and cf.shape <= 1.0):
            alpha = 2.0 * 3.0 / md
        elif t == "matern" and cf.shape <= 2.0:
            alpha = 2.0 * 4.7 / md
        elif t == "matern":
            alpha = 2.0 * 5.9 / md
        elif t == "gaussian":
            alpha = 3.0 / (md / 2.0) ** 2
        elif t == "powered_exponential":
            alpha = 3.0 / (md / 2.0) ** cf.shape
        else:
            return []
        return list(np.atleast_1d(cf.range_from_transformed(alpha)))
    if t in ("matern_ard", "gaussian_ard"):
        alphas = []
        for ic in range(coords.shape[1]):
            dc = np.abs(coords[:, ic][:, None] - coords[:, ic][None, :])
            iu = np.triu_indices(len(coords), k=1)
            m = np.median(dc[iu])
            if m <= 0:
                m = np.mean(dc[iu])
            if t == "matern_ard":
                c = 3.0 if cf.shape <= 1.0 else (4.7 if cf.shape <= 2.0 else 5.9)
                alphas.append(2.0 * c / m)
            else:
                alphas.append(3.0 / (m / 2.0) ** 2)
        return list(np.atleast_1d(cf.range_from_transformed(np.asarray(alphas))))
    if t in ("matern_space_time", "space_time_gneiting"):
        dt = np.abs(coords[:, 0][:, None] - coords[:, 0][None, :])
        iu = np.triu_indices(len(coords), k=1)
        md_t = np.median(dt[iu]) or np.mean(dt[iu])
        sp = coords[:, 1:]
        md_s = med(sp)
        if t == "space_time_gneiting":
            # cov_fcts.h:1640-1648: a, c, alpha, nu, beta, delta
            ds = coords.shape[1] - 1
            a = (20.0 ** (2.0 / ds) - 1.0) / (md_t * md_t) * 4.0
            return [a, 2.0 * 4.7 / md_s, 1.0, 1.5, 1.0, 1.0]
        c = 3.0 if cf.shape <= 1.0 else (4.7 if cf.shape <= 2.0 else 5.9)
        alphas = np.asarray([2.0 * c / md_t, 2.0 * c / md_s])
        return list(np.atleast_1d(cf.range_from_transformed(alphas)))
    if t == "matern_estimate_shape":
        # cov_fcts.h:1610-1613: range on the original scale + shape 1.5
        return [med(coords) * math.sqrt(3.0) / 2.0 / 4.7, 1.5]
    if t == "matern_ard_estimate_shape":
        out = []
        iu = np.triu_indices(len(coords), k=1)
        for ic in range(coords.shape[1]):
            dc = np.abs(coords[:, ic][:, None] - coords[:, ic][None, :])[iu]
            m = np.median(dc) or np.mean(dc)
            out.append(m * math.sqrt(3.0) / 2.0 / 4.7)
        return out + [1.5]
    if t in ("hurst", "hurst_ard"):
        # cov_fcts.h:1671-1678: H = 0.5 (Brownian motion), unit ranges
        out = [0.5]
        if t == "hurst_ard":
            out += [1.0] * (coords.shape[1] - 1)
        return out
    if t == "linear":
        return []
    raise AssertionError(t)
