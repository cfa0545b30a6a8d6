"""Constant-lifting jit: never bake large arrays into compiled graphs.

Problem this solves: ``jax.jit`` embeds closure-captured device/numpy arrays
into the lowered HLO as literal constants. The engines here close over large
per-row data (Vecchia neighbor indices/distances of shape (n, m, m), grouped
indices, binned feature matrices, ...), so a naive jit of an engine method
serializes hundreds of MB of constants into the executable. On this target
(a TPU reached through a remote-runtime tunnel, single-core host) that makes
compilation pathological: a trivial graph with ONE 32 MB constant takes
>5 minutes to compile, while the identical graph with the array passed as an
argument compiles in ~3 s (measured; see VERDICT round 4's 777 MB executable
/ 9-minute cold compile for the n=100k fit).

``lifted_jit(fun)`` is a drop-in replacement for ``jax.jit(fun)``:

  1. on first call it traces ``fun`` to a jaxpr (``jax.make_jaxpr``), which
     collects every closure-captured array into the jaxpr's ``consts``;
  2. it then jits an ``eval_jaxpr`` wrapper that takes those consts as
     ordinary ARGUMENTS, so the compiled module contains no big literals;
  3. the consts are converted to device arrays once and re-passed on every
     call (no per-call host->device transfer).

The cache key is the (pytree structure, shapes/dtypes) of the arguments —
the same specialization rule as jit. Like jit, a new closure (e.g. an engine
rebuilding its functions after neighbor re-determination) must be wrapped
anew so fresh constants are captured; all engines already follow that
discipline via their ``_build_jitted`` rebuilds.

This replaces the reference's approach of keeping data in C++ object state
(re_model_template.h member matrices): here the state lives in device arrays
threaded through compiled functions as arguments.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import tree_util


def _aval_key(x):
    return (jnp.shape(x), str(jnp.result_type(x)))


class _LiftedJit:
    __slots__ = ("_fun", "_cache", "_static_argnums", "__wrapped__")

    def __init__(self, fun, static_argnums=()):
        self._fun = fun
        self._cache = {}
        self._static_argnums = tuple(static_argnums)
        self.__wrapped__ = fun

    def __call__(self, *args):
        if self._static_argnums:
            static = tuple(args[i] for i in self._static_argnums)
            dyn = [a for i, a in enumerate(args)
                   if i not in self._static_argnums]
            fun = _reorder_static(self._fun, self._static_argnums, static)
        else:
            static = ()
            dyn = list(args)
            fun = self._fun
        flat, in_tree = tree_util.tree_flatten(tuple(dyn))
        key = (static, in_tree, tuple(_aval_key(x) for x in flat))
        entry = self._cache.get(key)
        if entry is None:
            closed, out_shape = jax.make_jaxpr(
                fun, return_shape=True)(*dyn)
            out_tree = tree_util.tree_structure(out_shape)
            jaxpr = closed.jaxpr
            # device-resident consts, transferred once (numpy consts would
            # otherwise re-upload per call)
            consts = [c if isinstance(c, jax.Array) else jnp.asarray(c)
                      for c in closed.consts]

            def run(consts_, flat_args):
                outs = jax.core.eval_jaxpr(jaxpr, consts_, *flat_args)
                return tree_util.tree_unflatten(out_tree, outs)

            entry = (jax.jit(run), consts)
            self._cache[key] = entry
        jitted, consts = entry
        return jitted(consts, flat)


def _reorder_static(fun, static_argnums, static_vals):
    def wrapped(*dyn):
        args = []
        it = iter(dyn)
        sv = dict(zip(static_argnums, static_vals))
        total = len(dyn) + len(static_vals)
        for i in range(total):
            args.append(sv[i] if i in sv else next(it))
        return fun(*args)
    return wrapped


def lifted_jit(fun=None, static_argnums=()):
    """Drop-in jax.jit replacement that lifts closure constants to args."""
    if fun is None:
        return partial(lifted_jit, static_argnums=static_argnums)
    if isinstance(static_argnums, int):
        static_argnums = (static_argnums,)
    return _LiftedJit(fun, static_argnums=static_argnums)
