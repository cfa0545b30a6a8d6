"""Tracing / profiling hooks (SURVEY.md §5.1).

Reference: include/LightGBM/utils/common.h:989-1073 (Common::Timer,
FunctionTimer, global_timer, USE_TIMETAG builds). TPU-native equivalents:
the Timer registry plus XProf integration — device_trace (full trace
capture), annotate/step_annotation (host-span tags that group device ops),
start_profiler_server (live capture), save_device_memory_profile (HBM
snapshot).
"""

import os

import numpy as np

import gpboost_tpu as gpb


def test_timer_registry_aggregates():
    t = gpb.Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    tot, cnt = t.stats["a"]
    assert cnt == 2 and tot >= 0.0
    assert "a: " in t.report()


def test_annotations_are_transparent():
    # annotations must not change results and must nest arbitrarily
    with gpb.annotate("outer"):
        with gpb.step_annotation("step", step_num=3):
            x = np.arange(4).sum()
    assert x == 6


def test_annotated_training_runs(tmp_path):
    rng = np.random.RandomState(0)
    X = rng.randn(200, 3)
    y = X[:, 0] + 0.1 * rng.randn(200)
    ds = gpb.Dataset(X, label=y)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": 0}, ds, num_boost_round=3)
    assert bst.current_iteration_ == 3


def test_device_memory_profile(tmp_path):
    path = os.path.join(str(tmp_path), "mem.pprof")
    gpb.save_device_memory_profile(path)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_device_trace_capture(tmp_path):
    import jax.numpy as jnp
    logdir = os.path.join(str(tmp_path), "trace")
    with gpb.device_trace(logdir):
        with gpb.annotate("traced_matmul"):
            a = jnp.ones((8, 8))
            (a @ a).block_until_ready()
    found = []
    for root, _dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "trace capture produced no files"
