"""API-surface parity: callbacks, plotting, TPE tuner, CLI.

Reference: python-package/gpboost/callback.py:237, plotting.py:623,
engine.py:1234 tune_pars_TPE_algorithm_optuna;
src/LightGBM/application/application.cpp:167-255 (CLI).
"""

import os
import tempfile

import numpy as np
import pytest

import gpboost_tpu as gpb

import matplotlib
matplotlib.use("Agg")


@pytest.fixture(scope="module")
def reg_data():
    rng = np.random.RandomState(3)
    n = 300
    X = rng.rand(n, 4)
    y = 2 * np.sin(3 * X[:, 0]) + X[:, 1] + 0.3 * rng.randn(n)
    tr = np.arange(n) < 220
    return dict(X=X, y=y, tr=tr)


class TestCallbacks:
    def test_early_stopping_and_record(self, reg_data):
        d = reg_data
        ds = gpb.Dataset(d["X"][d["tr"]], label=d["y"][d["tr"]])
        vs = gpb.Dataset(d["X"][~d["tr"]], label=d["y"][~d["tr"]])
        rec = {}
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "min_data_in_leaf": 5, "verbose": 0, "metric": "l2"},
                        ds, num_boost_round=100, valid_sets=[vs],
                        callbacks=[gpb.callback.record_evaluation(rec),
                                   gpb.callback.early_stopping(
                                       5, verbose=False)])
        assert bst.num_trees() < 100
        assert bst.best_iteration <= bst.num_trees()
        assert len(rec["valid_0"]["l2"]) == bst.num_trees()
        # best iteration really is the minimum of the recorded history
        hist = rec["valid_0"]["l2"]
        assert np.argmin(hist) + 1 == bst.best_iteration

    def test_reset_parameter(self, reg_data):
        d = reg_data
        ds = gpb.Dataset(d["X"][d["tr"]], label=d["y"][d["tr"]])
        lrs = []

        def spy(env):
            lrs.append(env.params["learning_rate"])
        spy.order = 99
        gpb.train({"objective": "regression", "num_leaves": 7,
                   "min_data_in_leaf": 5, "verbose": 0},
                  ds, num_boost_round=5,
                  callbacks=[gpb.callback.reset_parameter(
                      learning_rate=lambda it: 0.5 * 0.5 ** it), spy])
        assert lrs == [0.5 * 0.5 ** i for i in range(5)]


class TestPlotting:
    @pytest.fixture(scope="class")
    def trained(self, reg_data):
        d = reg_data
        ds = gpb.Dataset(d["X"][d["tr"]], label=d["y"][d["tr"]])
        vs = gpb.Dataset(d["X"][~d["tr"]], label=d["y"][~d["tr"]])
        ev = {}
        bst = gpb.train({"objective": "regression", "num_leaves": 7,
                         "min_data_in_leaf": 5, "verbose": 0, "metric": "l2"},
                        ds, num_boost_round=10, valid_sets=[vs],
                        evals_result=ev)
        return bst, ev

    def test_plot_importance(self, trained):
        ax = gpb.plot_importance(trained[0])
        assert len(ax.patches) > 0

    def test_plot_metric(self, trained):
        ax = gpb.plot_metric(trained[1])
        assert len(ax.lines) == 1

    def test_plot_split_value_histogram(self, trained):
        ax = gpb.plot_split_value_histogram(trained[0], 0)
        assert len(ax.patches) > 0

    def test_create_tree_digraph(self, trained):
        g = gpb.create_tree_digraph(trained[0], 0)
        assert "node0" in g.source


class TestTuner:
    def test_tpe_finds_reasonable_params(self, reg_data):
        d = reg_data
        folds = [(np.where(d["tr"])[0], np.where(~d["tr"])[0])]
        res = gpb.tune_pars_TPE_algorithm_optuna(
            search_space={"learning_rate": [0.01, 1.0],
                          "num_leaves": [2, 64]},
            n_trials=4, X=d["X"], y=d["y"], max_num_boost_round=15,
            folds=folds, metric="mse", verbose_eval=0)
        assert set(res["best_params"]) == {"learning_rate", "num_leaves"}
        assert res["best_iter"] > 0
        assert np.isfinite(res["best_score"])

    def test_builtin_tpe_sampler_minimizes(self):
        from gpboost_tpu.tuner import TPESampler, _Dim
        dims = [_Dim("learning_rate", 0.001, 1.0)]
        s = TPESampler(dims, seed=0, n_startup=8)
        for _ in range(40):
            u = s.ask()
            x = dims[0].to_value(u[0])
            s.tell(u, (np.log(x) - np.log(0.1)) ** 2)
        best_u = min(s.history, key=lambda t: t[1])[0]
        assert abs(np.log(dims[0].to_value(best_u[0])) - np.log(0.1)) < 1.0


class TestCLI:
    def test_train_predict_round_trip(self, reg_data):
        from gpboost_tpu.cli import run
        d = reg_data
        tmp = tempfile.mkdtemp()
        tr = np.column_stack([d["y"][d["tr"]], d["X"][d["tr"]]])
        te = np.column_stack([d["y"][~d["tr"]], d["X"][~d["tr"]]])
        np.savetxt(os.path.join(tmp, "train.csv"), tr, delimiter=",",
                   header="y,a,b,c,dd", comments="")
        np.savetxt(os.path.join(tmp, "test.csv"), te, delimiter=",",
                   header="y,a,b,c,dd", comments="")
        with open(os.path.join(tmp, "train.conf"), "w") as f:
            f.write(f"task = train\ndata = {tmp}/train.csv\n"
                    "objective = regression\nnum_iterations = 30\n"
                    "learning_rate = 0.1\nnum_leaves = 7\n"
                    "min_data_in_leaf = 5\nverbose = 0\n"
                    f"output_model = {tmp}/model.json\n")
        run([f"config={tmp}/train.conf"])
        run(["task=predict", f"input_model={tmp}/model.json",
             f"data={tmp}/test.csv", "predict_with_label=true",
             f"output_result={tmp}/preds.txt"])
        got = np.loadtxt(os.path.join(tmp, "preds.txt"))
        yte = d["y"][~d["tr"]]
        assert np.corrcoef(got, yte)[0, 1] > 0.85


def test_cli_convert_model_cpp(tmp_path):
    """task=convert_model emits compilable C++ matching predict(raw_score)
    exactly (application.cpp:216 ConvertModel)."""
    import subprocess, ctypes, sys
    import gpboost_tpu as gpb
    rng = np.random.RandomState(0)
    X = rng.randn(300, 4)
    y = X[:, 0] * 2 + np.sin(X[:, 1]) + 0.1 * rng.randn(300)
    bst = gpb.train({"objective": "regression", "num_leaves": 7,
                     "verbose": 0}, gpb.Dataset(X, label=y),
                    num_boost_round=3)
    mp = str(tmp_path / "m.json")
    bst.save_model(mp)
    cpp = str(tmp_path / "model.cpp")
    from gpboost_tpu import cli
    old = sys.argv
    try:
        sys.argv = ["gpboost_tpu", "task=convert_model",
                    f"input_model={mp}", f"convert_model={cpp}"]
        cli.main()
    finally:
        sys.argv = old
    src = open(cpp).read() \
        + '\nextern "C" double predict_raw_c(const double* f)' \
          '{return PredictRaw(f);}\n'
    open(cpp, "w").write(src)
    so = str(tmp_path / "model.so")
    subprocess.check_call(["g++", "-O2", "-shared", "-fPIC", cpp, "-o", so])
    lib = ctypes.CDLL(so)
    lib.predict_raw_c.restype = ctypes.c_double
    got = np.array([lib.predict_raw_c(
        np.ascontiguousarray(r).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double))) for r in X[:40]])
    np.testing.assert_allclose(got, bst.predict(X[:40], raw_score=True),
                               atol=1e-12)
