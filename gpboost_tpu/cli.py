"""Config-file-driven CLI: gpboost task=train|predict (boosting only, like
the reference).

Reference: src/LightGBM/application/application.cpp:31 (config parsing),
:167 InitTrain, :204 Train, :216 Predict; src/LightGBM/main.cpp. Usage
mirrors the reference binary:

    python -m gpboost_tpu config=train.conf [key=value ...]
    python -m gpboost_tpu task=train data=train.csv output_model=model.json
    python -m gpboost_tpu task=predict data=test.csv input_model=model.json \
        output_result=preds.txt

Data files are CSV/TSV with the label in the first column (or
`label_column=N`, 0-based). The reference CLI likewise has no GPModel path
(application.cpp:167-255): GP models are reachable only via the Python API.
"""

import sys

import numpy as np


def _parse_kv(tokens):
    conf = {}
    for tok in tokens:
        tok = tok.strip()
        if not tok or tok.startswith("#"):
            continue
        if "=" not in tok:
            raise ValueError(f"cannot parse CLI token '{tok}' (expect k=v)")
        k, v = tok.split("=", 1)
        conf[k.strip()] = v.strip().strip('"').strip("'")
    return conf


def _load_config(argv):
    """argv key=value pairs; `config=<file>` loads a config file first
    (application.cpp:31, later argv entries override)."""
    conf = _parse_kv(argv)
    if "config" in conf:
        with open(conf.pop("config")) as f:
            file_conf = _parse_kv([ln.split("#", 1)[0] for ln in f])
        file_conf.update(conf)
        conf = file_conf
    return conf


def _read_table(path, conf):
    header = conf.get("header", "true").lower() in ("true", "1")
    sep = "\t" if path.endswith((".tsv", ".txt")) else ","
    M = np.genfromtxt(path, delimiter=sep, skip_header=1 if header else 0,
                      dtype=np.float64)
    if M.ndim == 1:
        M = M[:, None]
    return M


def _num(conf, key, default, cast=float):
    return cast(conf[key]) if key in conf else default


def run(argv=None):
    conf = _load_config(argv if argv is not None else sys.argv[1:])
    task = conf.get("task", "train")
    from . import Dataset, train, Booster
    from .utils.log import Log

    if task == "train":
        if "data" not in conf:
            raise ValueError("task=train needs data=<file>")
        M = _read_table(conf["data"], conf)
        label_col = _num(conf, "label_column", 0, int)
        y = M[:, label_col]
        X = np.delete(M, label_col, axis=1)
        params = {k: v for k, v in conf.items()
                  if k not in ("task", "data", "valid", "valid_data",
                               "output_model", "input_model", "header",
                               "label_column", "num_iterations",
                               "output_result", "config")}
        for k in list(params):
            try:
                fv = float(params[k])
                params[k] = int(fv) if fv == int(fv) and "." not in params[k] \
                    else fv
            except ValueError:
                if params[k].lower() in ("true", "false"):
                    params[k] = params[k].lower() == "true"
        nrounds = _num(conf, "num_iterations", 100, int)
        valid_sets = None
        vfile = conf.get("valid", conf.get("valid_data"))
        if vfile:
            Mv = _read_table(vfile, conf)
            yv = Mv[:, label_col]
            Xv = np.delete(Mv, label_col, axis=1)
            valid_sets = [Dataset(Xv, label=yv)]
        ds = Dataset(X, label=y)
        esr = _num(conf, "early_stopping_round",
                   _num(conf, "early_stopping_rounds", None,
                        int) or None, int) if (
            "early_stopping_round" in conf
            or "early_stopping_rounds" in conf) else None
        bst = train(params, ds, num_boost_round=nrounds,
                    valid_sets=valid_sets, early_stopping_rounds=esr)
        out = conf.get("output_model", "GPBoost_model.json")
        bst.save_model(out)
        Log.info(f"Finished training; model saved to {out}")
        return bst

    if task in ("predict", "prediction"):
        if "input_model" not in conf or "data" not in conf:
            raise ValueError("task=predict needs input_model=<file> and "
                             "data=<file>")
        bst = Booster(model_file=conf["input_model"])
        M = _read_table(conf["data"], conf)
        if conf.get("predict_with_label", "false").lower() in ("true", "1"):
            label_col = _num(conf, "label_column", 0, int)
            M = np.delete(M, label_col, axis=1)
        pred = bst.predict(M, raw_score=conf.get(
            "predict_raw_score", "false").lower() in ("true", "1"))
        if isinstance(pred, dict):
            pred = pred.get("response_mean", pred.get("fixed_effect"))
        out = conf.get("output_result", "GPBoost_predict_result.txt")
        np.savetxt(out, np.asarray(pred))
        Log.info(f"Finished prediction; results saved to {out}")
        return pred

    if task == "convert_model":
        # standalone C++ if-else predictor from a saved model
        # (application.cpp:216 ConvertModel, convert_model_language=cpp)
        if "input_model" not in conf:
            raise ValueError("task=convert_model needs input_model=<file>")
        bst = Booster(model_file=conf["input_model"])
        out = conf.get("convert_model", "gpboost_dump_model.cpp")
        _convert_model_cpp(bst, out)
        Log.info(f"Finished converting model; C++ code saved to {out}")
        return out

    raise ValueError(f"unknown task '{task}' (train | predict | "
                     "convert_model)")


def _convert_model_cpp(bst, path):
    """Emit self-contained C++ with one function per tree plus
    PredictRaw/Predict (the reference's ModelToIfElse output shape,
    gbdt_model_text.cpp:15 SaveModelToIfElse)."""
    lines = ["#include <cmath>", "#include <cstring>", "",
             "// generated by gpboost_tpu task=convert_model", ""]
    names = []
    for ti, tree in enumerate(bst.trees):
        name = f"PredictTree{ti}"
        names.append(name)
        lines.append(f"static double {name}(const double* f) {{")

        def emit(node, indent):
            pad = "  " * indent
            if tree.is_leaf[node]:
                val = repr(float(tree.leaf_value[node]))
                lin = tree.leaf_linear.get(int(node))
                if lin is not None:
                    feats, coefs = lin
                    terms = " + ".join(
                        f"{float(c)!r} * f[{int(ft)}]"
                        for ft, c in zip(feats, coefs))
                    lines.append(f"{pad}return {val} + {terms};")
                else:
                    lines.append(f"{pad}return {val};")
                return
            feat = int(tree.split_feature[node])
            cl = tree.cat_left_values.get(int(node)) \
                if hasattr(tree, "cat_left_values") else None
            if cl is not None and len(cl):
                vals = " || ".join(f"f[{feat}] == {float(v)!r}"
                                   for v in np.asarray(cl).ravel())
                lines.append(f"{pad}if ({vals}) {{")
            else:
                thr = repr(float(tree.threshold_real[node]))
                lines.append(f"{pad}if (f[{feat}] <= {thr}) {{")
            emit(int(tree.left[node]), indent + 1)
            lines.append(f"{pad}}} else {{")
            emit(int(tree.right[node]), indent + 1)
            lines.append(f"{pad}}}")

        emit(0, 1)
        lines.append("}")
        lines.append("")
    lines.append("double PredictRaw(const double* f) {")
    lines.append(f"  double s = {float(bst.init_score)!r};")
    for name in names:
        lines.append(f"  s += {name}(f);")
    lines.append("  return s;")
    lines.append("}")
    lines.append("")
    obj = getattr(bst, "objective_name", "regression")
    lines.append("double Predict(const double* f) {")
    if obj in ("binary", "bernoulli_logit", "cross_entropy"):
        lines.append("  return 1.0 / (1.0 + std::exp(-PredictRaw(f)));")
    elif obj in ("poisson", "gamma", "tweedie", "negative_binomial"):
        lines.append("  return std::exp(PredictRaw(f));")
    else:
        lines.append("  return PredictRaw(f);")
    lines.append("}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
