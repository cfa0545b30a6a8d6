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

    raise ValueError(f"unknown task '{task}' (train | predict)")


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
