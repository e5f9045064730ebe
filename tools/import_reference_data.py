"""Import Stan model *data* assets from the reference checkout into native .npz form.

The reference ships per-model JSON data files (stan_models/<name>/<name>.json) and
ground-truth posterior moments (<name>.params, produced by a long Stan MCMC run —
see reference experiments/run_experiments.py:70-76). This one-shot tool converts
them into .npz/.json assets under smcnuts_tpu/assets/ so the framework is fully
standalone.

Known quirk handled here: the reference's PRMwCD.json is truncated mid-file — it
ends with the bytes '"phi": ' and no value/closing brace, an artifact of the
reference's interrupted in-place JSON rewrite mechanism (reference
smcnuts/model/bridgestan.py:134-141). We repair it by appending "1.0}". The
tempering parameter phi is *not* data in this framework (logp(theta, phi) is a
pure function), so phi is dropped from the imported assets entirely.

Run: python tools/import_reference_data.py
"""

import json
import os

import numpy as np

REF = "/root/reference/stan_models"
OUT = os.path.join(os.path.dirname(__file__), "..", "smcnuts_tpu", "assets")


def load_json_repaired(path):
    with open(path, "r") as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # Truncated in-place rewrite: '... "phi": ' with no value/close.
        repaired = text + "1.0}"
        return json.loads(repaired)


def load_params(path):
    names, means, variances = [], [], []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            names.append(parts[0])
            means.append(float(parts[1]))
            variances.append(float(parts[2]))
    return names, np.asarray(means), np.asarray(variances)


def load_step_size(model_dir, default=0.5):
    cfg_path = os.path.join(model_dir, "model_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        return float(cfg.get("step_size", default))
    return default


def import_arma():
    d = load_json_repaired(os.path.join(REF, "arma", "arma.json"))
    names, gt_mean, gt_var = load_params(os.path.join(REF, "arma", "arma.params"))
    np.savez(
        os.path.join(OUT, "arma.npz"),
        y=np.asarray(d["y"], dtype=np.float64),
        T=np.int64(d["T"]),
        gt_mean=gt_mean,
        gt_var=gt_var,
        step_size=load_step_size(os.path.join(REF, "arma")),
    )
    # Note: arma.params labels row 2 "phi" but it is the AR coefficient `beta`
    # (reference stan_models/arma/arma.stan:10); we store canonical names.
    meta = {"param_names": ["mu", "beta", "theta", "sigma"], "gt_names": names}
    with open(os.path.join(OUT, "arma_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def import_prmwcd():
    d = load_json_repaired(os.path.join(REF, "PRMwCD", "PRMwCD.json"))
    names, gt_mean, gt_var = load_params(os.path.join(REF, "PRMwCD", "PRMwCD.params"))
    N, M, Clength = int(d["N"]), int(d["M"]), int(d["Clength"])
    X = np.asarray(d["Xkernel"], dtype=np.float64).reshape(N, Clength)
    np.savez(
        os.path.join(OUT, "prmwcd.npz"),
        y=np.asarray(d["y"], dtype=np.float64),
        X=X,
        q=np.float64(d["q"]),
        N=np.int64(N),
        M=np.int64(M),
        Clength=np.int64(Clength),
        gt_mean=gt_mean,
        gt_var=gt_var,
        step_size=load_step_size(os.path.join(REF, "PRMwCD")),
    )
    meta = {
        "param_names": [f"Beta.{i}" for i in range(1, M + 1)] + ["Gamma"],
        "gt_names": names,
    }
    with open(os.path.join(OUT, "prmwcd_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    import_arma()
    import_prmwcd()
    print("Imported assets into", os.path.abspath(OUT))
