"""Multi-seed null distribution for the DEPLOYED bespoke-zoo parity rows.

VERDICT r4 item 2 (second half): the round-4 deployed zoo table (BIT
0.0040, SiamUnet_conc 0.0310, CFv6 0.1038-failing-at-10-epochs /
0.0191-passing-at-16) was single-seed, and the 10-epoch CFv6 failure was
explained by a mid-transition narrative instead of a measured
torch-vs-torch null. This driver runs >= 3 seeds per model AT THE
10-EPOCH COUNT, varying both the data seed and the torch init seed, and
builds the paired null: |F1(torch, init A) - F1(torch, init B)| on the
SAME data — the reference's own seed noise that the jax-vs-torch deltas
must be judged against (the same protocol parity_null.py applies to the
pipeline stages).

Per (model, seed): one full deployed run (torch init 1337+s vs jax on
the REAL chip, 128x128 10 epochs, uint8-snapped pixels) plus one
torch-only re-train from init 2337+s on the same data. Resumable: each
run writes its JSON under --out-dir and is skipped when present.

Run:  python benchmarks/zoo_null.py --models bit,siamunet_conc,changeformer_v6 \
          --seeds 0,1,2 --epochs 10 --size 128 --deployed
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HARNESS = {
    "bit": os.path.join(REPO, "benchmarks", "convergence_bit.py"),
    "siamunet_conc": os.path.join(REPO, "benchmarks", "convergence_zoo.py"),
    "changeformer_v6": os.path.join(REPO, "benchmarks",
                                    "convergence_zoo.py"),
    "dtcdscn": os.path.join(REPO, "benchmarks", "convergence_zoo.py"),
    "snunet": os.path.join(REPO, "benchmarks", "convergence_zoo.py"),
    "ifnet": os.path.join(REPO, "benchmarks", "convergence_zoo.py"),
}

PRIMARY_INIT = 1337
NULL_INIT = 2337


def _env():
    inherited = os.environ.get("PYTHONPATH", "")
    return dict(os.environ,
                PYTHONPATH=f"{REPO}:{os.path.join(REPO, 'tests')}"
                           + (f":{inherited}" if inherited else ""))


def _run(cmd, log):
    with open(log, "a") as f:
        f.write("+ " + " ".join(cmd) + "\n")
        f.flush()
        subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
                       env=_env(), check=True)


def _base(model, wd, args, init_seed):
    cmd = [sys.executable, HARNESS[model], "--workdir", wd,
           "--epochs", str(args.epochs), "--size", str(args.size),
           "--init-seed", str(init_seed)]
    if model != "bit":
        cmd += ["--model", model]
    if args.deployed:
        cmd.append("--deployed")
    return cmd


def _summarize(out_dir, models, seeds):
    summary = {}
    for model in models:
        s = summary.setdefault(model, {"deltas": {}, "null": {}})
        for seed in seeds:
            pj = os.path.join(out_dir, f"run_{model}_s{seed}_primary.json")
            nj = os.path.join(out_dir, f"run_{model}_s{seed}_null.json")
            if os.path.exists(pj):
                s["deltas"][seed] = json.load(open(pj))["delta_f1"]
            if os.path.exists(nj):
                s["null"][seed] = json.load(open(nj))["null_delta_f1"]
        if s["deltas"]:
            vals = list(s["deltas"].values())
            s["delta_mean"] = round(sum(vals) / len(vals), 4)
            s["delta_max"] = round(max(vals), 4)
        if s["null"]:
            vals = list(s["null"].values())
            s["null_mean"] = round(sum(vals) / len(vals), 4)
            s["null_max"] = round(max(vals), 4)
        if s["deltas"] and s["null"]:
            s["within_null"] = s["delta_mean"] <= max(s["null_mean"],
                                                      s["null_max"])
            s["within_contract"] = s["delta_max"] <= 0.1
    path = os.path.join(out_dir, "summary.json")
    json.dump(summary, open(path, "w"), indent=1)
    print(json.dumps({"summary": summary}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="bit,siamunet_conc,changeformer_v6")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--deployed", action="store_true")
    ap.add_argument("--out-dir",
                    default=os.path.join(REPO, "benchmarks", "out",
                                         "zoo_null"))
    args = ap.parse_args()
    models = args.models.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    os.makedirs(args.out_dir, exist_ok=True)
    log = os.path.join(args.out_dir, "driver.log")

    for model in models:
        for seed in seeds:
            wd = os.path.join(args.out_dir, f"wd_{model}_s{seed}")
            pj = os.path.join(args.out_dir,
                              f"run_{model}_s{seed}_primary.json")
            nj = os.path.join(args.out_dir, f"run_{model}_s{seed}_null.json")

            if not os.path.exists(pj):
                t0 = time.time()
                cmd = _base(model, wd, args, PRIMARY_INIT + seed) + [
                    "--seed", str(seed)]
                _run(cmd, log)
                # the harness prints the report as its last stdout line
                # AND leaves torch.json/jax.json in the workdir
                tr = json.load(open(os.path.join(wd, "torch.json")))
                jr = json.load(open(os.path.join(wd, "jax.json")))
                rec = {"model": model, "seed": seed, "kind": "primary",
                       "init_seed": PRIMARY_INIT + seed,
                       "torch_best_f1": tr["best_f1"],
                       "jax_best_f1": jr["best_f1"],
                       "delta_f1": round(abs(tr["best_f1"]
                                             - jr["best_f1"]), 4),
                       "seconds": round(time.time() - t0, 1)}
                json.dump(rec, open(pj, "w"))
                print(json.dumps(rec), flush=True)
                _summarize(args.out_dir, models, seeds)

            if not os.path.exists(nj):
                t0 = time.time()
                cmd = _base(model, wd, args, NULL_INIT + seed) + [
                    "--side", "torch", "--torch-out", "torch_null.json",
                    "--init-out", "init_null.npz"]
                _run(cmd, log)
                ta = json.load(open(os.path.join(wd, "torch.json")))
                tb = json.load(open(os.path.join(wd, "torch_null.json")))
                rec = {"model": model, "seed": seed, "kind": "null",
                       "init_seed_a": PRIMARY_INIT + seed,
                       "init_seed_b": NULL_INIT + seed,
                       "torch_a_best_f1": ta["best_f1"],
                       "torch_b_best_f1": tb["best_f1"],
                       "null_delta_f1": round(abs(ta["best_f1"]
                                                  - tb["best_f1"]), 4),
                       "seconds": round(time.time() - t0, 1)}
                json.dump(rec, open(nj, "w"))
                print(json.dumps(rec), flush=True)
                _summarize(args.out_dir, models, seeds)

    _summarize(args.out_dir, models, seeds)


if __name__ == "__main__":
    main()
