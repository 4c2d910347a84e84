"""Multi-seed null distribution for the deployed chip-scale parity deltas.

VERDICT r3 item 1: the round-3 chip parity table (BASELINE.md) had ONE
seed per cell — delta F1 0.0275 (stage 1) / 0.0405 (stage 2) with no way
to tell bf16 cost from seed noise, because nobody measured how much the
fp32 torch reference itself moves when only the seed changes.

This driver runs the deployed parity harness (convergence_parity.py
--deployed: jax on the REAL chip in the deployed bf16 perf stack, torch
the fp32-CPU reference — ref train_sup.py:112-185 / train_pse_cd.py:199-301
semantics) across N seeds per stage, varying BOTH the data seed and the
weight-init seed, and then builds the torch-vs-torch NULL: for each seed
the torch side is re-trained on the SAME data with a DIFFERENT init seed,
so |F1(torch, init a) - F1(torch, init b)| is the paired seed-noise
distribution that the jax-vs-torch deltas must be judged against.

Every (stage, seed, kind) run writes its own JSON under --out-dir and is
skipped on re-run if present, so the sweep is resumable; the summary is
rewritten after every run.

Run:  python benchmarks/parity_null.py --stages 1,2 --seeds 0,1,2,3,4 \
          --size 256 --epochs 10 --deployed
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "benchmarks", "convergence_parity.py")

# init seeds: the paired run reuses the primary's data but re-rolls init
PRIMARY_INIT = 1337
NULL_INIT = 2337


def _run(cmd, log_path):
    t0 = time.time()
    with open(log_path, "a") as log:
        log.write("+ " + " ".join(cmd) + "\n")
        log.flush()
        subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                       cwd=REPO, check=True)
    return time.time() - t0


def _summarize(results, out_path):
    """Per stage: jax-vs-torch deltas next to the torch-vs-torch null."""
    summary = {}
    for key, res in results.items():
        stage = res["stage"]
        s = summary.setdefault(stage, {"deltas": {}, "null": {}})
        if res["kind"] == "primary":
            s["deltas"][res["seed"]] = res["delta_f1"]
        else:
            s["null"][res["seed"]] = res["null_delta_f1"]
    for stage, s in summary.items():
        d = sorted(s["deltas"].values())
        n = sorted(s["null"].values())
        if d:
            s["delta_mean"] = round(sum(d) / len(d), 4)
            s["delta_max"] = round(max(d), 4)
        if n:
            s["null_mean"] = round(sum(n) / len(n), 4)
            s["null_max"] = round(max(n), 4)
        if d and n:
            # the contract-hardening verdict: the framework delta is
            # "explained by seed noise" if its mean sits at or under the
            # null mean, and "within the contract regardless" if max<=0.1
            s["within_null"] = s["delta_mean"] <= s["null_mean"]
            s["within_contract"] = s["delta_max"] <= 0.1
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True, default=str)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="1,2")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--deployed", action="store_true")
    ap.add_argument("--out-dir",
                    default=os.path.join(REPO, "benchmarks", "out",
                                         "parity_null"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    stages = [int(x) for x in args.stages.split(",")]
    seeds = [int(x) for x in args.seeds.split(",")]
    log_path = os.path.join(args.out_dir, "sweep.log")
    summary_path = os.path.join(args.out_dir, "summary.json")

    results = {}
    # reload completed runs (resumable sweep)
    for fn in os.listdir(args.out_dir):
        if fn.startswith("run_") and fn.endswith(".json"):
            with open(os.path.join(args.out_dir, fn)) as f:
                results[fn[:-5]] = json.load(f)

    for stage in stages:
        for seed in seeds:
            tag = f"run_s{stage}_seed{seed}_primary"
            wd = os.path.join(args.out_dir, f"wd_s{stage}_seed{seed}")
            if tag not in results:
                cmd = [sys.executable, HARNESS, "--stage", str(stage),
                       "--seed", str(seed),
                       "--init-seed", str(PRIMARY_INIT + seed),
                       "--epochs", str(args.epochs),
                       "--size", str(args.size),
                       "--n-train", str(args.n_train),
                       "--bs", str(args.bs), "--workdir", wd]
                if args.deployed:
                    cmd.append("--deployed")
                dt = _run(cmd, log_path)
                # the harness prints its one-line JSON report to stdout,
                # which _run teed into the log; re-read the side files
                torch_res = json.load(open(os.path.join(wd, "torch.json")))
                jax_res = json.load(open(os.path.join(wd, "jax.json")))
                jkey = "jax" if stage == 1 else "jax_folded"
                res = {"stage": stage, "seed": seed, "kind": "primary",
                       "init_seed": PRIMARY_INIT + seed,
                       "torch_best_f1": torch_res["best_f1"],
                       "jax_best_f1": jax_res[jkey]["best_f1"],
                       "delta_f1": round(abs(torch_res["best_f1"]
                                             - jax_res[jkey]["best_f1"]), 4),
                       "seconds": round(dt, 1)}
                results[tag] = res
                json.dump(res, open(os.path.join(args.out_dir,
                                                 tag + ".json"), "w"))
                _summarize(results, summary_path)
                print(json.dumps(res), flush=True)

            # null: same data, torch re-trained with a different init
            ntag = f"run_s{stage}_seed{seed}_null"
            if ntag not in results:
                nwd = wd + "_null"
                os.makedirs(nwd, exist_ok=True)
                shutil.copy(os.path.join(wd, "data.npz"),
                            os.path.join(nwd, "data.npz"))
                cmd = [sys.executable, HARNESS, "--stage", str(stage),
                       "--init-seed", str(NULL_INIT + seed),
                       "--epochs", str(args.epochs),
                       "--workdir", nwd, "--side", "torch"]
                dt = _run(cmd, log_path)
                t1 = json.load(open(os.path.join(wd, "torch.json")))
                t2 = json.load(open(os.path.join(nwd, "torch.json")))
                res = {"stage": stage, "seed": seed, "kind": "null",
                       "init_seed_a": PRIMARY_INIT + seed,
                       "init_seed_b": NULL_INIT + seed,
                       "torch_a_best_f1": t1["best_f1"],
                       "torch_b_best_f1": t2["best_f1"],
                       "null_delta_f1": round(abs(t1["best_f1"]
                                                  - t2["best_f1"]), 4),
                       "seconds": round(dt, 1)}
                results[ntag] = res
                json.dump(res, open(os.path.join(args.out_dir,
                                                 ntag + ".json"), "w"))
                _summarize(results, summary_path)
                print(json.dumps(res), flush=True)

    summary = _summarize(results, summary_path)
    print(json.dumps({"summary": summary}, default=str), flush=True)


if __name__ == "__main__":
    main()
