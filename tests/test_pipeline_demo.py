"""End-to-end 3-stage pipeline test (VERDICT r1 item 8): runs
scripts/run_pipeline_demo.sh — stage-1 seg pretrain -> stage-2
pseudo-change CD (+ reliability ranking + ff_label generation) -> stage-3
STCD fine-tune -> final evaluation — exactly the reference workflow
(ref train_sup.py -> train_pse_cd.py -> train_stcd.py with the gated
utility passes, train_stcd.py:56-224), on forced-CPU subprocesses so the
flagship CLI surface cannot silently rot.

Marked slow (~3-20 min depending on compile-cache warmth); each stage is a
fresh process, so the suite's 8-device in-process config doesn't apply —
STCD_CPU_DEVICES=2 exercises the sharded data-parallel path per stage.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_full_pipeline_demo(tmp_path):
    env = dict(os.environ, STCD_FORCE_CPU="1", STCD_CPU_DEVICES="2")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_pipeline_demo.sh"),
         str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=3600)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    assert proc.returncode == 0, f"pipeline demo failed:\n{tail}"
    assert "PIPELINE DEMO COMPLETE" in proc.stdout

    data = tmp_path / "data" / "LEVIR" / "train"
    runs = tmp_path / "runs"
    # gated-utility artifacts (ref train_pse_cd.py:87-179, train_stcd.py:96-204)
    assert (data / "list" / "reliable_ids.txt").exists()
    assert (data / "list" / "unreliable_ids.txt").exists()
    assert (data / "ff_label").is_dir() and any((data / "ff_label").iterdir())
    # per-stage best checkpoints ('%.2f_best_model' scheme, train_sup.py:175-180)
    for stage in ("seg", "psecd", "stcd"):
        best = [p for p in (runs / stage).iterdir()
                if p.name.endswith("_best_model")]
        assert best, f"no best checkpoint for stage {stage}"
    # final eval printed the confusion-matrix metrics
    assert "F1:" in proc.stdout and "IoU:" in proc.stdout
