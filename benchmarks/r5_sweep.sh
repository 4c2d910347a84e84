#!/bin/bash
# Round-5 evidence sweep (resumable; every sub-driver skips completed runs).
# Order is breadth-first: finish the stage-3 null (seed 4), then give every
# deployed zoo row a seed-0 primary+null pair, then deepen to 3 seeds.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
P=/opt/venv/bin/python
$P benchmarks/parity_null.py --stages 3 --seeds 0,1,2,3,4 --epochs 10 --deployed
$P benchmarks/zoo_null.py --models bit,siamunet_conc,changeformer_v6 --seeds 0 --deployed
$P benchmarks/zoo_null.py --models dtcdscn,snunet,ifnet --seeds 0 --deployed
$P benchmarks/zoo_null.py --models bit,siamunet_conc --seeds 0,1,2 --deployed
$P benchmarks/zoo_null.py --models dtcdscn,snunet,ifnet --seeds 0,1,2 --deployed
$P benchmarks/zoo_null.py --models changeformer_v6 --seeds 0,1,2 --deployed
$P benchmarks/zoo_null.py --models bit,siamunet_conc,changeformer_v6,dtcdscn,snunet,ifnet --seeds 0,1,2 --deployed
echo SWEEP_DONE
