#!/usr/bin/env bash
# Full 3-stage STCD pipeline demo on a synthetic mini dataset:
#   stage 1 seg pretrain -> stage 2 pseudo-change CD (+ reliability lists,
#   ff_label generation) -> stage 3 STCD fine-tune -> final evaluation.
# Mirrors the reference workflow (train_sup.py -> train_pse_cd.py ->
# train_stcd.py with the gated utility passes).
set -euo pipefail
ROOT=${1:-/tmp/stcd_demo}
RUNS=$ROOT/runs
COMMON=(--root_path "$ROOT/data" --img_height 64 --img_width 64
        --encoder resnet18 --decoder_channels 32,24,16,12,8
        --batch_size 4 --n_epochs 6 --bf16)
cd "$(dirname "$0")/.."

python scripts/make_demo_data.py "$ROOT/data" --n 8 --size 64

echo "=== stage 1: supervised segmentation pretrain (WHU-AB) ==="
python scripts/train_sup.py "${COMMON[@]}" --dataset_name WHU-AB \
    --save_name "$RUNS/seg"

echo "=== stage 2: pseudo-change CD pretrain (LEVIR pairs) ==="
python scripts/train_pse_cd.py "${COMMON[@]}" --dataset_name LEVIR \
    --CDdataset_name LEVIR --save_name "$RUNS/psecd"

echo "=== stage 2 util: reliability ranking -> reliable_ids.txt ==="
python scripts/train_pse_cd.py "${COMMON[@]}" --dataset_name LEVIR \
    --CDdataset_name LEVIR --save_name "$RUNS/psecd" \
    --load_model --load_path "$RUNS/psecd" --select_data

echo "=== stage 2 util: pseudo-label generation -> ff_label/ ==="
python scripts/train_pse_cd.py "${COMMON[@]}" --dataset_name LEVIR \
    --CDdataset_name LEVIR --save_name "$RUNS/psecd" \
    --load_model --load_path "$RUNS/psecd" --generate_label

echo "=== stage 3: STCD fine-tune (seg + CD + contrastive) ==="
python scripts/train_stcd.py "${COMMON[@]}" --dataset_name LEVIR \
    --CDdataset_name LEVIR --save_name "$RUNS/stcd" \
    --load_model --load_path "$RUNS/psecd"

echo "=== final evaluation ==="
python scripts/evaluate.py --root_path "$ROOT/data" --dataset_name LEVIR \
    --split val --load_path "$RUNS/stcd" --encoder resnet18 \
    --decoder_channels 32,24,16,12,8 --batch_size 4 \
    --img_height 64 --img_width 64

echo "PIPELINE DEMO COMPLETE"
