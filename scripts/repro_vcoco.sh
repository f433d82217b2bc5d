#!/usr/bin/env bash
# V-COCO leg of the runbook (round-4 VERDICT item 8): train on trainval,
# dump the official-toolkit cache.pkl (the reference's entire V-COCO eval
# surface — its in-repo eval raises NotImplementedError,
# /root/reference/main_tip_finetune.py:912;  cache format:
# /root/reference/utils_tip_cache_and_union_finetune.py:494-540), and score
# the in-repo vsrl role AP (beyond the reference; eval/vcoco_ap.py).
#
# Modes (same conventions as repro_common.sh):
#   (default)              real data: FETCH_VCOCO=1 scripts/fetch_data.sh
#                          first (COCO 2014 images + annotation producer),
#                          plus the COCO-pretrained DETR-R50 below.
#   HOIGEN_REPRO_CI=1      synthetic fixture (tools/make_fixture.py
#                          --dataset vcoco); runs sanity + 1 epoch + cache
#                          + eval in minutes, no real data needed.
#   HOIGEN_REPRO_DRYRUN=1  print the assembled commands and exit.
set -euo pipefail
cd "$(dirname "$0")/.."

out=checkpoints/repro_vcoco
data_root=./datasets/vcoco
common=(
    --dataset vcoco --partitions trainval test
    --batch-size 32 --epochs 15 --seed 66
    # V-COCO runs the COCO-pretrained detector (92 logits gathered to 81
    # via reserve_indices before the postprocess softmax,
    # /root/reference/upt_tip_cache_model_free_finetune_distill3.py:575-581)
    --pretrained-detr checkpoints/detr-r50-e632da11.pth
    --clip-model-path checkpoints/pretrained_clip/ViT-B-16.pt
    --file1 vcoco_pkl_files/vcoco_union_embeddings.p
    --num-classes 24 --dtype bfloat16
    --output-dir "$out"
)
if [ "${HOIGEN_REPRO_CI:-0}" = "1" ]; then
    data_root=$(mktemp -d)/fixture
    python tools/make_fixture.py "$data_root" --dataset vcoco >/dev/null
    common+=(--epochs 1 --batch-size 2 --num-workers 0)
fi
common+=(--data-root "$data_root")

train_cmd=(python -m hoigen_tpu.cli.main_finetune "${common[@]}")
cache_cmd=(python -m hoigen_tpu.cli.main_finetune "${common[@]}"
           --cache true --resume "$out")
eval_cmd=(python -m hoigen_tpu.cli.main_finetune "${common[@]}"
          --eval true --resume "$out")

if [ "${HOIGEN_REPRO_DRYRUN:-0}" = "1" ]; then
    echo "TRAIN: ${train_cmd[*]} $*"
    echo "CACHE: ${cache_cmd[*]} $*"
    echo "EVAL:  ${eval_cmd[*]} $*"
    exit 0
fi
if [ "${HOIGEN_REPRO_CI:-0}" = "1" ]; then
    echo "[ci] sanity: one production-config train step on the fixture"
    python -m hoigen_tpu.cli.main_finetune "${common[@]}" --sanity true "$@"
fi
echo "[train] ${train_cmd[*]} $*"
"${train_cmd[@]}" "$@"
echo "[cache] ${cache_cmd[*]} $*"
"${cache_cmd[@]}" "$@"
echo "[eval] ${eval_cmd[*]} $*"
"${eval_cmd[@]}" "$@"
echo "cache.pkl for the official v-coco toolkit: $out/cache.pkl"
echo "(role AP above is the in-repo vsrl_eval-parity scorer —"
echo " tests/test_vcoco_oracle.py certifies the matching semantics)"
