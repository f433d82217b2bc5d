#!/usr/bin/env bash
# Evaluate a checkpoint on every zero-shot split (reference: eval_hico.sh).
# --resume accepts an Orbax run dir OR a reference torch .pt checkpoint
# (imported through models/convert_upt.py). Usage:
#   scripts/eval_hico.sh checkpoints/new_best <extra flags...>
set -e
CKPT_DIR=${1:-checkpoints/new_best}; shift || true
for ZS in non_rare_first rare_first uc0 uc1 uc2 uc3 uc4 unseen_object unseen_verb; do
    python -m hoigen_tpu.cli.main_finetune \
        --eval true \
        --resume "$CKPT_DIR/$ZS" \
        --pretrained-detr checkpoints/detr-r50-hicodet.pth \
        --clip-model-path checkpoints/pretrained_clip/ViT-B-16.pt \
        --file1 hicodet_pkl_files/union_embeddings_cachemodel_crop_padding_zeros_vitb16.p \
        --data-root ./datasets \
        --num-classes 117 \
        --use-multi-hot true \
        --zs true \
        --zs-type "$ZS" \
        --dtype bfloat16 \
        "$@"
done
# fully-supervised checkpoint
python -m hoigen_tpu.cli.main_finetune \
    --eval true \
    --resume "$CKPT_DIR/no_unseen" \
    --pretrained-detr checkpoints/detr-r50-hicodet.pth \
    --clip-model-path checkpoints/pretrained_clip/ViT-B-16.pt \
    --file1 hicodet_pkl_files/union_embeddings_cachemodel_crop_padding_zeros_vitb16.p \
    --data-root ./datasets \
    --num-classes 117 \
    --use-multi-hot true \
    --dtype bfloat16 \
    "$@"
