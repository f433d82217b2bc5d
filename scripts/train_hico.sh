#!/usr/bin/env bash
# Train the zero-shot HICO-DET detector (reference: train_hico.sh —
# non-rare-first, batch 4/device, 15 epochs, num_shot 1 for NF-UC).
# On TPU the batch is global and shards over the mesh: 4 per chip x 8
# chips = 32. Swap --zs-type for rare_first / uc0..uc4 / unseen_verb /
# unseen_object, or drop --zs for fully-supervised training.
set -e
python -m hoigen_tpu.cli.main_finetune \
    --batch-size 32 \
    --pretrained-detr checkpoints/detr-r50-hicodet.pth \
    --clip-model-path checkpoints/pretrained_clip/ViT-B-16.pt \
    --file1 hicodet_pkl_files/union_embeddings_cachemodel_crop_padding_zeros_vitb16.p \
    --output-dir checkpoints/non_rare_first1 \
    --data-root ./datasets \
    --num-classes 117 \
    --use-multi-hot true \
    --epochs 15 \
    --num-shot 1 \
    --zs true \
    --zs-type non_rare_first \
    --dtype bfloat16 \
    "$@"
