#!/usr/bin/env bash
# Generator pipeline (reference: train_ship.sh): per crop family train the
# CoOp+VAE generator, then the SHIP alignment MLP. Produce the crop splits
# and GT features first with cli.prepare_data (the reference only ships
# these pre-computed).
set -e
CLIP=${CLIP:-checkpoints/pretrained_clip/ViT-B-16.pt}
for FAM in hoi human object; do
    python -m hoigen_tpu.cli.main_vae \
        --data ${FAM}_data \
        --split-json crops/hicodet_${FAM}_split.json \
        --clip-model "$CLIP" "$@"
    python -m hoigen_tpu.cli.finetune_ship \
        --data ${FAM}_data \
        --split-json crops/hicodet_${FAM}_split.json \
        --vae-ckpt ckpt/hicodet/${FAM}_vae_50.npz \
        --gt-features new_gt_features/${FAM}.pickle \
        --clip-model "$CLIP" "$@"
done
