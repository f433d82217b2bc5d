#!/usr/bin/env bash
# Shared driver for the per-config reproduction scripts (repro_*.sh).
#
# Modes:
#   (default)            real-data training + eval; needs scripts/fetch_data.sh
#                        artifacts in place. Expected wall-clock on one v5e
#                        chip: ~1.5-3 h train (15 epochs, batch 32; the
#                        measured eval leg runs ~278 img/s, bench.py), plus
#                        the one-off cache/feature producers.
#   HOIGEN_REPRO_CI=1    no real data needed: builds the synthetic 5-image
#                        fixture (tools/make_fixture.py), runs --sanity (one
#                        full-production-config train step), one training
#                        epoch, and eval on the fixture. Exercises the exact
#                        command flow end to end in minutes.
#   HOIGEN_REPRO_DRYRUN=1  print the assembled commands and exit (used by
#                        the test suite to keep the scripts wired).
set -euo pipefail
cd "$(dirname "$0")/.."

run_config() {  # $1 = tag, $2 = zs_type ('' = fully supervised), rest = extra flags
    local tag="$1"; shift
    local zs_type="$1"; shift
    local out="checkpoints/repro_${tag}"
    local data_root=./datasets
    local common=(
        --batch-size 32 --epochs 15 --seed 66
        --pretrained-detr checkpoints/detr-r50-hicodet.pth
        --clip-model-path checkpoints/pretrained_clip/ViT-B-16.pt
        --file1 hicodet_pkl_files/union_embeddings_cachemodel_crop_padding_zeros_vitb16.p
        --num-classes 117 --use-multi-hot true --dtype bfloat16
        --output-dir "$out"
    )
    if [ -n "$zs_type" ]; then
        common+=(--zs true --zs-type "$zs_type")
    fi
    if [ "${HOIGEN_REPRO_CI:-0}" = "1" ]; then
        data_root=$(mktemp -d)/fixture
        python tools/make_fixture.py "$data_root" >/dev/null
        common+=(--epochs 1 --batch-size 2 --num-workers 0)
    fi
    common+=(--data-root "$data_root")

    local train_cmd=(python -m hoigen_tpu.cli.main_finetune "${common[@]}")
    local eval_cmd=(python -m hoigen_tpu.cli.main_finetune "${common[@]}"
                    --eval true --resume "$out")

    if [ "${HOIGEN_REPRO_DRYRUN:-0}" = "1" ]; then
        echo "TRAIN: ${train_cmd[*]} $*"
        echo "EVAL:  ${eval_cmd[*]} $*"
        return 0
    fi
    if [ "${HOIGEN_REPRO_CI:-0}" = "1" ]; then
        echo "[ci] sanity: one production-config train step on the fixture"
        python -m hoigen_tpu.cli.main_finetune "${common[@]}" --sanity true "$@"
    fi
    echo "[train] ${train_cmd[*]} $*"
    "${train_cmd[@]}" "$@"
    echo "[eval] ${eval_cmd[*]} $*"
    "${eval_cmd[@]}" "$@"
}

expect() {  # $1..$3 = Full/Seen/Unseen mAP from BASELINE.md / README.md:120-127
    echo "expected (reference model zoo): Full $1 / Seen $2 / Unseen $3"
    echo "(BASELINE.md; tolerance: published numbers were measured with the"
    echo " reference's own checkpoints — match after importing those via"
    echo " --resume <ckpt.pt>, or approach them when training from scratch)"
}
