#!/usr/bin/env bash
# Fetch every artifact a full HICO-DET / V-COCO reproduction needs
# (round-4 VERDICT item 6 — turnkey real-data runbook).
#
# Sources (all cited from the reference README, /root/reference/README.md):
#   - HICO-DET images+annotations (umich mirror; ~7.9 GB tarball)
#   - COCO 2014 train/val images for V-COCO (~19 GB)
#   - DETR-R50 fine-tuned on HICO-DET        (README.md:49, Google Drive)
#   - CLIP ViT-B/16 official weights         (README.md:34-41, OpenAI CDN;
#     the sha256 is embedded in the URL path and verified after download)
#   - DINO ResNet-50 pretrain                (dino/ loader default)
#   - pre-extracted pair embeddings pkl      (README.md:58-66, Drive)
#   - generator (VAE/SHIP) weights           (README.md:71, Drive)
#   - published HOIGen model-zoo checkpoint  (README.md:120-127, Drive)
#
# Integrity: sha256 sums are recorded into scripts/checksums.sha256 on the
# first successful fetch (trust-on-first-use; upstream publishes none) and
# verified on every later run, so refetches and mirror swaps are caught.
#
# Google Drive files need `gdown` (pip install gdown) or a manual download;
# the script prints the exact file ids when gdown is unavailable.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p datasets checkpoints/pretrained_clip hicodet_pkl_files ckpt

SUMS=scripts/checksums.sha256
touch "$SUMS"

have_sum() { grep -q "  $1\$" "$SUMS" 2>/dev/null; }
check_or_record() {  # $1 = path
    if have_sum "$1"; then
        (grep "  $1\$" "$SUMS" | sha256sum -c -) \
            || { echo "CHECKSUM MISMATCH: $1"; exit 1; }
    else
        sha256sum "$1" >> "$SUMS"
        echo "[recorded] $(tail -1 "$SUMS")"
    fi
}

fetch_url() {  # $1 = url, $2 = dest
    if [ ! -f "$2" ]; then
        echo "[fetch] $1 -> $2"
        curl -fL --retry 3 -o "$2.part" "$1" && mv "$2.part" "$2"
    fi
    check_or_record "$2"
}

fetch_drive() {  # $1 = drive file id, $2 = dest
    if [ ! -f "$2" ]; then
        if command -v gdown >/dev/null 2>&1; then
            echo "[fetch] drive:$1 -> $2"
            gdown "https://drive.google.com/uc?id=$1" -O "$2"
        else
            echo "MISSING: $2"
            echo "  download manually: https://drive.google.com/file/d/$1/view"
            echo "  (or pip install gdown and re-run)"
            return 0
        fi
    fi
    check_or_record "$2"
}

# ---- CLIP ViT-B/16 (sha256 is the directory component of the URL) -------
CLIP_SHA=5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f
fetch_url "https://openaipublic.azureedge.net/clip/models/${CLIP_SHA}/ViT-B-16.pt" \
          "checkpoints/pretrained_clip/ViT-B-16.pt"
echo "${CLIP_SHA}  checkpoints/pretrained_clip/ViT-B-16.pt" | sha256sum -c - \
    || { echo "CLIP checkpoint corrupt"; exit 1; }

# ---- DINO ResNet-50 ------------------------------------------------------
fetch_url "https://dl.fbaipublicfiles.com/dino/dino_resnet50_pretrain/dino_resnet50_pretrain.pth" \
          "checkpoints/dino_resnet50_pretrain.pth"

# ---- DETR-R50 fine-tuned on HICO-DET (reference README.md:49) ------------
fetch_drive 1BQ-0tbSH7UC6QMIMMgdbNpRw2NcO8yAD checkpoints/detr-r50-hicodet.pth

# ---- pre-extracted pair embeddings (reference README.md:58) --------------
# (regenerable in-repo: python -m hoigen_tpu.cli.prepare_data pair-embeddings)
fetch_drive 1lUnUQD3XcWyQdwDHMi74oXBcivibGIWN \
            hicodet_pkl_files/union_embeddings_cachemodel_crop_padding_zeros_vitb16.p

# ---- generator weights (reference README.md:71; or train with
#      cli.main_vae + cli.finetune_ship) -----------------------------------
fetch_drive 1PWLw6CtN8eWT_MdZID3urIEVF2U1zKyZ ckpt/hoigen_generator_weights.zip

# ---- published model-zoo checkpoint (reference README.md:120-127) --------
fetch_drive 1UA9rzFFxNkuhUqvTGGrCJ5xpRYw-H-Ei checkpoints/hoigen_model_zoo.zip

# ---- HICO-DET images (Drive id from the reference's own
#      hicodet/download.sh:5) + UPT-format instance jsons (committed in
#      the public fredzzhang/hicodet repo the reference vendors) ----------
fetch_drive 1QZcJmGVlF9f4h-XLWe9Gkmnmj2z1gSnk datasets/hico_20160224_det.tar.gz
if [ -f datasets/hico_20160224_det.tar.gz ] \
   && [ ! -d datasets/hico_20160224_det ]; then
    echo "[extract] HICO-DET (~7.9 GB)"
    tar -xzf datasets/hico_20160224_det.tar.gz -C datasets
fi
for part in train2015 test2015; do
    fetch_url "https://raw.githubusercontent.com/fredzzhang/hicodet/main/instances_${part}.json" \
              "datasets/instances_${part}.json" || echo \
        "[warn] fetch instances_${part}.json from the fredzzhang/hicodet repo"
done

# ---- COCO-pretrained DETR-R50 (V-COCO detector; the reference builds the
#      91-class COCO detector for V-COCO, detr/models/detr.py:317-320) ----
if [ "${FETCH_VCOCO:-0}" = "1" ]; then
    fetch_url "https://dl.fbaipublicfiles.com/detr/detr-r50-e632da11.pth" \
              "checkpoints/detr-r50-e632da11.pth"
fi

# ---- V-COCO (COCO 2014 images + in-repo annotation producer) -------------
if [ "${FETCH_VCOCO:-0}" = "1" ]; then
    for part in train2014 val2014; do
        if [ ! -d "datasets/vcoco/images/$part" ]; then
            mkdir -p datasets/vcoco/images
            fetch_url "http://images.cocodataset.org/zips/${part}.zip" \
                      "datasets/vcoco/${part}.zip"
            unzip -q "datasets/vcoco/${part}.zip" -d datasets/vcoco/images
        fi
    done
    python -m hoigen_tpu.cli.prepare_data vcoco-annotations \
        --data-root datasets/vcoco || true
fi

echo "[fetch_data] done. Artifacts:"
ls -l checkpoints checkpoints/pretrained_clip hicodet_pkl_files 2>/dev/null
