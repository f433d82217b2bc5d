#!/usr/bin/env bash
# Fully-supervised HICO-DET (117 verbs, multi-hot) — reference README.md:79-83.
# Prints full / rare / non-rare mAP (no published number upstream).
source "$(dirname "$0")/repro_common.sh"
run_config fs "" "$@"
