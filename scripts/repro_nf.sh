#!/usr/bin/env bash
# NF-UC (non-rare-first unseen combination; num_shot 1 per train_hico.sh:13)
# — Full 33.08 / Seen 32.86 / Unseen 33.98 (reference README.md:125).
source "$(dirname "$0")/repro_common.sh"
run_config nf non_rare_first --num-shot 1 "$@"
expect 33.08 32.86 33.98
