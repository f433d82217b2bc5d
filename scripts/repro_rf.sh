#!/usr/bin/env bash
# RF-UC (rare-first unseen combination) — Full 33.86 / Seen 34.57 /
# Unseen 31.01 (reference README.md:124; BASELINE.md).
source "$(dirname "$0")/repro_common.sh"
run_config rf rare_first "$@"
expect 33.86 34.57 31.01
