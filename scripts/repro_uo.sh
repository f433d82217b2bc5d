#!/usr/bin/env bash
# UO (unseen object) — Full 33.48 / Seen 32.90 / Unseen 36.35
# (reference README.md:126; BASELINE.md).
source "$(dirname "$0")/repro_common.sh"
run_config uo unseen_object "$@"
expect 33.48 32.90 36.35
