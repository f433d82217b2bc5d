#!/usr/bin/env bash
# UV (unseen verb) — Full 32.34 / Seen 34.31 / Unseen 20.27
# (reference README.md:127; BASELINE.md).
source "$(dirname "$0")/repro_common.sh"
run_config uv unseen_verb "$@"
expect 32.34 34.31 20.27
