#!/usr/bin/env bash
# UC (unseen combination): trains/evals all five uc0..uc4 splits; the
# published number is their average — Full 33.44 / Seen 34.23 / Unseen 30.26
# (reference README.md:123; BASELINE.md).
source "$(dirname "$0")/repro_common.sh"
for split in uc0 uc1 uc2 uc3 uc4; do
    run_config "$split" "$split" "$@"
done
expect 33.44 34.23 30.26
