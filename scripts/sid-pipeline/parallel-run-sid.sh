#!/bin/bash
# Chromosome fan-out (reference parallel-run-sid.sh). Prefers GNU parallel,
# falls back to xargs -P.
set -euo pipefail
chroms="1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 X Y MT"
if command -v parallel >/dev/null; then
    parallel "$@" "./run-sid.sh" ::: $chroms
else
    printf '%s\n' $chroms | xargs -P 4 -I{} ./run-sid.sh {}
fi
