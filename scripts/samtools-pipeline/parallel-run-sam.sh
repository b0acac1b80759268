#!/bin/bash
set -euo pipefail
chroms="1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 X Y MT"
if command -v parallel >/dev/null; then
    parallel -u -t "$@" "./run-sam.sh" ::: $chroms
else
    printf '%s\n' $chroms | xargs -P 4 -I{} ./run-sam.sh {}
fi
