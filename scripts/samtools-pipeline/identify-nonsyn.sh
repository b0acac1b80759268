#!/bin/bash
# Codon labels against the sid-tpu local-method raw CSVs.
set -euo pipefail
chroms=${*:-1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 X Y MT}
for c in $chroms; do
    python -m sid_tpu.tools.nonsynonymous "exon_snps_$c.csv" \
        "../sid-local-output/raw_$c.csv.gz" > "nonsynonymous_exon_snps_$c.csv"
done
