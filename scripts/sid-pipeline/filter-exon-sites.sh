#!/bin/bash
# Exon filter per chromosome: snps_$c.csv -> exon_snps_$c.csv.
# EXON_TABLE=<csv> uses the offline table; otherwise queries Ensembl MySQL.
set -euo pipefail
chroms=${*:-1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 X Y MT}
for c in $chroms; do
    if [ -n "${EXON_TABLE:-}" ]; then
        python -m sid_tpu.tools.exons --exon-table "$EXON_TABLE" \
            < "snps_$c.csv" > "exon_snps_$c.csv"
    else
        python -m sid_tpu.tools.exons --mysql < "snps_$c.csv" > "exon_snps_$c.csv"
    fi
done
