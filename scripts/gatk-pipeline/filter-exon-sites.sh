#!/bin/bash
# het SNP VCFs -> exon annotations via the shared vcfsite2csv adapter.
set -euo pipefail
chroms=${*:-1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 X Y MT}
for c in $chroms; do
    if [ -n "${EXON_TABLE:-}" ]; then
        ../vcfsite2csv.sh < "het_snps_$c.vcf" | sed '1i chrom,pos' | \
            python -m sid_tpu.tools.exons --exon-table "$EXON_TABLE" > "exon_snps_$c.csv"
    else
        ../vcfsite2csv.sh < "het_snps_$c.vcf" | sed '1i chrom,pos' | \
            python -m sid_tpu.tools.exons --mysql > "exon_snps_$c.csv"
    fi
done
