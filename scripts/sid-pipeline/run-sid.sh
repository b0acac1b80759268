#!/bin/bash
# Per-chromosome calling shard (reference run-sid.sh shape): pileup ->
# gzipped raw CSV -> het SNP rows. Expects $HOME/data/<sample>_$1.plp.gz.
set -euo pipefail
chrom=${1:?chromosome required}
sample=${SAMPLE:-C57BL_6NJ}
sid_params=${SID_PARAMS:--R -m likelihood_ratio}

inputgz="$HOME/data/${sample}_${chrom}.plp.gz"
raw="raw_$chrom.csv.gz"
snps="snps_$chrom.csv"

tmp=$(mktemp -p "${TMPDIR:-/dev/shm}" sidtpu.XXXXXX) || tmp=$(mktemp)
zcat "$inputgz" > "$tmp" &&
    python -m sid_tpu.cli $sid_params "$tmp" | gzip -c > "$raw" &&
    zgrep ,het, "$raw" > "$snps" || true
rm -f "$tmp"
