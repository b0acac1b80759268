#!/bin/bash
# BAM -> per-chromosome deduplicated pileups (reference scripts/prepare-data.sh).
# Usage: prepare-data.sh input.bam "1 2 3 ... X Y MT" [picard.jar]
set -euo pipefail

command -v samtools >/dev/null || { echo "samtools not found" >&2; exit 1; }

bam=${1:?usage: prepare-data.sh input.bam "chromosomes" [picard.jar]}
chromosomes=${2:?chromosome list required}
picard=${3:-picard.jar}
base=$(basename "$bam" .bam)

for c in $chromosomes; do
    samtools view -b "$bam" "$c" > "${base}_${c}.bam" &
    while [ "$(jobs -r | wc -l)" -ge 3 ]; do wait -n; done
done
wait

if [ -f "$picard" ]; then
    for c in $chromosomes; do
        java -jar "$picard" MarkDuplicates INPUT="${base}_${c}.bam" \
            OUTPUT="${base}_${c}.dedup.bam" METRICS_FILE="dedup-metrics-$c.txt" \
            REMOVE_DUPLICATES=true
    done
else
    echo "picard.jar not found; skipping duplicate removal" >&2
    for c in $chromosomes; do cp "${base}_${c}.bam" "${base}_${c}.dedup.bam"; done
fi

for c in $chromosomes; do
    samtools mpileup -C50 -q1 "${base}_${c}.dedup.bam" | gzip -c > "${base}_${c}.plp.gz" &
    while [ "$(jobs -r | wc -l)" -ge 3 ]; do wait -n; done
done
wait
