#!/bin/bash
# Comparison caller: bcftools on one chromosome -> het SNP VCF
# (reference samtools-pipeline/run-sam.sh; parameters from the Sanger mouse
# SNP release README).
set -euo pipefail
command -v samtools >/dev/null || { echo "samtools not found" >&2; exit 1; }
command -v bcftools >/dev/null || { echo "bcftools not found" >&2; exit 1; }

chrom=${1:?chromosome required}
sample=${SAMPLE:-C57BL_6NJ}
bam="$HOME/data/${sample}_${chrom}.dedup.bam"
ref=${REF:-$HOME/data/reference.fa}
raw="raw_$chrom.vcf"
called="called_$chrom.vcf"
het="het_snps_$chrom.vcf"

samtools mpileup -t DP,DV,DP4,SP,DPR,INFO/DPR -E -Q 0 -pm3 -F0.25 -d500 -v -f "$ref" "$bam" > "$raw" &&
bcftools call -mv -f GQ,GP -p 0.99 "$raw" > "$called" &&
grep -v INDEL "$called" | grep -e "0/1" -e "1/2" -e "0/2" > "$het"
