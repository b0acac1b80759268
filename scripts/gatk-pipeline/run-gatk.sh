#!/bin/bash
# Comparison caller: GATK HaplotypeCaller -> filtered het SNP VCF
# (reference gatk-pipeline/run-gatk.sh).
set -euo pipefail
command -v gatk >/dev/null || { echo "gatk not found" >&2; exit 1; }

chrom=${1:?chromosome required}
sample=${SAMPLE:-C57BL_6NJ}
input="$HOME/data/${sample}_${chrom}.dedup.bam"
ref=${REF:-$HOME/data/reference.fa}
raw="raw_output_$chrom.vcf"
snps="raw_snps_$chrom.vcf"
filtered="filtered_snps_$chrom.vcf"
het="het_snps_$chrom.vcf"

gatk -T HaplotypeCaller -R "$ref" -I "$input" -L "$chrom" --genotyping_mode DISCOVERY -stand_call_conf 20 -o "$raw" &&
gatk -T SelectVariants -R "$ref" -V "$raw" -selectType SNP -o "$snps" &&
gatk -T VariantFiltration -R "$ref" -V "$snps" --filterExpression "QD < 2.0 || FS > 60.0 || MQ < 40.0" --filterName "snpfilter" -o "$filtered" &&
grep PASS "$filtered" | grep -e "0/1" -e "1/2" > "$het"
