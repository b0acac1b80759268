#!/bin/bash
# Whole pipeline: call -> SNPs -> exon filter -> nonsyn labels.
# Usage: run.sh input.plp[.gz] workdir [exon_table.csv]
set -euo pipefail
input=${1:?usage: run.sh input.plp[.gz] workdir [exon_table.csv]}
workdir=${2:?workdir required}
exon_table=${3:-}

args=("$input" --workdir "$workdir" --method likelihood_ratio)
if [ -n "$exon_table" ]; then args+=(--exon-table "$exon_table"); fi
exec python -m sid_tpu.tools.pipeline "${args[@]}"
