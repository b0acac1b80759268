#!/bin/bash
# VCF -> "chrom,pos" CSV adapter (reference scripts/vcfsite2csv.sh behavior).
grep -v -e "^#" | cut -f1,2 | sed 's/\t/,/'
