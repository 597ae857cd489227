#!/usr/bin/env bash
# Preprocessing batch-job driver (reference scripts/preprocess_dataset.sh):
# raw WB2 archive -> per-year stacked training stores + stats/constants.
set -euo pipefail

mkdir -p logs

PYTHON=python

INPUT=/path/to/wb2/archive.zarr
OUTPUT=/path/to/output/store

START_YEAR=1979
END_YEAR=2023

echo "========================================"
echo "Preprocessing job started"
echo "Host: $(hostname)   Start: $(date)"
echo "Input: ${INPUT} -> Output: ${OUTPUT}"
echo "========================================"

# the preprocessor is single-process numpy; keep BLAS single-threaded
export OMP_NUM_THREADS=1
export MKL_NUM_THREADS=1
export OPENBLAS_NUM_THREADS=1

set -x
${PYTHON} -m paradis_tpu.cli.preprocess \
    -i "${INPUT}" \
    -o "${OUTPUT}" \
    --begin_year="${START_YEAR}" \
    --end_year="${END_YEAR}" \
    --levels 13
set +x

echo "Preprocessing job finished: $(date)"
