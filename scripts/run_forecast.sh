#!/usr/bin/env bash
# The reference forecast protocol (reference scripts/run_forecast.sh:9-27):
# 40-step (10-day) forecasts initialized every 36 h over a full held-out
# year, written to a WB2-layout zarr. Edit the paths below for your run.
set -euo pipefail

DATASET_PATH=/path/to/preprocessed/dataset
PYTHON=python

BASE_DIR=/path/to/log/dir
CKPT_PATH="$(${PYTHON} -c "import json;print(json.load(open('${BASE_DIR}/checkpoints/last.json'))['path'])")"

YEAR=2020
START_DATE="${YEAR}-01-01"
END_DATE="${YEAR}-12-31"
FORECAST_STEPS=40

${PYTHON} -m paradis_tpu.cli.forecast \
  --config "${BASE_DIR}/config.yaml" \
  --checkpoint-path "${CKPT_PATH}" \
  --output-file "${BASE_DIR}/forecast/${YEAR}.zarr" \
  --root-dir "${DATASET_PATH}" \
  --start-date "${START_DATE}" \
  --end-date "${END_DATE}" \
  --forecast-steps "${FORECAST_STEPS}" \
  --sampling-interval 36h \
  --batch-size 1 \
  --num-devices 1 \
  --write-every-n 10

# headline scoring (Z500 / T850 lat-weighted RMSE); --truth accepts either a
# preprocessed store or a raw WB2-layout archive
${PYTHON} -m paradis_tpu.forecast.evaluate \
  --forecast "${BASE_DIR}/forecast/${YEAR}.zarr" \
  --truth "${DATASET_PATH}" \
  --variables geopotential:500 temperature:850 \
  --lead-hours 24 72 120
