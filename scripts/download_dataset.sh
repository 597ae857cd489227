#!/usr/bin/env bash
# Download the WeatherBench-2 ERA5 5.625° (64x32) equiangular archive —
# the training source the reference uses (reference scripts/download_dataset.sh).
# Requires gsutil and ~several hundred GB of space; select variables only.
set -euo pipefail

DEST="${1:-./wb2_era5_5.625deg}"
SRC="gs://weatherbench2/datasets/era5/1959-2023_01_10-6h-64x32_equiangular_conservative.zarr"

VARS=(
  10m_u_component_of_wind 10m_v_component_of_wind 2m_temperature
  mean_sea_level_pressure temperature u_component_of_wind
  v_component_of_wind vertical_velocity specific_humidity geopotential
  total_precipitation_6hr land_sea_mask geopotential_at_surface
  slope_of_sub_gridscale_orography standard_deviation_of_orography
)

mkdir -p "$DEST"
gsutil -m cp "$SRC/.zattrs" "$SRC/.zgroup" "$SRC/.zmetadata" "$DEST/" || true
for coord in time latitude longitude level; do
  gsutil -m cp -r "$SRC/$coord" "$DEST/" || true
done
for var in "${VARS[@]}"; do
  echo ">> $var"
  gsutil -m cp -r "$SRC/$var" "$DEST/"
done

echo "done: $DEST"
echo "next: python -m paradis_tpu.cli.preprocess -i $DEST -o <training-store> --levels 13"
