#!/usr/bin/env bash
# Launch matrix for all scenes/modes (single CLI covers both model families).
# TPU device selection is automatic; for multi-chip set
# parallel.data_parallel: True in the config.

ENDOSURF_CFGS="base_pull base_cut base_d1k1 base_d2k1 base_d3k1 base_d6k1 base_d7k1"
ENDONERF_CFGS="$ENDOSURF_CFGS"
ABLATIONS="no_sdf_loss no_angle_loss no_eikonal_loss no_surf_neig_loss"

for c in $ENDOSURF_CFGS; do
  python -m endosurf_tpu --cfg configs/endosurf/baseline/$c.yml --mode train
done
for c in $ENDOSURF_CFGS; do
  python -m endosurf_tpu --cfg configs/endosurf/baseline/$c.yml --mode test
  python -m endosurf_tpu --cfg configs/endosurf/baseline/$c.yml --mode demo
done

for c in $ENDONERF_CFGS; do
  python -m endosurf_tpu --cfg configs/endonerf/baseline/$c.yml --mode train
done
for c in $ENDONERF_CFGS; do
  python -m endosurf_tpu --cfg configs/endonerf/baseline/$c.yml --mode test
  python -m endosurf_tpu --cfg configs/endonerf/baseline/$c.yml --mode demo
done

for a in $ABLATIONS; do
  python -m endosurf_tpu --cfg configs/endosurf/ablation/$a.yml --mode train
  python -m endosurf_tpu --cfg configs/endosurf/ablation/$a.yml --mode test
done
