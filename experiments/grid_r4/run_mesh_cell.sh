#!/bin/bash
# Round-4 mesh-transparency cell (VERDICT r3 item 7): airfoil x ensemble
# x tails through mesh_workflow_driver.py on the virtual 8-device CPU
# mesh (trainer mesh dp=8), then the SAME reduced-budget cell single-
# device, for a trial-for-trial comparison.  Budget is 6 trials (the
# Sobol phase, identical parameter draws): a full 50-trial CPU cell is
# ~12-30h on this 1-core host — the transparency claim needs matched
# numbers, not budget.  Chained behind the delta_uq evalmetrics queue.
set -u
cd "$(dirname "$0")/../.."
G=experiments/grid_r4
# wait for the posthoc queue to release the CPU
while ps -p "$(cat /tmp/posthoc.pid 2>/dev/null || echo 0)" > /dev/null 2>&1; do
    sleep 60
done
export XLA_FLAGS=--xla_force_host_platform_device_count=8
export JAX_PLATFORMS=cpu
nice -n 19 python examples/bo_driven/mesh_workflow_driver.py \
    --config $G/config_mesh_airfoil.yaml \
    --output $G/mesh_cell/results_dp8 \
    --slices 1 \
    --cells airfoil:ensemble:tails \
    >> $G/mesh_cell.log 2>&1
echo MESH_DP8_DONE >> $G/mesh_cell.log
nice -n 19 python examples/bo_driven/bo.py \
    --benchmark airfoil --uq_method ensemble --dataset tails \
    --config $G/config_mesh_airfoil.yaml \
    --output $G/mesh_cell/results_1dev --platform cpu \
    >> $G/mesh_cell.log 2>&1
echo MESH_1DEV_DONE >> $G/mesh_cell.log
