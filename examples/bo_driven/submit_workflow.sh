#!/bin/bash
# SLURM entry point for the full BO workflow (reference
# examples/bo_driven/submit_workflow.sh). On a TPU host without SLURM just
# run workflow_driver.py (process fan-out) or mesh_workflow_driver.py
# (concurrent trials over mesh slices) directly.
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --ntasks-per-node=1
#SBATCH --time=48:00:00
#SBATCH --cpus-per-task=4
#SBATCH --mem=8g

python3 workflow_driver.py --output "$(date +%F)_output_percentile95_uethpt" \
    --rundir "$(date +%F)_rundir" --config config.yaml
