#!/bin/bash
# KDE-variant workflow submission (reference submit_workflow_kde.sh).
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --ntasks-per-node=1
#SBATCH --time=48:00:00
#SBATCH --cpus-per-task=4
#SBATCH --mem=8g

python3 workflow_driver.py --output "$(date +%F)_output_kde" \
    --rundir "$(date +%F)_rundir_kde" --config config_kde.yaml
