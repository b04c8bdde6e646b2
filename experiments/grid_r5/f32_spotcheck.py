"""f32 spot-check of the flagship cell's bf16-eval deviation.

VERDICT r4 weak #3 / next-round item 4: the banked
binomial_options x delta_uq x tails cell ran with ``eval_precision:
bf16-mixed`` (config_full_bf16eval.yaml; knob at driver.py:353-358) and
no committed artifact quantifies the metric drift of the banked rows
against an f32 evaluation.  This script re-evaluates the cell's Pareto
trials (trial 20 first, per the verdict) with the checkpointed f32
model at BOTH precisions:

  banked        the bf16-eval row in trial_results.csv (as recorded)
  rerun bf16    same model + data + precision re-evaluated today
                (isolates rerun/platform noise from precision drift)
  rerun f32     eval_precision unset — the reference-faithful precision

and reports the per-metric deltas for the UQ columns
(percentile_score, id_ue, ood_ue, id_loss, ood_loss).  Throughput
columns are excluded by design (precision changes them legitimately).

Output: experiments/grid_r5/artifacts/f32_spotcheck.csv + a drift table
on stdout.  Match: BASELINE.md 1e-5 parity bar; reference
examples/bo_driven/bo.py:205-280 (evaluation protocol).
"""
import os
import sys

os.chdir('/root/repo')
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/examples/metric_evaluation')

import numpy as np
import pandas as pd
import yaml

# session-3 note: the live results/ tree was wiped by a host
# re-provision (results/ is gitignored); read the BANKED cell instead —
# same trial_results.csv and the same Pareto model bundles, copied at
# bank time (bank-as-you-go policy, docs/EXPERIMENTS.md r4 notes).
CELL = ('experiments/full_cell/artifacts/binomial_options_delta_uq_tails'
        '/pareto_models')
RESULTS_CSV = ('experiments/full_cell/artifacts/'
               'binomial_options_delta_uq_tails/trial_results.csv')
CFG = 'examples/bo_driven/config_full.yaml'
OUT = 'experiments/grid_r5/artifacts/f32_spotcheck.csv'
UQ_COLS = ['percentile_score', 'id_ue', 'ood_ue', 'id_loss', 'ood_loss']


def main():
    from nnueehcs_tpu.data_utils import get_dataset, prepare_dataset_for_use
    from nnueehcs_tpu.training import load_model
    from nnueehcs_tpu.evaluation import get_uncertainty_evaluator
    from nnueehcs_tpu.driver import evaluate
    from evaluate_metrics import find_pareto_optimal_runs, get_evaluators

    with open(CFG) as f:
        cfg = yaml.safe_load(f)
    bo_cfg = cfg['bo_config']
    training_cfg = dict(cfg['training'])
    dataset_cfg = cfg['benchmarks']['binomial_options']['datasets']
    evaluators = get_uncertainty_evaluator(bo_cfg['evaluation_metric'])
    train_eval_metrics = [
        ev.metrics[0]
        for ev in get_evaluators(bo_cfg['evaluation_metric'])]

    class _Inst:                      # find_pareto's ResultsInstance shim
        def get_trial_results_file(self):
            return RESULTS_CSV

    pareto = find_pareto_optimal_runs(_Inst(), train_eval_metrics)
    pareto_trials = sorted(int(r['trial']) for r in pareto)
    # only trials whose model bundle was banked survive the re-provision
    trials = [t for t in sorted(set([20] + pareto_trials))
              if os.path.exists(f'{CELL}/bo_trial_{t}/model.pth')][:4]
    print(f'# Pareto trials: {pareto_trials}; banked+checking {trials}')

    banked = pd.read_csv(RESULTS_CSV)
    banked = banked[banked['failed'] != True]  # noqa: E712

    # ID/OOD exactly as the BO loop prepares them (OOD scaled by ID first)
    dset_id = get_dataset(dataset_cfg, 'tails')
    dset_ood = get_dataset(dataset_cfg, 'tails', is_ood=True)
    dset_ood = prepare_dataset_for_use(dset_ood, training_cfg,
                                       scaling_dset=dset_id)
    dset_id = prepare_dataset_for_use(dset_id, training_cfg)

    rows = []
    for t in trials:
        brow = banked[banked['trial'] == t].iloc[-1]
        for precision in ('bf16-mixed', None):
            model = load_model(f'{CELL}/bo_trial_{t}/model.pth')
            model.eval()
            if precision:
                model.set_precision(precision)
            res = evaluate(model, dset_id, dset_ood, evaluators,
                           warmup=1, trials=2)
            got = {
                'percentile_score': None,
                'id_ue': float(res['id_ue'].mean()),
                'ood_ue': float(res['ood_ue'].mean()),
                'id_loss': res['id_loss'],
                'ood_loss': res['ood_loss'],
            }
            for metric, mres in zip(evaluators.metrics,
                                    res['metric_results']):
                if metric.get_name() == 'percentile_score':
                    got['percentile_score'] = float(list(mres.values())[0])
            label = precision or 'f32'
            row = {'trial': t, 'precision': label}
            for c in UQ_COLS:
                row[c] = got[c]
                row[f'{c}_banked'] = float(brow[c])
                row[f'{c}_delta'] = got[c] - float(brow[c])
            rows.append(row)
            print(f'trial {t} [{label}]: ' + '  '.join(
                f'{c}={got[c]:.6g} (banked {float(brow[c]):.6g}, '
                f'd={got[c] - float(brow[c]):+.2e})' for c in UQ_COLS))

    df = pd.DataFrame(rows)
    df.to_csv(OUT, index=False)
    print(f'\n# drift summary (rerun-f32 vs banked-bf16 rows):')
    f32 = df[df['precision'] == 'f32']
    for c in UQ_COLS:
        print(f'#   {c:18s} max|delta| = {f32[f"{c}_delta"].abs().max():.3e}')
    b16 = df[df['precision'] == 'bf16-mixed']
    print(f'# rerun-bf16 vs banked (pure rerun noise):')
    for c in UQ_COLS:
        print(f'#   {c:18s} max|delta| = {b16[f"{c}_delta"].abs().max():.3e}')
    print(f'# wrote {OUT}')


if __name__ == '__main__':
    main()
