"""Mesh transparency: dp8-vs-1dev numbers comparison + attribution.

VERDICT r4 next-round item 3: round 4 banked both mesh-cell trees
(``experiments/grid_r4/mesh_cell/results_1dev`` and ``results_dp8_v2``,
airfoil x ensemble x tails through the same BO trajectory) but committed
no numbers-match comparison.  This script produces it, in two parts:

``compare``
    Aligns the two trees trial-for-trial and writes
    ``experiments/grid_r5/artifacts/mesh_compare.csv``: hyperparameters
    must be byte-identical (the BO trajectory is seed-deterministic and
    the mesh must not perturb it); score columns are reported with
    absolute/relative deltas; timing/throughput columns are excluded
    from the match claim (they differ by design — dp8 on a 1-core host
    emulates 8 devices).

``sensitivity``
    The *attribution* experiment.  Step-level transparency is already
    proven to ~1e-5 (tests/test_sharding.py: one fit epoch dp4 == 1dev
    at atol 1e-4, sharded UE eval at 1e-5), yet full-trial scores differ
    by ~1-4%.  Hypothesis: a ~300-epoch AdamW + ReduceLROnPlateau +
    EarlyStopping trajectory is chaotic — reduction-order noise (the only
    thing dp sharding changes, ~1e-7/step) is Lyapunov-amplified and can
    flip plateau/early-stop epochs.  Probe: train the same cell (trial-1
    hyperparameters, num_models=3) four ways on the virtual CPU mesh —
      a  1dev baseline
      a2 1dev rerun            (expected bitwise-equal: determinism)
      b  1dev, one training input perturbed by +1e-7 (chaos probe)
      c  dp8 mesh
    If |c-a| is of the same order as |b-a| (and a2 == a exactly), the
    dp divergence is chaotic amplification of reduction-order noise, not
    a semantic sharding bug.  Writes
    ``experiments/grid_r5/artifacts/mesh_sensitivity.json``.

Run with:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python experiments/grid_r5/mesh_compare.py compare|sensitivity

Reference contract being matched: one BO trial is one single-process
train+eval (reference ``examples/bo_driven/workflow_driver.py:105-127``);
the mesh must be a transparent execution strategy for that trial.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

# pin the virtual 8-device CPU platform in-process (the JAX_PLATFORMS env
# route does not apply --xla_force_host_platform_device_count under the
# axon plugin; same pattern as tests/conftest.py and
# mesh_workflow_driver --cpu_devices)
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import click
import numpy as np
import pandas as pd
import yaml

TREE_1DEV = REPO / 'experiments/grid_r4/mesh_cell/results_1dev'
TREE_DP8 = REPO / 'experiments/grid_r4/mesh_cell/results_dp8_v2'
ART = REPO / 'experiments/grid_r5/artifacts'
CELL = ('airfoil', 'tails', 'ensemble')
CFG = REPO / 'experiments/grid_r4/config_mesh_airfoil.yaml'

HPARAM_COLS = ['num_models', 'learning_rate', 'batch_size', 'weight_decay']
SCORE_COLS = ['percentile_score', 'id_ue', 'ood_ue', 'id_loss', 'ood_loss']
TIMING_COLS = ['ue_time', 'uncertainty_estimating_throughput', 'id_time',
               'ood_time', 'ue_throughput', 'id_ue_throughput',
               'ood_ue_throughput', 'train_time']


def _final_results(tree):
    b, d, m = CELL
    cell = Path(tree) / b / d / m
    trials = sorted((p for p in cell.glob('bo_trial_*')
                     if (p / 'trial_results.csv').is_file()),
                    key=lambda p: int(p.name.rsplit('_', 1)[1]))
    if not trials:
        raise SystemExit(f'no finished trials under {cell}')
    return pd.read_csv(trials[-1] / 'trial_results.csv')


@click.group()
def cli():
    pass


@cli.command()
def compare():
    a = _final_results(TREE_1DEV).set_index('trial')
    c = _final_results(TREE_DP8).set_index('trial')
    common = sorted(set(a.index) & set(c.index))
    rows = []
    for t in common:
        row = {'trial': t}
        for col in HPARAM_COLS:
            va, vc = a.loc[t, col], c.loc[t, col]
            row[col] = va
            row[f'{col}_match'] = bool(va == vc)
        for col in SCORE_COLS:
            va, vc = float(a.loc[t, col]), float(c.loc[t, col])
            row[f'{col}_1dev'] = va
            row[f'{col}_dp8'] = vc
            row[f'{col}_reldiff'] = abs(vc - va) / max(abs(va), 1e-12)
        rows.append(row)
    df = pd.DataFrame(rows)
    ART.mkdir(parents=True, exist_ok=True)
    out = ART / 'mesh_compare.csv'
    df.to_csv(out, index=False)
    print(f'{len(common)} common trials ({sorted(common)}) -> {out}')
    print('hyperparameters identical:',
          bool(df[[f'{c}_match' for c in HPARAM_COLS]].all().all()))
    for col in SCORE_COLS:
        print(f'{col}: max rel diff '
              f'{df[f"{col}_reldiff"].max():.4%}')


def _train_once(tag, perturb=False, mesh=None):
    """One trial-1-hyperparameter train+eval; returns the score dict."""
    from nnueehcs_tpu.driver import (build_model, get_trainer, load_model,
                                     enable_compilation_cache)
    from nnueehcs_tpu.data_utils import get_dataset, prepare_dataset_for_use
    from nnueehcs_tpu.training import DataLoader

    enable_compilation_cache()
    with open(CFG) as f:
        config = yaml.safe_load(f)
    bench, dset_name, method = CELL
    training_cfg = dict(config['training'])
    training_cfg.pop('parameter_space', None)
    training_cfg.update(learning_rate=5e-05, batch_size=128,
                        weight_decay=0.0)
    uq_config = {k: dict(v) for k, v in config['uq_methods'].items()}
    uq_config[method].pop('parameter_space', None)
    uq_config[method]['num_models'] = 3     # dp8_v2 trial 1 draw
    trainer_cfg = dict(config['trainer'])
    if mesh:
        trainer_cfg['mesh'] = mesh

    dset = get_dataset(config['benchmarks'][bench]['datasets'], dset_name)
    dset = prepare_dataset_for_use(dset, training_cfg)
    if perturb:
        # chaos probe: one input element nudged by 1e-7 (the magnitude of
        # one step's reduction-order noise)
        dset.input[0, 0] += 1e-7
    model = build_model(config['benchmarks'][bench]['model'], uq_config,
                        method, training_cfg)
    model.to(dset.dtype)
    tree = REPO / f'experiments/grid_r5/mesh_sens/{tag}'
    trainer = get_trainer(trainer_cfg, bench, model, method, dset_name,
                          version='bo_trial_0', log_dir=str(tree))
    train_dl = DataLoader(dset, batch_size=128, shuffle=True,
                          drop_last=True)
    test_dl = DataLoader(dset, batch_size=128, shuffle=False)
    t0 = time.time()
    trainer.fit(model, train_dl, test_dl)
    ttime = time.time() - t0

    model = load_model(f'{trainer.logger.log_dir}/model.pth')
    dset_id = get_dataset(config['benchmarks'][bench]['datasets'], dset_name)
    dset_ood = get_dataset(config['benchmarks'][bench]['datasets'],
                           dset_name, is_ood=True)
    dset_ood = prepare_dataset_for_use(dset_ood, training_cfg,
                                       scaling_dset=dset_id)
    dset_id = prepare_dataset_for_use(dset_id, training_cfg)
    if mesh:
        from nnueehcs_tpu.parallel.mesh import make_mesh
        model.attach_mesh(make_mesh(mesh))
    pid, uid = model(np.asarray(dset_id.input), return_ue=True)
    pood, uood = model(np.asarray(dset_ood.input), return_ue=True)
    res = {
        'tag': tag,
        'val_loss': float(trainer.callback_metrics['val_loss']),
        'percentile_score': float(np.percentile(np.asarray(uid), 95)),
        'id_ue': float(np.mean(np.asarray(uid))),
        'ood_ue': float(np.mean(np.asarray(uood))),
        'id_loss': float(np.mean(
            (np.asarray(pid) - np.asarray(dset_id.output)) ** 2)),
        'ood_loss': float(np.mean(
            (np.asarray(pood) - np.asarray(dset_ood.output)) ** 2)),
        'train_time_s': round(ttime, 1),
    }
    print(json.dumps(res))
    return res


@cli.command()
def sensitivity():
    runs = {
        'a_1dev': _train_once('a_1dev'),
        'a2_1dev_rerun': _train_once('a2_1dev_rerun'),
        'b_1dev_perturbed': _train_once('b_1dev_perturbed', perturb=True),
        'c_dp8': _train_once('c_dp8', mesh={'dp': 8}),
    }
    metrics = ['val_loss', 'percentile_score', 'id_ue', 'ood_ue',
               'id_loss', 'ood_loss']
    a = runs['a_1dev']

    def reldiff(r):
        return {m: abs(r[m] - a[m]) / max(abs(a[m]), 1e-12) for m in metrics}

    summary = {
        'runs': runs,
        'reldiff_vs_a': {
            'a2_rerun': reldiff(runs['a2_1dev_rerun']),
            'b_perturbed_1e-7': reldiff(runs['b_1dev_perturbed']),
            'c_dp8': reldiff(runs['c_dp8']),
        },
    }
    b_max = max(summary['reldiff_vs_a']['b_perturbed_1e-7'].values())
    c_max = max(summary['reldiff_vs_a']['c_dp8'].values())
    a2_max = max(summary['reldiff_vs_a']['a2_rerun'].values())
    summary['conclusion'] = {
        'rerun_deterministic': a2_max == 0.0,
        'max_reldiff_perturbed': b_max,
        'max_reldiff_dp8': c_max,
        'dp8_within_chaotic_sensitivity': bool(c_max <= 10 * max(b_max,
                                                                 1e-12)),
    }
    ART.mkdir(parents=True, exist_ok=True)
    out = ART / 'mesh_sensitivity.json'
    with open(out, 'w') as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary['conclusion'], indent=2))
    print(f'-> {out}')


if __name__ == '__main__':
    cli()
