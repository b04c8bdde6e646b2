"""BO experiment driver: the train→evaluate→record loop, output management
and restart logic.

The reference keeps this machinery inside ``examples/bo_driven/bo.py``
(OutputManager ``bo.py:30-132``, evaluate ``bo.py:205-280``, restart
``bo.py:282-302``, main loop ``bo.py:380-510``); here it is a first-class,
tested framework module and the example is a thin CLI.  All on-disk
contracts are preserved:

- per-trial directory ``<output>/<benchmark>/<dataset>/<method>/bo_trial_<N>``
  with ``ax_client.json``, ``ax_client_optimization_step.json``,
  ``trial_results.csv``, ``metrics.csv``, ``model.pth``,
- restart scans for the first incomplete trial dir (completeness = all three
  state files present) and reloads the BO client from the last complete one,
- the ``trial_results.csv`` column schema (reference ``bo.py:448-467``).
"""
from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from .bo import AxClient, ObjectiveProperties
from .data_utils import get_dataset, prepare_dataset_for_use
from .evaluation import UncertaintyEstimate, get_uncertainty_evaluator
from .model_builder import (EnsembleModelBuilder, KDEModelBuilder,
                            KNNKDEModelBuilder, DeltaUQMLPModelBuilder,
                            PAGERModelBuilder, MCDropoutModelBuilder,
                            MVEModelBuilder)
from .training import Trainer, ModelSavingCallback, EarlyStopping, DataLoader, load_model


_COMPILE_CACHE_READY = False


def enable_compilation_cache(cache_dir: str = None):
    """Persistent XLA compilation cache: successive BO trials (and restarted
    processes) re-use compiled programs for recurring shape signatures
    instead of recompiling every trial (SURVEY §7 'cache by shape
    signature')."""
    global _COMPILE_CACHE_READY
    if _COMPILE_CACHE_READY:
        return
    import os
    if jax.default_backend() == 'cpu':
        # CPU AOT cache entries are machine-feature specific and can be
        # poisoned across hosts ("SIGILL" loader warnings); the cache only
        # pays off for expensive TPU compiles anyway
        return
    try:
        cache_dir = cache_dir or os.path.join(
            os.path.expanduser('~'), '.cache', 'nnueehcs_tpu_xla')
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        _COMPILE_CACHE_READY = True
    except Exception as e:   # cache is an optimisation, never fatal
        print(f'compilation cache unavailable: {e}')


class OutputManager:
    """Per-trial output directory manager + restart-index scanner."""

    def __init__(self, directory_prefix, benchmark_name,
                 append_benchmark_name=True):
        self.benchmark_name = benchmark_name
        if append_benchmark_name:
            self.output_dir_name = f'{directory_prefix}_{benchmark_name}'
        else:
            self.output_dir_name = f'{directory_prefix}'
        self.output_dir_path = Path(self.output_dir_name)
        self.output_dir_path.mkdir(parents=True, exist_ok=True)

    def set_output_dir(self, output_dir):
        self.output_dir_path = output_dir

    @classmethod
    def get_datetime_prefix(cls):
        return datetime.now().strftime('%Y-%m-%d')

    def save_optimization_state(self, optimization_step, ax_client,
                                name='ax_client'):
        ax_client.save_to_json_file(f'{self.output_dir_path}/{name}.json')
        dat = {'optimization_step': optimization_step}
        with open(f'{self.output_dir_path}/{name}_optimization_step.json',
                  'w') as f:
            f.write(json.dumps(dat))

    def save_pareto_parameters(self, pareto_parameters,
                               name='pareto_parameters'):
        with open(f'{self.output_dir_path}/{name}.json', 'w') as f:
            f.write(pareto_parameters)

    def save_trial_results_df(self, trial_results_df, name='trial_results'):
        trial_results_df.to_csv(f'{self.output_dir_path}/{name}.csv',
                                index=True)

    def save_trial_results_dict(self, trial_results_dict,
                                name='trial_results'):
        df = pd.DataFrame.from_dict(trial_results_dict, orient='index')
        df.index.name = 'trial'
        self.save_trial_results_df(df, name)

    def get_optimization_step(self):
        with open(f'{self.output_dir_path}/ax_client_optimization_step.json') as f:
            return json.load(f)['optimization_step']

    def get_optimization_state(self):
        with open(f'{self.output_dir_path}/ax_client.json') as f:
            return json.load(f)

    def get_optimization_state_file(self):
        return f'{self.output_dir_path}/ax_client.json'

    def get_trial_results(self):
        return pd.read_csv(f'{self.output_dir_path}/trial_results.csv')

    def get_output_dir(self):
        return self.output_dir_path

    def output_exists(self):
        return self.output_dir_path.exists()

    def run_completed(self, run_index):
        opt_dir = self.output_dir_path
        opt_dir_base, run_str = opt_dir.parent, opt_dir.name
        children = [x.name for x in opt_dir_base.iterdir()]
        run_prefix = self._get_run_prefix(run_str)

        target_dir = Path(f'{opt_dir_base}/{run_prefix}{run_index}')
        if target_dir.name not in children:
            return False
        names = [item.name for item in target_dir.iterdir()]
        return all(n in names for n in
                   ('ax_client.json', 'ax_client_optimization_step.json',
                    'trial_results.csv'))

    def get_restart_index(self):
        opt_dir_base = self.output_dir_path.parent
        max_restart_idx = 0
        for item in sorted(opt_dir_base.iterdir(),
                           key=lambda p: self._sort_key(p.name)):
            if self._is_run_directory(item.name):
                run_index = self._get_run_index(item.name)
                if self.run_completed(run_index):
                    max_restart_idx = max(max_restart_idx, run_index)
                    continue
                return run_index
        return max_restart_idx + 1

    @staticmethod
    def _sort_key(name):
        m = re.search(r'\d+', name)
        return int(m.group()) if m else -1

    def _get_run_index(self, run_str):
        return int(re.search(r'\d+', run_str).group())

    def _is_run_directory(self, run_str):
        return re.match(r'bo_trial_\d+', run_str) is not None

    def _get_run_prefix(self, run_dir):
        return re.compile(r'(\S+_)+(\d+)').match(run_dir).group(1)


@dataclass
class BOParameterWrapper:
    parameter_space: list
    parameter_constraints: list
    objectives: dict
    tracking_metric_names: list

    def get_parameter_names(self):
        return [p['name'] for p in self.parameter_space]


def get_params(config):
    parm_space = config['parameter_space']
    constraints = config.get('parameter_constraints', []) \
        if 'constraints' in config else []
    objectives_l = {}
    for c in config['objectives']:
        objectives_l[c['name']] = ObjectiveProperties(
            minimize=(c['type'] == 'minimize'))
    return BOParameterWrapper(parm_space, constraints, objectives_l,
                              config['tracking_metrics'])


UQ_METHOD_REGISTRY = {
    'ensemble': EnsembleModelBuilder,
    'kde': KDEModelBuilder,
    'knn_kde': KNNKDEModelBuilder,
    'delta_uq': DeltaUQMLPModelBuilder,
    'pager': PAGERModelBuilder,
    'mc_dropout': MCDropoutModelBuilder,
    'mve': MVEModelBuilder,
}


def register_uq_method(name: str, builder_cls) -> None:
    """Plugin hook: register a custom UQ method so configs/drivers can
    reference it by ``uq_method`` name."""
    UQ_METHOD_REGISTRY[name] = builder_cls


def get_model_builder_class(uq_method):
    try:
        return UQ_METHOD_REGISTRY[uq_method]
    except KeyError:
        raise ValueError(f'Unknown uq method {uq_method}')


def build_model(model_cfg, uq_config, uq_method, train_cfg):
    builder_class = get_model_builder_class(uq_method)
    builder = builder_class(model_cfg['architecture'], uq_config[uq_method],
                            train_config=train_cfg)
    return builder.build()


def get_trainer(trainer_config, name, model, ue_method, dataset,
                version=None, log_dir='logs'):
    # trainer.defer_checkpoint: serialize the best model once at fit end
    # instead of on every improvement (big win on slow host links)
    defer = bool(trainer_config.get('defer_checkpoint', False))
    callbacks = [EarlyStopping(monitor='val_loss', min_delta=0.00, patience=30,
                               verbose=False, mode='min'),
                 ModelSavingCallback(monitor='val_loss',
                                     defer_serialization=defer)]
    extra = model.get_callbacks()
    if extra:
        callbacks.extend(extra)
    return Trainer(f'{name}/{dataset}/{ue_method}', trainer_config,
                   callbacks=callbacks, log_dir=log_dir, version=version)


def evaluate(model, id_data, ood_data, evaluator,
             warmup: int = 5, trials: int = 10) -> dict:
    """Timed UE passes over ID / OOD / combined inputs + metric evaluation
    (reference ``bo.py:205-280``). Timing uses ``block_until_ready``."""
    from .utils.timing import device_sync, timed_passes
    model.eval()
    id_opt = np.asarray(id_data.output)
    ood_opt = np.asarray(ood_data.output)
    # device-resident inputs for the timed passes, mirroring the
    # reference's one-time ``.to(model.device)`` before its timing loops
    # (reference ``bo.py:219-223``) — without this every pass would re-pay
    # the host→device transfer, which the reference does not measure
    id_ipt = jnp.asarray(np.asarray(id_data.input))
    ood_ipt = jnp.asarray(np.asarray(ood_data.input))

    for _ in range(warmup):
        device_sync(model(id_ipt, return_ue=True))

    # each input shape gets at least one warm pass so no timed trial
    # includes XLA compilation of a fresh bucket
    combined = jnp.concatenate((id_ipt, ood_ipt))
    combined_times = list(timed_passes(
        lambda: model(combined, return_ue=True), 1, trials))
    id_times = list(timed_passes(
        lambda: model(id_ipt, return_ue=True), 1, trials))
    ood_times = list(timed_passes(
        lambda: model(ood_ipt, return_ue=True), 1, trials))
    id_preds, id_ue = device_sync(model(id_ipt, return_ue=True))
    ood_preds, ood_ue = device_sync(model(ood_ipt, return_ue=True))
    id_ipt = np.asarray(id_ipt)
    ood_ipt = np.asarray(ood_ipt)

    id_loss = float(np.mean((np.asarray(id_preds) - id_opt) ** 2))
    ood_loss = float(np.mean((np.asarray(ood_preds) - ood_opt) ** 2))

    eval_results = [metric.evaluate(model, (id_ipt, id_opt),
                                    (ood_ipt, ood_opt))
                    for metric in evaluator.metrics]

    return {
        'id_ue': UncertaintyEstimate(id_ue),
        'ood_ue': UncertaintyEstimate(ood_ue),
        'ue_time': combined_times,
        'id_time': id_times,
        'ood_time': ood_times,
        'id_loss': id_loss,
        'ood_loss': ood_loss,
        'metric_results': eval_results,
    }


def get_restart(output_dir, name, dataset, uq_method):
    ld_name = f'{name}/{dataset}/{uq_method}'
    logdir = Trainer.get_default_logdir(output_dir, ld_name, 'bo_trial_0')
    opt_mgr = OutputManager(logdir, name, append_benchmark_name=False)
    restart_idx = opt_mgr.get_restart_index()
    if restart_idx == 0:
        raise ValueError(f'No restart index found in {logdir}')

    successful = restart_idx - 1
    logdir_trial = Trainer.get_default_logdir(output_dir, ld_name,
                                              f'bo_trial_{successful}')
    opt_mgr = OutputManager(logdir_trial, name, append_benchmark_name=False)
    ostep = opt_mgr.get_optimization_step()
    assert ostep == successful
    ax_client = AxClient.load_from_json_file(
        opt_mgr.get_optimization_state_file())
    tresults = opt_mgr.get_trial_results()
    tresults = tresults.set_index('trial').to_dict(orient='index')
    return restart_idx, ax_client, tresults


def run_bo_experiment(benchmark, uq_method, config: dict, dataset, output,
                      restart: bool = False, devices=None) -> dict:
    """The full BO loop for one (benchmark, uq_method, dataset-split) cell
    (reference ``bo.py:313-510``). Returns the trial-results dict.

    ``devices`` pins the trial to an explicit device slice so multiple
    cells can run concurrently across disjoint slices of one mesh (the
    TPU-native replacement for the reference's one-GPU-per-SLURM-task
    fan-out).
    """
    enable_compilation_cache()
    trainer_cfg = dict(config['trainer'])
    if devices is not None:
        trainer_cfg['devices'] = list(devices)
        trainer_cfg.setdefault('mesh', {'dp': len(devices)})
    training_cfg = dict(config['training'])
    model_cfg = config['benchmarks'][benchmark]['model']
    dataset_cfg = config['benchmarks'][benchmark]['datasets']
    uq_config = {k: dict(v) for k, v in config['uq_methods'].items()}
    bo_config = dict(config['bo_config'])
    bo_config.update(uq_config[uq_method])
    bo_config['parameter_space'] = (list(bo_config['parameter_space'])
                                    + list(training_cfg['parameter_space']))

    evaluators = get_uncertainty_evaluator(bo_config['evaluation_metric'])
    objectives = list(evaluators.get_training_objectives())
    metrics = list(evaluators.get_all_metrics())

    boc = dict(bo_config)
    boc['objectives'] = objectives
    boc['tracking_metrics'] = metrics
    del boc['evaluation_metric']
    bo_params = get_params(boc)
    training_cfg.pop('parameter_space', None)
    uq_config[uq_method].pop('parameter_space', None)
    # documented deviation knob: run the timed-eval / UE passes in this
    # precision (e.g. 'bf16-mixed') while training and checkpoints stay
    # f32 — halves the MXU roofline of the anchored-eval-dominated cells
    # (delta_uq/pager, ~19 PFLOP of protocol-mandated measurement per
    # trial; see docs/EXPERIMENTS.md cell 9)
    eval_precision = uq_config[uq_method].pop('eval_precision', None)
    name = benchmark

    def fresh_client():
        client = AxClient()
        client.create_experiment(
            name='UE Tuning',
            parameters=bo_params.parameter_space,
            objectives=bo_params.objectives,
            tracking_metric_names=bo_params.tracking_metric_names,
            outcome_constraints=bo_params.parameter_constraints)
        return client

    if restart:
        try:
            bo_idx, ax_client, trial_results = get_restart(
                output, name, dataset, uq_method)
            print(f'Restarting from trial {bo_idx}')
        except (ValueError, FileNotFoundError) as e:
            print(f'Warning: {e}. Starting fresh optimization run.')
            bo_idx, trial_results, ax_client = 0, {}, fresh_client()
    else:
        bo_idx, trial_results, ax_client = 0, {}, fresh_client()

    # compat note: the reference zeroes its success counter after restart
    # (reference ``bo.py:352,380-384``), so a run restarted at 45/50 can
    # never reach its quota inside the loop range.  We count successes
    # already recorded in the restored trial results instead — restart is
    # the entire point of the orchestration layer (SURVEY §5.4).
    successful_trials = sum(
        1 for row in trial_results.values()
        if str(row.get('failed', False)).lower() not in ('true', '1', '1.0'))
    opt_manager = None
    for bo_trial in range(bo_idx,
                          bo_config['trials'] + bo_config['max_failures']):
        if successful_trials >= bo_config['trials']:
            break
        trial, index = ax_client.get_next_trial()
        lr = trial.pop('learning_rate')
        bs = trial.pop('batch_size')
        wd = trial.pop('weight_decay', 0.0)
        training_cfg['learning_rate'] = lr
        training_cfg['batch_size'] = bs
        training_cfg['weight_decay'] = wd
        uq_config[uq_method].update(trial)

        dset = get_dataset(dataset_cfg, dataset)
        dset = prepare_dataset_for_use(dset, training_cfg)
        model = build_model(model_cfg, uq_config, uq_method, training_cfg)
        model.to(dset.dtype)
        trainer = get_trainer(trainer_cfg, name, model, uq_method, dataset,
                              version=f'bo_trial_{bo_trial}', log_dir=output)
        opt_manager = OutputManager(trainer.logger.log_dir, benchmark,
                                    append_benchmark_name=False)

        train_dl = DataLoader(dset, batch_size=training_cfg['batch_size'],
                              shuffle=True, drop_last=True)
        test_dl = DataLoader(dset, batch_size=training_cfg['batch_size'],
                             shuffle=False)
        train_start = time.time()
        trainer.fit(model, train_dl, test_dl)
        training_time = time.time() - train_start

        model = load_model(f'{trainer.logger.log_dir}/model.pth')
        if eval_precision:
            model.set_precision(eval_precision)
        if devices is not None:
            if len(devices) > 1:
                from .parallel.mesh import make_mesh
                # honor a configured dp×member×tp trainer mesh at eval
                # time too; default to pure data parallelism
                axes = trainer_cfg.get('mesh') or {'dp': len(devices)}
                model.attach_mesh(make_mesh(axes, devices=devices))
            else:
                model.to(devices[0])

        dset_id = get_dataset(dataset_cfg, dataset)
        dset_ood = get_dataset(dataset_cfg, dataset, is_ood=True)
        # OOD must be scaled by ID stats *first* — scaling is in place
        dset_ood = prepare_dataset_for_use(dset_ood, training_cfg,
                                           scaling_dset=dset_id)
        dset_id = prepare_dataset_for_use(dset_id, training_cfg)

        try:
            results = evaluate(model, dset_id, dset_ood, evaluators)
            id_ue = results['id_ue']
            ood_ue = results['ood_ue']
            metric_results = results['metric_results']

            n_id = np.asarray(dset_id.input).shape[0]
            n_ood = np.asarray(dset_ood.input).shape[0]
            id_ue_throughput = n_id / np.mean(results['id_time'])
            ood_ue_throughput = n_ood / np.mean(results['ood_time'])
            ue_throughput = (n_id + n_ood) / np.mean(results['ue_time'])

            trial_result = {}
            for metric, metric_result in zip(evaluators.metrics,
                                             metric_results):
                keys = list(metric_result.keys())
                if len(keys) > 1:
                    trial_result[metric.get_name()] = (
                        metric_result[keys[0]], metric_result[keys[1]])
                else:
                    trial_result[metric.get_name()] = (metric_result[keys[0]], 0)
            ax_client.complete_trial(trial_index=index, raw_data=trial_result)

            row = dict(trial)
            row['learning_rate'] = lr
            row['batch_size'] = bs
            row['weight_decay'] = wd
            row['ue_time'] = float(np.mean(results['ue_time']))
            row.update({k: v[0] for k, v in trial_result.items()})
            row['id_ue'] = id_ue.mean()
            row['ood_ue'] = ood_ue.mean()
            row['id_loss'] = results['id_loss']
            row['ood_loss'] = results['ood_loss']
            row['id_time'] = float(np.mean(results['id_time']))
            row['ood_time'] = float(np.mean(results['ood_time']))
            row['ue_throughput'] = ue_throughput
            row['id_ue_throughput'] = id_ue_throughput
            row['ood_ue_throughput'] = ood_ue_throughput
            row['train_time'] = training_time
            row['log_path'] = f'{trainer.logger.log_dir}'
            # additive column (not in the reference schema): the grid can
            # legitimately mix devices (reference mixed A40/A100 SLURM
            # partitions), and all timing columns are hardware-scaled
            row['platform'] = jax.default_backend()
            row['failed'] = False
            row['error_message'] = ''
            trial_results[index] = row
            successful_trials += 1
        except (RuntimeError, ValueError, FloatingPointError) as e:
            print(f'Trial failed: {e}')
            row = dict(trial)
            row['learning_rate'] = lr
            row['batch_size'] = bs
            row['weight_decay'] = wd
            row['train_time'] = training_time
            row['log_path'] = f'{trainer.logger.log_dir}'
            for metric in evaluators.metrics:
                row[metric.get_name()] = float('nan')
            for col in ('ue_time', 'id_ue', 'ood_ue', 'id_loss', 'ood_loss',
                        'id_time', 'ood_time', 'ue_throughput',
                        'id_ue_throughput', 'ood_ue_throughput'):
                row[col] = float('nan')
            row['platform'] = jax.default_backend()
            row['failed'] = True
            row['error_message'] = str(e)
            trial_results[index] = row
            ax_client.log_trial_failure(trial_index=index)

        opt_manager.save_trial_results_dict(trial_results)
        opt_manager.save_optimization_state(index, ax_client)

        if successful_trials == bo_config['trials']:
            break

    if opt_manager is None and trial_results:
        # quota already met at restart: no trial ran this invocation, but
        # the pareto export must still (re)generate into the latest
        # finished trial dir
        from .utility import find_latest_finished_trial
        _, latest_dir = find_latest_finished_trial(
            Path(output) / name / dataset / uq_method)
        if latest_dir is not None:
            opt_manager = OutputManager(str(latest_dir), benchmark,
                                        append_benchmark_name=False)
    if len(bo_params.tracking_metric_names) > 1 and opt_manager is not None:
        pareto_results = ax_client.get_pareto_optimal_parameters(
            use_model_predictions=False)
        # de-noised front over per-objective GP posterior means, matching
        # the reference's dual export (reference ``bo.py:506-510``)
        pareto_predictions = ax_client.get_pareto_optimal_parameters(
            use_model_predictions=True)
        pareto = {'results': _jsonable(pareto_results),
                  'predictions': _jsonable(pareto_predictions)}
        opt_manager.save_pareto_parameters(json.dumps(pareto))

    return trial_results


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return float(obj)
    return obj
