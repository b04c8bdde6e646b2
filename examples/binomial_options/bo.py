"""Single-run example: train a KDE-scored surrogate of the binomial-options
pricing kernel, evaluate the Wasserstein ID/OOD separation, and plot ECDFs
of the uncertainty scores (reference ``examples/binomial_options/bo.py``).

Generate the dataset first::

    python examples/data/generate_data.py --data-dir examples/data
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import click
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import yaml

from nnueehcs_tpu.model_builder import KDEModelBuilder
from nnueehcs_tpu.training import (Trainer, DataLoader, EarlyStopping,
                                   ModelSavingCallback, load_model)
from nnueehcs_tpu.data_utils import get_dataset_from_config
from nnueehcs_tpu.evaluation import get_uncertainty_evaluator


def get_trainer(trainer_config, name, model):
    callbacks = [EarlyStopping(monitor='val_loss', min_delta=0.00,
                               patience=300, verbose=False, mode='min'),
                 ModelSavingCallback(monitor='val_loss')]
    extra = model.get_callbacks()
    if extra:
        callbacks.extend(extra)
    return Trainer(name, trainer_config, callbacks=callbacks)


@click.command()
@click.option('--config', 'config_path', default='config.yaml')
@click.option('--eval_only', is_flag=True)
def main(config_path, eval_only):
    with open(config_path) as f:
        config = yaml.safe_load(f)
    trainer_cfg = config['trainer']
    training_cfg = config['training']
    model_cfg = config['model']
    dataset_cfg = config['datasets']

    name = 'binomial_options'
    logdir = None
    if not eval_only:
        dset = get_dataset_from_config(dataset_cfg, 'bo_ds')
        builder = KDEModelBuilder(model_cfg['architecture'], model_cfg['kde'],
                                  train_config=training_cfg)
        model = builder.build().to(dset.dtype)
        trainer = get_trainer(trainer_cfg, name, model)

        ipt = np.asarray(dset.input)
        opt = np.asarray(dset.output)
        dset.output = (opt - opt.min()) / (opt.max() - opt.min())
        dset.input = (ipt - ipt.min()) / (ipt.max() - ipt.min())

        train_dl = DataLoader(dset, batch_size=training_cfg['batch_size'],
                              shuffle=True)
        test_dl = DataLoader(dset, batch_size=training_cfg['batch_size'],
                             shuffle=False)
        trainer.fit(model, train_dl, test_dl)
        logdir = trainer.logger.log_dir

    if logdir is None:
        # --eval_only: pick the latest version directory (CSVLogger
        # auto-increments, so a hardcoded version_0 would go stale)
        import glob
        versions = sorted(glob.glob(f'logs/{name}/version_*'),
                          key=lambda p: int(p.rsplit('_', 1)[1]))
        if not versions:
            raise SystemExit(f'No trained model found under logs/{name}/')
        logdir = versions[-1]
    model = load_model(f'{logdir}/model.pth')
    model.eval()

    dset_id = get_dataset_from_config(dataset_cfg, 'bo_ds')
    dset_ood = get_dataset_from_config(dataset_cfg, 'bo_ood')

    id_ipt = np.asarray(dset_id.input)
    id_opt = np.asarray(dset_id.output)
    ood_ipt = np.asarray(dset_ood.input)
    ood_opt = np.asarray(dset_ood.output)

    # normalise OOD by ID stats, then ID by itself
    ood_ipt = (ood_ipt - id_ipt.min()) / (id_ipt.max() - id_ipt.min())
    ood_opt = (ood_opt - id_opt.min()) / (id_opt.max() - id_opt.min())
    id_ipt = (id_ipt - id_ipt.min()) / (id_ipt.max() - id_ipt.min())
    id_opt = (id_opt - id_opt.min()) / (id_opt.max() - id_opt.min())

    rng = np.random.default_rng(0)
    id_sel = rng.permutation(len(id_ipt))[:20000]
    ood_sel = rng.permutation(len(ood_ipt))[:20000]
    id_ipt, id_opt = id_ipt[id_sel], id_opt[id_sel]
    ood_ipt, ood_opt = ood_ipt[ood_sel], ood_opt[ood_sel]

    evaluator = get_uncertainty_evaluator('wasserstein_distance')
    results = evaluator.evaluate(model, (id_ipt, id_opt), (ood_ipt, ood_opt))
    print(results)

    _, id_ue = model(id_ipt, return_ue=True)
    _, ood_ue = model(ood_ipt, return_ue=True)

    fig, ax = plt.subplots()
    ax.ecdf(np.asarray(id_ue).flatten(), label='ID')
    ax.ecdf(np.asarray(ood_ue).flatten(), label='OOD')
    ax.set_xlabel('uncertainty score')
    ax.legend()
    plt.savefig('uncertainty.png')
    print('wrote uncertainty.png')


if __name__ == '__main__':
    main()
