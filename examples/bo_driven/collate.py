"""Collate and plot results across one or more experiment output
directories: per-trial line plots plus max/median bar plots of sensitivity,
UE time and UE throughput (reference ``examples/bo_driven/collate.py``)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import re
from pathlib import Path

import click
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import pandas as pd

# metric preference chain for the headline "UE distance" quantity
_METRIC_FALLBACK = ['wasserstein_distance', 'jensen_shannon_distance',
                    'sensitivity', 'percentile_score', 'score_dist']


def print_results(results, indent=0):
    for key, value in results.items():
        if isinstance(value, dict):
            print(' ' * indent, key)
            print_results(value, indent + 2)
        else:
            if value[3] == 'no_file':
                print(' ' * indent, key, value[3])
            else:
                print(' ' * indent, key, value[0], value[1],
                      round(value[2], 2), round(value[3], 2))


def plot_quantity(results, quantity, output):
    for bench, datasets in results.items():
        for dataset, methods in datasets.items():
            fig, ax = plt.subplots()
            ax.set_title(f'{bench}/{dataset}')
            plotted = False
            for method, method_data in sorted(methods.items()):
                for input_dir_name, data in method_data.items():
                    tresults = data[5]
                    if tresults is None or quantity not in tresults.columns:
                        continue
                    label = f'{method} ({input_dir_name})'
                    ax.plot(tresults['trial'], tresults[quantity],
                            label=label)
                    plotted = True
            ax.set_xlabel('Trial')
            ax.set_ylabel(quantity)
            if plotted:
                ax.legend()
            fig.savefig(f'{output}/{bench}_{dataset}_{quantity}.png')
            plt.close(fig)


def barplot_quantity(results, quantity, output, statistic='max'):
    for bench, datasets in results.items():
        for dataset, methods in datasets.items():
            fig, ax = plt.subplots()
            ax.set_title(f'{bench}/{dataset}')
            plotted = False
            for method, method_data in sorted(methods.items()):
                for input_dir_name, data in method_data.items():
                    tresults = data[5]
                    if tresults is None or quantity not in tresults.columns:
                        continue
                    label = f'{method} ({input_dir_name})'
                    stat = getattr(tresults[quantity], statistic)()
                    ax.bar(label, stat, label=label)
                    plotted = True
            ax.set_xlabel('Method')
            ax.set_ylabel(quantity)
            if plotted:
                ax.legend(loc='center right')
            ax.set_xticks([])
            fig.savefig(
                f'{output}/{bench}_{dataset}_{quantity}_{statistic}_bar.png')
            plt.close(fig)


def barplot_single_quantity(results, quantity, output):
    for bench, datasets in results.items():
        for dataset, methods in datasets.items():
            fig, ax = plt.subplots()
            ax.set_title(f'{bench}/{dataset}')
            plotted = False
            for method, method_data in sorted(methods.items()):
                for input_dir_name, data in method_data.items():
                    tresults = data
                    if tresults is None or quantity not in tresults.columns:
                        continue
                    label = f'{method} ({input_dir_name})'
                    ax.bar(label, tresults[quantity].iloc[0], label=label)
                    plotted = True
            ax.set_xlabel('Method')
            ax.set_ylabel(quantity)
            if plotted:
                ax.legend(loc='center right')
            ax.set_xticks([])
            fig.savefig(f'{output}/{bench}_{dataset}_{quantity}_bar.png')
            plt.close(fig)


def narrow_to_statistic(results, quantity, statistic='max'):
    filtered = {}
    for bench, datasets in results.items():
        filtered.setdefault(bench, {})
        for dataset, methods in datasets.items():
            filtered[bench].setdefault(dataset, {})
            for method, method_data in sorted(methods.items()):
                filtered[bench][dataset].setdefault(method, {})
                for input_dir_name, data in method_data.items():
                    tresults = data[5]
                    if tresults is None or quantity not in tresults.columns:
                        continue
                    stat = getattr(tresults[quantity], statistic)()
                    filtered[bench][dataset][method][input_dir_name] = \
                        tresults[tresults[quantity] == stat]
    return filtered


def get_final_bo_trial(result_files):
    """Latest finished trial via the shared results-tree helper."""
    from nnueehcs_tpu.utility import find_latest_finished_trial
    if not result_files:
        return None, None
    return find_latest_finished_trial(Path(result_files[0]).parent)


def _headline_stats(tresults):
    for name in _METRIC_FALLBACK:
        if name in tresults.columns:
            col = tresults[name]
            return col.argmax(), col.max(), col.median()
    return 0, float('nan'), float('nan')


@click.command()
@click.option('--input', 'inputs', type=click.Path(exists=True),
              multiple=True,
              help='Path to directory containing experiment results')
@click.option('--output', type=click.Path(), help='Path to output directory')
def main(inputs, output):
    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)

    results = {}
    for input_dir in inputs:
        input_dir = Path(input_dir)
        input_dir_name = input_dir.name
        for benchdir in input_dir.iterdir():
            if not benchdir.is_dir():
                continue
            bench_results = results.setdefault(benchdir.name, {})
            for datasetdir in benchdir.iterdir():
                dataset_results = bench_results.setdefault(datasetdir.name, {})
                for methoddir in datasetdir.iterdir():
                    method_results = dataset_results.setdefault(
                        methoddir.name, {})
                    trial_num, trial_file = get_final_bo_trial(
                        list(methoddir.iterdir()))
                    if trial_file is None:
                        method_results[input_dir_name] = \
                            (0, 0, 0, 'no_file', None, None)
                        continue
                    tresults = pd.read_csv(f'{trial_file}/trial_results.csv')
                    max_i, max_v, med_v = _headline_stats(tresults)
                    method_results[input_dir_name] = \
                        (trial_num, max_i, max_v, med_v, trial_file, tresults)

    print_results(results)
    plot_quantity(results, 'sensitivity', output)
    barplot_quantity(results, 'sensitivity', output)
    barplot_quantity(results, 'sensitivity', output, statistic='median')
    plot_quantity(results, 'ue_time', output)
    plot_quantity(results, 'ue_throughput', output)

    filtered = narrow_to_statistic(results, 'sensitivity')
    barplot_single_quantity(filtered, 'ue_time', output)


if __name__ == '__main__':
    main()
