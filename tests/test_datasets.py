"""Data-layer tests: real-file round trips, percentile partitioning,
slicing, dtype conversion and scaling (modelled on the reference's
``tests/test_datasets.py`` golden cases)."""
import io
import os

import numpy as np
import pytest

from nnueehcs_tpu.data_utils import (
    HDF5Dataset, ARFFDataSet, CharacterDelimitedDataset,
    get_dataset_from_config, read_dataset_from_yaml, get_dataset,
    get_id_datset_name, get_ood_dataset_name, prepare_dataset_for_use)


@pytest.fixture
def hdf5_file(tmp_path):
    import h5py
    path = tmp_path / 'data.h5'
    rng = np.random.default_rng(0)
    ipt = rng.normal(size=(100, 4)).astype(np.float32)
    opt = np.arange(100, dtype=np.float32).reshape(-1, 1)
    with h5py.File(path, 'w') as f:
        g = f.create_group('TestKernel')
        g.create_dataset('input', data=ipt)
        g.create_dataset('output', data=opt)
    return str(path), ipt, opt


@pytest.fixture
def csv_file(tmp_path):
    path = tmp_path / 'data.csv'
    rows = np.column_stack([np.arange(50, dtype=float),
                            np.arange(50, dtype=float) * 2,
                            np.arange(50, dtype=float) * 3])
    np.savetxt(path, rows, delimiter=',', fmt='%.6f')
    return str(path), rows


@pytest.fixture
def whitespace_file(tmp_path):
    path = tmp_path / 'data.dat'
    rows = np.column_stack([np.arange(30, dtype=float),
                            np.arange(30, dtype=float) + 0.5])
    with open(path, 'w') as f:
        for r in rows:
            f.write(f'{r[0]:.4f}\t{r[1]:.4f}\n')
    return str(path), rows


@pytest.fixture
def arff_file(tmp_path):
    path = tmp_path / 'data.arff'
    with open(path, 'w') as f:
        f.write('@RELATION test\n')
        f.write('@ATTRIBUTE a NUMERIC\n@ATTRIBUTE b NUMERIC\n'
                '@ATTRIBUTE target NUMERIC\n@DATA\n')
        for i in range(40):
            f.write(f'{i},{i * 2},{i * 3}\n')
    return str(path)


def test_hdf5_roundtrip(hdf5_file):
    path, ipt, opt = hdf5_file
    ds = HDF5Dataset(path, 'TestKernel', 'input', 'output')
    assert np.allclose(np.asarray(ds.input), ipt)
    assert np.allclose(np.asarray(ds.output), opt)
    assert len(ds) == 100
    assert ds.shape == (100, 4)


def test_hdf5_leading_one_squeeze(tmp_path):
    import h5py
    path = tmp_path / 'one.h5'
    with h5py.File(path, 'w') as f:
        g = f.create_group('G')
        g.create_dataset('input', data=np.ones((1, 10, 3)))
        g.create_dataset('output', data=np.ones((1, 10, 1)))
    ds = HDF5Dataset(str(path), 'G', 'input', 'output')
    assert np.asarray(ds.input).shape == (10, 3)


def test_delimited_no_header(csv_file):
    path, rows = csv_file
    ds = CharacterDelimitedDataset(path, ',')
    assert np.allclose(np.asarray(ds.input), rows[:, :-1])
    assert np.allclose(np.asarray(ds.output), rows[:, -1:])


def test_delimited_with_header(tmp_path):
    path = tmp_path / 'hdr.csv'
    with open(path, 'w') as f:
        f.write('colA,colB,target\n')
        for i in range(20):
            f.write(f'{i},{i + 1},{i + 2}\n')
    ds = CharacterDelimitedDataset(str(path), ',')
    assert len(ds) == 20
    assert np.allclose(np.asarray(ds.input)[:, 0], np.arange(20))


def test_whitespace_delimited(whitespace_file):
    path, rows = whitespace_file
    ds = CharacterDelimitedDataset(path, r'\s+')
    assert np.allclose(np.asarray(ds.input), rows[:, :-1])


def test_arff(arff_file):
    ds = ARFFDataSet(arff_file)
    assert len(ds) == 40
    assert np.allclose(np.asarray(ds.output)[:, 0], np.arange(40) * 3)


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        get_dataset_from_config({'x': {'format': 'bogus'}}, 'x')


def test_percentile_partition_exact(csv_file):
    path, rows = csv_file
    ds = CharacterDelimitedDataset(path, ',', percentiles='[0, 70]')
    # output column is 0..147 step 3; 70th percentile cut is inclusive
    assert len(ds) <= 50
    n_id = len(ds)
    ds_ood = CharacterDelimitedDataset(path, ',', percentiles='[70, 100]')
    # complement recombination: ID + OOD = whole dataset
    assert n_id + len(ds_ood) == 50
    full_out = np.sort(np.concatenate([
        np.asarray(ds.output).ravel(), np.asarray(ds_ood.output).ravel()]))
    assert np.allclose(full_out, rows[:, -1])


def test_percentile_partition_gaps(csv_file):
    path, rows = csv_file
    ds_id = CharacterDelimitedDataset(path, ',', percentiles='[0, 30], [60, 100]')
    ds_ood = CharacterDelimitedDataset(path, ',', percentiles='[30, 60]')
    assert len(ds_id) + len(ds_ood) == 50
    # the OOD chunk lives strictly inside the ID output range
    ood_out = np.asarray(ds_ood.output)
    id_out = np.asarray(ds_id.output)
    assert ood_out.min() > id_out.min()
    assert ood_out.max() < id_out.max()


def test_percentile_regex_spacing(csv_file):
    path, _ = csv_file
    a = CharacterDelimitedDataset(path, ',', percentiles='[0,30],[60,100]')
    b = CharacterDelimitedDataset(path, ',', percentiles='[0, 30], [60, 100]')
    assert len(a) == len(b)


def test_dtype_conversion(csv_file):
    path, _ = csv_file
    ds = CharacterDelimitedDataset(path, ',', dtype='float32')
    assert np.asarray(ds.input).dtype == np.float32
    ds64 = CharacterDelimitedDataset(path, ',')
    assert np.asarray(ds64.input).dtype == np.float64


def test_subset_slice(csv_file):
    path, rows = csv_file
    ds = CharacterDelimitedDataset(path, ',',
                                   subset={'start': 10, 'stop': 30, 'step': 2})
    assert len(ds) == 10
    assert np.allclose(np.asarray(ds.input)[0, 0], rows[10, 0])


def test_getitem(csv_file):
    path, rows = csv_file
    ds = CharacterDelimitedDataset(path, ',')
    x, y = ds[5]
    assert np.allclose(x, rows[5, :-1])
    assert np.allclose(y, rows[5, -1:])


def test_to_device(csv_file):
    import jax
    path, _ = csv_file
    ds = CharacterDelimitedDataset(path, ',', dtype='float32')
    ds.to(jax.devices()[0])
    assert hasattr(ds.input, 'devices')


def test_yaml_factory(csv_file):
    path, _ = csv_file
    cfg = f"""
datasets:
  bench_id:
    format: character_delimited
    delimiter: ','
    path: {path}
    percentiles: '[0, 70]'
"""
    ds = read_dataset_from_yaml(io.StringIO(cfg), 'bench_id')
    assert len(ds) > 0
    assert get_id_datset_name('bench') == 'bench_id'
    assert get_ood_dataset_name('bench') == 'bench_ood'


def test_scaling_semantics(csv_file):
    path, _ = csv_file
    dset_id = CharacterDelimitedDataset(path, ',', percentiles='[0, 70]')
    dset_ood = CharacterDelimitedDataset(path, ',', percentiles='[70, 100]')
    dset_ood = prepare_dataset_for_use(dset_ood, {'scaling': True},
                                       scaling_dset=dset_id)
    dset_id = prepare_dataset_for_use(dset_id, {'scaling': True})
    # global min-max: ID spans exactly [0, 1]; OOD scaled by ID stats lies above
    assert np.isclose(np.asarray(dset_id.output).min(), 0.0)
    assert np.isclose(np.asarray(dset_id.output).max(), 1.0)
    assert np.asarray(dset_ood.output).min() > 1.0


def test_train_test_split(csv_file):
    path, _ = csv_file
    ds = CharacterDelimitedDataset(path, ',')
    train, test = ds.train_test_split(0.2)
    assert len(test) == 10
    assert len(train) == 40
