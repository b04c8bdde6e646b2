"""Native C++ fast-loader tests: correctness vs numpy, header skipping,
fallback behaviour, and integration with the delimited dataset reader."""
import numpy as np
import pytest

from nnueehcs_tpu.native import load_delimited, _get_lib


requires_native = pytest.mark.skipif(_get_lib() is None,
                                     reason='native toolchain unavailable')


@pytest.fixture
def table(tmp_path):
    rng = np.random.default_rng(0)
    data = np.concatenate([
        rng.normal(size=(500, 4)) *
        10.0 ** rng.integers(-8, 8, size=(500, 1)).astype(np.float64),
        np.array([[0.0, -0.0, 1e-300, 1e300]]),   # extremes via strtod path
    ])
    path = str(tmp_path / 'table.dat')
    np.savetxt(path, data, delimiter='\t', fmt='%.17g')
    return path, data


@requires_native
def test_native_matches_numpy(table):
    path, data = table
    arr = load_delimited(path, r'\s+')
    assert arr is not None
    assert arr.shape == data.shape
    assert np.array_equal(arr, data) or np.allclose(arr, data, rtol=1e-15)


@requires_native
def test_native_csv_and_header(tmp_path):
    path = str(tmp_path / 'x.csv')
    with open(path, 'w') as f:
        f.write('a,b\n')
        for i in range(10):
            f.write(f'{i},{i * 0.5}\n')
    arr = load_delimited(path, ',', skip_rows=1)
    assert arr.shape == (10, 2)
    assert arr[4, 1] == 2.0


@requires_native
def test_native_rejects_non_numeric(tmp_path):
    path = str(tmp_path / 'bad.csv')
    with open(path, 'w') as f:
        f.write('1,2\n3,apple\n')
    assert load_delimited(path, ',') is None


def test_unsupported_delimiter_returns_none(tmp_path):
    path = str(tmp_path / 'x.txt')
    with open(path, 'w') as f:
        f.write('1~2\n')
    assert load_delimited(path, '~') is None


@requires_native
def test_dataset_reader_uses_native(tmp_path):
    from nnueehcs_tpu.data_utils import CharacterDelimitedDataset
    rng = np.random.default_rng(1)
    data = rng.normal(size=(200, 3))
    path = str(tmp_path / 'ds.dat')
    np.savetxt(path, data, delimiter='\t', fmt='%.10g')
    ds = CharacterDelimitedDataset(path, r'\s+')
    assert np.allclose(np.asarray(ds.input), data[:, :2], rtol=1e-9)
    assert np.allclose(np.asarray(ds.output)[:, 0], data[:, 2], rtol=1e-9)
