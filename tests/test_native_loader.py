"""Native fast-loader tests (skipped if the toolchain can't build it)."""

import numpy as np
import pytest

from hygeia_tpu.native.loader import ensure_built, load_matrix


pytestmark = pytest.mark.skipif(not ensure_built(), reason="no native toolchain")


def test_load_matrix_roundtrip(tmp_path):
    arr = np.array([[1, 2.5, -3], [4, 5, 6], [0, 0, 0]])
    p = tmp_path / "m.txt.gz"
    np.savetxt(p, arr, delimiter=",", fmt="%s")
    np.testing.assert_allclose(load_matrix(p), arr)


def test_load_matrix_int_and_single_column(tmp_path):
    arr = np.arange(7).reshape(7, 1)
    p = tmp_path / "m.txt.gz"
    np.savetxt(p, arr, delimiter=",", fmt="%s")
    got = load_matrix(p)
    assert got.shape == (7, 1)
    np.testing.assert_allclose(got, arr)


def test_load_matrix_uncompressed(tmp_path):
    # gzopen reads plain files transparently.
    arr = np.array([[1.5, 2.0]])
    p = tmp_path / "m.txt"
    np.savetxt(p, arr, delimiter=",", fmt="%s")
    np.testing.assert_allclose(load_matrix(p), arr)


def test_matches_pandas_on_pipeline_output(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(0)
    arr = rng.poisson(20, size=(5000, 3)).astype(float)
    p = tmp_path / "counts.txt.gz"
    np.savetxt(p, arr, delimiter=",", fmt="%s")
    native = load_matrix(p)
    ref = pd.read_table(p, sep=",", header=None).to_numpy(float)
    np.testing.assert_allclose(native, ref)
