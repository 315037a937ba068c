"""Native fast-loader/writer tests (skipped if the toolchain can't build it)."""

import gzip
import io

import numpy as np
import pytest

from hygeia_tpu.native.loader import (
    ensure_built,
    load_matrix,
    write_int_table_gz,
)


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


def test_fastwrite_matches_pandas_to_csv(tmp_path):
    """The aggregate-stage writer's contract: decompressed bytes identical
    to pandas to_csv for integer tables (index + header + tab sep), and the
    multi-member gzip stream reads back through both gzip and pandas."""
    import pandas as pd

    rng = np.random.default_rng(1)
    for rows, cols in ((1, 1), (7, 3), (5001, 12)):
        arr = rng.integers(-9, 3000, (rows, cols)).astype(np.int32)
        idx = rng.integers(0, 2**40, rows).astype(np.int64)
        df = pd.DataFrame(arr).set_index(pd.Index(idx, name="pos"))
        buf = io.StringIO()
        df.to_csv(buf, sep="\t")
        p = tmp_path / f"t_{rows}x{cols}.csv.gz"
        assert write_int_table_gz(
            p, arr, index=idx,
            header="pos\t" + "\t".join(str(c) for c in df.columns),
        )
        with gzip.open(p, "rb") as f:
            assert f.read() == buf.getvalue().encode(), (rows, cols)
        rt = pd.read_table(p, sep="\t", index_col=0)
        np.testing.assert_array_equal(rt.to_numpy(), arr)
        np.testing.assert_array_equal(rt.index.to_numpy(), idx)


def test_fastwrite_float_table_roundtrip(tmp_path):
    """The float writer's contract: %.9g round-trips float32 VALUES exactly
    (textual form may differ from pandas' shortest repr — PARITY.md), with
    pandas-style integral-float formatting ('1.0') and an int index column."""
    import pandas as pd

    from hygeia_tpu.native.loader import write_float_table_gz

    rng = np.random.default_rng(2)
    probs = rng.random((3000, 6)).astype(np.float32)
    probs[0, 0] = 1.0
    probs[1, 1] = 0.0
    pos = (np.arange(3000) * 41 + 7).astype(np.int64)
    p = tmp_path / "probs.csv.gz"
    assert write_float_table_gz(
        p, probs, index=pos,
        header="genomic_position," + ",".join(f"r{i}" for i in range(6)),
    )
    df = pd.read_csv(p)
    np.testing.assert_array_equal(df.iloc[:, 0].to_numpy(), pos)
    np.testing.assert_array_equal(
        df.iloc[:, 1:].to_numpy().astype(np.float32), probs
    )
    with gzip.open(p, "rt") as f:
        header = f.readline().strip()
        first = f.readline()
    assert header.startswith("genomic_position,r0")
    assert ",1.0," in ("," + first) or first.split(",")[1] == "1.0"


def test_fastwrite_no_index_no_header(tmp_path):
    arr = np.array([[1, 2], [3, 4]], np.int64)
    p = tmp_path / "plain.csv.gz"
    assert write_int_table_gz(p, arr, sep=",")
    with gzip.open(p, "rb") as f:
        assert f.read() == b"1,2\n3,4\n"


def test_matches_pandas_on_pipeline_output(tmp_path):
    import pandas as pd

    rng = np.random.default_rng(0)
    arr = rng.poisson(20, size=(5000, 3)).astype(float)
    p = tmp_path / "counts.txt.gz"
    np.savetxt(p, arr, delimiter=",", fmt="%s")
    native = load_matrix(p)
    ref = pd.read_table(p, sep=",", header=None).to_numpy(float)
    np.testing.assert_allclose(native, ref)
