"""CSV readers/writers matching the reference's file formats.

Two distinct conventions exist in the reference and both are preserved:

* Two-group count files (preprocess output, read by `infer`): header-less,
  comma-separated, one row per CpG site (`positions_{chrom}.txt.gz` etc.).
* Single-group engine files (R tidyverse convention,
  input_output_functions.R): headed CSVs; count matrices are stored
  (n_sites, n_samples) with `sample_i` columns; the theta vector is a single
  `data` column (read back by get_estimated_control_group_param,
  run_inference_two_groups.py:76-89).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _ensure_dir(path):
    d = os.path.dirname(str(path))
    if d:
        os.makedirs(d, exist_ok=True)


# ---------- two-group count files (header-less, comma-separated) ----------

def read_count_matrix(path, dtype=np.float32):
    """(T, S) matrix from a header-less comma-separated .txt.gz.

    Uses the native zlib/multithreaded parser (hygeia_tpu/native) when its
    shared library is available, with a pandas fallback."""
    from hygeia_tpu.native.loader import load_matrix

    m = load_matrix(path)
    if m is not None:
        return m.astype(dtype, copy=False)
    return pd.read_table(path, sep=",", header=None).to_numpy(dtype)


def read_positions(path):
    return read_count_matrix(path, np.int64).ravel()


def write_count_matrix(path, arr):
    """np.savetxt(fmt="%s")-compatible writer, byte-identical output.

    savetxt formats every row in Python (~1.7 s per production 110k-site
    count file at level-9 gzip); pandas' C writer with level-1 gzip emits
    the SAME bytes after decompression (str()-shortest float repr both
    ways; verified byte-for-byte on f32 counts and i64 positions) ~12x
    faster. INFER writes 5 of these per work unit.

    Integer arrays take the native itoa + parallel-gzip writer
    (native/loader.write_int_table_gz) — same decompressed bytes
    ("%s" of an int has no decimal point), another ~8x on the int16
    trimmed-count files (regression: test_more_components byte-identity,
    which routes its i64 case through this path)."""
    _ensure_dir(path)
    a = np.asarray(arr)
    if a.ndim == 1:
        a = a[:, None]
    if np.issubdtype(a.dtype, np.integer) and str(path).endswith(".gz"):
        from hygeia_tpu.native.loader import write_int_table_gz

        if write_int_table_gz(path, a, sep=",", level=1):
            return
    df = pd.DataFrame(a)
    compression = (
        {"method": "gzip", "compresslevel": 1}
        if str(path).endswith(".gz")
        else None
    )
    df.to_csv(path, header=False, index=False, compression=compression)


# ---------- single-group engine files (headed CSVs) ----------

def read_headed_matrix(path):
    """(n_samples, n_sites): stored transposed with sample_i columns."""
    return pd.read_csv(path).to_numpy().T


def read_headed_column(path):
    return pd.read_csv(path).iloc[:, 0].to_numpy()


def write_headed_column(path, values, name):
    _ensure_dir(path)
    pd.DataFrame({name: np.asarray(values)}).to_csv(path, index=False)


def write_headed_matrix(path, matrix, prefix):
    """Write a (k, n) matrix with `{prefix}_i` columns (R convention: the
    count matrices are transposed to (n_sites, n_samples) first)."""
    _ensure_dir(path)
    m = np.asarray(matrix)
    cols = [f"{prefix}_{i + 1}" for i in range(m.shape[0])]
    pd.DataFrame(m.T, columns=cols).to_csv(path, index=False)


def read_theta(path):
    """theta vector from the single-group `data`-column CSV."""
    df = pd.read_table(path, sep=",")
    return pd.to_numeric(df["data"]).to_numpy()


def write_theta(path, theta):
    _ensure_dir(path)
    pd.DataFrame({"data": np.asarray(theta)}).to_csv(path, index=False)


def theta_file_to_p_softmax(theta, n_regimes):
    """Rebuild (log P, omega_logit) from the packed theta exactly as
    get_estimated_control_group_param does (run_inference_two_groups.py:76-89):
    exponentiate the R(R-1) off-diagonal entries row-major, renormalise each
    row, take log (diagonal becomes log 0 = -inf)."""
    R = n_regimes
    theta = np.asarray(theta, np.float64)
    p = np.zeros((R, R))
    i = 0
    for r in range(R):
        for c in range(R):
            if c != r:
                p[r, c] = np.exp(theta[i])
                i += 1
        p[r] = p[r] / p[r].sum()
    with np.errstate(divide="ignore"):
        log_p = np.log(p)
    omega_logit = theta[-R:]
    return log_p, omega_logit


def savez_fast(path, arr, level=1):
    """np.savez_compressed-compatible single-array .npz writer at zlib
    level 1 (or ZIP_STORED when level=0).

    numpy pins its npz deflate at level 6; at production scale the INFER
    stage writes ~0.5 GB of trajectory archives per chromosome and the
    compression wall was a visible share of the warm stage (PERF.md pipeline
    table). An .npz is just a zip of .npy members, so writing the member
    through zipfile with compresslevel=1 produces a file np.load reads
    identically (key "arr_0", like np.savez_compressed(path, arr)).
    level=0 writes STORED members — even level-1 deflate of the big
    trajectory archives is CPU-bound on this 2-core host (~25 s of wall
    after the single compute chunk at production scale); np.load reads
    stored members identically and disk bandwidth absorbs the size."""
    import io as _io
    import zipfile

    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    buf = _io.BytesIO()
    np.lib.format.write_array(buf, np.asanyarray(arr), allow_pickle=False)
    if level:
        zf = zipfile.ZipFile(
            path, "w", compression=zipfile.ZIP_DEFLATED, compresslevel=level
        )
    else:
        zf = zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED)
    with zf:
        zf.writestr("arr_0.npy", buf.getvalue())
