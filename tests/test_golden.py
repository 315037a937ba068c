"""Golden-file pipeline test: re-run infer + aggregate + get_dmps on the
checked-in fixture and compare EVERY output file against tests/golden/
expected/ (generated once by tests/golden/make_golden.py — see its docstring
for why the goldens come from this repo's f64 CPU path rather than the
reference container, which cannot run in this environment)."""

import gzip
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

GOLDEN = Path(__file__).resolve().parent / "golden"
EXPECTED = GOLDEN / "expected"
FIXTURE = GOLDEN / "fixture"


@pytest.fixture(scope="module")
def regenerated(tmp_path_factory):
    if not EXPECTED.exists():
        pytest.skip("golden outputs not generated (run tests/golden/make_golden.py)")
    import sys

    sys.path.insert(0, str(GOLDEN))
    import make_golden

    out_root = tmp_path_factory.mktemp("golden_rerun")
    make_golden.run_pipeline(
        FIXTURE / "data", FIXTURE / "single_group", out_root
    )
    return out_root


def _compare_file(exp: Path, got: Path):
    assert got.exists(), f"missing output {got}"
    if exp.suffix == ".npz":
        e, g = np.load(exp), np.load(got)
        assert set(e.files) == set(g.files), exp
        for k in e.files:
            if np.issubdtype(e[k].dtype, np.integer):
                np.testing.assert_array_equal(g[k], e[k], err_msg=str(exp))
            else:
                np.testing.assert_allclose(g[k], e[k], rtol=1e-12, atol=0, err_msg=str(exp))
    elif exp.suffix == ".txt":
        # flags txt / logZ dicts: exact text (before the CSV branch — .txt
        # previously fell through to the lenient CSV fallback).
        assert got.read_text() == exp.read_text(), exp
    elif exp.name.endswith(".csv.gz") or exp.suffix == ".csv":
        opener = gzip.open if exp.name.endswith(".gz") else open
        with opener(exp, "rt") as f:
            e_text = f.read()
        with opener(got, "rt") as f:
            g_text = f.read()
        if e_text != g_text:
            # Fall back to numeric comparison (formatting-stable, value-exact).
            e_df = pd.read_csv(exp, sep=None, engine="python")
            g_df = pd.read_csv(got, sep=None, engine="python")
            pd.testing.assert_frame_equal(g_df, e_df, check_exact=True, obj=str(exp))


def test_pipeline_outputs_match_golden(regenerated):
    exp_files = sorted(
        p for p in EXPECTED.rglob("*")
        if p.is_file() and not p.name.startswith("optimal_time")
    )
    assert exp_files, "no golden files found"
    n_checked = 0
    for exp in exp_files:
        rel = exp.relative_to(EXPECTED)
        _compare_file(exp, regenerated / rel)
        n_checked += 1
    # Every stage is represented.
    names = {p.name for p in exp_files}
    assert any(n.startswith("optimal_backward_particles_merged") for n in names)
    assert any(n.startswith("split_probs") for n in names)
    assert any(n.startswith("dmp_") for n in names)
    assert n_checked >= 25, n_checked
