"""Golden tests for the legacy SHRiMP1 tools (probcalc, probcalc_mp,
prettyprint, shrimp_var) against the reference binaries on fresh
synthetic data (SURVEY §2.5)."""
import io
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from . import oracle
from .test_e2e_unpaired import make_dataset


def ensure_tool(name):
    path = os.path.join(oracle.BUILD_DIR, "bin", name)
    if os.path.exists(path):
        return path
    if oracle.ensure_gmapper() is None:
        return None
    try:
        subprocess.run(["make", "bin/" + name.split("-")[0], "-j4"],
                       cwd=oracle.BUILD_DIR, check=True,
                       capture_output=True, timeout=600)
    except Exception:
        return None
    return path if os.path.exists(path) else None


def shrimp_format_output(tmp_path, mode="ls"):
    """Reference gmapper --shrimp-format run on a synthetic dataset."""
    gpath, rpath, _, _ = make_dataset(str(tmp_path), seed=77, n_reads=80)
    out = oracle.run_gmapper(["-N", "1", "--shrimp-format", rpath, gpath],
                             mode=mode)
    spath = os.path.join(str(tmp_path), "out.shrimp")
    with open(spath, "w") as f:
        f.write(out)
    return gpath, rpath, spath


def run_mod(mod, argv):
    import importlib
    m = importlib.import_module("shrimp_tpu.tools." + mod)
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = m.main(argv)
    finally:
        sys.stdout = old
    assert rc in (0, None)
    return buf.getvalue()


@pytest.mark.skipif(ensure_tool("probcalc") is None,
                    reason="reference probcalc unavailable")
def test_probcalc_matches_reference(tmp_path):
    _, _, spath = shrimp_format_output(tmp_path)
    ref = subprocess.run(
        [ensure_tool("probcalc"), "-S", "10000", spath],
        capture_output=True, text=True, timeout=300)
    assert ref.returncode == 0
    mine = run_mod("probcalc", ["-S", "10000", spath])
    # cross-read order is hash-iteration order in the reference; compare
    # the (per-read deterministic) line sets
    assert sorted(ref.stdout.splitlines()) == sorted(mine.splitlines())


@pytest.mark.skipif(ensure_tool("probcalc") is None,
                    reason="reference probcalc unavailable")
def test_probcalc_rates_line_matches(tmp_path):
    _, _, spath = shrimp_format_output(tmp_path)
    ref = subprocess.run(
        [ensure_tool("probcalc"), "-S", "-G", "10000", spath],
        capture_output=True, text=True, timeout=300)
    mine = run_mod("probcalc", ["-S", "-G", "10000", spath])
    assert ref.stdout.strip() == mine.strip()


@pytest.mark.skipif(ensure_tool("prettyprint") is None,
                    reason="reference prettyprint unavailable")
def test_prettyprint_matches_reference(tmp_path):
    gpath, rpath, spath = shrimp_format_output(tmp_path)
    ref = subprocess.run(
        [os.path.join(oracle.BUILD_DIR, "bin", "prettyprint-ls"),
         spath, gpath, rpath],
        capture_output=True, text=True, timeout=300)
    assert ref.returncode == 0
    mine = run_mod("prettyprint", [spath, gpath, rpath])
    assert ref.stdout == mine


@pytest.mark.skipif(ensure_tool("shrimp_var") is None,
                    reason="reference shrimp_var unavailable")
def test_shrimp_var_matches_reference(tmp_path):
    # include indel + reverse-strand edit strings
    lines = (">ri1\tctg\t+\t100\t140\t1\t36\t36\t300\t5(AC)10-3A12\t"
             "1.0e+00\t1.0e+00\t1.0e-09\n"
             ">ri2\tctg\t-\t200\t240\t1\t36\t36\t300\t4(GT)8--6C13x2\t"
             "1.0e+00\t1.0e+00\t1.0e-09\n")
    spath = os.path.join(str(tmp_path), "in.probcalc")
    with open(spath, "w") as f:
        f.write(lines)
    ref = subprocess.run([ensure_tool("shrimp_var"), "-p", spath],
                         capture_output=True, text=True, timeout=120)
    assert ref.returncode == 0
    mine = run_mod("shrimp_var", ["-p", spath])
    assert ref.stdout == mine


def _mp_input(tmp_path):
    rng = np.random.default_rng(5)
    lines = []
    for k in range(60):
        base = 100000 * k + 10000
        for i in range(int(rng.integers(1, 3))):
            s = base + i * 37
            lines.append(
                ">p%d_F\tctg1\t+\t%d\t%d\t1\t36\t36\t360\t36\t"
                "1.000000e+00\t9.990000e-01\t1.000000e-09" % (k, s, s + 35))
        for i in range(int(rng.integers(1, 3))):
            s = base - 200 - i * 41 - (k % 3) * 50
            lines.append(
                ">p%d_R\tctg1\t+\t%d\t%d\t1\t36\t36\t360\t36\t"
                "1.000000e+00\t9.980000e-01\t2.000000e-09" % (k, s, s + 35))
    path = os.path.join(str(tmp_path), "mp_in.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


@pytest.mark.skipif(ensure_tool("probcalc_mp") is None,
                    reason="reference probcalc_mp unavailable")
@pytest.mark.parametrize("extra", [[], ["-d", "-G", "0.5"]])
def test_probcalc_mp_matches_reference(tmp_path, extra):
    path = _mp_input(tmp_path)
    args = ["-m", path, "-f", "_F", "-b", "_R", "-g", "4600000",
            "-M", "5000"] + extra
    ref = subprocess.run([ensure_tool("probcalc_mp")] + args,
                         capture_output=True, text=True, timeout=300,
                         cwd=str(tmp_path))
    assert ref.returncode == 0
    mine = run_mod("probcalc_mp", args)
    assert ref.stdout == mine


def test_editstr_to_counts():
    from shrimp_tpu.io.shrimp_input import editstr_to_counts
    assert editstr_to_counts("36") == (36, 0, 0, 0, 0)
    assert editstr_to_counts("15A9") == (24, 1, 0, 0, 0)
    assert editstr_to_counts("3(TGCT)20") == (23, 0, 0, 4, 0)
    assert editstr_to_counts("5----20") == (25, 0, 4, 0, 0)
    assert editstr_to_counts("4x15x6") == (25, 0, 0, 0, 2)
    assert editstr_to_counts("3(TG") is None
