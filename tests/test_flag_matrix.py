"""Flag-matrix golden fuzz: our CLI vs gmapper across option combos.

Each case maps the same reads/genome with one flag set through both
tools and requires byte-identical SAM bodies. This is the broad-parity
backstop behind the per-feature golden tests."""
import os
import subprocess
import sys

import pytest

from . import oracle

pytestmark = pytest.mark.skipif(oracle.ensure_gmapper() is None,
                                reason="reference gmapper not available")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import random
    d = str(tmp_path_factory.mktemp("flagmx"))
    rng = random.Random(424242)
    g = "".join(rng.choice("ACGT") for _ in range(60000))
    with open(os.path.join(d, "genome.fa"), "w") as f:
        f.write(">chrX\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    with open(os.path.join(d, "u.fa"), "w") as f:
        for r in range(200):
            pos = rng.randrange(0, len(g) - 36)
            s = list(g[pos:pos + 36])
            for _ in range(rng.choice([0, 0, 1, 2, 3])):
                s[rng.randrange(36)] = rng.choice("ACGT")
            s = "".join(s)
            if rng.random() < 0.5:
                s = s.translate(comp)[::-1]
            f.write(f">u{r}\n{s}\n")
    with open(os.path.join(d, "p.fa"), "w") as f:
        for i in range(120):
            p = rng.randrange(0, len(g) - 400)
            isz = rng.randrange(100, 300)
            a = list(g[p:p + 36])
            b = list(g[p + isz - 36:p + isz])
            for s in (a, b):
                for _ in range(rng.choice([0, 0, 1, 2])):
                    s[rng.randrange(36)] = rng.choice("ACGT")
            r1 = "".join(a)
            r2 = "".join(b).translate(comp)[::-1]
            if rng.random() < 0.1:
                q = rng.randrange(0, len(g) - 36)
                r2 = g[q:q + 36]
            f.write(f">p{i}/1\n{r1}\n>p{i}/2\n{r2}\n")
    return d


UNPAIRED_CASES = [
    ("--max-alignments 2", None),
    ("-o 3", None),
    ("-w 120.0", None),
    ("-r 70.0", None),
    ("-h 60.0", "-h-threshold 60.0"),
    ("-m 11 -i -20", None),
    ("-g -40 -e -10", None),
    ("-q -40 -f -10", None),
    ("--trim-front 3", None),
    ("--trim-end 4", None),
    ("--strata -o 5", None),
    ("--local -t", None),
    ("-l 80.0", None),
    ("-n 1", None),
    ("-a 4", None),
    ("-s 1110111,1101101", None),
    ("--extra-sam-fields", None),
    ("--all-contigs", None),
    ("--single-best-mapping", None),
]

PAIRED_CASES = [
    ("-p opp-in -I 50,400", None),
    ("-p opp-in --strata", None),
    ("-p opp-in --max-alignments 1", None),
    ("-p opp-in --insert-size-dist 180,60", None),
    ("-p opp-in --no-improper-mappings", None),
    ("-p opp-in --trim-front 2", None),
    ("-p opp-in --trim-end 3", None),
    ("-p opp-in --trim-front 2 --trim-first", None),
    ("-p opp-out", None),
    ("-p col-fw", None),
    ("-p col-bw", None),
]


def _ours(dataset, flags, reads):
    from shrimp_tpu.cli import main
    out_path = os.path.join(dataset, "out.sam")
    old = sys.stdout
    with open(out_path, "w") as f:
        sys.stdout = f
        try:
            main(["map"] + flags.split()
                 + [os.path.join(dataset, reads),
                    os.path.join(dataset, "genome.fa")])
        finally:
            sys.stdout = old
    with open(out_path) as f:
        return [l.rstrip("\n") for l in f
                if l.strip() and not l.startswith("@")]


def _ref(dataset, flags, reads):
    res = subprocess.run(
        [os.path.join(oracle.BUILD_DIR, "bin", "gmapper-ls"), "-E"]
        + flags.split()
        + [os.path.join(dataset, reads), os.path.join(dataset, "genome.fa")],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-500:]
    return [l for l in res.stdout.splitlines()
            if l and not l.startswith("@")]


@pytest.mark.parametrize("gflags,oflags", UNPAIRED_CASES)
def test_flag_matrix_unpaired(dataset, gflags, oflags):
    want = _ref(dataset, gflags, "u.fa")
    got = _ours(dataset, oflags or gflags, "u.fa")
    assert got == want, (f"[{gflags}]\n" + "\n".join(got[:3])
                         + "\n---\n" + "\n".join(want[:3]))


@pytest.mark.parametrize("gflags,oflags", PAIRED_CASES)
def test_flag_matrix_paired(dataset, gflags, oflags):
    want = _ref(dataset, gflags, "p.fa")
    got = _ours(dataset, oflags or gflags, "p.fa")
    assert got == want, (f"[{gflags}]\n" + "\n".join(got[:3])
                         + "\n---\n" + "\n".join(want[:3]))


@pytest.fixture(scope="module")
def cs_dataset(tmp_path_factory):
    import random
    d = str(tmp_path_factory.mktemp("flagmx_cs"))
    rng = random.Random(888)
    g = "".join(rng.choice("ACGT") for _ in range(60000))
    with open(os.path.join(d, "genome.fa"), "w") as f:
        f.write(">chrX\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    l2n = {c: i for i, c in enumerate("ACGT")}
    comp = str.maketrans("ACGT", "TGCA")

    def tocs(s):
        return "T" + str(l2n["T"] ^ l2n[s[0]]) + "".join(
            str(l2n[s[i]] ^ l2n[s[i + 1]]) for i in range(len(s) - 1))

    fa = open(os.path.join(d, "pc.fa"), "w")
    fq = open(os.path.join(d, "pc.fastq"), "w")
    for i in range(100):
        p = rng.randrange(0, len(g) - 400)
        isz = rng.randrange(100, 300)
        a = list(g[p:p + 36])
        b = list(g[p + isz - 36:p + isz])
        for s in (a, b):
            for _ in range(rng.choice([0, 0, 1])):
                s[rng.randrange(36)] = rng.choice("ACGT")
        r1 = "".join(a)
        r2 = "".join(b).translate(comp)[::-1]
        if rng.random() < 0.12:
            q = rng.randrange(0, len(g) - 36)
            r2 = g[q:q + 36]
        c1, c2 = tocs(r1), tocs(r2)
        fa.write(f">x{i}/1\n{c1}\n>x{i}/2\n{c2}\n")
        for nm, cs in ((f"x{i}/1", c1), (f"x{i}/2", c2)):
            qs = "".join(chr(33 + rng.randrange(3, 41))
                         for _ in range(len(cs) - 1))
            fq.write(f"@{nm}\n{cs}\n+\n{qs}\n")
    fa.close()
    fq.close()
    with open(os.path.join(d, "uc.fa"), "w") as f:
        for r in range(150):
            pos = rng.randrange(0, len(g) - 36)
            s = list(g[pos:pos + 36])
            for _ in range(rng.choice([0, 0, 1, 2])):
                s[rng.randrange(36)] = rng.choice("ACGT")
            s = "".join(s)
            if rng.random() < 0.5:
                s = s.translate(comp)[::-1]
            f.write(f">c{r}\n{tocs(s)}\n")
    return d


CS_PAIRED_CASES = [
    ("-p opp-in", None),
    ("-p opp-in --strata", None),
    ("-p opp-in -x -18", None),
    ("-p opp-in --no-half-paired", None),
    ("-p opp-in --trim-end 2", None),
    ("-p col-fw", None),
]

CS_PAIRED_FASTQ_CASES = [
    ("-p opp-in", None),
    ("-p opp-in --strata", None),
    ("-p opp-in --ignore-qvs", None),
    ("-p opp-in --max-alignments 1", None),
    ("-p opp-out", None),
]

CS_UNPAIRED_CASES = [
    ("", None),
    ("--max-alignments 2", None),
    ("-o 3", None),
    ("--strata -o 5", None),
    ("-x -18", None),
    ("-n 1", None),
    ("-w 120.0", None),
]


def _ref_cs(dataset, flags, reads):
    res = subprocess.run(
        [os.path.join(oracle.BUILD_DIR, "bin", "gmapper-cs"), "-E"]
        + flags.split()
        + [os.path.join(dataset, reads), os.path.join(dataset, "genome.fa")],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-500:]
    return [l for l in res.stdout.splitlines()
            if l and not l.startswith("@")]


@pytest.mark.parametrize("gflags,oflags", CS_PAIRED_CASES)
def test_flag_matrix_cs_paired(cs_dataset, gflags, oflags):
    want = _ref_cs(cs_dataset, gflags, "pc.fa")
    got = _ours(cs_dataset, "--cs " + (oflags or gflags), "pc.fa")
    assert got == want, (f"[{gflags}]\n" + "\n".join(got[:3])
                         + "\n---\n" + "\n".join(want[:3]))


@pytest.mark.parametrize("gflags,oflags", CS_PAIRED_FASTQ_CASES)
def test_flag_matrix_cs_paired_fastq(cs_dataset, gflags, oflags):
    want = _ref_cs(cs_dataset, gflags, "pc.fastq")
    got = _ours(cs_dataset, "--cs " + (oflags or gflags), "pc.fastq")
    assert got == want, (f"[{gflags}]\n" + "\n".join(got[:3])
                         + "\n---\n" + "\n".join(want[:3]))


@pytest.mark.parametrize("gflags,oflags", CS_UNPAIRED_CASES)
def test_flag_matrix_cs_unpaired(cs_dataset, gflags, oflags):
    want = _ref_cs(cs_dataset, gflags, "uc.fa")
    got = _ours(cs_dataset, ("--cs " + (oflags or gflags)).strip(),
                "uc.fa")
    assert got == want, (f"[{gflags}]\n" + "\n".join(got[:3])
                         + "\n---\n" + "\n".join(want[:3]))
