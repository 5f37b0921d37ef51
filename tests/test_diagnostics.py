"""Diagnostics: -Y index histogram, -X insert-size histogram, -D stage
stats (print_genomemap_stats genome.c:834-902; insert histogram
gmapper.c:664-677, output.c:1255-1264)."""
import contextlib
import io
import os

import numpy as np

from shrimp_tpu.cli import InsertHistogram, main as cli_main


def _mk_dataset(d, paired=False):
    rng = np.random.default_rng(77)
    g = "".join(rng.choice(list("ACGT"), 20000))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    gpath = os.path.join(d, "g.fa")
    with open(gpath, "w") as f:
        f.write(">c\n" + g + "\n")
    rpath = os.path.join(d, "r.fa")
    with open(rpath, "w") as f:
        if paired:
            for k in range(8):
                p = int(rng.integers(0, len(g) - 400))
                r1 = g[p:p + 36]
                mate = g[p + 200:p + 236]
                r2 = "".join(comp[c] for c in reversed(mate))
                f.write(f">p{k}/1\n{r1}\n>p{k}/2\n{r2}\n")
        else:
            for k in range(8):
                p = int(rng.integers(0, len(g) - 36))
                f.write(f">u{k}\n{g[p:p + 36]}\n")
    return gpath, rpath


def _run(argv):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = cli_main(argv)
    assert rc == 0
    return out.getvalue(), err.getvalue()


def test_index_histogram_flag(tmp_path):
    gpath, rpath = _mk_dataset(str(tmp_path))
    _, err = _run(["map", "-Y", rpath, gpath])
    assert "Genome Map stats:" in err
    assert "sn:0 weight:" in err
    assert "(cummulative: 100.0000%)" in err.replace("100.0000 %", "")


def test_detailed_stats_flag(tmp_path):
    gpath, rpath = _mk_dataset(str(tmp_path))
    _, err = _run(["map", "-D", rpath, gpath])
    assert "Per-stage wall clock:" in err
    _, err2 = _run(["map", rpath, gpath])
    assert "Per-stage wall clock:" not in err2


def test_insert_histogram_paired(tmp_path):
    gpath, rpath = _mk_dataset(str(tmp_path), paired=True)
    _, err = _run(["map", "-X", "-p", "opp-in", rpath, gpath])
    lines = [l for l in err.splitlines()
             if l.startswith("[") and l.endswith("%")]
    assert len(lines) == 100
    # the ~236bp inserts land in some bucket with nonzero percentage
    pcts = [float(l.split()[-1].rstrip("%")) for l in lines]
    assert max(pcts) > 0


def test_insert_histogram_bucketing():
    ih = InsertHistogram(0, 1000)
    bucket_size = ih.bucket_size

    class PH:
        improper_mapping = False

        def __init__(self, ins):
            self.insert_size = ins

    class PE:
        final_paired_hits = [PH(5), PH(999), PH(-50), PH(10**6)]

    ih.add_pair_entry(PE())
    assert ih.total == 4
    assert ih.hist[0] == 2           # 5 and clamped -50
    assert ih.hist[999 // bucket_size] == 1
    assert ih.hist[99] == 1          # clamped high
