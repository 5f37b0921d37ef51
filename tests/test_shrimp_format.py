"""Legacy SHRiMP-format output and extra SAM fields vs the reference."""
import pytest

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io import shrimp_format
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired
from shrimp_tpu.mapper import Mapper

from . import oracle
from .test_e2e_unpaired import make_dataset


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_shrimp_format_matches_reference(tmp_path):
    gpath, rpath, g, reads = make_dataset(str(tmp_path))
    raw = oracle.run_gmapper(["--shrimp-format", rpath, gpath])
    want = [l for l in raw.splitlines() if l and not l.startswith("#")]

    idx = build_index([("chr_test", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(shrimp_format=True)
    m = Mapper(idx, cfg)
    results = m.map_unpaired([SeqRecord(n, s) for n, s in reads])
    got = []
    for re_, hits in results:
        for h in hits:
            got.append(shrimp_format.output_normal(re_, h, idx))
    assert len(got) == len(want), (f"{len(got)} vs {len(want)}\n"
                                   + "\n".join(got[:4]) + "\n---\n"
                                   + "\n".join(want[:4]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_extra_sam_fields_match_reference(tmp_path):
    gpath, rpath, g, reads = make_dataset(str(tmp_path), seed=77)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "--extra-sam-fields", rpath, gpath]))
    idx = build_index([("chr_test", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(extra_sam_fields=True)
    m = Mapper(idx, cfg)
    results = m.map_unpaired([SeqRecord(n, s) for n, s in reads])
    got = []
    for re_, hits in results:
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg))
    assert len(got) == len(want)
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


def test_shrimp2sam_roundtrip(tmp_path):
    """Map in legacy format, convert with shrimp2sam, and check the SAM
    core fields against a direct SAM run (shrimp2sam/shrimp2sam.c)."""
    import contextlib
    import io
    import os

    import numpy as np

    from shrimp_tpu.cli import main as cli_main
    rng = np.random.default_rng(33)
    g = "".join(rng.choice(list("ACGT"), 20000))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    d = str(tmp_path)
    with open(os.path.join(d, "g.fa"), "w") as f:
        f.write(">c\n" + g + "\n")
    reads = []
    for k in range(12):
        p = int(rng.integers(0, len(g) - 36))
        r = g[p:p + 36]
        if k % 3 == 0:
            r = "".join(comp[c] for c in reversed(r))
        if k % 4 == 0:
            r = r[:10] + "A" + r[11:]
        reads.append((f"s{k}", r))
    rpath = os.path.join(d, "r.fa")
    with open(rpath, "w") as f:
        for n, s in reads:
            f.write(f">{n}\n{s}\n")

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            assert cli_main(argv) == 0
        return buf.getvalue()

    legacy = run(["map", "--shrimp-format", rpath, os.path.join(d, "g.fa")])
    lpath = os.path.join(d, "out.shrimp")
    open(lpath, "w").write(legacy)
    sam_direct = run(["map", rpath, os.path.join(d, "g.fa")])
    sam_conv = run(["shrimp2sam", rpath, lpath])

    def core(s):
        rows = {}
        for line in s.splitlines():
            if not line or line.startswith("@"):
                continue
            f = line.split("\t")
            # qname, flag, rname, pos, cigar, seq
            rows[(f[0], f[1])] = (f[2], f[3], f[5], f[9])
        return rows
    direct = core(sam_direct)
    conv = core(sam_conv)
    assert set(conv) == set(direct)
    for k in conv:
        assert conv[k] == direct[k], (k, conv[k], direct[k])
