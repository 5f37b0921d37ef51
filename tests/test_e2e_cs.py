"""End-to-end golden test for colour-space unpaired mapping."""
import os

import numpy as np
import pytest

from shrimp_tpu import constants as C
from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired
from shrimp_tpu.mapper import Mapper

from . import oracle


def make_cs_dataset(tmpdir, seed=11, genome_len=40_000, n_reads=40,
                    read_len=36):
    """CS reads: initial base + read_len colours."""
    rng = np.random.default_rng(seed)
    g = "".join(rng.choice(list("ACGT"), genome_len))
    gpath = os.path.join(tmpdir, "genome.fa")
    with open(gpath, "w") as f:
        f.write(">chrC\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len - 1))
        letters = g[p:p + read_len + 1]
        if k % 2:
            letters = "".join(comp[c] for c in reversed(letters))
        lcodes = encode.encode_ls(letters)
        colours = [int(C.COLOUR_MAT[lcodes[i], lcodes[i + 1]])
                   for i in range(read_len)]
        # colour errors (sequencing noise)
        for _ in range(int(rng.integers(0, 3))):
            colours[int(rng.integers(read_len))] = int(rng.integers(4))
        if k % 6 == 4:
            colours[int(rng.integers(read_len))] = 4  # N colour -> '.'
        cs = letters[0] + "".join("0123."[c] if c <= 4 else "."
                                  for c in colours)
        reads.append((f"c{k}:{p}", cs))
    rpath = os.path.join(tmpdir, "reads.csfasta")
    with open(rpath, "w") as f:
        for n, r in reads:
            f.write(f">{n}\n{r}\n")
    return gpath, rpath, g, reads


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_cs_fastq_matches_reference(tmp_path):
    gpath, rpath, g, reads = make_cs_dataset(str(tmp_path), seed=13)
    rng = np.random.default_rng(99)
    fq = os.path.join(str(tmp_path), "reads.csfastq")
    recs = []
    with open(fq, "w") as f:
        for n, r in reads:
            quals = "".join(chr(33 + int(q))
                            for q in rng.integers(5, 40, len(r) - 1))
            f.write(f"@{n}\n{r}\n+\n{quals}\n")
            recs.append(SeqRecord(n, r, quals))
    want = oracle.sam_body(oracle.run_gmapper(["-E", fq, gpath], mode="cs"))
    idx = build_index([("chrC", encode.encode_ls(g))], default_seeds(),
                      mode=C.MODE_COLOUR_SPACE)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    m = Mapper(idx, cfg)
    results = m.map_unpaired(recs)
    got = []
    for re_, hits in results:
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg, fastq=True))
    assert len(got) == len(want), (
        f"line count differs: got {len(got)} want {len(want)}\n"
        + "\n".join(got[:5]) + "\n--- want:\n" + "\n".join(want[:5]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_cs_unpaired_matches_reference(tmp_path):
    gpath, rpath, g, reads = make_cs_dataset(str(tmp_path))
    want = oracle.sam_body(oracle.run_gmapper(["-E", rpath, gpath],
                                              mode="cs"))
    idx = build_index([("chrC", encode.encode_ls(g))], default_seeds(),
                      mode=C.MODE_COLOUR_SPACE)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    m = Mapper(idx, cfg)
    results = m.map_unpaired([SeqRecord(n, s) for n, s in reads])
    got = []
    for re_, hits in results:
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg))
    assert len(got) == len(want), (
        f"line count differs: got {len(got)} want {len(want)}\n"
        + "\n".join(got[:5]) + "\n--- want:\n" + "\n".join(want[:5]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_cs_paired_matches_reference(tmp_path):
    """Colour-space paired-end (opp-in) golden test vs gmapper-cs."""
    import os
    rng = np.random.default_rng(135)
    g = "".join(rng.choice(list("ACGT"), 50_000))
    gpath = os.path.join(str(tmp_path), "genome.fa")
    with open(gpath, "w") as f:
        f.write(">chrD\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    l2n = {c: i for i, c in enumerate("ACGT")}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def tocs(s):
        return "T" + str(l2n["T"] ^ l2n[s[0]]) + "".join(
            str(l2n[s[i]] ^ l2n[s[i + 1]]) for i in range(len(s) - 1))

    def rc(s):
        return "".join(comp[c] for c in reversed(s))

    reads = []
    for i in range(60):
        isz = int(rng.integers(100, 300))
        p = int(rng.integers(0, len(g) - isz - 40))
        a = list(g[p:p + 36])
        b = list(g[p + isz - 36:p + isz])
        for s in (a, b):
            for _ in range(int(rng.integers(0, 2))):
                s[int(rng.integers(36))] = str(
                    rng.choice(list("ACGT")))
        r1, r2 = "".join(a), rc("".join(b))
        if i % 8 == 5:    # scattered mate -> half-paired
            q = int(rng.integers(0, len(g) - 36))
            r2 = g[q:q + 36]
        reads.append((f"d{i}/1", tocs(r1)))
        reads.append((f"d{i}/2", tocs(r2)))
    rpath = os.path.join(str(tmp_path), "reads.fa")
    with open(rpath, "w") as f:
        for n, s in reads:
            f.write(f">{n}\n{s}\n")
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "-p", "opp-in", rpath, gpath], mode="cs"))
    from shrimp_tpu.io.sam import render_pair_entry
    from shrimp_tpu.paired import PairedMapper
    idx = build_index([("chrD", encode.encode_ls(g))], default_seeds(),
                      mode=C.MODE_COLOUR_SPACE)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE, pair_mode="opp-in")
    m = PairedMapper(idx, cfg)
    got = []
    for pe in m.map_paired([SeqRecord(n, s) for n, s in reads]):
        p_out, u_out = m.select_output(pe)
        got.extend(render_pair_entry(pe, idx, cfg, p_out, u_out))
    assert got == want, (
        f"{len(got)} vs {len(want)}\n" + "\n".join(got[:4])
        + "\n---\n" + "\n".join(want[:4]))
