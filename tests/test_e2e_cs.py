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
