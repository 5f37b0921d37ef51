"""End-to-end golden test: our SAM output vs the reference gmapper binary
on synthetic letter-space unpaired data."""
import os
import subprocess

import numpy as np
import pytest

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired
from shrimp_tpu.mapper import Mapper

from . import oracle


def make_dataset(tmpdir, seed=42, genome_len=10000, n_reads=60, read_len=36):
    rng = np.random.default_rng(seed)
    g = "".join(rng.choice(list("ACGT"), genome_len))
    gpath = os.path.join(tmpdir, "genome.fa")
    with open(gpath, "w") as f:
        f.write(">chr_test\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(n_reads):
        pos = int(rng.integers(0, genome_len - read_len))
        r = list(g[pos:pos + read_len])
        kind = k % 6
        if kind == 1:      # mismatches
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(read_len))
                r[i] = str(rng.choice(list("ACGT")))
        elif kind == 2:    # deletion from read
            i = int(rng.integers(5, read_len - 8))
            d = int(rng.integers(1, 4))
            r = list(g[pos:pos + read_len + d])
            del r[i:i + d]
        elif kind == 3:    # insertion into read
            i = int(rng.integers(5, read_len - 5))
            ins = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 3))))
            r = list(g[pos:pos + read_len])
            r = r[:i] + list(ins) + r[i:]
            r = r[:read_len]
        elif kind == 5:    # random (likely unmapped)
            r = list(rng.choice(list("ACGT"), read_len))
        rs = "".join(r)
        if k % 2 == 1:
            rs = "".join(comp[c] for c in reversed(rs))
        reads.append((f"read{k}", rs))
    rpath = os.path.join(tmpdir, "reads.fa")
    with open(rpath, "w") as f:
        for n, r in reads:
            f.write(f">{n}\n{r}\n")
    return gpath, rpath, g, reads


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_unpaired_ls_matches_reference(tmp_path):
    gpath, rpath, g, reads = make_dataset(str(tmp_path))
    want = oracle.sam_body(oracle.run_gmapper(["-E", rpath, gpath]))

    idx = build_index([("chr_test", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig()
    m = Mapper(idx, cfg)
    results = m.map_unpaired([SeqRecord(n, s) for n, s in reads])
    got = []
    for re, hits in results:
        for h in hits:
            got.append(render_unpaired(re, h, idx, cfg))
    assert len(got) == len(want), (
        f"line count differs: got {len(got)} want {len(want)}\n"
        + "\n".join(got[:5]) + "\n---\n" + "\n".join(want[:5]))
    for g_line, w_line in zip(got, want):
        assert g_line == w_line, f"\n got: {g_line}\nwant: {w_line}"
