"""Gapless (-U) and miRNA-mode golden tests vs the reference."""
import os

import numpy as np
import pytest

from shrimp_tpu import constants as C
from shrimp_tpu.config import MapperConfig, Scores
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds, mirna_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired
from shrimp_tpu.mapper import Mapper

from . import oracle


def _mk(tmpdir, rng, read_len, n_reads=30, genome_len=30_000):
    g = "".join(rng.choice(list("ACGT"), genome_len))
    gpath = os.path.join(tmpdir, "genome.fa")
    with open(gpath, "w") as f:
        f.write(">chrM\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        r = list(g[p:p + read_len])
        for _ in range(int(rng.integers(0, 2))):
            r[int(rng.integers(read_len))] = str(rng.choice(list("ACGT")))
        rs = "".join(r)
        if k % 2:
            rs = "".join(comp[c] for c in reversed(rs))
        reads.append((f"u{k}", rs))
    rpath = os.path.join(tmpdir, "reads.fa")
    with open(rpath, "w") as f:
        for n, r in reads:
            f.write(f">{n}\n{r}\n")
    return gpath, rpath, g, reads


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_ungapped_local_matches_reference(tmp_path):
    rng = np.random.default_rng(41)
    gpath, rpath, g, reads = _mk(str(tmp_path), rng, 36)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "-U", "--local", rpath, gpath]))
    idx = build_index([("chrM", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(gapless=True, global_alignment=False)
    m = Mapper(idx, cfg)
    got = []
    for re_, hits in m.map_unpaired([SeqRecord(n, s) for n, s in reads]):
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg))
    assert len(got) == len(want), (f"{len(got)} vs {len(want)}\n"
                                   + "\n".join(got[:4]) + "\n---\n"
                                   + "\n".join(want[:4]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_cs_ungapped_matches_reference(tmp_path):
    """Colour-space -U: the gapless Kadane filter must score a colour
    mismatch as match+crossover (f1_setup, gmapper.c:2933-2936), not the
    full-SW mismatch, or pass1 survivors diverge."""
    from .test_e2e_cs import make_cs_dataset
    gpath, rpath, g, reads = make_cs_dataset(str(tmp_path), seed=47)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "-U", "--local", rpath, gpath], mode="cs"))
    idx = build_index([("chrC", encode.encode_ls(g))], default_seeds(),
                      mode=C.MODE_COLOUR_SPACE)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE, gapless=True,
                       global_alignment=False)
    m = Mapper(idx, cfg)
    got = []
    for re_, hits in m.map_unpaired([SeqRecord(n, s) for n, s in reads]):
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg))
    assert len(got) == len(want), (f"{len(got)} vs {len(want)}\n"
                                   + "\n".join(got[:4]) + "\n---\n"
                                   + "\n".join(want[:4]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_mirna_mode_matches_reference(tmp_path):
    rng = np.random.default_rng(43)
    gpath, rpath, g, reads = _mk(str(tmp_path), rng, 22)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "-M", "mirna", rpath, gpath]))
    idx = build_index([("chrM", encode.encode_ls(g))], mirna_seeds(),
                      hashed=True)
    sc = Scores(a_gap_open=-255, b_gap_open=-255)
    cfg = MapperConfig(scores=sc, gapless=True, global_alignment=False,
                      match_mode=1, window_len=100.0, anchor_width=0,
                      compute_mapping_qualities=False)
    m = Mapper(idx, cfg)
    got = []
    for re_, hits in m.map_unpaired([SeqRecord(n, s) for n, s in reads]):
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg))
    assert len(got) == len(want), (f"{len(got)} vs {len(want)}\n"
                                   + "\n".join(got[:4]) + "\n---\n"
                                   + "\n".join(want[:4]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"
