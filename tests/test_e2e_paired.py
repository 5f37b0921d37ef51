"""End-to-end golden test for paired-end mapping vs the reference binary."""
import os

import numpy as np
import pytest

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io import sam
from shrimp_tpu.paired import PairedMapper

from . import oracle


def make_paired_dataset(tmpdir, seed=7, genome_len=50_000, n_pairs=40,
                        read_len=36, mode="opp-in"):
    rng = np.random.default_rng(seed)
    g = list(rng.choice(list("ACGT"), genome_len))
    g[30_000:30_400] = g[5_000:5_400]     # repeat for multimapping
    g = "".join(g)
    gpath = os.path.join(tmpdir, "genome.fa")
    with open(gpath, "w") as f:
        f.write(">chrP\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def rc(s):
        return "".join(comp[c] for c in reversed(s))

    reads = []
    for k in range(n_pairs):
        isize = int(rng.normal(200, 60))
        isize = max(2 * read_len + 10, min(isize, 900))
        p = int(rng.integers(0, genome_len - isize - 1))
        r1 = list(g[p:p + read_len])
        r2 = list(g[p + isize - read_len:p + isize])
        for r in (r1, r2):
            for _ in range(int(rng.integers(0, 3))):
                r[int(rng.integers(read_len))] = str(rng.choice(list("ACGT")))
        if k % 5 == 2:  # indel in read 1
            i2 = int(rng.integers(5, read_len - 8))
            d = int(rng.integers(1, 3))
            if k % 2:
                r1 = list(g[p:p + read_len + d])
                del r1[i2:i2 + d]
            else:
                r1 = (r1[:i2]
                      + list(rng.choice(list("ACGT"), d)) + r1[i2:])[
                          :read_len]
        r1s, r2s = "".join(r1), "".join(r2)
        # orientation per pair mode (second mate genomic-downstream)
        if mode == "opp-in":
            m1, m2 = r1s, rc(r2s)
        elif mode == "opp-out":
            m1, m2 = rc(r1s), r2s
        elif mode == "col-fw":
            m1, m2 = r1s, r2s
        else:  # col-bw
            m1, m2 = rc(r1s), rc(r2s)
        if k % 2 == 0:
            reads.append((f"p{k}:{p}/1", m1))
            reads.append((f"p{k}:{p}/2", m2))
        else:
            reads.append((f"p{k}:{p}/1", m2))
            reads.append((f"p{k}:{p}/2", m1))
        if k % 7 == 3:  # break one mate (half-paired case)
            name, _ = reads[-1]
            reads[-1] = (name, "".join(rng.choice(list("ACGT"), read_len)))
    rpath = os.path.join(tmpdir, "reads.fa")
    with open(rpath, "w") as f:
        for n, r in reads:
            f.write(f">{n}\n{r}\n")
    return gpath, rpath, g, reads


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
@pytest.mark.parametrize("mode", ["opp-in", "opp-out", "col-fw", "col-bw"])
def test_paired_ls_matches_reference(tmp_path, mode):
    gpath, rpath, g, reads = make_paired_dataset(str(tmp_path), mode=mode)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "-p", mode, rpath, gpath]))

    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode=mode)
    m = PairedMapper(idx, cfg)
    pairs = m.map_paired([SeqRecord(n, s) for n, s in reads])
    got = []
    for pe in pairs:
        paired_out, unpaired_out = m.select_output(pe)
        got.extend(sam.render_pair_entry(pe, idx, cfg, paired_out,
                                         unpaired_out))
    assert len(got) == len(want), (
        f"line count differs: got {len(got)} want {len(want)}\n"
        + "\n".join(got[:6]) + "\n--- want:\n" + "\n".join(want[:6]))
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"


def make_mp_dataset(tmpdir, seed=13, genome_len=120_000, n_pairs=70,
                    read_len=36):
    """Long-insert opp-in pairs straddling 2048-bp region boundaries plus
    junk mates, so the mate-pair region filter (and heavy_mp window
    rescue) actually discriminates."""
    rng = np.random.default_rng(seed)
    g = list(rng.choice(list("ACGT"), genome_len))
    g[80_000:81_200] = g[20_000:21_200]      # big repeat, offset 60_000
    g = "".join(g)
    gpath = os.path.join(tmpdir, "genome.fa")
    with open(gpath, "w") as f:
        f.write(">chrR\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(n_pairs):
        isize = max(2 * read_len + 5, min(int(rng.normal(800, 700)), 3000))
        p = int(rng.integers(0, genome_len - isize - 1))
        r1 = list(g[p:p + read_len])
        r2 = list(g[p + isize - read_len:p + isize])
        for r in (r1, r2):
            for _ in range(int(rng.integers(0, 4))):
                r[int(rng.integers(read_len))] = str(rng.choice(list("ACGT")))
        if k % 6 == 1:  # indel
            i2 = int(rng.integers(5, read_len - 8))
            d = int(rng.integers(1, 4))
            r1 = list(g[p:p + read_len + d])
            del r1[i2:i2 + d]
        m1 = "".join(r1)
        m2 = "".join(comp[c] for c in reversed("".join(r2)))
        if k % 9 == 4:
            m2 = "".join(rng.choice(list("ACGT"), read_len))
        if k % 11 == 7:
            m1 = "".join(rng.choice(list("ACGT"), read_len))
            m2 = "".join(rng.choice(list("ACGT"), read_len))
        reads.append((f"q{k}:{p}/1", m1))
        reads.append((f"q{k}:{p}/2", m2))
    rpath = os.path.join(tmpdir, "reads.fa")
    with open(rpath, "w") as f:
        for n, r in reads:
            f.write(f">{n}\n{r}\n")
    return gpath, rpath, g, reads


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
@pytest.mark.parametrize("mp_mode,flags,kw", [
    (1, ["--no-half-paired"], dict(half_paired=False)),
    (2, ["-n", "3"], dict(match_mode=3)),
    (3, ["-n", "3", "--no-half-paired"],
     dict(match_mode=3, half_paired=False)),
])
def test_paired_mp_region_filter_matches_reference(tmp_path, mp_mode,
                                                   flags, kw):
    """Mate-pair region filter modes 1/2/3 (advance_index_in_genomemap
    mapping.c:695-745, heavy_mp mapping.c:1083-1163)."""
    gpath, rpath, g, reads = make_mp_dataset(str(tmp_path))
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "-p", "opp-in"] + flags + [rpath, gpath]))

    idx = build_index([("chrR", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in", **kw)
    m = PairedMapper(idx, cfg)
    pairs = m.map_paired([SeqRecord(n, s) for n, s in reads])
    got = []
    for pe in pairs:
        paired_out, unpaired_out = m.select_output(pe)
        got.extend(sam.render_pair_entry(pe, idx, cfg, paired_out,
                                         unpaired_out))
    assert len(got) == len(want), (
        f"line count differs: got {len(got)} want {len(want)}")
    for gl, wl in zip(got, want):
        assert gl == wl, f"\n got: {gl}\nwant: {wl}"
