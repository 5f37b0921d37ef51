"""Offline sharding workflow tests: split-db / split-reads / project-db
CLI equivalents of utils/split-db.py, splitreads.py, project-db.py, plus
the small mergesam-family tools (fasta2fastq, lineindex).

The workflow correctness criterion is the reference's own
(SPLITTING_AND_MERGING): map per chunk, merge, and the result must equal
the whole-genome run.
"""
import io
import os

import numpy as np

from shrimp_tpu.cli import main as cli_main
from shrimp_tpu.io.fasta import read_fasta, read_seqs
from shrimp_tpu.tools.split import (fasta2fastq, lineindex, split_db,
                                    split_reads)


def _write_fa(path, recs):
    with open(path, "w") as f:
        for name, seq in recs:
            f.write(f">{name}\n{seq}\n")


def test_split_db_bins_whole_contigs(tmp_path):
    rng = np.random.default_rng(3)
    contigs = [(f"c{i}", "".join(rng.choice(list("ACGT"), 5000)))
               for i in range(6)]
    gpath = os.path.join(str(tmp_path), "g.fa")
    _write_fa(gpath, contigs)
    # budget chosen so several chunks are produced
    prefix = os.path.join(str(tmp_path), "chunk")
    paths = split_db([gpath], ram_size_gb=0.0471, prefix=prefix,
                     n_seeds=4, weight=12, out=io.StringIO())
    assert len(paths) > 1
    seen = []
    for p in paths:
        for rec in read_fasta(p):
            seen.append((rec.name, rec.seq))
    assert seen == contigs  # whole contigs, original order, none split


def test_split_reads_pairs_stay_together(tmp_path):
    recs = [(f"r{i}/{1 + i % 2}", "ACGTACGTAC") for i in range(30)]
    rpath = os.path.join(str(tmp_path), "r.fa")
    _write_fa(rpath, recs)
    paths = split_reads(rpath, 4, os.path.join(str(tmp_path), "rs"),
                        paired=True, out=io.StringIO())
    back = []
    for p in paths:
        chunk = list(read_seqs(p))
        assert len(chunk) % 2 == 0  # pair boundary respected
        back.extend((r.name, r.seq) for r in chunk)
    assert back == recs


def test_split_project_map_merge_equals_whole(tmp_path):
    rng = np.random.default_rng(11)
    g1 = "".join(rng.choice(list("ACGT"), 20000))
    g2 = "".join(rng.choice(list("ACGT"), 20000))
    d = str(tmp_path)
    _write_fa(os.path.join(d, "g.fa"), [("c1", g1), ("c2", g2)])
    reads = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for k in range(20):
        src = g1 if k % 2 == 0 else g2
        p = int(rng.integers(0, len(src) - 36))
        r = src[p:p + 36]
        if k % 3 == 0:
            r = "".join(comp[c] for c in reversed(r))
        reads.append((f"q{k}", r))
    rpath = os.path.join(d, "reads.fa")
    _write_fa(rpath, reads)

    import contextlib
    import sys

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli_main(argv)
        assert rc == 0
        return buf.getvalue()

    cli_main(["split-db", os.path.join(d, "g.fa"), "--ram-size", "0.0471",
              "--prefix", os.path.join(d, "chunk")])
    chunks = sorted(p for p in os.listdir(d) if p.startswith("chunk")
                    and p.endswith(".fa"))
    assert len(chunks) == 2
    cli_main(["project-db"] + [os.path.join(d, c) for c in chunks])

    whole = run(["map", rpath, os.path.join(d, "g.fa")])
    shard_sams = []
    for c in chunks:
        npz = os.path.join(d, c.rsplit(".", 1)[0] + ".npz")
        assert os.path.exists(npz)
        sam_path = os.path.join(d, c + ".sam")
        with open(sam_path, "w") as f:
            f.write(run(["map", rpath, npz]))
        shard_sams.append(sam_path)
    merged = run(["merge", rpath] + shard_sams)

    body = lambda s: sorted(l for l in s.splitlines()
                            if l and not l.startswith("@"))
    assert body(merged) == body(whole)


def test_fasta2fastq_and_lineindex(tmp_path):
    d = str(tmp_path)
    fa = os.path.join(d, "x.fa")
    qu = os.path.join(d, "x.qual")
    _write_fa(fa, [("a", "ACGT"), ("b", "GGTT")])
    with open(qu, "w") as f:
        f.write(">a\n30 31 32 33\n>b\n2 3 4 5\n")
    out = io.StringIO()
    n = fasta2fastq(fa, qu, out)
    assert n == 2
    lines = out.getvalue().splitlines()
    assert lines[0] == "@a" and lines[1] == "ACGT"
    assert lines[3] == "".join(chr(33 + v) for v in (30, 31, 32, 33))
    out2 = io.StringIO()
    n2 = lineindex(fa, out2)
    offs = [int(x) for x in out2.getvalue().split()]
    assert n2 == 4 and offs[0] == 0 and offs[1] == len(">a\n")


def test_split_contigs_balanced(tmp_path):
    """split-contigs (utils/split-contigs.c): desc-size first-fit with
    rebalancing; every contig lands in exactly one chunk and chunk
    genome lengths stay under the RAM-model target."""
    from shrimp_tpu.tools.split import split_contigs
    contigs = [(f"c{i}", size) for i, size in enumerate(
        [9_000_000, 7_000_000, 5_000_000, 3_000_000, 2_000_000,
         1_000_000, 500_000, 100_000])]
    chunks = split_contigs(contigs, 1.65, [10, 10, 10],
                           out=open(os.devnull, "w"))
    seen = [c for ch in chunks for c in ch]
    assert sorted(seen) == sorted(contigs)
    assert len(chunks) >= 2
    # chunks ordered by first-fit over descending sizes
    assert chunks[0][0][0] == "c0"


def test_temp_sink(tmp_path):
    import io

    from shrimp_tpu.tools.split import temp_sink
    dest = str(tmp_path / "out.bin")
    data = b"x" * 3_000_000
    n = temp_sink(dest, src=io.BytesIO(data), block_size=1 << 16,
                  out=open(os.devnull, "w"))
    assert n == len(data)
    with open(dest, "rb") as f:
        assert f.read() == data


def test_halo_split_merge_equals_whole(tmp_path):
    """Contigs split into overlapping pieces (split_contig_pieces, a
    capability the reference lacks: README:158-166, TODO:3) must map +
    merge back to the whole-genome run: piece records rebase to whole-
    contig coordinates and halo duplicates dedup with exact z1
    correction."""
    import io
    import numpy as np
    from shrimp_tpu.config import MapperConfig
    from shrimp_tpu.core import encode
    from shrimp_tpu.index.build import build_index
    from shrimp_tpu.index.seeds import default_seeds
    from shrimp_tpu.io.fasta import SeqRecord
    from shrimp_tpu.io.sam import render_unpaired, sam_header
    from shrimp_tpu.mapper import Mapper
    from shrimp_tpu.tools.mergesam import merge_sam_files
    from shrimp_tpu.tools.split import split_contig_pieces

    rng = np.random.default_rng(55)
    g = "".join(rng.choice(list("ACGT"), 60_000))
    # a repeat that spans the piece boundary region
    g = g[:34_000] + g[10_000:10_300] + g[34_300:]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(60):
        # bias reads toward the boundary/halo region of the 35k split
        if k % 3 == 0:
            p = int(rng.integers(29_500, 34_500))
        else:
            p = int(rng.integers(0, len(g) - 36))
        r = g[p:p + 36]
        if k % 2:
            r = "".join(comp[c] for c in reversed(r))
        reads.append(SeqRecord(f"h{k}", r))

    cfg = MapperConfig()

    def run(contigs):
        idx = build_index(contigs, default_seeds())
        m = Mapper(idx, cfg)
        lines = sam_header(idx, "x", cfg)
        for re_, hits in m.map_unpaired(reads):
            for h in hits:
                lines.append(render_unpaired(re_, h, idx, cfg))
        return lines

    whole = run([("chrH", encode.encode_ls(g))])
    pieces = split_contig_pieces("chrH", g, 35_000, 6_000)
    assert len(pieces) == 2 and pieces[0][0] == "chrH/0"
    assert pieces[1][0] == "chrH/29000"
    # one shard run per piece (pieces could also share chunks)
    shard_paths = []
    for i, (nm, seq) in enumerate(pieces):
        lines = run([(nm, encode.encode_ls(seq))])
        p = os.path.join(str(tmp_path), f"piece{i}.sam")
        open(p, "w").write("\n".join(lines) + "\n")
        shard_paths.append(p)
    rpath = os.path.join(str(tmp_path), "reads.fa")
    with open(rpath, "w") as f:
        for r in reads:
            f.write(f">{r.name}\n{r.seq}\n")
    buf = io.StringIO()
    merge_sam_files(rpath, shard_paths, buf)
    out_lines = buf.getvalue().splitlines()
    # collapsed @SQ header with the true contig length
    assert any(l.startswith("@SQ\tSN:chrH\tLN:60000") for l in out_lines)
    merged = sorted(l for l in out_lines
                    if l and not l.startswith("@"))
    want = sorted(l for l in whole if not l.startswith("@"))
    assert len(merged) == len(want), (
        f"{len(merged)} vs {len(want)}\n" + "\n".join(merged[:5])
        + "\n---\n" + "\n".join(want[:5]))
    from .test_merge import _assert_equivalent
    for gl, wl in zip(merged, want):
        _assert_equivalent(gl, wl)
