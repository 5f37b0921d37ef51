"""Read trimming (--trim-front/-end/-illumina) and quality-value gating
(--min-avg-qv, PHRED-offset sanity check) — gmapper.c:262-281,430-498."""
import os

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
from .test_e2e_unpaired import make_dataset


def _our_sam(idx, recs, **cfgkw):
    cfg = MapperConfig(**cfgkw)
    m = Mapper(idx, cfg)
    lines = []
    fastq = any(r.qual is not None for r in recs)
    for re_, hits in m.map_unpaired(recs):
        for h in hits:
            lines.append(render_unpaired(re_, h, m.index, cfg,
                                         fastq=fastq))
    return lines


def _build(tmp_path, **kw):
    gpath, rpath, g, reads = make_dataset(str(tmp_path), **kw)
    idx = build_index([("chr_test", encode.encode_ls(g))], default_seeds())
    return idx, reads, gpath, rpath


def test_trim_front_end(tmp_path):
    """Front/end trimming is equivalent to mapping the sliced reads."""
    idx, reads, _, _ = _build(tmp_path, n_reads=60, read_len=44)
    recs = [SeqRecord(n, s) for n, s in reads]
    got = _our_sam(idx, recs, trim_front=3, trim_end=5)
    sliced = [SeqRecord(n, s[3:len(s) - 5]) for n, s in reads]
    want = _our_sam(idx, sliced)
    assert got == want and got


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_trim_matches_reference(tmp_path):
    idx, reads, gpath, rpath = _build(tmp_path, n_reads=80, seed=5,
                                      read_len=44)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "--trim-front", "2", "--trim-end", "4", rpath, gpath]))
    got = _our_sam(idx, [SeqRecord(n, s) for n, s in reads],
                   trim_front=2, trim_end=4)
    assert got == want


def _write_fastq(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n")


def test_min_avg_qv_drops(tmp_path):
    """Reads whose average qv (PHRED+64 in LS) is below min_avg_qv are
    dropped entirely."""
    idx, reads, _, _ = _build(tmp_path, n_reads=40)
    recs = []
    for i, (n, s) in enumerate(reads):
        # avg qv 30 (keep) vs avg qv 2 (drop); delta=64
        q = chr(64 + 30) if i % 2 == 0 else chr(64 + 2)
        recs.append(SeqRecord(n, s, q * len(s)))
    got = _our_sam(idx, recs)
    kept_names = {r.name for r in recs[::2]}
    got_names = {l.split("\t")[0] for l in got}
    assert got_names and got_names <= kept_names
    # disabled gate maps everything the plain run maps
    all_names = {l.split("\t")[0]
                 for l in _our_sam(idx, recs, min_avg_qv=-1)}
    assert got_names < all_names


def test_qv_offset_check_raises(tmp_path):
    idx, reads, _, _ = _build(tmp_path, n_reads=4)
    n, s = reads[0]
    recs = [SeqRecord(n, s, "%" * len(s))]  # '%'-64 = -27 < -10
    with pytest.raises(ValueError, match="qv-offset"):
        _our_sam(idx, recs)
    assert _our_sam(idx, recs, no_qv_check=True, min_avg_qv=-1)


def test_trim_illumina(tmp_path):
    """Trailing 'B' quality run is stripped from seq+qual (LS only)."""
    idx, reads, _, _ = _build(tmp_path, n_reads=30, read_len=44)
    recs = []
    for n, s in reads:
        q = chr(64 + 30) * (len(s) - 6) + "B" * 6
        recs.append(SeqRecord(n, s, q))
    got = _our_sam(idx, recs, trim_illumina=True)
    sliced = [SeqRecord(r.name, r.seq[:-6], r.qual[:-6]) for r in recs]
    want = _our_sam(idx, sliced)
    assert got == want and got


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_fastq_qv_gate_matches_reference(tmp_path):
    """End-to-end fastq run with mixed-quality reads: dropped reads,
    QUAL column, and alignments all match gmapper."""
    idx, reads, gpath, _ = _build(tmp_path, n_reads=60, seed=9)
    rng = np.random.default_rng(1)
    recs = []
    for i, (n, s) in enumerate(reads):
        qv = 3 if i % 5 == 0 else int(rng.integers(15, 41))
        recs.append(SeqRecord(n, s, chr(64 + qv) * len(s)))
    fq = os.path.join(str(tmp_path), "reads.fastq")
    _write_fastq(fq, recs)
    want = oracle.sam_body(oracle.run_gmapper(["-E", fq, gpath]))
    got = _our_sam(idx, recs)
    assert got == want
