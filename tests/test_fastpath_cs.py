"""The flat-array CS unpaired fast path (shrimp_tpu/fastpath_cs.py +
native/cspipe.cpp) must produce byte-identical SAM to the generic
object pipeline (and hence to gmapper-cs -E, covered transitively by
test_e2e_cs)."""
import pytest

from shrimp_tpu import constants as C
from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.fastpath_cs import (fastpath_cs_supported,
                                    map_unpaired_cs_sam_stream)
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired
from shrimp_tpu.mapper import Mapper
from shrimp_tpu.native import get_lib

from .test_e2e_cs import make_cs_dataset

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")]


def _generic_sam(mapper, recs):
    lines = []
    for re_, hits in mapper.map_unpaired(recs):
        for h in hits:
            lines.append(render_unpaired(re_, h, mapper.index,
                                         mapper.config))
    return ("\n".join(lines) + "\n").encode() if lines else b""


def _fast_sam(mapper, recs, batch_size=None):
    gen = map_unpaired_cs_sam_stream(
        mapper, recs, batch_size=batch_size or len(recs) or 1)
    assert gen is not None, "cs fast path unexpectedly unsupported"
    return b"".join(gen)


def _build(tmp_path, **dskw):
    gpath, rpath, g, reads = make_cs_dataset(str(tmp_path), **dskw)
    idx = build_index([("chrC", encode.encode_ls(g))],
                      default_seeds(mode="cs"), mode="cs")
    return idx, reads


def test_cs_fastpath_matches_generic(tmp_path):
    idx, reads = _build(tmp_path, n_reads=200, genome_len=30_000)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    recs = [SeqRecord(n, s) for n, s in reads]
    got = _fast_sam(Mapper(idx, cfg), recs)
    want = _generic_sam(Mapper(idx, cfg), recs)
    assert got == want


def test_cs_fastpath_two_phase_identical(tmp_path, monkeypatch):
    """Two-phase dispatch (vec first, full SW only on pass1 survivors —
    the high-candidate-density shape used at hg scale) must be
    byte-identical to the fused speculative launch."""
    idx, reads = _build(tmp_path, n_reads=200, genome_len=30_000)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    recs = [SeqRecord(n, s) for n, s in reads]
    monkeypatch.setenv("SHRIMP_TPU_CS_TWO_PHASE", "0")
    fused = _fast_sam(Mapper(idx, cfg), recs, batch_size=64)
    monkeypatch.setenv("SHRIMP_TPU_CS_TWO_PHASE", "1")
    m2 = Mapper(idx, cfg)
    assert _fast_sam(m2, recs, batch_size=64) == fused
    # the split kernels really ran (phase-B stage recorded)
    assert "device full (2ph)" in m2.stats.stage_secs


def test_cs_fastpath_multi_batch(tmp_path):
    idx, reads = _build(tmp_path, n_reads=130, genome_len=30_000)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    recs = [SeqRecord(n, s) for n, s in reads]
    want = _generic_sam(Mapper(idx, cfg), recs)
    assert _fast_sam(Mapper(idx, cfg), recs, batch_size=48) == want


def _generic_sam_fastq(mapper, recs):
    lines = []
    for re_, hits in mapper.map_unpaired(recs):
        for h in hits:
            lines.append(render_unpaired(re_, h, mapper.index,
                                         mapper.config, fastq=True))
    return ("\n".join(lines) + "\n").encode() if lines else b""


def test_cs_fastpath_fastq_quals(tmp_path):
    """Quality-carrying CS reads keep the fast path: qv-derived
    crossover scores, post-SW error rates, QUAL column and CQ:Z must
    match the generic renderer byte for byte."""
    import numpy as np
    idx, reads = _build(tmp_path, n_reads=150, genome_len=30_000)
    rng = np.random.default_rng(4)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    recs = [SeqRecord(n, s,
                      "".join(chr(33 + int(rng.integers(3, 41)))
                              for _ in range(len(s) - 1)))
            for n, s in reads]
    want = _generic_sam_fastq(Mapper(idx, cfg), recs)
    gen = map_unpaired_cs_sam_stream(Mapper(idx, cfg), recs,
                                     batch_size=64)
    assert gen is not None
    assert b"".join(gen) == want


def test_cs_fastpath_fastq_ignore_qvs(tmp_path):
    import numpy as np
    idx, reads = _build(tmp_path, n_reads=60)
    rng = np.random.default_rng(5)
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE, ignore_qvs=True)
    recs = [SeqRecord(n, s,
                      "".join(chr(33 + int(rng.integers(3, 41)))
                              for _ in range(len(s) - 1)))
            for n, s in reads]
    want = _generic_sam_fastq(Mapper(idx, cfg), recs)
    gen = map_unpaired_cs_sam_stream(Mapper(idx, cfg), recs,
                                     batch_size=32)
    assert gen is not None
    assert b"".join(gen) == want


def test_cs_fastpath_gate():
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE)
    assert fastpath_cs_supported(cfg)
    assert not fastpath_cs_supported(MapperConfig())
    assert not fastpath_cs_supported(
        MapperConfig(mode=C.MODE_COLOUR_SPACE, shrimp_format=True))
    assert not fastpath_cs_supported(
        MapperConfig(mode=C.MODE_COLOUR_SPACE,
                     compute_mapping_qualities=False))


def _make_cs_pairs(seed, n_pairs, glen=30_000, with_quals=False):
    import random
    rng = random.Random(seed)
    g = "".join(rng.choice("ACGT") for _ in range(glen))
    l2n = {c: i for i, c in enumerate("ACGT")}
    comp = str.maketrans("ACGT", "TGCA")

    def tocs(s):
        return "T" + str(l2n["T"] ^ l2n[s[0]]) + "".join(
            str(l2n[s[i]] ^ l2n[s[i + 1]]) for i in range(len(s) - 1))

    recs = []
    for i in range(n_pairs):
        isz = rng.randrange(100, 300)
        p = rng.randrange(0, glen - isz - 40)
        a = list(g[p:p + 36])
        b = list(g[p + isz - 36:p + isz])
        for s in (a, b):
            for _ in range(rng.choice([0, 0, 1, 2])):
                s[rng.randrange(36)] = rng.choice("ACGT")
        r1 = tocs("".join(a))
        r2 = tocs("".join(b).translate(comp)[::-1])
        if rng.random() < 0.15:
            q = rng.randrange(0, glen - 36)
            r2 = tocs(g[q:q + 36])
        q1 = q2 = None
        if with_quals:
            q1 = "".join(chr(33 + rng.randrange(3, 41))
                         for _ in range(len(r1) - 1))
            q2 = "".join(chr(33 + rng.randrange(3, 41))
                         for _ in range(len(r2) - 1))
        recs.append(SeqRecord(f"cp{i}/1", r1, q1))
        recs.append(SeqRecord(f"cp{i}/2", r2, q2))
    return g, recs


def _generic_paired_sam(m, recs, fastq=False):
    from shrimp_tpu.io import sam
    lines = []
    for pe in m.map_paired(recs):
        p_out, u_out = m.select_output(pe)
        lines.extend(sam.render_pair_entry(pe, m.index, m.config,
                                           p_out, u_out, fastq=fastq))
    return ("\n".join(lines) + "\n").encode() if lines else b""


@pytest.mark.parametrize("mode,seed", [("opp-in", 21), ("opp-out", 22),
                                       ("col-fw", 23), ("col-bw", 24)])
def test_cs_paired_fastpath_matches_generic(mode, seed):
    from shrimp_tpu.fastpath_cs import map_paired_cs_sam_stream
    from shrimp_tpu.paired import PairedMapper
    g, recs = _make_cs_pairs(seed, 60)
    idx = build_index([("chrP", encode.encode_ls(g))],
                      default_seeds(mode="cs"), mode="cs")
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE, pair_mode=mode)
    want = _generic_paired_sam(PairedMapper(idx, cfg), recs)
    m2 = PairedMapper(idx, cfg)
    gen = map_paired_cs_sam_stream(m2, recs, batch_size=64, lanes=1)
    assert gen is not None, "cs paired fast path unexpectedly unsupported"
    assert b"".join(gen) == want


def test_cs_paired_fastpath_fastq(tmp_path):
    from shrimp_tpu.fastpath_cs import map_paired_cs_sam_stream
    from shrimp_tpu.paired import PairedMapper
    g, recs = _make_cs_pairs(31, 50, with_quals=True)
    idx = build_index([("chrP", encode.encode_ls(g))],
                      default_seeds(mode="cs"), mode="cs")
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE, pair_mode="opp-in")
    want = _generic_paired_sam(PairedMapper(idx, cfg), recs, fastq=True)
    m2 = PairedMapper(idx, cfg)
    gen = map_paired_cs_sam_stream(m2, recs, batch_size=32, lanes=1)
    assert gen is not None
    assert b"".join(gen) == want


def test_cs_paired_two_phase_select_full_identical(monkeypatch):
    """CS paired select-then-full (vector pass picks the feet via the
    native select pass, only those run the 4-layer full CS SW) must be
    byte-identical to the fused speculative launch."""
    from shrimp_tpu.fastpath_cs import map_paired_cs_sam_stream
    from shrimp_tpu.paired import PairedMapper
    g, recs = _make_cs_pairs(99, 70)
    idx = build_index([("chrP", encode.encode_ls(g))],
                      default_seeds(mode="cs"), mode="cs")
    cfg = MapperConfig(mode=C.MODE_COLOUR_SPACE, pair_mode="opp-in")
    monkeypatch.setenv("SHRIMP_TPU_CS_TWO_PHASE", "0")
    want = b"".join(map_paired_cs_sam_stream(
        PairedMapper(idx, cfg), recs, batch_size=64, lanes=1))
    assert want.count(b"\n") >= 70
    monkeypatch.setenv("SHRIMP_TPU_CS_TWO_PHASE", "1")
    got = b"".join(map_paired_cs_sam_stream(
        PairedMapper(idx, cfg), recs, batch_size=64, lanes=1))
    assert got == want
