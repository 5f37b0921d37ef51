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

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


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
