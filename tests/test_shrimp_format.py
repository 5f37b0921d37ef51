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
