"""The flat-array paired fast path (fastpath.FastPaired +
native/pairedpipe.cpp) must produce byte-identical SAM to the generic
PairedMapper pipeline (and hence to gmapper -p, covered transitively by
test_paired's oracle runs)."""
import random

import pytest

from shrimp_tpu import constants as C
from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.fastpath import map_paired_sam_stream
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io import sam
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.native import get_lib
from shrimp_tpu.paired import PairedMapper

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")]

_COMP = str.maketrans("ACGT", "TGCA")


def _rc(s):
    return s.translate(_COMP)[::-1]


def make_pairs(seed: int, n_pairs: int, mode: str, glen: int = 30000):
    rng = random.Random(seed)
    g = "".join(rng.choice("ACGT") for _ in range(glen))
    recs = []
    for i in range(n_pairs):
        L = 36
        isz = rng.randrange(120, 280)
        p = rng.randrange(0, glen - isz - L)
        a = list(g[p:p + L])
        b = list(g[p + isz:p + isz + L])
        for s in (a, b):
            for _ in range(rng.randrange(0, 4)):
                s[rng.randrange(L)] = rng.choice("ACGT")
            if rng.random() < 0.06:
                q = rng.randrange(2, L - 2)
                del s[q]
                s.append(rng.choice("ACGT"))
        a, b = "".join(a), "".join(b)
        if mode == "opp-in":
            r1, r2 = a, _rc(b)
        elif mode == "opp-out":
            r1, r2 = _rc(a), b
        else:
            r1, r2 = a, b
        if rng.random() < 0.2:   # scattered mate -> half-paired cases
            q = rng.randrange(0, glen - L)
            r2 = g[q:q + L]
            if rng.random() < .5:
                r2 = _rc(r2)
        recs.append(SeqRecord(f"p{i}/1", r1))
        recs.append(SeqRecord(f"p{i}/2", r2))
    return g, recs


def _generic_sam(m, recs):
    lines = []
    for pe in m.map_paired(recs):
        p_out, u_out = m.select_output(pe)
        lines.extend(sam.render_pair_entry(pe, m.index, m.config,
                                           p_out, u_out))
    return ("\n".join(lines) + "\n").encode() if lines else b""


@pytest.mark.parametrize("mode,seed", [("opp-in", 1), ("opp-out", 2),
                                       ("col-fw", 3), ("col-bw", 4)])
def test_paired_fastpath_matches_generic(mode, seed):
    g, recs = make_pairs(seed, 60, mode)
    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode=mode)
    generic = _generic_sam(PairedMapper(idx, cfg), recs)
    m2 = PairedMapper(idx, cfg)
    gen = map_paired_sam_stream(m2, recs, batch_size=64, lanes=1)
    assert gen is not None, "paired fast path unexpectedly unsupported"
    fast = b"".join(gen)
    assert fast == generic


def test_paired_fastpath_multilane_order():
    g, recs = make_pairs(9, 80, "opp-in")
    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in")
    generic = _generic_sam(PairedMapper(idx, cfg), recs)
    m2 = PairedMapper(idx, cfg)
    fast = b"".join(map_paired_sam_stream(m2, recs, batch_size=32,
                                          lanes=4))
    assert fast == generic


@pytest.mark.parametrize("kw,seed", [
    (dict(half_paired=False), 5),              # mp_rc=1, hit mode 2
    (dict(match_mode=3), 6),                   # mp_rc=2, hit mode 3
    (dict(match_mode=3, half_paired=False), 7),  # mp_rc=3
])
def test_paired_fastpath_mp_region_configs(kw, seed):
    # The mate-pair region filter configs (paired_options mp_rc=1/2/3)
    # run through the native filter1 mp path; output must match the
    # generic pipeline exactly
    g, recs = make_pairs(seed, 60, "opp-in")
    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in", **kw)
    generic = _generic_sam(PairedMapper(idx, cfg), recs)
    m2 = PairedMapper(idx, cfg)
    gen = map_paired_sam_stream(m2, recs, batch_size=64, lanes=1)
    assert gen is not None, "mp fast path unexpectedly unsupported"
    assert b"".join(gen) == generic


def test_paired_fastpath_fastq_quals():
    """fastq pairs keep the fast path; QUAL columns match the generic
    renderer (incl. unmapped-mate records)."""
    import numpy as np
    g, recs = make_pairs(12, 60, "opp-in")
    rng = np.random.default_rng(3)
    recs = [SeqRecord(r.name, r.seq,
                      "".join(chr(64 + int(rng.integers(12, 41)))
                              for _ in range(len(r.seq))))
            for r in recs]
    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in")

    def gen_sam(m):
        lines = []
        for pe in m.map_paired(recs):
            p_out, u_out = m.select_output(pe)
            lines.extend(sam.render_pair_entry(pe, m.index, m.config,
                                               p_out, u_out, fastq=True))
        return ("\n".join(lines) + "\n").encode() if lines else b""

    want = gen_sam(PairedMapper(idx, cfg))
    m2 = PairedMapper(idx, cfg)
    gen = map_paired_sam_stream(m2, recs, batch_size=64, lanes=1)
    assert gen is not None
    assert b"".join(gen) == want


def test_paired_two_phase_select_full_identical(monkeypatch):
    """Select-then-full paired dispatch (the reference's lazy full-SW:
    vector pass picks the feet, only those run full SW —
    mapping.c:1261-1366 only_paired + the hp option set) must be
    byte-identical to the fused speculative launch, including the
    half-paired fallback for discordant pairs."""
    g, recs = make_pairs(77, 80, "opp-in")
    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in")
    monkeypatch.setenv("SHRIMP_TPU_LS_TWO_PHASE", "0")
    want = b"".join(map_paired_sam_stream(PairedMapper(idx, cfg), recs,
                                          batch_size=64, lanes=1))
    assert want.count(b"\n") >= 80
    monkeypatch.setenv("SHRIMP_TPU_LS_TWO_PHASE", "1")
    got = b"".join(map_paired_sam_stream(PairedMapper(idx, cfg), recs,
                                         batch_size=64, lanes=1))
    assert got == want


def test_paired_two_phase_dense_genome_identical(monkeypatch):
    """Repeat-dense genome (SINE-library copies at 5-25% divergence →
    hundreds of candidate windows/read): the density-gated
    select-then-full dispatch auto-activates, the hp-superset rescue
    machinery exercises for real, and the output must stay
    byte-identical to the fused launch."""
    import numpy as np
    from shrimp_tpu.core.encode import decode_ls
    rng = np.random.default_rng(777)
    slen = 8_000_000
    lib = np.random.default_rng(3)
    sine = lib.integers(0, 4, 300).astype(np.uint8)
    codes = rng.integers(0, 4, slen, dtype=np.int64).astype(np.uint8)
    n_sine = int(0.25 * slen) // 300
    starts = rng.integers(0, slen - 300, n_sine)
    cp = np.tile(sine, (n_sine, 1))
    div = rng.uniform(0.05, 0.25, n_sine)
    msk = rng.random((n_sine, 300)) < div[:, None]
    cp[msk] = rng.integers(0, 4, int(msk.sum()),
                           dtype=np.int64).astype(np.uint8)
    pos = starts[:, None] + np.arange(300)[None, :]
    codes[pos.ravel()] = cp.ravel()
    idx = build_index([("dense", codes)], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in")
    COMP = np.array([3, 2, 1, 0], np.uint8)
    recs = []
    for k in range(400):
        isz = int(rng.integers(120, 280))
        p = int(rng.integers(0, slen - isz - 36))
        a = codes[p:p + 36].copy()
        b = COMP[codes[p + isz - 36:p + isz][::-1]].copy()
        for r in (a, b):
            for _ in range(int(rng.integers(0, 3))):
                r[int(rng.integers(36))] = rng.integers(4)
        recs += [SeqRecord(f"d{k}/1", decode_ls(a)),
                 SeqRecord(f"d{k}/2", decode_ls(b))]
    monkeypatch.setenv("SHRIMP_TPU_LS_TWO_PHASE", "0")
    want = b"".join(map_paired_sam_stream(PairedMapper(idx, cfg), recs,
                                          batch_size=400, lanes=1))
    monkeypatch.setenv("SHRIMP_TPU_LS_TWO_PHASE", "auto")
    m2 = PairedMapper(idx, cfg)
    got = b"".join(map_paired_sam_stream(m2, recs, batch_size=400,
                                         lanes=1))
    assert got == want
    # density really was in the two-phase regime
    assert m2.stats.vec_invocs / max(m2.stats.reads, 1) >= 8
