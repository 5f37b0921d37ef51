"""Native filter-1 must be element-equal to the numpy reference path."""
import numpy as np
import pytest

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import batch_pipeline as bp
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds, mirna_seeds
from shrimp_tpu.native.filter1_py import (generate_candidates_native,
                                          native_available)

FIELDS = ("owner", "cn", "g_off", "w_len", "score_window_gen", "matches",
          "score_max", "ax", "ay", "alen", "awid", "seg_start")


def _dataset(rng, hashed=False, n_reads=200):
    g = rng.integers(0, 4, 300_000).astype(np.uint8)
    g[40_000:40_500] = g[10_000:10_500]        # repeat
    g[150_000:150_200] = g[10_000:10_200]
    seeds = mirna_seeds() if hashed else default_seeds()
    idx = build_index([("a", g[:200_000]), ("b", g[200_000:])], seeds,
                      hashed=hashed)
    rl = 22 if hashed else 36
    comp = np.array([3, 2, 1, 0], np.uint8)
    codes = np.zeros((n_reads, 2, rl), np.uint8)
    for k in range(n_reads):
        p = int(rng.integers(0, len(g) - rl))
        r = g[p:p + rl].copy()
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(rl))] = rng.integers(4)
        if k % 2:
            r = comp[r[::-1]]
        codes[k, 0] = r
        codes[k, 1] = comp[r[::-1]]
    return idx, codes, rl


@pytest.mark.skipif(not native_available(), reason="native build failed")
@pytest.mark.parametrize("hashed", [False, True])
def test_native_matches_numpy(hashed):
    rng = np.random.default_rng(91 + hashed)
    idx, codes, rl = _dataset(rng, hashed=hashed)
    args = (idx, codes, rl, int(1.4 * rl), idx.auto_list_cutoff(),
            1 if hashed else 2, 55.0, 10, -33, -3)
    kw = dict(use_region_counts=not hashed, gapless=hashed)
    want = bp.generate_candidates(*args, **kw)
    got = generate_candidates_native(*args, **kw)
    assert got is not None
    assert got.n == want.n, f"hit count {got.n} vs {want.n}"
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f), np.int64),
            np.asarray(getattr(want, f), np.int64), err_msg=f)


@pytest.mark.skipif(not native_available(), reason="native build failed")
@pytest.mark.parametrize("mp_mode,match_mode", [(1, 2), (2, 3), (3, 3)])
def test_native_mp_matches_numpy(mp_mode, match_mode):
    """Native mate-pair region filter (interleaved pair groups) vs the
    numpy pipeline with explicit mate-mark arrays."""
    rng = np.random.default_rng(400 + mp_mode)
    idx, codes, rl = _dataset(rng, n_reads=120)   # 60 interleaved pairs
    n_reg = (idx.total_len >> 11) + 2
    drmin = np.empty(240, np.int64)
    drmax = np.empty(240, np.int64)
    drmin[0::2], drmax[0::2] = 0, 3      # strand 0
    drmin[1::2], drmax[1::2] = -3, 0     # strand 1
    args = (idx, codes, rl, int(1.4 * rl), idx.auto_list_cutoff(),
            match_mode, 55.0, 10, -33, -3)
    # numpy path: mate marks rebased per owner (Mapper._mp_context)
    ids1, ids2 = bp.region_mark_keys(idx, codes, rl,
                                     idx.auto_list_cutoff())
    m1_chunks, m2_chunks = [], []
    for k in range(codes.shape[0]):
        for st in (0, 1):
            o = 2 * k + st
            om = 2 * (k ^ 1) + (1 - st)
            for ids, chunks in ((ids1, m1_chunks), (ids2, m2_chunks)):
                s = slice(np.searchsorted(ids, om * n_reg),
                          np.searchsorted(ids, (om + 1) * n_reg))
                chunks.append(o * n_reg + (ids[s] - om * n_reg))
    want = bp.generate_candidates(
        *args, mp_mode=mp_mode, mp_mate_m1=np.concatenate(m1_chunks),
        mp_mate_m2=np.concatenate(m2_chunks), mp_drmin=drmin,
        mp_drmax=drmax)
    got = generate_candidates_native(
        *args, mp_mode=mp_mode, mp_drmin=drmin, mp_drmax=drmax)
    assert got is not None
    assert got.n == want.n, f"hit count {got.n} vs {want.n}"
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f), np.int64),
            np.asarray(getattr(want, f), np.int64), err_msg=f)
