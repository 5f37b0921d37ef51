"""Pallas full-SW kernel equivalence (interpret mode, runs on CPU).

Backpointers may legitimately differ from sw_jax.sw_full_batch on cells
valued below -2^26 (the XLA associative-scan leaks decayed W values
across band gaps where the reference re-initializes; see
sw_full_pallas.py docstring) — such cells can never lie on a
positive-score traceback path, so equivalence is asserted on scores
everywhere plus the full traceback outputs of every surviving hit.
"""
import numpy as np
import pytest

from shrimp_tpu.core import sw_jax
from shrimp_tpu.core.sw_full_pallas import sw_full_batch_pallas

KW = dict(match=10, mismatch=-15, a_gap_open=-33, a_gap_ext=-7,
          b_gap_open=-33, b_gap_ext=-3)


def _mk(seed, B=1024, G=32, R=16):
    rng = np.random.default_rng(seed)
    return dict(
        genome=rng.integers(0, 5, (B, G)).astype(np.uint8),
        glen=rng.integers(8, G + 1, B).astype(np.int32),
        read=rng.integers(0, 5, (B, R)).astype(np.uint8),
        rlen=rng.integers(6, R + 1, B).astype(np.int32),
        ax=rng.integers(-4, G // 2, B).astype(np.int32),
        ay=rng.integers(-4, R, B).astype(np.int32),
        alen=rng.integers(1, 12, B).astype(np.int32),
        awid=rng.integers(3, 20, B).astype(np.int32),
        revcmpl=rng.integers(0, 2, B) > 0,
    )


@pytest.mark.parametrize("local", [False, True])
@pytest.mark.parametrize("seed", [1, 2])
def test_full_pallas_matches_xla_traceback(local, seed):
    a = _mk(seed)
    ref_pk, ref_ops = sw_jax.sw_full_and_traceback(
        a["genome"], a["glen"], a["read"], a["rlen"], a["ax"], a["ay"],
        a["alen"], a["awid"], a["revcmpl"], local_alignment=local,
        use_pallas=False, **KW)
    score, mi, mj, plane, bp = sw_full_batch_pallas(
        a["genome"], a["glen"], a["read"], a["rlen"], a["ax"], a["ay"],
        a["alen"], a["awid"], a["revcmpl"].astype(np.int32),
        local_alignment=local, interpret=True, **KW)
    got_pk, got_ops = sw_jax._traceback_pack(
        np.asarray(a["genome"]), np.asarray(a["read"]),
        score, mi, mj, plane, bp)
    ref_pk, ref_ops = np.asarray(ref_pk), np.asarray(ref_ops)
    got_pk, got_ops = np.asarray(got_pk), np.asarray(got_ops)
    assert np.array_equal(ref_pk[:, 0], got_pk[:, 0]), "scores differ"
    pos = ref_pk[:, 0] > 0
    assert pos.sum() > 10
    assert np.array_equal(ref_pk[pos], got_pk[pos])
    assert np.array_equal(ref_ops[pos], got_ops[pos])
