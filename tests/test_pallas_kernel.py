"""Pallas vector-SW kernel equivalence vs the XLA reference formulation.

The interpret-mode tests run on every backend (including the CPU mesh
used by CI), so the hottest Mosaic kernel cannot regress silently
off-TPU; the @tpu_only cases additionally exercise the real Mosaic
compile on TPU hardware.
"""
import numpy as np
import pytest


def _tpu_available():
    import jax
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


tpu_only = pytest.mark.skipif(not _tpu_available(),
                              reason="needs a TPU backend for Mosaic")


KW = dict(match=10, mismatch=-15, a_gap_open=-33, a_gap_ext=-7,
          b_gap_open=-33, b_gap_ext=-3)


def test_pallas_interpret_matches_xla_ls():
    """The hottest kernel, runnable everywhere: Pallas interpreter mode
    vs the XLA formulation (bit-equal scores)."""
    from shrimp_tpu.core.sw_jax import sw_vector_batch
    from shrimp_tpu.core.sw_pallas import sw_vector_batch_pallas
    rng = np.random.default_rng(15)
    B, G, R = 1024, 48, 24
    gwin = rng.integers(0, 5, (B, G)).astype(np.uint8)
    glen = rng.integers(8, G + 1, B).astype(np.int32)
    rwin = rng.integers(0, 5, (B, R)).astype(np.uint8)
    rlen = rng.integers(6, R + 1, B).astype(np.int32)
    ref = np.asarray(sw_vector_batch(gwin, glen, rwin, rlen, **KW))
    got = np.asarray(sw_vector_batch_pallas(gwin, glen, rwin, rlen,
                                            interpret=True, **KW))
    assert np.array_equal(ref, got)


def test_pallas_interpret_matches_xla_cs():
    from shrimp_tpu.core.sw_jax import sw_vector_batch
    from shrimp_tpu.core.sw_pallas import sw_vector_batch_pallas
    rng = np.random.default_rng(16)
    B, G, R = 1024, 32, 16
    gwin = rng.integers(0, 5, (B, G)).astype(np.uint8)
    glen = rng.integers(8, G + 1, B).astype(np.int32)
    rwin = rng.integers(0, 5, (B, R)).astype(np.uint8)
    rlen = rng.integers(6, R + 1, B).astype(np.int32)
    g0 = rng.integers(0, 5, (B, G)).astype(np.uint8)
    ref = np.asarray(sw_vector_batch(gwin, glen, rwin, rlen, g0,
                                     cs_mode=True, **KW))
    got = np.asarray(sw_vector_batch_pallas(gwin, glen, rwin, rlen, g0,
                                            cs_mode=True, interpret=True,
                                            **KW))
    assert np.array_equal(ref, got)


@tpu_only
def test_pallas_matches_xla_ls():
    from shrimp_tpu.core.sw_jax import sw_vector_batch
    from shrimp_tpu.core.sw_pallas import sw_vector_batch_pallas
    rng = np.random.default_rng(5)
    B, G, R = 1024, 32, 16
    gwin = rng.integers(0, 5, (B, G)).astype(np.uint8)
    glen = rng.integers(8, G + 1, B).astype(np.int32)
    rwin = rng.integers(0, 5, (B, R)).astype(np.uint8)
    rlen = rng.integers(6, R + 1, B).astype(np.int32)
    ref = np.asarray(sw_vector_batch(gwin, glen, rwin, rlen, **KW))
    got = np.asarray(sw_vector_batch_pallas(gwin, glen, rwin, rlen, **KW))
    assert np.array_equal(ref, got)


@tpu_only
def test_pallas_matches_xla_cs():
    from shrimp_tpu.core.sw_jax import sw_vector_batch
    from shrimp_tpu.core.sw_pallas import sw_vector_batch_pallas
    rng = np.random.default_rng(6)
    B, G, R = 1024, 32, 16
    gwin = rng.integers(0, 5, (B, G)).astype(np.uint8)
    glen = rng.integers(8, G + 1, B).astype(np.int32)
    rwin = rng.integers(0, 5, (B, R)).astype(np.uint8)
    rlen = rng.integers(6, R + 1, B).astype(np.int32)
    g0 = rng.integers(0, 5, (B, G)).astype(np.uint8)
    ref = np.asarray(sw_vector_batch(gwin, glen, rwin, rlen, g0,
                                     cs_mode=True, **KW))
    got = np.asarray(sw_vector_batch_pallas(gwin, glen, rwin, rlen, g0,
                                            cs_mode=True, **KW))
    assert np.array_equal(ref, got)


@tpu_only
def test_full_pallas_mosaic_matches():
    """Full-SW Pallas kernel compiled by Mosaic (not interpret mode)."""
    import numpy as np

    from shrimp_tpu.core import sw_jax
    from shrimp_tpu.core.sw_full_pallas import sw_full_batch_pallas
    from tests.test_full_pallas import KW, _mk
    a = _mk(3)
    for local in (False, True):
        ref_pk, ref_ops = sw_jax.sw_full_and_traceback(
            a["genome"], a["glen"], a["read"], a["rlen"], a["ax"],
            a["ay"], a["alen"], a["awid"], a["revcmpl"],
            local_alignment=local, use_pallas=False, **KW)
        score, mi, mj, plane, bp = sw_full_batch_pallas(
            a["genome"], a["glen"], a["read"], a["rlen"], a["ax"],
            a["ay"], a["alen"], a["awid"], a["revcmpl"].astype(np.int32),
            local_alignment=local, **KW)
        got_pk, got_ops = sw_jax._traceback_pack(
            np.asarray(a["genome"]), np.asarray(a["read"]),
            score, mi, mj, plane, bp)
        ref_pk, got_pk = np.asarray(ref_pk), np.asarray(got_pk)
        assert np.array_equal(ref_pk[:, 0], got_pk[:, 0])
        pos = ref_pk[:, 0] > 0
        assert np.array_equal(ref_pk[pos], got_pk[pos])
        assert np.array_equal(np.asarray(ref_ops)[pos],
                              np.asarray(got_ops)[pos])


@tpu_only
def test_index_gather_path_matches():
    from shrimp_tpu.core.sw_jax import sw_vector_batch
    from shrimp_tpu.core.sw_pallas import sw_vector_ls_from_index
    import jax
    rng = np.random.default_rng(7)
    L, B, G, R = 100_000, 1024, 32, 16
    codes = rng.integers(0, 4, L).astype(np.uint8)
    gstart = rng.integers(0, L - 1, B).astype(np.int64)
    glen = rng.integers(8, G + 1, B).astype(np.int32)
    rtab = rng.integers(0, 4, (64, R)).astype(np.uint8)
    owner = rng.integers(0, 64, B).astype(np.int64)
    rlen = np.full(B, R, np.int32)
    got = np.asarray(sw_vector_ls_from_index(
        jax.device_put(codes), gstart, glen, jax.device_put(rtab), owner,
        rlen, G=G, use_pallas=True, **KW))
    pos = np.clip(gstart[:, None] + np.arange(G)[None, :], 0, L - 1)
    ref = np.asarray(sw_vector_batch(codes[pos], glen, rtab[owner], rlen,
                                     **KW))
    assert np.array_equal(ref, got)
