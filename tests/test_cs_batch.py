"""Batched CS kernel must match the scalar oracle element-for-element."""
import numpy as np

from shrimp_tpu import constants as C
from shrimp_tpu.core import sw_cs_np
from shrimp_tpu.core.sw_cs_batch import sw_full_cs_batch

SC = dict(match=10, mismatch=-24, a_gap_open=-33, a_gap_ext=-7,
          b_gap_open=-33, b_gap_ext=-3)


def _make_case(rng, G, R):
    gl = rng.integers(0, 4, G).astype(np.uint8)
    p = int(rng.integers(0, G - R - 3))
    letters = gl[p:p + R + 1].copy()
    for _ in range(int(rng.integers(0, 3))):
        letters[int(rng.integers(1, R))] = rng.integers(4)
    initbp = int(letters[0])
    cols = np.zeros(R, np.uint8)
    prev = initbp
    for i in range(R):
        cols[i] = C.COLOUR_MAT[prev, letters[i + 1]]
        prev = letters[i + 1]
    for _ in range(int(rng.integers(0, 3))):
        cols[int(rng.integers(R))] = rng.integers(4)
    if rng.random() < 0.3:
        cols[int(rng.integers(R))] = 15
    if rng.random() < 0.4:   # indel
        q = int(rng.integers(5, G - R - 2))
        gl = np.concatenate([gl[:q], gl[q + 2:], rng.integers(0, 4, 2)
                             .astype(np.uint8)])
    return gl, cols, initbp, (p, 0, R, 1)


def _run_both(gw, glen, cw, rlen, initbp, rect, rev, xover_rows, thresh,
              use_jax, **sc):
    if use_jax:
        from shrimp_tpu.core.sw_cs_jax import sw_full_cs_batch_jax
        return sw_full_cs_batch_jax(
            gw, glen, cw, rlen, initbp, rect[:, 0], rect[:, 1],
            rect[:, 2], rect[:, 3], rev, xover_rows, thresh, **sc)
    return sw_full_cs_batch(
        gw, glen, cw, rlen, initbp, rect[:, 0], rect[:, 1], rect[:, 2],
        rect[:, 3], rev, xover_rows, thresh, **sc)


import pytest


@pytest.mark.parametrize("use_jax", [False, True])
def test_cs_batch_matches_oracle(use_jax):
    rng = np.random.default_rng(17)
    NB = 40
    G, R = 64, 35
    gw = np.zeros((NB, G), np.uint8)
    cw = np.zeros((NB, R), np.uint8)
    glen = np.zeros(NB, np.int32)
    rlen = np.full(NB, R, np.int32)
    initbp = np.zeros(NB, np.int64)
    rect = np.zeros((NB, 4), np.int64)
    rev = np.zeros(NB, bool)
    oracles = []
    aw = 8
    for b in range(NB):
        Gb = int(rng.integers(45, G + 1))
        gl, cols, ib, anchor = _make_case(rng, Gb, R)
        gw[b, :len(gl)] = gl
        glen[b] = len(gl)
        cw[b] = cols
        initbp[b] = ib
        rev[b] = b % 3 == 0
        # widened rectangle (the batch kernel takes it pre-widened)
        rect[b] = (anchor[0] - aw // 2, anchor[1] + aw // 2, anchor[2],
                   anchor[3] + aw)
        res = sw_cs_np.sw_full_cs(
            gl, cols, ib, SC["match"], SC["mismatch"], SC["a_gap_open"],
            SC["a_gap_ext"], SC["b_gap_open"], SC["b_gap_ext"],
            threshscore=0, global_xover=-20, revcmpl=bool(rev[b]),
            anchor=anchor, anchor_width=aw, local_alignment=False)
        oracles.append(res)

    xover_rows = np.full((NB, R + 1), -20, np.int64)
    got = _run_both(gw, glen, cw, rlen, initbp, rect, rev, xover_rows,
                    np.zeros(NB, np.int64), use_jax, **SC)

    for b, res in enumerate(oracles):
        assert got.score[b] == res.score, (b, got.score[b], res.score)
        if res.score == 0:
            continue
        assert got.read_start[b] == res.read_start, b
        assert got.genome_start[b] == res.genome_start, b
        assert got.rmapped[b] == res.rmapped, b
        assert got.gmapped[b] == res.gmapped, b
        assert got.matches[b] == res.matches, b
        assert got.mismatches[b] == res.mismatches, b
        assert got.insertions[b] == res.insertions, b
        assert got.deletions[b] == res.deletions, b
        assert got.crossovers[b] == res.crossovers, b
        np.testing.assert_array_equal(
            got.steps[b, :got.n_steps[b]], res.steps,
            err_msg=f"case {b}")
