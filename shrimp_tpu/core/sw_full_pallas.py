"""Pallas TPU kernel for the full (filter 3) banded Smith-Waterman DP.

Same lane-per-pair layout as sw_pallas: each VPU lane owns one
(genome window, read) pair, a tile is 8x128 = 1024 pairs, and one DP
row update is a [G, 8, 128] vector op. The kernel produces the packed
3-plane backpointer tensor (nibbles as in sw_jax.sw_full_batch,
bit-equal to common/sw-full-ls.c:154-403 including the `revcmpl`
tie-break flip) plus the running max bookkeeping; the traceback stays
the XLA scan of sw_jax (it is short and gather-bound, not DP-bound).

Layout notes (why this shape):
- grid = (nb, R): row i of tile t is one grid step, so the [G, 8, 128]
  backpointer row streams straight to HBM as its own output block and
  VMEM never holds the full [R, G] backpointer plane.
- The three DP planes persist across row steps in VMEM scratch
  (TPU grids iterate sequentially; the minor grid dim is the row).
- The intra-row W-gap chain W(j) = max(NW(j-1)-open, W(j-1)-ext) is a
  cummax of (a_k + k*ext) resolved by log2(G) shift-and-max doubling
  steps (same trick as the vector kernel); the band's left boundary
  injects the out-of-band resting value init_w as an extra candidate
  at j == x_min.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 30)
FILL = -(2 ** 28)      # cummax shift fill; stays clear of int32 overflow

TILE = 1024
_SUB, _LANE = 8, 128

# plane nibble codes (sw_jax / traceback.py)
NW_FROM_NW, NW_FROM_N, NW_FROM_W = 1, 2, 3
N_FROM_N, N_FROM_NW = 1, 2
W_FROM_W, W_FROM_NW = 1, 2


def pallas_full_ok(B: int, R: int, G: int) -> bool:
    """Shape/backend gate for the Mosaic full-SW path: tile-divisible
    batch, VMEM-sized row blocks, and a bounded HBM backpointer tensor
    (the XLA formulation handles the rest)."""
    import jax
    try:
        if jax.default_backend() in ("cpu",):
            return False
    except Exception:  # pragma: no cover
        return False
    return (B % TILE == 0 and G <= 256
            and B * R * G * 4 <= 256 * 1024 * 1024)


def _kernel(g_ref, r_ref, glen_ref, rlen_ref, ax_ref, ay_ref, alen_ref,
            awid_ref, rv_ref, *refs, G, R, m, mm, goa, gea, gob, geb,
            local, emit_bp):
    if emit_bp:
        bp_ref, stats_ref, nwp, np_, wp, runp, termp, deqp, basep = refs
    else:
        bp_ref = None
        stats_ref, nwp, np_, wp, runp, termp, deqp, basep = refs
    i = pl.program_id(1)
    glen = glen_ref[...].reshape(_SUB, _LANE)
    rlen = rlen_ref[...].reshape(_SUB, _LANE)
    ax = ax_ref[...].reshape(_SUB, _LANE)
    ay = ay_ref[...].reshape(_SUB, _LANE)
    alen = alen_ref[...].reshape(_SUB, _LANE)
    awid = awid_ref[...].reshape(_SUB, _LANE)
    rv = rv_ref[...].reshape(_SUB, _LANE) != 0
    g = g_ref[...].reshape(G, _SUB, _LANE)
    zeros = jnp.minimum(rlen, 0)      # 0, but not a foldable splat

    # row -1 boundary values (sw-full-ls.c:194-196): nw=0, n=b_gap_open,
    # w=a_gap_open for every column incl. the j=-1 pad column.
    @pl.when(i == 0)
    def _init():
        nwp[:] = jnp.zeros((G + 1, _SUB, _LANE), jnp.int32)
        np_[:] = jnp.full((G + 1, _SUB, _LANE), -(gob - geb) - geb,
                          jnp.int32)
        wp[:] = jnp.full((G + 1, _SUB, _LANE), -(goa - gea) - gea,
                         jnp.int32)
        runp[:] = jnp.zeros((G + 1, _SUB, _LANE), jnp.int32)
        termp[:] = jnp.zeros((G + 1, _SUB, _LANE), jnp.int32)
        deqp[:] = jnp.zeros((G + 1, _SUB, _LANE), jnp.int32)
        basep[:] = jnp.zeros((G + 1, _SUB, _LANE), jnp.int32)
        stats_ref[...] = jnp.broadcast_to(
            (zeros + NEG)[None, None], (1, N_STATS, _SUB, _LANE)
        ).astype(jnp.int32)
        stats_ref[0, 1] = zeros
        stats_ref[0, 2] = zeros

    rch = r_ref[...].reshape(_SUB, _LANE)

    jidx = jax.lax.broadcasted_iota(jnp.int32, (G, _SUB, _LANE), 0)

    # band for this row (anchor_get_x_range, anchors.c:66-95)
    x_min = jnp.where(i < ay, 0,
                      jnp.where(i <= ay + alen - 1, ax + (i - ay),
                                ax + alen))
    x_min = jnp.clip(x_min, 0, glen - 1)
    x_max = jnp.where(i < ay - (awid - 1), ax + awid - 2,
                      jnp.where(i <= ay - (awid - 1) + alen - 1,
                                ax + (awid - 1) + (i - (ay - (awid - 1))),
                                glen - 1))
    x_max = jnp.clip(x_max, 0, glen - 1)
    inb = (jidx >= x_min[None]) & (jidx <= x_max[None])

    s = jnp.where(g == rch[None], m, mm)

    c_nw = nwp[pl.ds(0, G)]          # prev row, j-1
    c_n = np_[pl.ds(0, G)]
    c_w = wp[pl.ds(0, G)]
    rvb = rv[None]

    # --- NW plane (tie pref nw > n > w; flipped under revcmpl)
    v = jnp.where(rvb, c_w, c_nw)
    f = jnp.where(rvb, jnp.full_like(v, NW_FROM_W),
                  jnp.full_like(v, NW_FROM_NW))
    f = jnp.where(c_n > v, NW_FROM_N, f)
    v = jnp.maximum(v, c_n)
    last = jnp.where(rvb, c_nw, c_w)
    lastf = jnp.where(rvb, NW_FROM_NW, NW_FROM_W)
    f = jnp.where(last > v, lastf, f)
    v = jnp.maximum(v, last)
    nw_val = v + s
    nw_from = f
    if local:
        clamp = nw_val <= 0
        nw_val = jnp.where(clamp, 0, nw_val)
        nw_from = jnp.where(clamp, 0, nw_from)

    # --- N plane (prev row, same column)
    c_open = nwp[pl.ds(1, G)] - gob - geb
    c_ext = np_[pl.ds(1, G)] - geb
    # (rv ? c_ext >= c_open : c_ext > c_open) as i1 algebra: Mosaic
    # cannot lower a bool-valued where on wide vectors (i8->i1 trunc)
    take_ext = ((rvb & (c_ext >= c_open)) | (~rvb & (c_ext > c_open)))
    n_val = jnp.where(take_ext, c_ext, c_open)
    n_from = jnp.where(take_ext, N_FROM_N, N_FROM_NW)
    if local:
        clamp = n_val <= 0
        n_val = jnp.where(clamp, 0, n_val)
        n_from = jnp.where(clamp, 0, n_from)

    init_nw_v = 0 if local else NEG
    init_n_v = (-(gob - geb) - geb)   # == b_gap_open
    init_w_v = (-(goa - gea) - gea)   # == a_gap_open
    if not local:
        init_n_v = NEG
        init_w_v = NEG

    nw_val = jnp.where(inb, nw_val, init_nw_v)
    nw_from = jnp.where(inb, nw_from, 0)
    n_val = jnp.where(inb, n_val, init_n_v)
    n_from = jnp.where(inb, n_from, 0)

    # --- W plane: cummax chain along j
    nw_shift = jnp.concatenate(
        [jnp.full((1, _SUB, _LANE), init_nw_v, jnp.int32), nw_val[:-1]],
        axis=0)
    a_elem = nw_shift - goa - gea
    if local:
        a_elem = jnp.maximum(a_elem, 0)
    # inject the band-left boundary W(x_min-1) = init_w as a candidate
    a_elem = jnp.where(jidx == x_min[None],
                       jnp.maximum(a_elem, init_w_v - gea), a_elem)
    c = jnp.where(inb, a_elem + jidx * gea, FILL)
    k = 1
    while k < G:
        shifted = jnp.concatenate(
            [jnp.full((k, _SUB, _LANE), FILL, jnp.int32), c[:-k]], axis=0)
        c = jnp.maximum(c, shifted)
        k *= 2
    w_val = jnp.where(inb, c - jidx * gea, init_w_v)
    w_prev = jnp.concatenate(
        [jnp.full((1, _SUB, _LANE), init_w_v, jnp.int32), w_val[:-1]],
        axis=0)
    c_open_w = nw_shift - goa - gea
    c_ext_w = w_prev - gea
    take_ext_w = ((rvb & (c_ext_w >= c_open_w))
                  | (~rvb & (c_ext_w > c_open_w)))
    w_from = jnp.where(take_ext_w, W_FROM_W, W_FROM_NW)
    if local:
        w_from = jnp.where(w_val <= 0, 0, w_from)
    w_from = jnp.where(inb, w_from, 0)

    if emit_bp:
        bp_ref[0, 0] = nw_from | (n_from << 2) | (w_from << 4)

    # --- diagonal-chain bookkeeping (traceback-free closed form):
    # along each NW-plane backpointer chain of consecutive NW_FROM_NW
    # cells, precompute its length (`run`), the from-nibble at its far
    # end (`term`, 0 when the chain is the whole path), and the eq
    # cumsum (`deq`/`base`) so matches-in-chain = deq - base. All are
    # diagonal carries: read prev row at j-1.
    eq = jnp.where(g == rch[None], 1, 0)
    deq = deqp[pl.ds(0, G)] + eq
    chain = nw_from == NW_FROM_NW
    run = jnp.where(chain, runp[pl.ds(0, G)] + 1, 0)
    term = jnp.where(chain, termp[pl.ds(0, G)], nw_from)
    base = jnp.where(chain, basep[pl.ds(0, G)], deq)

    # --- score tracking (sw-full-ls.c:359-368)
    cellmax = jnp.maximum(jnp.maximum(n_val, nw_val), w_val)
    if local:
        rowvalid = (i < rlen)[None] & inb
    else:
        rowvalid = (i == rlen - 1)[None] & inb
    cand = jnp.where(rowvalid, cellmax, NEG)
    rowbest = jnp.max(cand, axis=0)
    jsel = jnp.min(jnp.where(cand == rowbest[None], jidx, G), axis=0)
    selm = jidx == jsel[None]

    def pick(vals):
        return jnp.max(jnp.where(selm, vals, NEG), axis=0)

    best = stats_ref[0, 0]
    upd = rowbest > best
    stats_ref[0, 0] = jnp.where(upd, rowbest, best)
    stats_ref[0, 1] = jnp.where(upd, zeros + i, stats_ref[0, 1])
    stats_ref[0, 2] = jnp.where(upd, jsel, stats_ref[0, 2])
    stats_ref[0, 3] = jnp.where(upd, pick(nw_val), stats_ref[0, 3])
    stats_ref[0, 4] = jnp.where(upd, pick(n_val), stats_ref[0, 4])
    stats_ref[0, 5] = jnp.where(upd, pick(w_val), stats_ref[0, 5])
    stats_ref[0, 6] = jnp.where(upd, pick(run), stats_ref[0, 6])
    stats_ref[0, 7] = jnp.where(upd, pick(term), stats_ref[0, 7])
    stats_ref[0, 8] = jnp.where(upd, pick(deq), stats_ref[0, 8])
    stats_ref[0, 9] = jnp.where(upd, pick(base), stats_ref[0, 9])

    # --- planes for the next row (pad col j=-1 = per-mode init)
    nwp[pl.ds(0, 1)] = jnp.full((1, _SUB, _LANE), init_nw_v, jnp.int32)
    nwp[pl.ds(1, G)] = nw_val
    np_[pl.ds(0, 1)] = jnp.full((1, _SUB, _LANE), init_n_v, jnp.int32)
    np_[pl.ds(1, G)] = n_val
    wp[pl.ds(0, 1)] = jnp.full((1, _SUB, _LANE), init_w_v, jnp.int32)
    wp[pl.ds(1, G)] = w_val
    zrow = jnp.zeros((1, _SUB, _LANE), jnp.int32)
    runp[pl.ds(0, 1)] = zrow
    runp[pl.ds(1, G)] = run
    termp[pl.ds(0, 1)] = zrow
    termp[pl.ds(1, G)] = term
    deqp[pl.ds(0, 1)] = zrow
    deqp[pl.ds(1, G)] = deq
    basep[pl.ds(0, 1)] = zrow
    basep[pl.ds(1, G)] = base


N_STATS = 10


def _run_kernel(genome, glen, read, rlen, ax, ay, alen, awid, revcmpl,
                match, mismatch, a_gap_open, a_gap_ext, b_gap_open,
                b_gap_ext, local_alignment, interpret, emit_bp):
    B, G = genome.shape
    R = read.shape[1]
    assert B % TILE == 0, B
    nb = B // TILE

    def tiles(x, inner):
        return x.astype(jnp.int32).reshape(
            nb, _SUB, _LANE, inner).transpose(0, 3, 1, 2)

    gT = tiles(genome, G)
    rT = tiles(read, R)

    def flat(x):
        return x.astype(jnp.int32).reshape(nb, 1, _SUB, _LANE)

    kern = functools.partial(
        _kernel, G=G, R=R, m=int(match), mm=int(mismatch),
        goa=int(-(a_gap_open)), gea=int(-(a_gap_ext)),
        gob=int(-(b_gap_open)), geb=int(-(b_gap_ext)),
        local=bool(local_alignment), emit_bp=emit_bp)

    def cspec(shape):
        # constant over the row dimension
        return pl.BlockSpec((1,) + shape,
                            lambda t, i: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    row_spec = pl.BlockSpec((1, 1, _SUB, _LANE), lambda t, i: (t, i, 0, 0),
                            memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, 1, G, _SUB, _LANE),
                           lambda t, i: (t, i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [cspec((N_STATS, _SUB, _LANE))]
    out_shape = [jax.ShapeDtypeStruct((nb, N_STATS, _SUB, _LANE),
                                      jnp.int32)]
    if emit_bp:
        out_specs.insert(0, bp_spec)
        out_shape.insert(
            0, jax.ShapeDtypeStruct((nb, R, G, _SUB, _LANE), jnp.int32))

    outs = pl.pallas_call(
        kern,
        grid=(nb, R),
        in_specs=[cspec((G, _SUB, _LANE)), row_spec,
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE)),
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE)),
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE)),
                  cspec((1, _SUB, _LANE))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((G + 1, _SUB, _LANE), jnp.int32)] * 7,
        interpret=interpret,
    )(gT, rT, flat(glen), flat(rlen), flat(ax), flat(ay), flat(alen),
      flat(awid), flat(revcmpl))
    if emit_bp:
        bp, stats = outs
        bp = bp.transpose(0, 3, 4, 1, 2).reshape(B, R, G)
    else:
        (stats,) = outs
        bp = None
    st = stats.transpose(0, 2, 3, 1).reshape(B, N_STATS)
    return st, bp


def _plane_from_stats(st):
    best, bi, bj, nw_c, n_c, w_c = (st[:, k] for k in range(6))
    score = jnp.maximum(best, 0)
    has = best > 0
    max_i = jnp.where(has, bi, 0)
    max_j = jnp.where(has, bj, 0)
    plane = jnp.zeros(st.shape[0], jnp.int32)
    fs = nw_c
    plane = jnp.where(w_c > fs, 1, plane)
    fs = jnp.maximum(fs, w_c)
    plane = jnp.where(n_c > fs, 2, plane)
    plane = jnp.where(has, plane, 0)
    return score, max_i, max_j, plane


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "a_gap_open", "a_gap_ext", "b_gap_open",
    "b_gap_ext", "local_alignment", "interpret"))
def sw_full_batch_pallas(genome, glen, read, rlen, ax, ay, alen, awid,
                         revcmpl, *, match: int, mismatch: int,
                         a_gap_open: int, a_gap_ext: int,
                         b_gap_open: int, b_gap_ext: int,
                         local_alignment: bool = False,
                         interpret: bool = False):
    """Pallas drop-in for sw_jax.sw_full_batch.

    Returns (score, max_i, max_j, plane, bp[B, R, G] int32). Scores,
    positions and backpointers are bit-equal to sw_full_batch; `plane`
    matches wherever score > 0 (when nothing scores positive the start
    plane is irrelevant — the hit is dropped downstream).
    """
    st, bp = _run_kernel(genome, glen, read, rlen, ax, ay, alen, awid,
                         revcmpl, match, mismatch, a_gap_open, a_gap_ext,
                         b_gap_open, b_gap_ext, local_alignment,
                         interpret, True)
    score, max_i, max_j, plane = _plane_from_stats(st)
    return score, max_i, max_j, plane, bp


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "a_gap_open", "a_gap_ext", "b_gap_open",
    "b_gap_ext", "local_alignment", "interpret"))
def sw_full_stats_pallas(genome, glen, read, rlen, ax, ay, alen, awid,
                         revcmpl, *, match: int, mismatch: int,
                         a_gap_open: int, a_gap_ext: int,
                         b_gap_open: int, b_gap_ext: int,
                         local_alignment: bool = False,
                         interpret: bool = False):
    """Traceback-free full SW: the DP plus the in-kernel diagonal-chain
    summary, with no backpointer tensor at all.

    Returns [B, 8] int32: score, max_i, max_j, plane, run, term, deq,
    base. When plane == 0 and term == 0 the whole traceback is the
    single diagonal chain: nops = run, read_start = max_i - run + 1,
    genome_start = max_j - run + 1, matches = deq - base, mismatches =
    run - matches, no indels. Otherwise the caller must walk the path
    itself (host C++ banded DP re-run)."""
    st, _ = _run_kernel(genome, glen, read, rlen, ax, ay, alen, awid,
                        revcmpl, match, mismatch, a_gap_open, a_gap_ext,
                        b_gap_open, b_gap_ext, local_alignment,
                        interpret, False)
    score, max_i, max_j, plane = _plane_from_stats(st)
    return jnp.stack([score, max_i, max_j, plane, st[:, 6], st[:, 7],
                      st[:, 8], st[:, 9]], axis=1)
