"""Pallas TPU kernel for the colour-space full Smith-Waterman DP.

The 4-layer banded DP of common/sw-full-cs.c (four letter-space
translations of the CS read; switching layer between read positions is
a crossover costing the per-position penalty): each VPU lane owns one
(genome window, read) pair, a tile is 8x128 = 1024 pairs, and one DP
row update operates on [4, G, 8, 128] vectors (all four layers at
once).  Produces the same packed backpointers and best-cell bookkeeping
as the lax.scan formulation in sw_cs_jax.sw_full_cs_tpu, whose
traceback scan (gather-bound, not DP-bound) is reused unchanged.

The XLA scan formulation runs at ~0.03 Gcells/s on the v5e (each of
the R sequential row steps lowers to dozens of relayouted [B,12,G]
reductions); this kernel keeps the planes in VMEM scratch across rows.

Mosaic notes (learned on the vector/LS-full kernels): derive zeros from
loaded data so carries don't get "replicated" splat layouts, keep
every vector int32, reshape scalar refs to (8, 128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 25)
FILL = -(2 ** 28)
TILE = 1024
_SUB, _LANE = 8, 128
BASE_N = 15            # constants.BASE_N (scores 0 against anything)

_NN, _NNW, _WNW, _WW, _NWN, _NWNW, _NWW = 1, 2, 3, 4, 5, 6, 7


def pallas_cs_full_ok(B: int, R: int, G: int) -> bool:
    import jax as _jax
    try:
        if _jax.default_backend() in ("cpu",):
            return False
    except Exception:  # pragma: no cover
        return False
    # 3 plane scratches of [4*(G+1), 8, 128] int32 plus temporaries
    return B % TILE == 0 and G <= 128 and R <= 128


def _kernel(g_ref, qr_ref, x_ref, gx_ref, glen_ref, rlen_ref, ax_ref,
            ay_ref, alen_ref, awid_ref, rv_ref,
            bp_ref, stats_ref, nwp, np_, wp,
            *, G, R, m, mm, goa, gea, gob, geb, local, taboo):
    i = pl.program_id(1)
    glen = glen_ref[...].reshape(_SUB, _LANE)
    rlen = rlen_ref[...].reshape(_SUB, _LANE)
    ax = ax_ref[...].reshape(_SUB, _LANE)
    ay = ay_ref[...].reshape(_SUB, _LANE)
    alen = alen_ref[...].reshape(_SUB, _LANE)
    awid = awid_ref[...].reshape(_SUB, _LANE)
    rv = rv_ref[...].reshape(_SUB, _LANE) != 0
    gx = gx_ref[...].reshape(_SUB, _LANE)          # global crossover
    xc = x_ref[...].reshape(_SUB, _LANE)           # this row's crossover
    g = g_ref[...].reshape(G, _SUB, _LANE)
    zeros = jnp.minimum(rlen, 0)

    # row -1 boundary: layer 0 starts at 0, layers 1..3 at the global
    # crossover penalty; N/W planes offset by the gap opens
    @pl.when(i == 0)
    def _init():
        for k in range(4):
            off = zeros if k == 0 else gx
            nwp[pl.ds(k * (G + 1), G + 1)] = jnp.broadcast_to(
                off[None], (G + 1, _SUB, _LANE)).astype(jnp.int32)
            np_[pl.ds(k * (G + 1), G + 1)] = jnp.broadcast_to(
                (off - gob)[None], (G + 1, _SUB, _LANE)).astype(jnp.int32)
            wp[pl.ds(k * (G + 1), G + 1)] = jnp.broadcast_to(
                (off - goa)[None], (G + 1, _SUB, _LANE)).astype(jnp.int32)
        stats_ref[...] = jnp.broadcast_to(
            zeros[None, None], (1, 5, _SUB, _LANE)).astype(jnp.int32)

    jidx = jax.lax.broadcasted_iota(jnp.int32, (G, _SUB, _LANE), 0)

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

    no_taboo = (i < rlen - taboo) if taboo else None
    rvb = rv[None]
    xcb = xc[None]

    qrow = qr_ref[...].reshape(4, _SUB, _LANE)     # this row's 4 letters
    gn = g == BASE_N

    # previous-row plane views per layer
    def prev(ref, k, lo):
        return ref[pl.ds(k * (G + 1) + lo, G)]

    nw_vals = [None] * 4
    nw_bks = [None] * 4
    n_vals = [None] * 4
    n_bks = [None] * 4
    w_vals = [None] * 4
    w_bks = [None] * 4

    nw_d = [prev(nwp, l, 0) for l in range(4)]
    n_d = [prev(np_, l, 0) for l in range(4)]
    w_d = [prev(wp, l, 0) for l in range(4)]
    nw_u = [prev(nwp, l, 1) for l in range(4)]
    n_u = [prev(np_, l, 1) for l in range(4)]

    if local:
        init_nw = [zeros[None] if k == 0 else xcb for k in range(4)]
        init_n = [v - gob for v in init_nw]
        init_w = [v - goa for v in init_nw]
    else:
        negb = zeros[None] + NEG
        init_nw = [negb] * 4
        init_n = [negb] * 4
        init_w = [negb] * 4

    for k in range(4):
        qk = qrow[k][None]
        qn = qk == BASE_N
        s = jnp.where(gn | qn, 0, jnp.where(g == qk, m, mm))

        lorder = [k] + [ll for ll in range(4) if ll != k]
        # ---- NW: 12 candidates in (layer-group, plane nw/n/w) order;
        # groups beyond the first pay the crossover; rank ties break
        # forward (or plane-reversed within a group under revcmpl)
        val = None
        for gi, l in enumerate(lorder):
            trio = [(nw_d[l], _NWNW), (n_d[l], _NWN), (w_d[l], _NWW)]
            trio_r = [trio[2], trio[1], trio[0]]
            for ci in range(3):
                cf, df = trio[ci]
                cr, dr = trio_r[ci]
                c = jnp.where(rvb, cr, cf)
                d = jnp.where(rvb, jnp.full_like(c, dr),
                              jnp.full_like(c, df))
                if gi != 0:
                    c = c + xcb
                if taboo:
                    # suppress the from-N candidate near the read end
                    isn = d == _NWN
                    c = jnp.where(isn & ~no_taboo[None], 2 * NEG, c)
                bk = (d << 2) | l
                if val is None:
                    val, bkv = c, bk
                else:
                    take = c > val
                    val = jnp.where(take, c, val)
                    bkv = jnp.where(take, bk, bkv)
        val = val + s
        if local:
            resetv = init_nw[k]
            clamp = val <= resetv
            val = jnp.where(clamp, resetv, val)
            bkv = jnp.where(clamp, 0, bkv)
        nw_vals[k] = jnp.where(inb, val, init_nw[k])
        nw_bks[k] = jnp.where(inb, bkv, 0)

        # ---- N: 8 candidates (open/ext per layer group)
        val = None
        for gi, l in enumerate(lorder):
            duo = [(nw_u[l] - gob - geb, _NNW), (n_u[l] - geb, _NN)]
            duo_r = [duo[1], duo[0]]
            for ci in range(2):
                cf, df = duo[ci]
                cr, dr = duo_r[ci]
                c = jnp.where(rvb, cr, cf)
                d = jnp.where(rvb, jnp.full_like(c, dr),
                              jnp.full_like(c, df))
                if gi != 0:
                    c = c + xcb
                if taboo:
                    iso = d == _NNW
                    c = jnp.where(iso & ~no_taboo[None], 2 * NEG, c)
                bk = (d << 2) | l
                if val is None:
                    val, bkv = c, bk
                else:
                    take = c > val
                    val = jnp.where(take, c, val)
                    bkv = jnp.where(take, bk, bkv)
        if local:
            resetv = init_nw[k]
            clamp = val <= resetv
            val = jnp.where(clamp, resetv, val)
            bkv = jnp.where(clamp, 0, bkv)
        n_vals[k] = jnp.where(inb, val, init_n[k])
        n_bks[k] = jnp.where(inb, bkv, 0)

    # ---- W chains (per layer, same-layer only): cummax doubling
    for k in range(4):
        nw_shift = jnp.concatenate(
            [jnp.broadcast_to(init_nw[k], (1, _SUB, _LANE)),
             nw_vals[k][:-1]], axis=0)
        c_open_w = nw_shift - goa - gea
        if taboo:
            c_open_w = jnp.where(no_taboo[None], c_open_w, 2 * NEG)
        a_elem = c_open_w
        if local:
            a_elem = jnp.maximum(a_elem, init_nw[k])
        a_elem = jnp.where(jidx == x_min[None],
                           jnp.maximum(a_elem, init_w[k] - gea), a_elem)
        c = jnp.where(inb, a_elem + jidx * gea, FILL)
        step = 1
        while step < G:
            shifted = jnp.concatenate(
                [jnp.full((step, _SUB, _LANE), FILL, jnp.int32),
                 c[:-step]], axis=0)
            c = jnp.maximum(c, shifted)
            step *= 2
        w_val = jnp.where(inb, c - jidx * gea, init_w[k])
        w_prev = jnp.concatenate([init_w[k][:1], w_val[:-1]], axis=0)
        c_ext_w = w_prev - gea
        take_ext = ((rvb & ~(c_open_w > c_ext_w))
                    | (~rvb & (c_ext_w > c_open_w)))
        w_bk = jnp.where(take_ext, (_WW << 2) | k, (_WNW << 2) | k)
        if local:
            resetv = init_nw[k]
            clamp = w_val <= resetv
            w_val = jnp.where(clamp, resetv, w_val)
            w_bk = jnp.where(clamp, 0, w_bk)
        w_vals[k] = w_val
        w_bks[k] = jnp.where(inb, w_bk, 0)

    # ---- emit packed backpointers: nw | n<<5 | w<<10, [4G, SUB, LANE]
    for k in range(4):
        bp_ref[0, 0, pl.ds(k * G, G)] = (nw_bks[k] | (n_bks[k] << 5)
                                         | (w_bks[k] << 10))

    # ---- best-cell tracking, tie order (j, k, plane[p1, n, p3])
    if local:
        rowvalid = (i < rlen)[None] & inb
    else:
        rowvalid = (i == rlen - 1)[None] & inb

    best = stats_ref[0, 0]
    rowbest = zeros + NEG
    cellmax = [None] * 4
    for k in range(4):
        cm = jnp.maximum(jnp.maximum(nw_vals[k], n_vals[k]), w_vals[k])
        cm = jnp.where(rowvalid, cm, NEG)
        cellmax[k] = cm
        rowbest = jnp.maximum(rowbest, jnp.max(cm, axis=0))
    # jsel = min j holding rowbest in any layer
    anyk = jnp.where(
        (cellmax[0] == rowbest[None]) | (cellmax[1] == rowbest[None])
        | (cellmax[2] == rowbest[None]) | (cellmax[3] == rowbest[None]),
        jidx, G)
    jsel = jnp.min(anyk, axis=0)
    selj = jidx == jsel[None]
    # ksel = min k whose cell at jsel holds rowbest
    ksel = zeros + 4
    for k in range(3, -1, -1):
        hit = jnp.max(jnp.where(selj & (cellmax[k] == rowbest[None]),
                                jnp.ones_like(jidx), jnp.zeros_like(jidx)),
                      axis=0)
        ksel = jnp.where(hit > 0, k, ksel)

    def pick(vals_k):
        out = zeros + NEG
        for k in range(4):
            v = jnp.max(jnp.where(selj, vals_k[k], NEG), axis=0)
            out = jnp.where(ksel == k, v, out)
        return out

    nw_c = pick(nw_vals)
    n_c = pick(n_vals)
    w_c = pick(w_vals)
    bk_nw = pick(nw_bks)
    bk_n = pick(n_bks)
    bk_w = pick(w_bks)
    # frm plane preference: nw, then w if strictly greater, then n
    frm = bk_nw
    fs = nw_c
    frm = jnp.where(w_c > fs, bk_w, frm)
    fs = jnp.maximum(fs, w_c)
    frm = jnp.where(n_c > fs, bk_n, frm)

    upd = rowbest > best
    stats_ref[0, 0] = jnp.where(upd, rowbest, best)
    stats_ref[0, 1] = jnp.where(upd, zeros + i, stats_ref[0, 1])
    stats_ref[0, 2] = jnp.where(upd, jsel, stats_ref[0, 2])
    stats_ref[0, 3] = jnp.where(upd, ksel, stats_ref[0, 3])
    stats_ref[0, 4] = jnp.where(upd, frm, stats_ref[0, 4])

    # ---- persist planes for the next row (pad col j=-1 = inits)
    for k in range(4):
        nwp[pl.ds(k * (G + 1), 1)] = init_nw[k][:1]
        nwp[pl.ds(k * (G + 1) + 1, G)] = nw_vals[k]
        np_[pl.ds(k * (G + 1), 1)] = init_n[k][:1]
        np_[pl.ds(k * (G + 1) + 1, G)] = n_vals[k]
        wp[pl.ds(k * (G + 1), 1)] = init_w[k][:1]
        wp[pl.ds(k * (G + 1) + 1, G)] = w_vals[k]


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "a_gap_open", "a_gap_ext", "b_gap_open",
    "b_gap_ext", "local_alignment", "indel_taboo_len", "interpret"))
def sw_full_cs_dp_pallas(genome_ls, glen, qr, rlen, ax, ay, alen, awid,
                         revcmpl, xover_rows, gx_col,
                         *, match: int, mismatch: int, a_gap_open: int,
                         a_gap_ext: int, b_gap_open: int, b_gap_ext: int,
                         local_alignment: bool = False,
                         indel_taboo_len: int = 0,
                         interpret: bool = False):
    """CS 4-layer DP on Mosaic.  Returns (best, bi, bj, bk, bfrm,
    bp_packed [B, R, 4, G] int32 with nw|n<<5|w<<10) matching the scan
    formulation in sw_cs_jax bit for bit."""
    B, G = genome_ls.shape
    R = qr.shape[2]
    nb = B // TILE

    def tiles(x, inner):
        return x.astype(jnp.int32).reshape(
            nb, _SUB, _LANE, inner).transpose(0, 3, 1, 2)

    gT = tiles(genome_ls, G)
    # qr rows: [nb, R, 4, SUB, LANE]
    qT = qr.astype(jnp.int32).reshape(nb, _SUB, _LANE, 4, R
                                      ).transpose(0, 4, 3, 1, 2)
    xT = xover_rows.astype(jnp.int32).reshape(
        nb, _SUB, _LANE, R).transpose(0, 3, 1, 2)[:, :, None]

    def flat(x):
        return x.astype(jnp.int32).reshape(nb, 1, _SUB, _LANE)

    kern = functools.partial(
        _kernel, G=G, R=R, m=int(match), mm=int(mismatch),
        goa=int(-(a_gap_open)), gea=int(-(a_gap_ext)),
        gob=int(-(b_gap_open)), geb=int(-(b_gap_ext)),
        local=bool(local_alignment), taboo=int(indel_taboo_len))

    def cspec(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda t, i: (t,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    qrow_spec = pl.BlockSpec((1, 1, 4, _SUB, _LANE),
                             lambda t, i: (t, i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    xrow_spec = pl.BlockSpec((1, 1, 1, _SUB, _LANE),
                             lambda t, i: (t, i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec((1, 1, 4 * G, _SUB, _LANE),
                           lambda t, i: (t, i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    bp, stats = pl.pallas_call(
        kern,
        grid=(nb, R),
        in_specs=[cspec((G, _SUB, _LANE)), qrow_spec, xrow_spec,
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE)),
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE)),
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE)),
                  cspec((1, _SUB, _LANE)), cspec((1, _SUB, _LANE))],
        out_specs=[bp_spec, cspec((5, _SUB, _LANE))],
        out_shape=[jax.ShapeDtypeStruct((nb, R, 4 * G, _SUB, _LANE),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((nb, 5, _SUB, _LANE), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((4 * (G + 1), _SUB, _LANE),
                                   jnp.int32)] * 3,
        interpret=interpret,
    )(gT, qT, xT, flat(gx_col), flat(glen), flat(rlen), flat(ax),
      flat(ay), flat(alen), flat(awid), flat(revcmpl))

    st = stats.transpose(0, 2, 3, 1).reshape(B, 5)
    best, bi, bj, bk, bfrm = (st[:, c] for c in range(5))
    # [nb, R, 4, G, SUB, LANE] -> [B, R, 4, G]
    bp = bp.reshape(nb, R, 4, G, _SUB, _LANE).transpose(
        0, 4, 5, 1, 2, 3).reshape(B, R, 4, G)
    return best, bi, bj, bk, bfrm, bp
