"""Pallas TPU kernel for the vector Smith-Waterman filter (filter 2).

The reference's hottest loop is an SSE2 anti-diagonal wavefront scoring 8
read rows at a time (common/sw-vector.c:68-377). The TPU-native
formulation instead uses inter-task parallelism: every VPU lane scores an
independent (genome window, read) pair, so each whole-genome-row update is
a [G, 8, 128] vector op advancing G*1024 DP cells at once with no
wavefront shuffles at all.

The intra-row E-gap chain (E[j] = max(H[j-1]-open, E[j-1]-ext)) is the
only sequential dependency along j. It is resolved without a scan:
because open+extend >= extend, a gap re-opened from a cell whose value
came from E can never beat simply extending, so E computed from
H0 = max(0, diag+s, F) (the no-E row value) equals the true E. With a
uniform extend cost that is a running max of H0[k] + k*ext — log2(G)
shift-and-max doubling steps — and H = max(H0, E). Scores are therefore
bit-equal to sw_jax.sw_vector_batch (itself fuzz-verified against the
reference object code): local affine SW where gap-open charges
open+extend, H clamped at 0, invalid cells (i >= rlen, j >= glen)
contribute 0, and colour-space mode scores read row 0 against `g_row0` =
lstocs(genome letters, initbp) (sw-vector.c:108-146).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 30)     # plain int: jnp scalars would be captured kernel consts
FILL = -(2 ** 28)    # shift fill for the cummax; stays clear of overflow

TILE = 1024          # pairs per grid step = 8 sublanes x 128 lanes
_SUB, _LANE = 8, 128


def pallas_vec_ok(B: int, G: int) -> bool:
    """Shape/backend gate for the VEC-ONLY Mosaic kernel (two-phase
    phase A): tile-divisible batch and a VMEM-sized genome block. The
    full-kernel gate (sw_full_pallas.pallas_full_ok) also bounds the
    backpointer tensor, which the vec phase never materializes — huge
    single-launch row counts are exactly the point of phase A."""
    import jax
    try:
        if jax.default_backend() in ("cpu",):
            return False
    except Exception:  # pragma: no cover
        return False
    return B % TILE == 0 and G <= 256


def _kernel(g_ref, r_ref, g0_ref, glen_ref, rlen_ref, out_ref, h_scr,
            f_scr, *, G, R, m, mm, goa, gea, gob, geb, cs_mode):
    glen = glen_ref[...].reshape(_SUB, _LANE)
    rlen = rlen_ref[...].reshape(_SUB, _LANE)
    # derive loop-carry inits from loaded data: pure splat constants get
    # a "replicated" Mosaic layout that cannot be a fori_loop carry
    zeros = jnp.minimum(rlen, 0)     # == 0, but not foldable to a splat
    g = g_ref[...].reshape(G, _SUB, _LANE)

    jidx = jax.lax.broadcasted_iota(jnp.int32, (G, _SUB, _LANE), 0)
    jvalid = jidx < glen[None]                      # [G, 8, 128]
    jg = jidx * gea                                  # j * extend cost
    if cs_mode:
        g0 = g0_ref[...].reshape(G, _SUB, _LANE)

    # row -1: H = 0 (F[-1] = NEG never matters: F[0] <= H[-1]-gob < 0 and
    # H0 row 0 clamps at 0, matching the masked recurrence of sw_jax)
    h_scr[:] = jnp.zeros((G + 1, _SUB, _LANE), jnp.int32)
    f_scr[:] = jnp.full((G, _SUB, _LANE), NEG, jnp.int32)

    def row_body(i, best):
        rch = r_ref[0, pl.ds(i, 1)].reshape(_SUB, _LANE)
        rvalid = i < rlen                            # [8, 128]
        hp = h_scr[pl.ds(1, G)]                      # H[i-1][0..G-1]
        h_diag = h_scr[pl.ds(0, G)]                  # H[i-1][-1..G-2]
        s = jnp.where(g == rch[None], m, mm)
        if cs_mode:
            s0 = jnp.where(g0 == rch[None], m, mm)
            s = jnp.where(i == 0, s0, s)
        f = jnp.maximum(hp - gob, f_scr[...] - geb)
        h0 = jnp.maximum(jnp.maximum(0, h_diag + s), f)
        valid = rvalid[None] & jvalid
        h0 = jnp.where(valid, h0, 0)
        f = jnp.where(valid, f, NEG)
        # E chain: cummax of (h0[k] + k*gea) over k <= j-1
        c = h0 + jg
        k = 1
        while k < G:
            shifted = jnp.concatenate(
                [jnp.full((k, _SUB, _LANE), FILL, jnp.int32), c[:-k]],
                axis=0)
            c = jnp.maximum(c, shifted)
            k *= 2
        cs_prev = jnp.concatenate(
            [jnp.full((1, _SUB, _LANE), FILL, jnp.int32), c[:-1]], axis=0)
        e = cs_prev - (goa - gea) - jg               # C[j-1] - goa - (j-1)e
        h = jnp.maximum(h0, jnp.where(valid, e, NEG))
        best = jnp.maximum(best, jnp.max(h, axis=0))
        h_scr[pl.ds(1, G)] = h
        f_scr[...] = f
        return best

    best = jax.lax.fori_loop(0, R, row_body, zeros)
    out_ref[...] = best.reshape(1, _SUB, _LANE)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "a_gap_open", "a_gap_ext", "b_gap_open",
    "b_gap_ext", "cs_mode", "interpret"))
def sw_vector_batch_pallas(genome: jnp.ndarray, glen: jnp.ndarray,
                           read: jnp.ndarray, rlen: jnp.ndarray,
                           g_row0: jnp.ndarray = None,
                           *, match: int, mismatch: int,
                           a_gap_open: int, a_gap_ext: int,
                           b_gap_open: int, b_gap_ext: int,
                           cs_mode: bool = False,
                           interpret: bool = False) -> jnp.ndarray:
    """Drop-in for sw_jax.sw_vector_batch; B must be a multiple of 1024.
    `interpret=True` runs the kernel on the Pallas interpreter so the
    hottest Mosaic kernel stays covered on CPU-only CI."""
    B, G = genome.shape
    R = read.shape[1]
    assert B % TILE == 0, B
    nb = B // TILE

    def tiles(x, inner):
        # [B, L] -> [nb, L, 8, 128]: batch to (sublane, lane)
        return x.astype(jnp.int32).reshape(
            nb, _SUB, _LANE, inner).transpose(0, 3, 1, 2)

    gT = tiles(genome, G)
    rT = tiles(read, R)
    g0T = (tiles(g_row0, G) if cs_mode
           else jnp.zeros((nb, 1, _SUB, _LANE), jnp.int32))
    glenT = glen.reshape(nb, 1, _SUB, _LANE)
    rlenT = rlen.reshape(nb, 1, _SUB, _LANE)

    kern = functools.partial(
        _kernel, G=G, R=R,
        m=int(match), mm=int(mismatch),
        goa=int(-(a_gap_open) + -(a_gap_ext)),
        gea=int(-(a_gap_ext)),
        gob=int(-(b_gap_open) + -(b_gap_ext)),
        geb=int(-(b_gap_ext)),
        cs_mode=cs_mode)

    def bspec(shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[bspec((G, _SUB, _LANE)), bspec((R, _SUB, _LANE)),
                  bspec((g0T.shape[1], _SUB, _LANE)),
                  bspec((1, _SUB, _LANE)), bspec((1, _SUB, _LANE))],
        out_specs=bspec((_SUB, _LANE)),
        out_shape=jax.ShapeDtypeStruct((nb, _SUB, _LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G + 1, _SUB, _LANE), jnp.int32),
                        pltpu.VMEM((G, _SUB, _LANE), jnp.int32)],
        interpret=interpret,
    )(gT, rT, g0T, glenT, rlenT)
    return out.reshape(B)


@functools.partial(jax.jit, static_argnames=(
    "G", "match", "mismatch", "a_gap_open", "a_gap_ext", "b_gap_open",
    "b_gap_ext", "use_pallas"))
def sw_vector_ls_from_index(codes, gstart, glen, rtab, owner, rlen,
                            *, G: int, match: int, mismatch: int,
                            a_gap_open: int, a_gap_ext: int,
                            b_gap_open: int, b_gap_ext: int,
                            use_pallas: bool) -> jnp.ndarray:
    """Letter-space vector SW against the DEVICE-RESIDENT genome.

    Instead of gathering [B, G] genome windows on the host and shipping
    them per launch, the packed genome `codes` lives on the device once
    and only window start offsets (`gstart`, absolute) cross the host
    boundary — several-fold less PCIe/tunnel traffic per launch. Read
    rows are gathered on-device too when `owner` is given: `rtab` is
    the per-batch read table (upload it once with device_put) and
    `owner` the per-candidate row index; with owner=None, `rtab` is
    already the per-candidate [B, R] row matrix. All argument shapes
    are launch-size constants so exactly one compile per (G, R) bucket
    happens. Windows crossing the genome end clip to the last base;
    `glen` masks them (same semantics as mapper._gather_rows).
    """
    from . import sw_jax
    B = gstart.shape[0]
    jidx = jnp.arange(G, dtype=jnp.int32)[None, :]
    pos = jnp.clip(gstart.astype(jnp.int32)[:, None] + jidx, 0,
                   codes.shape[0] - 1)
    gwin = codes[pos]
    rwin = (rtab if owner is None
            else rtab[jnp.clip(owner.astype(jnp.int32), 0,
                               rtab.shape[0] - 1)])
    kw = dict(match=match, mismatch=mismatch, a_gap_open=a_gap_open,
              a_gap_ext=a_gap_ext, b_gap_open=b_gap_open,
              b_gap_ext=b_gap_ext)
    if use_pallas and B % TILE == 0:
        return sw_vector_batch_pallas.__wrapped__(gwin, glen, rwin, rlen,
                                                  **kw)
    return sw_jax.sw_vector_batch.__wrapped__(gwin, glen, rwin, rlen, **kw)


@functools.partial(jax.jit, static_argnames=(
    "G", "match", "mismatch", "a_gap_open", "a_gap_ext", "b_gap_open",
    "b_gap_ext", "use_pallas"))
def sw_vector_cs_from_index(cs_codes, cs_codes_rc, ls_codes, ls_codes_rc,
                            gstart, glen, eff_rc, rtab, owner, rlen, initbp,
                            *, G: int, match: int, mismatch: int,
                            a_gap_open: int, a_gap_ext: int,
                            b_gap_open: int, b_gap_ext: int,
                            use_pallas: bool) -> jnp.ndarray:
    """Colour-space vector SW against the DEVICE-RESIDENT genome planes.

    The CS vector SW scores the colour read against the genome's colour
    projection, except row 0 which re-derives the first colour from the
    genome letter and the read's initial base (sw-vector.c:108-146).
    Both colour planes (fw/rc) and both letter planes live on the device;
    per candidate only `gstart` (absolute, already strand-normalized on
    the host per reverse_hit, mapping.c:254-263), `eff_rc`, the read-row
    index and `initbp` cross the host boundary. g_row0 is computed
    on-device as COLOUR_MAT[genome_letter, initbp].
    """
    from . import sw_jax
    from .. import constants as C
    B = gstart.shape[0]
    jidx = jnp.arange(G, dtype=jnp.int32)[None, :]
    pos = jnp.clip(gstart.astype(jnp.int32)[:, None] + jidx, 0,
                   cs_codes.shape[0] - 1)
    rcb = (eff_rc != 0)[:, None]
    gwin = jnp.where(rcb, cs_codes_rc[pos], cs_codes[pos])
    lswin = jnp.where(rcb, ls_codes_rc[pos], ls_codes[pos])
    cmat = jnp.asarray(C.COLOUR_MAT.reshape(-1))
    g_row0 = cmat[lswin.astype(jnp.int32) * 16
                  + initbp.astype(jnp.int32)[:, None]]
    rwin = rtab[jnp.clip(owner.astype(jnp.int32), 0, rtab.shape[0] - 1)]
    kw = dict(match=match, mismatch=mismatch, a_gap_open=a_gap_open,
              a_gap_ext=a_gap_ext, b_gap_open=b_gap_open,
              b_gap_ext=b_gap_ext)
    if use_pallas and B % TILE == 0:
        return sw_vector_batch_pallas.__wrapped__(gwin, glen, rwin, rlen,
                                                  g_row0, cs_mode=True, **kw)
    return sw_jax.sw_vector_batch.__wrapped__(gwin, glen, rwin, rlen,
                                              g_row0, cs_mode=True, **kw)


def pallas_available() -> bool:
    """True when the default backend can run the Mosaic kernels."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False
