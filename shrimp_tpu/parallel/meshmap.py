"""On-line sharded mapping: the product pipeline over a device mesh.

SHRiMP2 scales out by splitting the genome into RAM-sized chunks,
mapping each chunk in its own process, and recombining SAM + mapping
qualities offline with mergesam (SPLITTING_AND_MERGING:1-160,
mergesam/sam_reader.c:417-520). Here the genome becomes a
`jax.sharding.Mesh` axis: the packed genome planes are range-sharded
(with an overlap halo) across the devices, every batch's candidate
windows are routed to the device that owns their genome range, and ONE
`shard_map` launch per batch runs the real fused filter-2 + filter-3
kernels (core/sw_jax.sw_vec_full_stats_packed) on every shard
concurrently — the same launch the single-device fast path uses. The
host then merges the per-shard results back into the original window
order and runs the identical native selection/finalize, so the SAM
stream is byte-identical to the unsharded run by construction.

Cross-shard Z statistics ride the same collectives mergesam's algebra
prescribes (not_in_dist/MAPPING_QUALITIES Parts 1c/2c): z1 (the
posterior-sum MQV denominator, output.c:777-793) is a `psum` over the
shard axis; best-score class statistics are `pmax`; the z4/z5 class
priors are neg-log minima, i.e. `pmin` in neg-log space. `zmerge_psum`
and `zmerge_min_neglog` below implement exactly those reductions and
are asserted against the host-exact recombination in the tests and the
multichip dry run.
"""
from __future__ import annotations

import functools
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import MapperConfig
from ..fastpath import (FastLS, FastPaired, _normalize_win, _pack_args4,
                        _pack_rtab, fastpath_paired_supported,
                        fastpath_supported)
from ..io.fasta import SeqRecord
from ..mapper import Mapper, _round_up

SHARD_AXIS = "index_shard"


def make_mesh(devices=None):
    import jax
    from jax.sharding import Mesh
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (SHARD_AXIS,))


def zmerge_psum(mesh, zrows: np.ndarray) -> np.ndarray:
    """Cross-shard additive Z recombination as an on-device collective:
    zrows [D, ...] holds each shard's partial statistic rows (z1 / z3 /
    insert-size denominator — the literal sums of MAPPING_QUALITIES
    Parts 1c/2c, sam_reader.c:456-509); returns the psum-merged rows.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    with jax.enable_x64(True):   # Z stats are f64 end to end
        out = jax.jit(jax.shard_map(
            lambda z: jax.lax.psum(z[0], SHARD_AXIS)[None], mesh=mesh,
            in_specs=(P(SHARD_AXIS),), out_specs=P(SHARD_AXIS),
            check_vma=False))(zrows)
        return np.asarray(out)[0]


def zmerge_min_neglog(mesh, zrows: np.ndarray) -> np.ndarray:
    """Cross-shard class-prior recombination: z4/z5 are probabilities
    carried in neg-log space, and mergesam takes the class prior from
    the best (min neg-log) shard — "the min becomes a max"
    (MAPPING_QUALITIES Part 2c). pmin over the shard axis."""
    import jax
    from jax.sharding import PartitionSpec as P

    with jax.enable_x64(True):
        out = jax.jit(jax.shard_map(
            lambda z: jax.lax.pmin(z[0], SHARD_AXIS)[None], mesh=mesh,
            in_specs=(P(SHARD_AXIS),), out_specs=P(SHARD_AXIS),
            check_vma=False))(zrows)
        return np.asarray(out)[0]


class MeshMapper:
    """Maps read batches against a genome range-sharded over a device
    mesh; SAM output is byte-identical to the unsharded fast path.

    The index stays host-resident once (single-host multi-chip model:
    host RAM holds the CSR index, device HBM holds only the 1/D genome
    slice + halo per chip); candidate generation (filter 1) runs on the
    host exactly as unsharded, so candidate sets — and therefore output
    bytes — match the whole-genome run exactly. Multi-host distribution
    (per-host sub-index + mergesam-collective recombination) lives in
    parallel/dist.py.
    """

    def __init__(self, index, config: Optional[MapperConfig] = None,
                 mesh=None, halo: int = 2048):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = int(self.mesh.devices.size)
        self.halo = halo
        cfg = config or MapperConfig()
        if cfg.pair_mode and cfg.pair_mode != "none":
            from ..paired import PairedMapper
            self.m = PairedMapper(index, cfg)
        else:
            self.m = Mapper(index, cfg)
        self.platform = self.mesh.devices.flat[0].platform
        # range-sharded genome planes with halo: device d holds
        # [d*S, d*S + S + halo) of both the forward and the revcomp
        # plane (windows never span more than halo beyond their start)
        pad = Mapper._pad_plane(index.codes)
        pad_rc = Mapper._pad_plane(index.codes_rc)
        P_len = len(pad)
        S = _round_up(-(-P_len // self.D), 256)
        self.S = S
        rows = np.full((self.D, S + halo), 254, np.uint8)
        rows_rc = np.full((self.D, S + halo), 254, np.uint8)
        for d in range(self.D):
            src = pad[d * S: d * S + S + halo]
            rows[d, :len(src)] = src
            src = pad_rc[d * S: d * S + S + halo]
            rows_rc[d, :len(src)] = src
        shd = NamedSharding(self.mesh, P(SHARD_AXIS))
        self._fwd_sh = jax.device_put(rows, shd)
        self._rc_sh = jax.device_put(rows_rc, shd)
        self._repl = NamedSharding(self.mesh, P())
        self._step_cache = {}
        self._lock = threading.Lock()
        self.last_zpart: Optional[np.ndarray] = None  # [D, B] z1 partials

    # ------------------------------------------------------ device step
    def _get_step(self, G, L, Wcap, Bcap, Rpk, kw_key):
        key = (G, L, Wcap, Bcap, Rpk, kw_key)
        with self._lock:
            fn = self._step_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from ..core.sw_full_pallas import pallas_full_ok
        from ..core.sw_jax import sw_vec_full_stats_packed
        kw = dict(kw_key)
        use_pallas = (self.platform == "tpu"
                      and pallas_full_ok(Wcap, _round_up(L, 8), G))
        interpret = self.platform != "tpu"

        def body(fwd, rc, args, rtab_pk):
            pk3, = sw_vec_full_stats_packed.__wrapped__(
                fwd[0], rc[0], args[0], rtab_pk, G=G, L=L,
                local_alignment=False, use_pallas=use_pallas,
                interpret=interpret, phase="fused", **kw)
            # per-read best vector score, merged across shards with the
            # pmax collective (the best-score class statistic feeding
            # z4, MAPPING_QUALITIES Part 2c)
            w0, w1 = pk3[:, 0], pk3[:, 1]
            vec = (w0 & 0xFFFF).astype(jnp.int32)
            ri = w1 & 0x3FFFF
            valid = ((w1 >> 20) & 0xFFF) > 1     # pad rows carry glen=1
            tgt = jnp.where(valid, ri, Bcap)
            local_best = jnp.zeros(Bcap, jnp.int32).at[tgt].max(
                vec, mode="drop")
            best = jax.lax.pmax(local_best, SHARD_AXIS)
            return pk3[None], best[None]

        fn = jax.jit(jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)), check_vma=False))
        with self._lock:
            self._step_cache[key] = fn
        return fn

    # --------------------------------------------------------- dispatch
    def _dispatch(self, m, fh, read_tab: np.ndarray, L: int, R: int,
                  rcf: np.ndarray, n_reads=None):
        """Drop-in for fastpath._fused_dispatch: routes every candidate
        window to the device owning its genome range and runs the fused
        vec+full launch as ONE shard_map program over the mesh."""
        import jax
        cfg = m.config
        sc = cfg.scores
        n = int(fh.n)
        win, G = _normalize_win(m, fh, L, rcf)
        if G > self.halo:
            raise ValueError(f"window {G} exceeds shard halo {self.halo}")
        assert G <= 1023 and R <= 1023 and int(fh.w_len.max()) < 4096, \
            "mesh dispatch requires packed-IO field ranges"
        starts = win["starts"]
        shard = np.clip(starts // self.S, 0, self.D - 1).astype(np.int64)
        order = np.argsort(shard, kind="stable")
        counts = np.bincount(shard, minlength=self.D)
        Wcap = max(2048, 1 << int(np.ceil(np.log2(max(
            int(counts.max()), 1)))))
        args = np.empty((self.D, Wcap, 4), np.int32)
        off = 0
        for d in range(self.D):
            k = int(counts[d])
            sl = order[off:off + k]
            local = starts[sl] - d * self.S
            args[d] = _pack_args4(
                Wcap, k, local, win["glen"][sl], win["ri"][sl],
                win["rcmask"][sl], win["rx"][sl], win["ry"][sl],
                win["rl_"][sl], win["rw_"][sl], win["rev"][sl])
            off += k
        kw_key = (("match", sc.match), ("mismatch", sc.mismatch),
                  ("a_gap_open", sc.a_gap_open),
                  ("a_gap_ext", sc.a_gap_extend),
                  ("b_gap_open", sc.b_gap_open),
                  ("b_gap_ext", sc.b_gap_extend))
        step = self._get_step(G, L, Wcap, read_tab.shape[0],
                              read_tab.shape[1] // 2, kw_key)
        args_dev = jax.device_put(args, jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(SHARD_AXIS)))
        rtab_dev = jax.device_put(_pack_rtab(read_tab), self._repl)
        pk3_sh, best_sh = step(self._fwd_sh, self._rc_sh, args_dev,
                               rtab_dev)
        win["packed_io"] = True
        win["shard"] = shard
        win["mesh_best"] = best_sh
        win["fetch"] = functools.partial(
            self._fetch, pk3_sh, order, counts, n)
        m.stats.vec_invocs += n
        cells = int(fh.w_len.astype(np.int64).sum()) * L
        m.stats.vec_cells += cells
        m.stats.full_invocs += n
        m.stats.full_cells += cells
        return [(0, n, None)], win, G, True

    def _fetch(self, pk3_sh, order, counts, n, futures):
        """Gather the sharded [D, Wcap, 3] stats and restore the
        original (unsharded) window order."""
        import jax
        pk3 = np.asarray(jax.device_get(pk3_sh))
        flat = np.empty((n, 3), np.int32)
        off = 0
        for d in range(len(counts)):
            k = int(counts[d])
            flat[order[off:off + k]] = pk3[d, :k]
            off += k
        return [(flat,)]

    # ------------------------------------------------------- public API
    def map_unpaired_sam(self, records: Sequence[SeqRecord],
                         batch_size: int = 8192,
                         collect_z: bool = False) -> bytes:
        """Unpaired mapping to SAM bytes, byte-identical to the
        unsharded fast path. With collect_z, also accumulates the
        per-shard z1 partials ([D, n_reads] in self.last_zpart) that the
        zmerge_psum collective recombines (verified in tests)."""
        if not fastpath_supported(self.m.config):
            raise ValueError("config outside the fast-path envelope")
        fast = FastLS(self.m)
        fast.dispatch_fn = self._dispatch
        out: List[bytes] = []
        zparts = []
        for off in range(0, len(records), batch_size):
            batch = records[off:off + batch_size]
            if collect_z:
                fast.surv_post = np.zeros(0, np.float64)  # request
            ctx = fast.stage_prepare(batch, batch_cap=batch_size)
            if ctx is None:
                raise ValueError("batch shape outside fast-path support")
            sam, _ = fast.stage_finish(ctx)
            out.append(sam)
            if collect_z:
                zp = np.zeros((self.D, len(batch)), np.float64)
                if ctx["fh"].n and fast.surv_post is not None \
                        and len(fast.surv_post):
                    sh = ctx["win"]["shard"][fast.last_rows]
                    np.add.at(zp, (sh, fast.last_ri.astype(np.int64)),
                              fast.surv_post)
                zparts.append(zp)
                fast.surv_post = None
        if collect_z:
            self.last_zpart = (np.concatenate(zparts, axis=1) if zparts
                               else np.zeros((self.D, 0)))
        return b"".join(out)

    def map_paired_sam(self, records: Sequence[SeqRecord],
                       batch_size: int = 8192) -> bytes:
        """Paired mapping to SAM bytes, byte-identical to the unsharded
        paired fast path: same whole-index filter 1 + pair-up, the fused
        SW launch runs as the shard_map program over the mesh."""
        if not fastpath_paired_supported(self.m.config):
            raise ValueError("config outside the paired fast-path"
                             " envelope")
        if batch_size % 2:
            batch_size += 1
        fp = FastPaired(self.m)
        fp.fls.dispatch_fn = self._dispatch
        out: List[bytes] = []
        for off in range(0, len(records), batch_size):
            ctx = fp.stage_prepare(records[off:off + batch_size],
                                   batch_cap=batch_size)
            if ctx is None:
                raise ValueError("batch shape outside fast-path support")
            out.append(fp.stage_finish(ctx)[0])
        return b"".join(out)
