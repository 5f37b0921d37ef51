"""Sharded mapping: genome index distributed over multiple devices.

The reference scales out by splitting the genome into RAM-sized chunks
(utils/split-db.py), mapping each chunk independently, and recombining
SAM + MQVs with mergesam (SPLITTING_AND_MERGING). Here every shard is a
device-resident index; read batches stream to every shard; each shard's
kernel launches are placed on its own device (so SW work runs on all
chips concurrently); and the final per-read merge applies mergesam's
recombination algebra in memory at full double precision — z1 sums,
z4 min — with no neg-log requantization loss.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import constants as C
from ..config import MapperConfig
from ..index.build import GenomeIndex, SeedIndex
from ..io.fasta import SeqRecord
from ..mapper import Hit, Mapper, ReadEntry, qv_from_pr_corr
from .mesh import shard_genome


def make_shard_indexes(index: GenomeIndex, n_shards: int
                       ) -> List[Tuple[GenomeIndex, np.ndarray]]:
    """Split an index into per-shard indexes by contig bins.

    Returns [(shard_index, global_contig_ids)] — each shard holds whole
    contigs (split-db semantics: contigs are never split, README:158-166).
    """
    from ..index.build import build_index
    assign = shard_genome(index, n_shards)
    shards = []
    for s in range(n_shards):
        cns = np.nonzero(assign == s)[0]
        if len(cns) == 0:
            continue
        contigs = []
        for cn in cns:
            o = int(index.contig_offsets[cn])
            l = int(index.contig_lengths[cn])
            contigs.append((index.contig_names[cn], index.codes[o:o + l]))
        sub = build_index(contigs, [si.seed for si in index.seeds],
                          mode=index.mode, is_rna=index.is_rna)
        shards.append((sub, cns))
    return shards


class ShardedMapper:
    """Maps against N index shards and merges exactly.

    `devices`: optional list of jax devices, one per shard; each shard's
    kernels are dispatched onto its device so compute overlaps.
    """

    def __init__(self, index: GenomeIndex, n_shards: int,
                 config: Optional[MapperConfig] = None, devices=None):
        self.config = config or MapperConfig()
        self.index = index
        self.shards = make_shard_indexes(index, n_shards)
        self.mappers = []
        for i, (sub, cns) in enumerate(self.shards):
            m = Mapper(sub, self.config)
            # the auto cutoff must reflect the WHOLE genome so per-shard
            # filtering matches the unsharded run
            if self.config.list_cutoff is None:
                m.cutoff = index.auto_list_cutoff()
            m.device = (devices[i % len(devices)] if devices else None)
            self.mappers.append(m)

    def map_unpaired(self, records: Sequence[SeqRecord]
                     ) -> List[Tuple[ReadEntry, List[Hit]]]:
        if len(self.mappers) == 1:
            per_shard = [self.mappers[0].map_unpaired(records)]
        else:
            # one thread per shard: native filter1 and the device waits
            # release the GIL, so shard pipelines overlap on host and
            # each shard's kernels run on its own device concurrently
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(len(self.mappers)) as ex:
                per_shard = list(ex.map(
                    lambda m: m.map_unpaired(records), self.mappers))
        cfg = self.config
        out = []
        n_reads = len(per_shard[0])
        for ri in range(n_reads):
            entry = per_shard[0][ri][0]
            merged: List[Hit] = []
            z1_total = 0.0
            for si, shard_res in enumerate(per_shard):
                _, hits = shard_res[ri]
                sub_cns = self.shards[si][1]
                for h in hits:
                    h.cn = int(sub_cns[h.cn])  # shard -> global contig id
                    merged.append(h)
                if hits:
                    z1_total += hits[0].z1  # per-shard z1 sum
            if cfg.compute_mapping_qualities:
                for h in merged:
                    h.z1 = z1_total
                    h.mqv = qv_from_pr_corr(h.z0 / z1_total)
                    # mergesam does not re-clamp mqv<4; the whole-genome
                    # run does — follow the whole-run behavior since we
                    # recombine at full precision
                    if h.mqv < 4:
                        h.mqv = 0
            # cross-shard selection: sort by (mqv, score) like mergesam,
            # trim to num_outputs
            merged.sort(key=lambda h: (-h.mqv, -h.score_full))
            if len(merged) > cfg.num_outputs:
                merged = merged[:cfg.num_outputs]
            if merged:
                entry.mapped = True
                if cfg.single_best_mapping:
                    merged = merged[:1]
            out.append((entry, merged))
        return out
