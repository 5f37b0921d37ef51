"""Multi-chip sharded mapping step.

SHRiMP2 scales out by splitting the genome into RAM-sized chunks, mapping
each chunk in a separate process, and recombining SAM + mapping qualities
offline with mergesam (SPLITTING_AND_MERGING:1-160). Here the same genome
(index-shard) axis becomes a `jax.sharding.Mesh` axis: every device scores
the candidate windows drawn from its genome shard for the whole read batch,
and the merge is on-device collectives — `pmax` for the per-read best
score, `psum` for the posterior-sum statistics (the z1 term of
gmapper/output.c:777-793, which mergesam recombines additively across
shards, not_in_dist/MAPPING_QUALITIES Part 1c).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.sw_jax import sw_vector_batch

SHARD_AXIS = "index_shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (SHARD_AXIS,))


def sharded_score_fn(mesh: Mesh, n_reads: int, *, match: int, mismatch: int,
                     a_gap_open: int, a_gap_ext: int, b_gap_open: int,
                     b_gap_ext: int, alpha: float, beta: float):
    """Build the jitted sharded scoring step.

    Per-shard inputs (leading dim = shard axis):
      gwin [D, B, G] uint8  — candidate windows from this device's genome
      glen [D, B]    int32
      rwin [D, B, R] uint8  — read codes per window
      rlen [D, B]    int32
      read_id [D, B] int32  — which of the n_reads each window belongs to
    Returns (replicated):
      best   [n_reads] int32 — max vector-SW score across all shards
      z1sum  [n_reads] f32   — psum of per-shard posterior sums (the exact
                               cross-shard MQV denominator recombination)
    """
    kw = dict(match=match, mismatch=mismatch, a_gap_open=a_gap_open,
              a_gap_ext=a_gap_ext, b_gap_open=b_gap_open,
              b_gap_ext=b_gap_ext)

    def per_shard(gwin, glen, rwin, rlen, read_id):
        # shard_map passes [1, B, ...] blocks; drop the shard dim
        gwin, glen = gwin[0], glen[0]
        rwin, rlen = rwin[0], rlen[0]
        read_id = read_id[0]
        scores = sw_vector_batch(gwin, glen, rwin, rlen, **kw)
        local_best = jnp.zeros(n_reads, jnp.int32).at[read_id].max(scores)
        post = jnp.exp2((scores.astype(jnp.float32)
                         - rlen.astype(jnp.float32) * (2 * alpha + beta))
                        / alpha)
        post = jnp.where(glen > 0, post, 0.0)
        local_z1 = jnp.zeros(n_reads, jnp.float32).at[read_id].add(post)
        best = jax.lax.pmax(local_best, SHARD_AXIS)
        z1 = jax.lax.psum(local_z1, SHARD_AXIS)
        return best[None], z1[None]

    sharded = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS),
                  P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        check_vma=False)

    def step(gwin, glen, rwin, rlen, read_id):
        best, z1 = sharded(gwin, glen, rwin, rlen, read_id)
        # every shard now holds identical copies; take shard 0
        return best[0], z1[0]

    return jax.jit(step)


def shard_genome(index, n_shards: int):
    """Assign contig bins to shards (split-db recast, utils/split-db.py):
    greedy bin-packing of contigs by length onto n_shards."""
    order = np.argsort(-index.contig_lengths.astype(np.int64))
    loads = np.zeros(n_shards, np.int64)
    assign = np.zeros(index.n_contigs, np.int32)
    for cn in order:
        s = int(np.argmin(loads))
        assign[cn] = s
        loads[s] += int(index.contig_lengths[cn])
    return assign
