"""ShardedMapper over a virtual device mesh must reproduce the
whole-genome run (sharded-vs-unsharded equivalence, the reference's own
correctness criterion; SURVEY §4c)."""
import numpy as np
import jax

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired
from shrimp_tpu.mapper import Mapper
from shrimp_tpu.parallel.sharded import ShardedMapper


def test_sharded_mapper_matches_whole():
    rng = np.random.default_rng(31)
    contigs = []
    gs = []
    for c in range(4):
        g = "".join(rng.choice(list("ACGT"), 20_000))
        gs.append(g)
        contigs.append((f"chr{c}", encode.encode_ls(g)))
    # repeat across shards
    gs[2] = gs[2][:8_000] + gs[0][1_000:1_300] + gs[2][8_300:]
    contigs[2] = ("chr2", encode.encode_ls(gs[2]))

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(60):
        src = gs[k % 4]
        p = int(rng.integers(0, len(src) - 36))
        if k % 6 == 0:
            src, p = gs[0], int(rng.integers(1_000, 1_264))
        r = src[p:p + 36]
        if k % 3 == 0:
            r = "".join(comp[c] for c in reversed(r))
        reads.append(SeqRecord(f"s{k}", r))

    cfg = MapperConfig()
    idx = build_index(contigs, default_seeds())
    whole = Mapper(idx, cfg)
    res_w = whole.map_unpaired(reads)
    want = []
    for re_, hits in res_w:
        for h in hits:
            want.append(render_unpaired(re_, h, idx, cfg))

    devices = jax.devices()[:4]
    sm = ShardedMapper(idx, 4, cfg, devices=devices)
    res_s = sm.map_unpaired(reads)
    got = []
    for re_, hits in res_s:
        for h in hits:
            got.append(render_unpaired(re_, h, idx, cfg))

    assert sorted(got) == sorted(want), (
        "\n".join(f"G {l}" for l in sorted(got)[:8]) + "\n---\n"
        + "\n".join(f"W {l}" for l in sorted(want)[:8]))
