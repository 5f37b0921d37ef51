"""Batched candidate generation must match the per-read reference path."""
import numpy as np

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.mapper import Mapper


def test_batched_hit_lists_match_per_read():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 200_000).astype(np.uint8)
    # plant some repeats to exercise collapse/region logic
    g[50_000:50_200] = g[10_000:10_200]
    g[120_000:120_100] = g[10_000:10_100]
    idx = build_index([("c1", g[:150_000]), ("c2", g[150_000:])],
                      default_seeds())
    comp = np.array([3, 2, 1, 0], np.uint8)
    recs = []
    for k in range(80):
        p = int(rng.integers(0, 200_000 - 36))
        src = g
        r = src[p:p + 36].copy()
        for _ in range(int(rng.integers(0, 4))):
            r[int(rng.integers(36))] = rng.integers(4)
        if k % 2:
            r = comp[r[::-1]]
        recs.append(SeqRecord(f"r{k}", encode.decode_ls(r)))

    m = Mapper(idx, MapperConfig())
    entries = [m.prepare_read(r) for r in recs]
    batched = m.hit_lists_batched(entries)
    for e, got2 in zip(entries, batched):
        want2 = m.hit_lists(e)
        for st in (0, 1):
            got, want = got2[st], want2[st]
            assert got.n == want.n, (e.name, st, got.n, want.n)
            for field in ("cn", "g_off", "w_len", "score_window_gen",
                          "matches", "score_max", "ax", "ay", "alen",
                          "awid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, field), np.int64),
                    np.asarray(getattr(want, field), np.int64),
                    err_msg=f"{e.name} st={st} field={field}")
