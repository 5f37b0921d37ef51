"""Unit tests for encoding and the CSR seed index."""
import numpy as np

from shrimp_tpu import constants as C
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import GenomeIndex, build_index
from shrimp_tpu.index.seeds import Seed, default_seeds, kmer_mapidx


def test_encode_roundtrip():
    s = "ACGTNRYacgt"
    codes = encode.encode_ls(s)
    assert encode.decode_ls(codes) == "ACGTNRYACGT"


def test_revcomp():
    codes = encode.encode_ls("ACGTN")
    assert encode.decode_ls(encode.revcomp_ls(codes)) == "NACGT"


def test_ls_to_cs():
    # colours: T->A=3, A->C=1, C->G=3, G->T=1
    codes = encode.encode_ls("ACGT")
    np.testing.assert_array_equal(encode.ls_to_cs(codes), [3, 1, 3, 1])


def test_mapidx_layout():
    # seed "11", kmer "AC": mapidx = C*4 + A = 4 (kmer start in low bits)
    codes = encode.encode_ls("AC")
    m = kmer_mapidx(codes, np.array([0]), Seed("11"))
    assert m[0] == 4


def test_index_matches_bruteforce():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 5000).astype(np.uint8)
    g[100:120] = C.BASE_N  # N block
    seeds = default_seeds()
    idx = build_index([("c1", g)], seeds)
    for si in idx.seeds:
        seed = si.seed
        span = seed.span
        # brute force: every window without N
        for trial in range(200):
            p = int(rng.integers(0, len(g) - span))
            window = g[p:p + span]
            if (window == C.BASE_N).any():
                continue
            key = int(kmer_mapidx(g, np.array([p]), seed)[0])
            lst = si.positions[si.offsets[key]:si.offsets[key + 1]]
            assert p in lst
        # lists are sorted ascending
        for key in rng.integers(0, seed.n_mapidx, 50):
            lst = si.positions[si.offsets[key]:si.offsets[key + 1]]
            assert (np.diff(lst.astype(np.int64)) > 0).all()


def test_index_save_load(tmp_path):
    rng = np.random.default_rng(8)
    g = rng.integers(0, 4, 2000).astype(np.uint8)
    g2 = rng.integers(0, 4, 1500).astype(np.uint8)
    idx = build_index([("c1", g), ("c2", g2)], default_seeds())
    path = str(tmp_path / "test.idx.npz")
    idx.save(path)
    idx2 = GenomeIndex.load(path)
    assert idx2.contig_names == ["c1", "c2"]
    np.testing.assert_array_equal(idx.codes, idx2.codes)
    np.testing.assert_array_equal(idx.codes_rc, idx2.codes_rc)
    for a, b in zip(idx.seeds, idx2.seeds):
        np.testing.assert_array_equal(a.offsets, b.offsets)
        np.testing.assert_array_equal(a.positions, b.positions)


def test_contig_of():
    g = np.zeros(100, np.uint8)
    g2 = np.ones(50, np.uint8)
    idx = build_index([("a", g), ("b", g2)], [Seed("111")])
    np.testing.assert_array_equal(idx.contig_of(np.array([0, 99, 100, 149])),
                                  [0, 0, 1, 1])


def test_index_mmap_roundtrip(tmp_path):
    import os

    import numpy as np

    from shrimp_tpu.core import encode
    from shrimp_tpu.index.build import GenomeIndex, build_index
    from shrimp_tpu.index.seeds import default_seeds
    rng = np.random.default_rng(9)
    seq = "".join(rng.choice(list("ACGT"), 4000))
    idx = build_index([("c", encode.encode_ls(seq))], default_seeds())
    d = os.path.join(str(tmp_path), "img")
    idx.save_mmap(d)
    back = GenomeIndex.load_mmap(d)
    assert np.array_equal(back.codes, idx.codes)
    assert np.array_equal(back.codes_rc, idx.codes_rc)
    assert back.contig_names == idx.contig_names
    for a, b in zip(back.seeds, idx.seeds):
        assert a.seed.mask_string == b.seed.mask_string
        assert np.array_equal(np.asarray(a.positions), b.positions)
