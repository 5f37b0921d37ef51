"""Multi-host distribution (parallel/dist.py): 2 jax.distributed
processes x 4 virtual CPU devices each, per-process sub-indexes only
(no process holds more than half the genome's CSR), cross-host window
allgather + z1 psum over the global mesh. Rank 0's ordered SAM must be
byte-identical to the single-process whole-index run — the reference's
own correctness criterion for its multi-machine split/merge workflow
(/root/reference/SPLITTING_AND_MERGING:1-160, README:281-303).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CLEN = 16 * 2048          # region-aligned (see test_sharded_index)
COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def make_dataset():
    """Deterministic 8-contig genome + 200 reads, shared between the
    oracle run here and the distributed workers."""
    from shrimp_tpu.core import encode
    from shrimp_tpu.io.fasta import SeqRecord
    rng = np.random.default_rng(331)
    contigs, gs = [], []
    for c in range(8):
        g = "".join(rng.choice(list("ACGT"), CLEN))
        gs.append(g)
        contigs.append((f"chr{c}", encode.encode_ls(g)))
    reads = []
    for k in range(200):
        src = gs[k % len(gs)]
        p = int(rng.integers(0, len(src) - 36))
        r = list(src[p:p + 36])
        for _ in range(int(rng.integers(0, 3))):
            r[int(rng.integers(0, 36))] = "ACGT"[int(rng.integers(0, 4))]
        r = "".join(r)
        if k % 3 == 0:
            r = "".join(COMP[c] for c in reversed(r))
        reads.append(SeqRecord(f"dr{k}", r))
    return contigs, reads


def make_paired_dataset():
    """8-contig genome + 120 opp-in pairs (1 in 9 discordant, so the
    half-paired fallback and leg-prior classes are exercised)."""
    from shrimp_tpu.core import encode
    from shrimp_tpu.io.fasta import SeqRecord
    rng = np.random.default_rng(733)
    contigs, gs = [], []
    for c in range(8):
        g = "".join(rng.choice(list("ACGT"), CLEN))
        gs.append(g)
        contigs.append((f"chr{c}", encode.encode_ls(g)))
    reads = []
    for k in range(120):
        src = gs[k % len(gs)]
        isz = int(rng.integers(90, 200))
        p = int(rng.integers(0, len(src) - isz - 1))
        r1 = src[p:p + 36]
        r2 = "".join(COMP[c]
                     for c in reversed(src[p + isz - 36:p + isz]))
        if k % 9 == 0:
            q = int(rng.integers(0, len(src) - 36))
            r2 = src[q:q + 36]
        reads.append(SeqRecord(f"dp{k}/1", r1))
        reads.append(SeqRecord(f"dp{k}/2", r2))
    return contigs, reads


def _run_workers(tmp_path, mode):
    port = 11000 + (os.getpid() * 7 + (1 if mode == "paired" else 0)) \
        % 20000
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    outs = [str(tmp_path / f"w{mode}{p}.sam") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "dist_worker.py"),
         str(p), "2", str(port), outs[p], mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    logs = []
    for pr in procs:
        try:
            so, se = pr.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((pr.returncode, so.decode(), se.decode()[-3000:]))
    for rc, so, se in logs:
        assert rc == 0, f"worker failed rc={rc}\n{so}\n{se}"
    return outs


def test_two_process_dist_paired_byte_identical(tmp_path):
    """Paired multi-host: each process owns 4 of 8 sub-indexes, the
    paired class statistics (z1/z2/z3/insert denominator, z4 leg
    priors, pair prior) merge via the zpair collective over the global
    mesh, and both ranks' SAM is byte-identical to the single-process
    whole-index paired run."""
    from shrimp_tpu.config import MapperConfig
    from shrimp_tpu.fastpath import map_paired_sam_stream
    from shrimp_tpu.index.build import build_index
    from shrimp_tpu.index.seeds import default_seeds
    from shrimp_tpu.paired import PairedMapper
    contigs, reads = make_paired_dataset()
    idx = build_index(contigs, default_seeds())
    cfg = MapperConfig(pair_mode="opp-in", min_insert_size=60,
                       max_insert_size=240)
    want = b"".join(map_paired_sam_stream(PairedMapper(idx, cfg), reads,
                                          batch_size=100, lanes=1))
    outs = _run_workers(tmp_path, "paired")
    assert open(outs[0], "rb").read() == want
    assert open(outs[1], "rb").read() == want
    meta = json.load(open(outs[0] + ".meta"))
    assert meta["z1_max"] > 0.0   # the cross-host zpair psum ran


def test_two_process_dist_byte_identical(tmp_path):
    # oracle: single-process whole-index fast path
    from shrimp_tpu.config import MapperConfig
    from shrimp_tpu.fastpath import map_unpaired_sam_stream
    from shrimp_tpu.index.build import build_index
    from shrimp_tpu.index.seeds import default_seeds
    from shrimp_tpu.mapper import Mapper
    contigs, reads = make_dataset()
    idx = build_index(contigs, default_seeds())
    cfg = MapperConfig()
    want = b"".join(map_unpaired_sam_stream(Mapper(idx, cfg), reads,
                                            batch_size=100, lanes=1))

    port = 11000 + os.getpid() % 20000
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    outs = [str(tmp_path / f"w{p}.sam") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "dist_worker.py"),
         str(p), "2", str(port), outs[p]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    logs = []
    for pr in procs:
        try:
            so, se = pr.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((pr.returncode, so.decode(), se.decode()[-3000:]))
    for rc, so, se in logs:
        assert rc == 0, f"worker failed rc={rc}\n{so}\n{se}"

    got0 = open(outs[0], "rb").read()
    got1 = open(outs[1], "rb").read()
    assert got0 == want           # rank 0 byte-identical to whole run
    assert got1 == want           # every rank renders the same bytes
    meta = json.load(open(outs[0] + ".meta"))
    assert meta["z1_max"] > 0.0   # the cross-host psum really ran
