"""Sharded-vs-whole equivalence: mapping against genome shards and merging
must reproduce the whole-genome run (the reference's own correctness
criterion for mergesam, not_in_dist/MAPPING_QUALITIES Part 1c)."""
import io
import os

import numpy as np
import pytest

from shrimp_tpu.config import MapperConfig
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.io.sam import render_unpaired, sam_header
from shrimp_tpu.mapper import Mapper
from shrimp_tpu.tools.mergesam import merge_sam_files


def test_sharded_merge_equals_whole_unpaired(tmp_path):
    rng = np.random.default_rng(21)
    g1 = "".join(rng.choice(list("ACGT"), 30_000))
    g2 = "".join(rng.choice(list("ACGT"), 30_000))
    # cross-shard repeat: reads here map to both contigs
    g2 = g2[:10_000] + g1[5_000:5_300] + g2[10_300:]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(40):
        src = g1 if k % 2 == 0 else g2
        p = int(rng.integers(0, len(src) - 36))
        if k % 5 == 0:
            p = int(rng.integers(5_000, 5_264))  # repeat region
            src = g1
        r = src[p:p + 36]
        if k % 3 == 0:
            r = "".join(comp[c] for c in reversed(r))
        reads.append(SeqRecord(f"m{k}", r))

    cfg = MapperConfig()

    def run(contigs):
        idx = build_index(contigs, default_seeds())
        m = Mapper(idx, cfg)
        lines = sam_header(idx, "x", cfg)
        for re_, hits in m.map_unpaired(reads):
            for h in hits:
                lines.append(render_unpaired(re_, h, idx, cfg))
        return lines

    whole = run([("c1", encode.encode_ls(g1)), ("c2", encode.encode_ls(g2))])
    s1 = run([("c1", encode.encode_ls(g1))])
    s2 = run([("c2", encode.encode_ls(g2))])

    rpath = os.path.join(str(tmp_path), "reads.fa")
    with open(rpath, "w") as f:
        for r in reads:
            f.write(f">{r.name}\n{r.seq}\n")
    p1 = os.path.join(str(tmp_path), "s1.sam")
    p2 = os.path.join(str(tmp_path), "s2.sam")
    open(p1, "w").write("\n".join(s1) + "\n")
    open(p2, "w").write("\n".join(s2) + "\n")

    buf = io.StringIO()
    merge_sam_files(rpath, [p1, p2], buf)
    merged = [l for l in buf.getvalue().splitlines()
              if l and not l.startswith("@")]
    want = sorted(l for l in whole if not l.startswith("@"))
    got = sorted(merged)
    assert len(got) == len(want)
    for gl, wl in zip(got, want):
        _assert_equivalent(gl, wl)


def _assert_equivalent(gl: str, wl: str):
    """Identical up to the documented recombination quantization: Z fields
    re-encoded through 1/1000 neg-log ints may differ by 1 ulp, and the
    whole-genome run clamps mqv<4 to 0 (output.c:791) while mergesam's
    recombination does not."""
    gf, wf = gl.split("\t"), wl.split("\t")
    assert len(gf) == len(wf), f"\n got: {gl}\nwant: {wl}"
    for i, (a, b) in enumerate(zip(gf, wf)):
        if a == b:
            continue
        if i == 4:  # mapq
            ga, wb = int(a), int(b)
            ga0 = 0 if ga < 4 else ga
            assert abs(ga0 - wb) <= 1, f"mapq {ga} vs {wb}\n{gl}\n{wl}"
        elif a.startswith("Z") and b.startswith("Z"):
            assert a[:5] == b[:5]
            assert abs(int(a[5:]) - int(b[5:])) <= 2, \
                f"{a} vs {b}\n{gl}\n{wl}"
        else:
            raise AssertionError(f"field {i}: {a} vs {b}\n{gl}\n{wl}")


def test_sharded_merge_equals_whole_paired(tmp_path):
    """Paired recombination across genome shards (MAPPING_QUALITIES
    Part 2c: z3/z6 sums, z4 min-as-max in neg-log, insert-size
    renormalization) must reproduce the whole-genome paired run."""
    from shrimp_tpu.io.sam import render_pair_entry
    from shrimp_tpu.paired import PairedMapper
    rng = np.random.default_rng(77)
    g1 = "".join(rng.choice(list("ACGT"), 30_000))
    g2 = "".join(rng.choice(list("ACGT"), 30_000))
    g2 = g2[:10_000] + g1[5_000:5_400] + g2[10_400:]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def rc(s):
        return "".join(comp[c] for c in reversed(s))

    reads = []
    for k in range(40):
        src = g1 if k % 2 == 0 else g2
        isz = int(rng.integers(120, 260))
        p = int(rng.integers(0, len(src) - isz - 36))
        if k % 5 == 0:
            src, p = g1, int(rng.integers(5_000, 5_100))
        r1 = src[p:p + 36]
        r2 = rc(src[p + isz:p + isz + 36])
        if k % 7 == 3:   # scattered mate (half-paired candidates)
            q = int(rng.integers(0, len(g2) - 36))
            r2 = g2[q:q + 36]
        reads.append(SeqRecord(f"p{k}/1", r1))
        reads.append(SeqRecord(f"p{k}/2", r2))

    cfg = MapperConfig(pair_mode="opp-in")

    def run(contigs):
        idx = build_index(contigs, default_seeds())
        m = PairedMapper(idx, cfg)
        lines = sam_header(idx, "x", cfg)
        for pe in m.map_paired(reads):
            p_out, u_out = m.select_output(pe)
            lines.extend(render_pair_entry(pe, idx, cfg, p_out, u_out))
        return lines

    whole = run([("c1", encode.encode_ls(g1)),
                 ("c2", encode.encode_ls(g2))])
    s1 = run([("c1", encode.encode_ls(g1))])
    s2 = run([("c2", encode.encode_ls(g2))])

    rpath = os.path.join(str(tmp_path), "reads.fa")
    with open(rpath, "w") as f:
        for r in reads:
            f.write(f">{r.name}\n{r.seq}\n")
    p1 = os.path.join(str(tmp_path), "s1.sam")
    p2 = os.path.join(str(tmp_path), "s2.sam")
    open(p1, "w").write("\n".join(s1) + "\n")
    open(p2, "w").write("\n".join(s2) + "\n")

    buf = io.StringIO()
    merge_sam_files(rpath, [p1, p2], buf)

    def norm(lines):
        """mergesam re-renders unmapped partner records with both
        unmapped bits set and mate fields cleared (render.c:27-39);
        normalize the whole-genome run's hit_output form to match."""
        out = []
        for l in lines:
            if l.startswith("@"):
                continue
            f = l.split("\t")
            if int(f[1]) & 0x4:
                f = [f[0], str(int(f[1]) | 0xC), "*", "0", "0", "*",
                     "*", "0", "0", f[9], f[10]] + [
                    t for t in f[11:] if t[:2] in ("CQ", "CS", "RG", "R2")]
            out.append("\t".join(f))
        return sorted(out)

    got = norm(buf.getvalue().splitlines())
    want = norm(whole)
    assert len(got) == len(want), (
        f"{len(got)} vs {len(want)}\n" + "\n".join(got[:6])
        + "\n---\n" + "\n".join(want[:6]))
    for gl, wl in zip(got, want):
        _assert_equivalent(gl, wl)


def test_merge_matches_reference_mergesam(tmp_path):
    """Our merge must be byte-identical (sorted) to the reference
    mergesam binary on the same per-shard SAM inputs."""
    import subprocess
    from . import oracle
    if oracle.ensure_gmapper() is None:
        pytest.skip("reference toolchain unavailable")
    mergesam_bin = os.path.join(oracle.BUILD_DIR, "bin", "mergesam")
    if not os.path.exists(mergesam_bin):
        try:
            subprocess.run(["make", "bin/mergesam", "-j8"],
                           cwd=oracle.BUILD_DIR, check=True,
                           capture_output=True, timeout=600)
        except Exception:
            pytest.skip("reference mergesam build failed")
    from shrimp_tpu.io.sam import render_pair_entry
    from shrimp_tpu.paired import PairedMapper
    rng = np.random.default_rng(123)
    g1 = "".join(rng.choice(list("ACGT"), 25_000))
    g2 = "".join(rng.choice(list("ACGT"), 25_000))
    g2 = g2[:8_000] + g1[4_000:4_300] + g2[8_300:]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for k in range(30):
        src = g1 if k % 2 == 0 else g2
        isz = int(rng.integers(120, 260))
        p = int(rng.integers(0, len(src) - isz - 36))
        if k % 5 == 0:
            src, p = g1, int(rng.integers(4_000, 4_100))
        r1 = src[p:p + 36]
        r2 = "".join(comp[c] for c in
                     reversed(src[p + isz:p + isz + 36]))
        if k % 7 == 3:
            q = int(rng.integers(0, len(g2) - 36))
            r2 = g2[q:q + 36]
        reads.append(SeqRecord(f"q{k}/1", r1))
        reads.append(SeqRecord(f"q{k}/2", r2))
    cfg = MapperConfig(pair_mode="opp-in")

    def run(contigs):
        idx = build_index(contigs, default_seeds())
        m = PairedMapper(idx, cfg)
        lines = sam_header(idx, "x", cfg)
        for pe in m.map_paired(reads):
            p_out, u_out = m.select_output(pe)
            lines.extend(render_pair_entry(pe, idx, cfg, p_out, u_out))
        return lines

    s1 = run([("c1", encode.encode_ls(g1))])
    s2 = run([("c2", encode.encode_ls(g2))])
    r1path = os.path.join(str(tmp_path), "reads1.fa")
    with open(r1path, "w") as f:
        for r in reads[0::2]:
            f.write(f">{r.name}\n{r.seq}\n")
    rpath = os.path.join(str(tmp_path), "reads.fa")
    with open(rpath, "w") as f:
        for r in reads:
            f.write(f">{r.name}\n{r.seq}\n")
    p1 = os.path.join(str(tmp_path), "s1.sam")
    p2 = os.path.join(str(tmp_path), "s2.sam")
    open(p1, "w").write("\n".join(s1) + "\n")
    open(p2, "w").write("\n".join(s2) + "\n")

    res = subprocess.run([mergesam_bin, "-E", r1path, p1, p2],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-1000:]
    want = sorted(l for l in res.stdout.splitlines()
                  if l and not l.startswith("@"))
    buf = io.StringIO()
    merge_sam_files(rpath, [p1, p2], buf)
    got = sorted(l for l in buf.getvalue().splitlines()
                 if l and not l.startswith("@"))
    assert got == want, ("\n".join(got[:8]) + "\n---\n"
                         + "\n".join(want[:8]))


def test_merge_reads_gzipped_sam_inputs(tmp_path):
    """mergesam accepts gzipped SAM inputs (the reference reads all
    inputs through a gz-capable file_buffer, mergesam/file_buffer.c);
    output must be byte-identical to merging the plain files."""
    import gzip

    rng = np.random.default_rng(77)
    g1 = "".join(rng.choice(list("ACGT"), 20_000))
    g2 = "".join(rng.choice(list("ACGT"), 20_000))
    reads = []
    for k in range(20):
        src = g1 if k % 2 == 0 else g2
        p = int(rng.integers(0, len(src) - 36))
        reads.append(SeqRecord(f"z{k}", src[p:p + 36]))

    cfg = MapperConfig()

    def run(contigs):
        idx = build_index(contigs, default_seeds())
        m = Mapper(idx, cfg)
        lines = sam_header(idx, "x", cfg)
        for re_, hits in m.map_unpaired(reads):
            for h in hits:
                lines.append(render_unpaired(re_, h, idx, cfg))
        return lines

    s1 = run([("c1", encode.encode_ls(g1))])
    s2 = run([("c2", encode.encode_ls(g2))])

    rpath = os.path.join(str(tmp_path), "reads.fa.gz")
    with gzip.open(rpath, "wt") as f:
        for r in reads:
            f.write(f">{r.name}\n{r.seq}\n")
    plain = []
    gzed = []
    for i, s in enumerate((s1, s2)):
        p = os.path.join(str(tmp_path), f"s{i}.sam")
        open(p, "w").write("\n".join(s) + "\n")
        pz = p + ".gz"
        with gzip.open(pz, "wt") as f:
            f.write("\n".join(s) + "\n")
        plain.append(p)
        gzed.append(pz)

    buf_p, buf_z = io.StringIO(), io.StringIO()
    merge_sam_files(rpath, plain, buf_p)
    merge_sam_files(rpath, gzed, buf_z)
    assert buf_p.getvalue() == buf_z.getvalue()
    assert len([l for l in buf_p.getvalue().splitlines()
                if l and not l.startswith("@")]) >= 20
