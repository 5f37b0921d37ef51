"""Multi-round option-set DSL (--unpaired-options / --paired-options,
gmapper.c:1589-1718 parsing, :2184-2220 CLI handling, mapping.c:1773-1850
handle_read loop, :2502-2636 handle_readpair loop)."""
import numpy as np
import pytest

from shrimp_tpu.config import (MapperConfig, parse_paired_options_arg,
                               parse_read_mapping_options,
                               parse_unpaired_options_arg)
from shrimp_tpu.core import encode
from shrimp_tpu.index.build import build_index
from shrimp_tpu.index.seeds import default_seeds
from shrimp_tpu.io import sam
from shrimp_tpu.io.fasta import SeqRecord
from shrimp_tpu.mapper import Mapper
from shrimp_tpu.paired import PairedMapper

from . import oracle
from .test_e2e_paired import make_paired_dataset
from .test_e2e_unpaired import make_dataset

# a transliteration of the built-in unpaired defaults
DSL_DEFAULT = "0;1/1,1,1/1,0,2,55.0/1,50.0,90.0,2,0,30/50.0,0,0,10/0"
# strict first round that stops only on a >=92% hit
DSL_STRICT = "0;1/1,1,1/1,0,2,60.0/1,55.0,90.0,2,0,30/55.0,0,0,10/1,92.0"
# sensitive second round
DSL_LOOSE = "0;1/1,1,1/1,0,1,40.0/1,35.0,90.0,1,0,40/35.0,0,0,20/0"
# second round reusing the first round's hit list (recompute=false)
DSL_REUSE = "0;0/0/0/1,35.0,90.0,1,0,40/35.0,0,0,20/0"


def test_parse_threshold_convention():
    # bare integers are absolute (negated), '%'/'.' mark percentages
    ro = parse_read_mapping_options(
        "1/1,1,0/1,0,2,5000/1,55%,90.0,2,0,30/50.0,0,0,10/0", False)
    assert ro.hit_list.threshold == -5000.0      # absolute
    assert ro.pass1.threshold == 55.0            # percent
    assert ro.pass1.window_overlap == 90.0
    assert ro.pass1.num_outputs == 30
    assert ro.pass2.stop_count == 0


def test_parse_paired_arg():
    po = parse_paired_options_arg(
        "opp-in,0,1000,30,50.0,10,50.0,1,90.0,0,1"
        ";1/1,1,1,0/1,0,2,55.0/1,50.0,90.0,2,0,1/25.0"
        ";1/1,1,1,0/1,0,2,55.0/1,50.0,90.0,2,0,1/25.0")
    assert po.pairing.pair_mode == "opp-in"
    assert po.pairing.stop_count == 1 and po.pairing.stop_threshold == 90.0
    assert po.pairing.save_outputs is True
    assert po.read[0].pass1.only_paired is True
    assert po.read[0].pass1.num_outputs == 30
    assert po.read[1].pass2.threshold == 25.0
    nip, ro = parse_unpaired_options_arg(DSL_REUSE)
    assert nip == 0 and not ro.hit_list.recompute and ro.pass1.recompute


def _our_sam(idx, recs, custom):
    cfg = MapperConfig(custom_unpaired_options=tuple(custom))
    m = Mapper(idx, cfg)
    if len(custom) > 1:
        assert m.multi_round
    lines = []
    for re_, hits in m.map_unpaired(recs):
        for h in hits:
            lines.append(sam.render_unpaired(re_, h, m.index, cfg))
    return lines


def _noisy_reads(g, rng, n=60, L=50):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for i in range(n):
        p = int(rng.integers(0, len(g) - L))
        s = list(g[p:p + L])
        for _ in range(int(rng.integers(2, 9))):
            s[int(rng.integers(L))] = str(rng.choice(list("ACGT")))
        if rng.random() < 0.5:
            s = [comp[c] for c in reversed(s)]
        out.append((f"n{i:03d}", "".join(s)))
    return out


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_unpaired_dsl_default_matches(tmp_path):
    gpath, rpath, g, reads = make_dataset(str(tmp_path), n_reads=60)
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "--unpaired-options", DSL_DEFAULT, rpath, gpath]))
    idx = build_index([("chr_test", encode.encode_ls(g))], default_seeds())
    got = _our_sam(idx, [SeqRecord(n, s) for n, s in reads], [DSL_DEFAULT])
    assert got == want and got


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
@pytest.mark.parametrize("second", [DSL_LOOSE, DSL_REUSE])
def test_unpaired_multiround_matches(tmp_path, second):
    gpath, rpath, g, _ = make_dataset(str(tmp_path), n_reads=10)
    rng = np.random.default_rng(31)
    reads = _noisy_reads(g, rng)
    rpath2 = str(tmp_path / "noisy.fa")
    with open(rpath2, "w") as f:
        for n, s in reads:
            f.write(f">{n}\n{s}\n")
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "--unpaired-options", DSL_STRICT,
         "--unpaired-options", second, rpath2, gpath]))
    idx = build_index([("chr_test", encode.encode_ls(g))], default_seeds())
    got = _our_sam(idx, [SeqRecord(n, s) for n, s in reads],
                   [DSL_STRICT, second])
    # the fallthrough re-emits reads mapped below the stop threshold, so
    # output order (round-major per read) matters: compare unsorted
    assert got == want and got


PD_STOP = ("opp-in,0,1000,30,50.0,10,50.0,1,90.0,0,1"
           ";1/1,1,1,0/1,0,2,55.0/1,50.0,90.0,2,0,1/25.0"
           ";1/1,1,1,0/1,0,2,55.0/1,50.0,90.0,2,0,1/25.0")
U_LEG0 = "0;0/0/0/1,50.0,90.0,2,0,30/50.0,0,1,10/0"
U_LEG1 = "1;0/0/0/1,50.0,90.0,2,0,30/50.0,0,1,10/0"


@pytest.mark.skipif(oracle.ensure_gmapper() is None,
                    reason="reference gmapper not available")
def test_paired_dsl_with_fallback_matches(tmp_path):
    gpath, rpath, g, reads = make_paired_dataset(str(tmp_path),
                                                 mode="opp-in")
    want = oracle.sam_body(oracle.run_gmapper(
        ["-E", "--paired-options", PD_STOP,
         "--unpaired-options", U_LEG0, "--unpaired-options", U_LEG1,
         rpath, gpath]))
    idx = build_index([("chrP", encode.encode_ls(g))], default_seeds())
    cfg = MapperConfig(pair_mode="opp-in",
                       custom_paired_options=(PD_STOP,),
                       custom_unpaired_options=(U_LEG0, U_LEG1),
                       half_paired=True)
    m = PairedMapper(idx, cfg)
    pairs = m.map_paired([SeqRecord(n, s) for n, s in reads])
    got = []
    for pe in pairs:
        paired_out, unpaired_out = m.select_output(pe)
        got.extend(sam.render_pair_entry(pe, idx, cfg, paired_out,
                                         unpaired_out))
    assert got == want and got
