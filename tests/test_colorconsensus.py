"""colorconsensus (tools/colorconsensus.py vs common/colorconsensus.c).

Output expectations were cross-checked against a binary compiled from
the untouched reference source: 25 random multi-read contigs produced
byte-identical (consensus, confidence) blocks.

Read convention (updateStates, colorconsensus.c:319-388): the CS read's
char 0 is the primer base; the molecule's first real base is
``read[0]^read[1]`` and lands at contig position ``pos`` (1-based).
Negative ``pos`` marks a reverse-strand read whose first molecule base
(revcomped) lands at ``-pos + readlen - 2``.
"""
import io

from shrimp_tpu.tools import colorconsensus as cc

LET = "TGCA"
BB = {c: i for i, c in enumerate(LET)}


def to_cs(s):
    """Primer-prefixed SOLiD encoding of molecule ``s``."""
    s = "T" + s
    return s[0] + "".join(str(BB[s[i - 1]] ^ BB[s[i]])
                          for i in range(1, len(s)))


def rc(s):
    comp = {"T": "A", "G": "C", "C": "G", "A": "T"}
    return "".join(comp[c] for c in reversed(s))


def test_clean_coverage_recovers_contig():
    contig = "TGCATTGGCCAA"
    reads = [(p + 1, to_cs(contig[p:p + 6]), None)
             for p in range(0, len(contig) - 6 + 1, 2)]
    cons, conf = cc.call_consensus(len(contig), reads)
    assert cons == contig
    assert all(c >= "1" for c in conf)


def test_reverse_strand_reads():
    contig = "AACCGGTTAACC"
    reads = [(-(p + 1), to_cs(rc(contig[p:p + 6])), None)
             for p in range(0, len(contig) - 6 + 1, 3)]
    cons, _ = cc.call_consensus(len(contig), reads)
    # position 0 is covered by a single read end: posterior below the
    # 0.9 gate (oracle calls it N too)
    assert cons[1:] == contig[1:]
    assert cons[0] in ("N", contig[0])


def test_single_read_tail_confidence():
    # oracle: "Contig c 10 / 1 T0000" -> TTNNNNNNNN, conf 3221000000
    cons, conf = cc.call_consensus(10, [(1, to_cs("TTTT"), None)])
    assert cons == "TTNNNNNNNN"
    assert conf == "3221000000"


def test_colour_error_outvoted():
    contig = "TGCATGCA"
    good = to_cs(contig)
    bad = list(good)
    bad[3] = str((int(bad[3]) + 1) % 4)
    reads = [(1, good, None)] * 3 + [(1, "".join(bad), None)]
    cons, _ = cc.call_consensus(len(contig), reads)
    assert cons == contig


def test_stream_format():
    contig = "TTGGCC"
    inp = (f"Contig c1 {len(contig)}\n"
           f"1 {to_cs(contig)}\n"
           f"1 {to_cs(contig)}\n"
           f"Contig c2 4\n"
           f"1 {to_cs('AAAA')}\n")
    out = io.StringIO()
    cc.main_stream(io.StringIO(inp), out)
    lines = out.getvalue().splitlines()
    assert lines[0] == f"c1 {len(contig)}"
    assert lines[1] == contig
    assert len(lines[2]) == len(contig)
    assert lines[3] == "c2 4"
    # single coverage: tail positions stay under the confidence gate
    assert lines[4] == "AANN"


def test_conf_level_gates_calls():
    contig = "TGCATGCA"
    reads = [(1, to_cs(contig), None)]
    strict, _ = cc.call_consensus(len(contig), reads,
                                  conf_level=0.9999999999)
    loose, _ = cc.call_consensus(len(contig), reads, conf_level=0.5)
    assert "N" in strict
    assert loose == contig
