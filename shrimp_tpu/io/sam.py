"""SAM emission, mirroring gmapper's hit_output (gmapper/output.c:227-774).

String assembly is host-side work in both designs; the numbers flowing in
come from the device kernels.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .. import constants as C
from ..config import MapperConfig
from ..core.sw_np import BACK_DELETION, BACK_INSERTION, BACK_MATCH_MISMATCH
from ..index.build import GenomeIndex
from ..mapper import Hit, ReadEntry, double_to_neglog

_COMP = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N",
         "a": "t", "t": "a", "c": "g", "g": "c", "n": "n", "-": "-"}


def sam_header(index: GenomeIndex, command_line: str,
               cfg: Optional[MapperConfig] = None,
               version: str = "2.2.3") -> List[str]:
    """gmapper.c:2968-3014."""
    lines = ["@HD\tVN:1.0\tSO:unsorted"]
    for name, ln in zip(index.contig_names, index.contig_lengths):
        lines.append(f"@SQ\tSN:{name}\tLN:{ln}")
    if cfg is not None and cfg.read_group_name is not None:
        lines.append(f"@RG\tID:{cfg.read_group_name}"
                     f"\tSM:{cfg.sam_sample_name or cfg.read_group_name}")
    lines.append(f"@PG\tID:gmapper\tVN:{version}\tCL:{command_line}")
    return lines


def _clean_seq(seq: str) -> str:
    """output.c:326-352: uppercase, wobble codes -> N."""
    out = []
    for ch in seq:
        c = ch.upper()
        if c in "RYSWKMBDHV":
            c = "N"
        out.append(c)
    return "".join(out)


def _revcomp_str(s: str) -> str:
    return "".join(_COMP.get(c, "N") for c in reversed(s))


def cigar_ops(h: Hit, read_len: int) -> List[Tuple[int, str]]:
    """make_cigar (output.c:15-64): ops from the backtrace, plus S clips."""
    read_start1 = h.read_start + 1
    read_end1 = read_start1 + h.rmapped - 1
    out: List[Tuple[int, str]] = []
    if read_start1 > 1:
        out.append((read_start1 - 1, "S"))
    ops = h.ops if h.ops is not None else np.zeros(0, np.int8)
    i = 0
    n = len(ops)
    opmap = {BACK_DELETION: "I", BACK_INSERTION: "D",
             BACK_MATCH_MISMATCH: "M"}
    while i < n:
        o = ops[i]
        j = i
        while j + 1 < n and ops[j + 1] == o:
            j += 1
        out.append((j - i + 1, opmap[int(o)]))
        i = j + 1
    if read_end1 != read_len:
        out.append((read_len - read_end1, "S"))
    return out


def render_unpaired(re: ReadEntry, h: Optional[Hit], index: GenomeIndex,
                    cfg: MapperConfig, fastq: bool = False) -> str:
    """SAM line for an unpaired read (hit_output, output.c:296-761)."""
    qname = re.name
    if h is None:
        # unmapped record (output.c:417-473)
        seq = (_clean_seq(re.seq) if cfg.mode == C.MODE_LETTER_SPACE
               else "*")
        qual = "*"
        if fastq and cfg.mode == C.MODE_LETTER_SPACE and re.qual:
            qual = _requal(re.qual, cfg.qual_delta)
        fields = [qname, "4", "*", "0", "0", "*", "*", "0", "0", seq, qual]
        line = "\t".join(fields)
        if cfg.mode == C.MODE_COLOUR_SPACE:
            line += f"\tCQ:Z:{re.qual if fastq and re.qual else '*'}"
            line += f"\tCS:Z:{re.seq}"
        if cfg.read_group_name:
            line += f"\tRG:Z:{cfg.read_group_name}"
        return line

    reverse_strand = h.gen_st == 1
    rname = index.contig_names[h.cn]
    genome_length = int(index.contig_lengths[h.cn])
    read_start1 = h.read_start + 1
    read_end1 = read_start1 + h.rmapped - 1

    if cfg.mode == C.MODE_LETTER_SPACE:
        seq = _clean_seq(re.seq)
        if reverse_strand:
            seq = _revcomp_str(seq)
    else:
        seq = "*"

    qual = "*"
    if fastq and cfg.mode == C.MODE_LETTER_SPACE and re.qual:
        q = re.qual[::-1] if reverse_strand else re.qual
        qual = _requal(q, cfg.qual_delta)

    cig = cigar_ops(h, re.read_len)
    if cfg.mode == C.MODE_COLOUR_SPACE:
        cig = [(n, "H" if op == "S" else op) for n, op in cig]
    if reverse_strand:
        cig = cig[::-1]
    cigar = "".join(f"{n}{op}" for n, op in cig)

    if not reverse_strand:
        pos = h.genome_start + 1
    else:
        right_most = genome_length - h.genome_start
        pos = right_most - (read_end1 - read_start1 - h.deletions
                            + h.insertions)

    flag = 0x10 if reverse_strand else 0
    mapq = h.mqv if h.mqv != 255 else 255
    fields = [qname, str(flag), rname, str(pos), str(mapq), cigar, "*",
              "0", "0", seq, qual]
    line = "\t".join(fields)
    line += f"\tAS:i:{h.score_full}"
    if cfg.compute_mapping_qualities and not cfg.all_contigs:
        line += (f"\tZ0:i:{double_to_neglog(h.z0)}"
                 f"\tZ1:i:{double_to_neglog(h.z1)}")
    line += f"\tNM:i:{h.mismatches + h.deletions + h.insertions}"
    if cfg.read_group_name:
        line += f"\tRG:Z:{cfg.read_group_name}"
    return line


def _requal(qual: str, qual_delta: int) -> str:
    """Rescale quality string to PHRED+33 (output.c:562-568)."""
    if qual_delta == 33:
        return qual
    return "".join(chr(ord(c) - qual_delta + 33) for c in qual)
