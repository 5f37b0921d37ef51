"""Helicos DAG aligner (tools/dag.py vs common/dag_align.cpp).

Expected values below were produced by a harness compiled from the
untouched reference sources (dag_setup(2,-100,-1,11,-10,4,-5,5,-6,-6),
i.e. the documented historical defaults); the full fuzz (60 random
cases, kmers + score + start/end + alignment strings) matched
identically.
"""
from shrimp_tpu.tools import dag


def test_identical_reads_kmers_are_substrings():
    kg = dag.build_kmer_graph("ACGTACGT", "ACGTACGT", 0)
    got = dag.get_kmers(kg, 4)
    want = sorted({"ACGTACGT"[i:i + 4] for i in range(5)})
    assert got == want


def test_reference_case_alignment():
    # oracle: ACGTACGT / ACGAACGT eps=4, genome TTACGTACGTTT
    kg = dag.build_kmer_graph("ACGTACGT", "ACGAACGT", 4)
    al = dag.build_alignment("TTACGTACGTTT", kg)
    assert (al.score, al.start_index, al.end_index) == (76, 2, 9)
    assert al.sequence == "ACG_TACGT"
    assert al.read1 == "ACG_TACGT"
    assert al.read2 == "ACGA_ACGT"


def test_epsilon_widens_kmer_set():
    k0 = dag.get_kmers(dag.build_kmer_graph("ACGTAC", "ACTTAC", 0), 3)
    k8 = dag.get_kmers(dag.build_kmer_graph("ACGTAC", "ACTTAC", 8), 3)
    assert set(k0) <= set(k8)
    assert len(k8) >= len(k0)


def test_mismatching_reads_kmer_set_matches_reference():
    # reads disagree at one base; with the default read_mismatch=-100
    # the best co-alignments route the disagreement through paired
    # gap columns, so both letters appear on separate paths
    # (oracle output for eps=8, k=5)
    kg = dag.build_kmer_graph("AAGAA", "AATAA", 8)
    kmers = dag.get_kmers(kg, 5)
    assert "AAGAA" in kmers and "AATAA" in kmers
    assert len(kmers) == 30 and kmers[0] == "AAAAG"


def test_column_consensus_tie_order():
    # ties resolve in A,C,G,T,_ scan order (dag_align.cpp:100-136)
    assert dag._consensus("GT") == "G"
    assert dag._consensus("TG") == "G"
    assert dag._consensus("A_") == "A"
    assert dag._consensus("__") == "_"
    assert dag._consensus("T_") == "T"  # letter beats an equal gap count
    assert dag._consensus("T__") == "_"


def test_local_alignment_clips_genome():
    kg = dag.build_kmer_graph("CCCC", "CCCC", 0)
    al = dag.build_alignment("TTTTCCCCTTTT", kg)
    assert (al.start_index, al.end_index) == (4, 7)
    assert al.score == 4 * dag.DEF_DAG_MATCH
    assert al.sequence == al.read1 == al.read2 == "CCCC"


def test_deletion_in_one_pass():
    # read2 lost one letter; DAG column at that position is (T, _) and
    # the genome T scores S_MATCH_DELETION through the LETTERGAP rule
    kg = dag.build_kmer_graph("ACGTACG", "ACGACG", 0)
    al = dag.build_alignment("ACGTACG", kg)
    assert al.score == 6 * dag.DEF_DAG_MATCH + dag.DEF_DAG_MATCH_DELETION
    assert al.read2.replace("_", "") == "ACGACG"


def test_statistics_accumulate():
    before = dag.get_statistics().kmers_invocations
    kg = dag.build_kmer_graph("ACGT", "ACGT", 0)
    # oracle: kmers ending at the terminal node are not flushed
    # (Graph::getkmers deletes aux before the last node's turn), so
    # k=2 on a 4-letter chain yields exactly {AC, CG}
    assert dag.get_kmers(kg, 2) == ["AC", "CG"]
    after = dag.get_statistics()
    assert after.kmers_invocations == before + 1
    assert after.kmers_total_kmers >= before + 2
