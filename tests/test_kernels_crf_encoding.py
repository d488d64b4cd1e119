"""Pins for the round-2 kernels: W6 split-list, W4 pointer-matrix
decode, P8 one/multi-hot, M7 constrained Viterbi."""

import pytest

from rex_spark.kernels.crf import (
    allowed_transitions,
    constrained_viterbi,
    is_transition_allowed,
    viterbi_tags,
)
from rex_spark.kernels.positions import (
    decode_pointer_matrix,
    multi_hot,
    one_hot,
)
from rex_spark.kernels.tagging import count_illegal_tags, decode_tag_seq
from rex_spark.kernels.textnorm import split_list_by_element


def test_split_list_reference_vectors():
    """Exact vectors from the reference's tests/utils/test_segmentation.py."""
    case = [1, 2, 1, 4, 5, 6, 1, 7, 1]
    assert split_list_by_element(case, 1) == [[2], [4, 5, 6], [7]]
    assert split_list_by_element(case, 1, keep_empty_segments=True) == [
        [], [2], [4, 5, 6], [7], [],
    ]
    # quirks: no delimiter -> whole list unfiltered (even empty)
    assert split_list_by_element([2, 3], 1) == [[2, 3]]
    assert split_list_by_element([], 1) == [[]]
    assert split_list_by_element([1], 1) == []
    assert split_list_by_element([1], 1, keep_empty_segments=True) == [[], []]


def test_decode_pointer_matrix():
    """rex/utils/position.py:119-132 semantics: (s, e+1, cls) per
    nonzero cell, torch-nonzero (row-major) order, offset applied."""
    mat = [
        [[0, 1, 0], [0, 0, 0], [0, 0, 1]],   # cls 0: (0,1)=1, (2,2)=1
        [[0, 0, 0], [0, 1, 1], [0, 0, 0]],   # cls 1: (1,1)=1, (1,2)=1
    ]
    assert decode_pointer_matrix(mat) == [
        (0, 2, 0), (2, 3, 0), (1, 2, 1), (1, 3, 1),
    ]
    assert decode_pointer_matrix(mat, offset=1) == [
        (-1, 1, 0), (1, 2, 0), (0, 1, 1), (0, 2, 1),
    ]
    assert decode_pointer_matrix([]) == []


def test_one_multi_hot():
    """rex/data/label_encoder.py:59-68 semantics."""
    assert one_hot(2, 5) == [0, 0, 1, 0, 0]
    assert multi_hot([0, 3], 5) == [1, 0, 0, 1, 0]
    assert multi_hot([], 5) == [0] * 5
    assert multi_hot([1, 1, 1], 5) == [0, 1, 0, 0, 0]


# -- M7 constrained Viterbi --------------------------------------------------

BIO = ["O", "B-ENT", "I-ENT"]


def test_allowed_transitions_bio():
    """Spot-pins of the legality mask vs rex/modules/crf.py:107-119."""
    labels = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG"]
    allowed = set(allowed_transitions("BIO", labels))
    start, end = 5, 6
    assert (start, 0) in allowed and (start, 1) in allowed
    assert (start, 2) not in allowed            # cannot start with I
    assert (1, 2) in allowed                    # B-PER -> I-PER
    assert (1, 4) not in allowed                # B-PER -> I-ORG illegal
    assert (0, 2) not in allowed                # O -> I-PER illegal
    assert (2, 2) in allowed                    # I-PER -> I-PER
    assert (2, end) in allowed and (0, end) in allowed
    # entity parsing keeps the dash on both sides (crf.py:36-49)
    assert is_transition_allowed("BIO", "B", "-PER", "I", "-PER")
    assert not is_transition_allowed("BIO", "B", "-PER", "I", "-ORG")


def test_allowed_transitions_bmes():
    labels = ["B-X", "M-X", "E-X", "S-X"]
    allowed = set(allowed_transitions("BMES", labels))
    start, end = 4, 5
    assert (start, 0) in allowed and (start, 3) in allowed
    assert (start, 1) not in allowed and (start, 2) not in allowed
    assert (0, 1) in allowed and (1, 2) in allowed   # B->M, M->E
    assert (2, 0) in allowed and (3, 3) in allowed   # E->B, S->S
    assert (0, 0) not in allowed                     # B->B illegal
    assert (2, end) in allowed and (0, end) not in allowed


def test_viterbi_repairs_illegal_greedy():
    """Greedy argmax starts runs with I (illegal); the constrained path
    must open with B and the repaired sequence must decode cleanly."""
    em_flag = [-5.0, 0.9, 1.0]   # O, B, I — greedy picks I
    em_plain = [1.0, -5.0, -5.0]
    emissions = [em_plain, em_flag, em_flag, em_flag, em_plain, em_flag]
    tags = viterbi_tags(emissions, BIO)
    assert tags == ["O", "B-ENT", "I-ENT", "I-ENT", "O", "B-ENT"]
    assert count_illegal_tags(tags) == 0
    # decode agrees with the flag runs
    spans = decode_tag_seq(list("abcdef"), tags)
    assert [(s, e) for _, _, (s, e) in spans] == [(1, 4), (5, 6)]


def test_viterbi_equals_greedy_when_legal():
    """On emissions whose greedy path is already legal, the constrained
    decode returns exactly the greedy path."""
    legal = [
        [1.0, 0.0, -1.0],   # O
        [0.0, 2.0, -1.0],   # B
        [0.0, 0.5, 2.0],    # I
        [3.0, 0.0, 0.0],    # O
    ]
    greedy = [max(range(3), key=lambda t: (row[t], -t)) for row in legal]
    assert constrained_viterbi(legal, BIO) == greedy
    assert count_illegal_tags([BIO[t] for t in greedy]) == 0


def test_viterbi_output_always_legal_fuzz():
    """Random emissions never produce an illegal sequence (the
    ConstraintCRF guarantee the plain decode lacks)."""
    import random

    rng = random.Random(1227)
    labels = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG"]
    for _ in range(200):
        n = rng.randint(1, 12)
        em = [[rng.uniform(-2, 2) for _ in labels] for _ in range(n)]
        tags = viterbi_tags(em, labels)
        assert count_illegal_tags(tags) == 0, (em, tags)


def test_viterbi_bmes_scheme():
    labels = ["B-X", "M-X", "E-X", "S-X"]
    # single position: must be S (B cannot reach END)
    assert viterbi_tags([[9.0, 0.0, 0.0, 1.0]], labels, "BMES") == ["S-X"]
    # two positions favoring M everywhere -> B E is the only legal shape
    em = [[0.0, 5.0, 0.0, -1.0]] * 2
    assert viterbi_tags(em, labels, "BMES") == ["B-X", "E-X"]


def test_viterbi_unknown_scheme():
    with pytest.raises(ValueError):
        constrained_viterbi([[0.0]], ["O"], "NOPE")
