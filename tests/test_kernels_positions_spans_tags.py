"""Kernel tests: positions (pinned by reference tests/utils/test_position.py),
span pairing (tests/utils/test_span.py), tag decode (rex/utils/tagging.py
semantics), metrics (tests/metrics/test_prf1.py)."""

import pytest

from rex_spark.kernels.metrics import accuracy, measure_triple, prf1, safe_division
from rex_spark.kernels.positions import (
    find_all_positions,
    find_element_in_list,
    pair_start_end,
    relative_positions,
)
from rex_spark.kernels.spans import (
    find_closest_span_pairs,
    find_closest_span_pairs_with_index,
)
from rex_spark.kernels.tagging import count_illegal_tags, decode_tag_seq


def test_find_all_positions_str_and_list():
    assert find_all_positions("123123123", "123") == [(0, 3), (3, 6), (6, 9)]
    assert find_all_positions(["123", "1234", "12345"], ["123"]) == [(0, 1)]
    assert find_all_positions("aaaa", "aa") == [(0, 2), (1, 3), (2, 4)]  # overlaps
    with pytest.raises(ValueError):
        find_all_positions("ab", "abc")
    with pytest.raises(TypeError):
        find_all_positions("abc", ["a"])


def test_relative_positions():
    assert relative_positions(2, 5) == [2, 1, 0, 1, 2]
    with pytest.raises(ValueError):
        relative_positions(5, 5)


def test_find_element_in_list():
    assert find_element_in_list([1, 2, 1, 3], 1) == [0, 2]


def test_pair_start_end():
    # starts at 0 and 3; ends at 1 and 5: (0,1) then (3,5)
    assert pair_start_end([1, 0, 0, 1, 0, 0], [0, 1, 0, 0, 0, 1]) == [(0, 1), (3, 5)]
    # end before next start required: start@0 end@4 blocked by start@2
    assert pair_start_end([1, 0, 1, 0, 0], [0, 0, 0, 0, 1]) == [(2, 4)]


def test_find_closest_span_pairs_pinned():
    head = [1, 0, 0, 1, 0, 0, 1]
    tail = [0, 1, 0, 1, 0, 1, 1]
    assert find_closest_span_pairs(head, tail, backtrace=False) == [
        (0, 1), (3, 3), (6, 6),
    ]
    assert find_closest_span_pairs(head, tail, backtrace=True) == [
        (0, 1), (3, 3), (6, 6), (3, 5),
    ]


def test_find_closest_span_pairs_with_index_pinned():
    heads = [[1, 0, 0, 1, 0, 0, 1], [1, 0, 0, 1, 0, 0, 1]]
    tails = [[0, 1, 0, 1, 0, 1, 1], [0, 1, 0, 0, 0, 1, 0]]
    assert find_closest_span_pairs_with_index(heads, tails, backtrace=False) == [
        (0, 0, 1), (0, 3, 3), (0, 6, 6), (1, 0, 1), (1, 3, 5),
    ]
    assert find_closest_span_pairs_with_index(heads, tails, backtrace=True) == [
        (0, 0, 1), (0, 3, 3), (0, 6, 6), (0, 3, 5), (1, 0, 1), (1, 3, 5),
    ]


def test_decode_tag_seq_bio():
    chars = list("abcdefg")
    tags = ["B-PER", "I-PER", "O", "B-LOC", "I-LOC", "I-LOC", "O"]
    assert decode_tag_seq(chars, tags) == [
        ("ab", "PER", (0, 2)),
        ("def", "LOC", (3, 6)),
    ]


def test_decode_tag_seq_bmes_and_single():
    chars = list("abcde")
    tags = ["B-ORG", "M-ORG", "E-ORG", "S-PER", "O"]
    assert decode_tag_seq(chars, tags) == [
        ("abc", "ORG", (0, 3)),
        ("d", "PER", (3, 4)),
    ]


def test_decode_tag_seq_illegal_type_switch():
    # I with a different type closes the open entity (end-exclusive)
    chars = list("abcd")
    tags = ["B-PER", "I-LOC", "O", "O"]
    assert decode_tag_seq(chars, tags) == [("a", "PER", (0, 1))]


def test_decode_tag_seq_trailing_open_entity():
    chars = list("ab")
    tags = ["B-PER", "I-PER"]
    assert decode_tag_seq(chars, tags) == [("ab", "PER", (0, 2))]


def test_decode_tag_seq_truncation():
    assert decode_tag_seq(list("abc"), ["B-PER"]) == [("a", "PER", (0, 1))]
    assert decode_tag_seq(list("a"), ["B-PER", "I-PER"]) == [("a", "PER", (0, 1))]


def test_count_illegal_tags():
    assert count_illegal_tags(["B-PER", "I-PER", "O"]) == 0
    assert count_illegal_tags(["O", "I-PER", "O"]) == 1
    assert count_illegal_tags(["B-PER", "I-LOC"]) == 1
    assert count_illegal_tags(["B-PER", "M-PER", "S-PER"]) == 1  # S after M


def test_prf1_zero_division():
    assert safe_division(1, 0) == 0.0
    r = prf1(0, 0, 0)
    assert r == {"p": 0.0, "r": 0.0, "f1": 0.0, "tp": 0, "fp": 0, "fn": 0}
    r = prf1(2, 1, 1)
    assert r["p"] == pytest.approx(2 / 3)
    assert r["r"] == pytest.approx(2 / 3)
    assert r["f1"] == pytest.approx(2 / 3)


def test_measure_triple_facets():
    preds = [[("a", "r1", "b"), ("a", "r1", "b")], []]  # dup counts once
    golds = [[("a", "r1", "b"), ("c", "r2", "d")], [("e", "r3", "f")]]
    m = measure_triple(preds, golds)
    assert m["triple"]["tp"] == 1 and m["triple"]["fp"] == 0 and m["triple"]["fn"] == 2
    assert m["subject"]["tp"] == 1 and m["subject"]["fn"] == 2
    assert m["relation"]["tp"] == 1
    assert m["triple"]["p"] == 1.0
    assert m["triple"]["r"] == pytest.approx(1 / 3)


def test_accuracy():
    assert accuracy([1, 2, 3], [1, 2, 4]) == pytest.approx(2 / 3)
    assert accuracy([], []) == 0.0


def test_piecewise_mask_reference_vectors():
    """Pinned vectors from the reference's tests/utils/test_mask.py."""
    import pytest

    from rex_spark.kernels.positions import piecewise_mask

    assert piecewise_mask(2, 7, 10, 15) == [1,1,2,2,2,2,2,3,3,3,0,0,0,0,0]
    assert piecewise_mask(0, 7, 10, 15) == [2,2,2,2,2,2,2,3,3,3,0,0,0,0,0]
    assert piecewise_mask(7, 1, 10, 15) == [1,2,2,2,2,2,2,3,3,3,0,0,0,0,0]
    with pytest.raises(AssertionError):
        piecewise_mask(-1, 0, 0, 0)
    with pytest.raises(AssertionError):
        piecewise_mask(0, -1, 0, 0)
    # truncation cases (seq longer than max)
    assert piecewise_mask(1, 3, 10, 5) == [1, 2, 2, 3, 3]


def test_pad_kernels():
    from rex_spark.kernels.positions import pad_mask, pad_tokens

    assert pad_tokens([1, 2, 3], 5, 0) == [1, 2, 3, 0, 0]
    assert pad_tokens([1, 2, 3, 4, 5, 6], 4, 0) == [1, 2, 3, 4]
    assert pad_mask(3, 5) == [1, 1, 1, 0, 0]
    assert pad_mask(9, 4) == [1, 1, 1, 1]
