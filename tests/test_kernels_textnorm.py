"""Kernel tests: segmentation / tokenization / html strip.

sent_seg cases mirror the reference's pinned behavior
(/root/reference/tests/utils/test_segmentation.py:6-23).
"""

import pytest

from rex_spark.kernels.textnorm import (
    char_shingles,
    html_to_text,
    ngrams,
    sent_seg,
    tokenize,
)


def test_sent_seg_zh_quotation_modes():
    case = "我说：“翠花，上酸菜。”她说：“欸，好嘞。”"
    assert sent_seg(case) == ["我说：“翠花，上酸菜。”", "她说：“欸，好嘞。”"]
    assert sent_seg(case, quotation_seg_mode=False) == [
        "我说：“翠花，上酸菜。",
        "”她说：“欸，好嘞。",
        "”",
    ]


def test_sent_seg_empty_and_type_error():
    assert sent_seg("") == []
    with pytest.raises(ValueError):
        sent_seg(123)


def test_sent_seg_indicators():
    assert sent_seg("123###456", special_seg_indicators=[("###", "\n")]) == [
        "123",
        "456",
    ]


def test_sent_seg_en_custom_punct():
    assert sent_seg("abcdefg;cgcg.wfwf.", lang="en", punctuations={";"}) == [
        "abcdefg;",
        "cgcg.",
        "wfwf.",
    ]


def test_sent_seg_en_basic():
    assert sent_seg("hello world . next one !", lang="en") == [
        "hello world .",
        "next one !",
    ]


def test_tokenize():
    assert tokenize("Bob Smith WORKS for Acme") == [
        "bob", "smith", "works", "for", "acme",
    ]
    assert tokenize("翠花 在阿里", lang="zh") == ["翠", "花", "在", "阿", "里"]


def test_ngrams_and_shingles():
    assert ngrams(["a", "b", "c"], 2) == ["a b", "b c"]
    assert ngrams(["a"], 3) == ["a"]
    assert ngrams([], 3) == []
    assert char_shingles("Ab  c", 3) == ["ab ", "b c"]
    assert char_shingles("", 3) == []


def test_html_to_text_strips_boilerplate():
    html = (
        b"<html><head><title>T</title><style>p{}</style>"
        b"<script>x=1;</script></head><body>"
        b"<nav><ul><li>Home</li><li>About</li></ul></nav>"
        b"<header><h1>Site</h1></header>"
        b"<article><p>first sentence .</p><p>second   one .</p></article>"
        b"<footer>copyright</footer></body></html>"
    )
    assert html_to_text(html) == "first sentence .\nsecond one ."


def test_html_to_text_deterministic_bytes():
    html = "<p>café &amp; bar</p>".encode("utf-8")
    assert html_to_text(html) == "café & bar"
    # invalid utf-8 is replaced deterministically
    assert html_to_text(b"<p>\xff ok</p>") == "� ok"
