"""M6 USM slot: pointer-algebra decode semantics + agreement with the
fused extractor path (ref /root/reference/rex/models/usm.py:100-168)."""

from rex_spark.kernels.extractor import extract_sentence
from rex_spark.kernels.synth import make_pages
from rex_spark.kernels.textnorm import html_to_text, sent_seg, tokenize
from rex_spark.operators.usm import (
    LABEL_MAP,
    build_label_map,
    usm_decode,
    usm_links,
    usm_sentence,
)


def test_label_map_shape():
    lm = build_label_map()
    assert lm == LABEL_MAP
    types = [v["type"] for v in lm.values()]
    # all "m" labels precede all "p" labels; both present
    assert "m" in types and "p" in types
    assert types == sorted(types, key=lambda t: 0 if t == "m" else 1)
    assert len({v["string"] for v in lm.values()}) == len(lm)


def test_decode_algebra_two_disjoint_triples():
    """Two same-relation triples with disjoint spans decode exactly —
    the H2T span constraint kills every cross combination."""
    lm = {0: {"type": "m", "string": "PER"}, 5: {"type": "p", "string": "r"}}
    h2t = [(0, 0, 0), (2, 2, 0), (4, 4, 0), (6, 6, 0)]
    ttl = h2t + [(0, 4, 1), (2, 6, 1), (0, 4, 2), (2, 6, 2)]
    ltl = [
        (0, 0, 0), (0, 0, 1), (0, 2, 0), (0, 2, 1),   # PER on subj spans
        (0, 4, 0), (0, 4, 1), (0, 6, 0), (0, 6, 1),   # PER on obj spans
        (5, 0, 0), (5, 0, 1), (5, 2, 0), (5, 2, 1),   # r on subject spans
    ]
    tll = [(4, 5, 0), (4, 5, 1), (6, 5, 0), (6, 5, 1)]  # r on object spans
    ents, rels = usm_decode(ttl, ltl, tll, lm)
    assert rels == [((0, 0), "r", (4, 4)), ((2, 2), "r", (6, 6))]
    assert ents == [
        ((0, 0), "PER"), ((2, 2), "PER"), ((4, 4), "PER"), ((6, 6), "PER"),
    ]


def test_decode_ignores_unsupported_links():
    """Links not grounded in H2T spans (or labels outside the map)
    contribute nothing — the reference filters them the same way."""
    lm = {0: {"type": "m", "string": "PER"}}
    ttl = [(0, 1, 0), (0, 5, 1), (1, 6, 2)]  # h2h/t2t to nonexistent spans
    ltl = [(0, 0, 0), (0, 1, 1), (9, 0, 0)]  # label 9 not in map
    ents, rels = usm_decode(ttl, ltl, [], lm)
    assert rels == []
    assert ents == [((0, 1), "PER")]


def test_usm_sentence_matches_fused_on_known_text():
    toks = tokenize("alice johnson works for acme corp", lang="en")
    ents, rels = usm_sentence(toks)
    fused = {(t[0], t[1], t[2]) for t in extract_sentence(toks)}
    assert {(s, r, o) for s, r, o, *_ in rels} == fused == {
        ("alice johnson", "works_for", "acme corp")
    }
    assert ("alice johnson", "PER", 0, 2) in ents
    assert ("acme corp", "ORG", 4, 6) in ents


def test_usm_links_are_sorted_and_typed():
    toks = tokenize("alice johnson works for acme corp", lang="en")
    ttl, ltl, tll = usm_links(toks)
    assert ttl == sorted(ttl) and ltl == sorted(ltl) and tll == sorted(tll)
    assert {x[2] for x in ttl} <= {0, 1, 2}
    assert {x[2] for x in ltl} <= {0, 1} and {x[2] for x in tll} <= {0, 1}


def test_usm_agreement_with_fused_corpus():
    """P/R >= 0.95 vs the fused pair-scorer path over the synthetic
    corpus (the BASELINE.json-style agreement contract; measured exact
    on this corpus, pinned at the contract bound)."""
    pages, _ = make_pages(120, seed=42)
    fused, usm = set(), set()
    for p in pages:
        lang = "zh" if p["lang"] == "zh" else "en"
        for sent in sent_seg(html_to_text(p["html"]), lang=lang):
            toks = tokenize(sent, lang=lang)
            for t in extract_sentence(toks):
                fused.add((p["url"], t[0], t[1], t[2]))
            for s, r, o, *_ in usm_sentence(toks)[1]:
                usm.add((p["url"], s, r, o))
    assert fused, "corpus must produce triples"
    tp = len(fused & usm)
    p = tp / len(usm) if usm else 0.0
    r = tp / len(fused)
    assert p >= 0.95 and r >= 0.95, (p, r)
