"""Deterministic synthetic Common-Crawl-style corpus (seed-pinned).

Builds the ``pages`` input table of exactly the BASELINE.json
input_hint shape: (url STRING, warc_ts TIMESTAMP, html BINARY,
text STRING, lang STRING).  Facts are planted from the frozen KB so
gold triples are known by construction; the corpus includes (per
FIXTURES.md §1):
- boilerplate-heavy HTML (<nav>/<header>/<footer>/<style> subtrees),
- pages with zero entities,
- compound sentences carrying two facts (overlapping-triple case),
- nested-mention sentences ("dr alice johnson ..." also contains
  "alice johnson"),
- surface variants of the same entity (canonicalization cases),
- one hub entity (Acme) in ~30% of pages (skew test),
- a slice of zh pages (char tokenization + zh punctuation).

No wall-clock, no unseeded randomness: same (n_pages, seed) -> byte-
identical corpus.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Dict, List, Tuple

from . import kb

PageRow = Dict[str, object]  # url, warc_ts, html, text, lang

_BASE_TS = dt.datetime(2024, 10, 20, 0, 0, 0)

_FILLER_VOCAB = (
    "server request cluster batch quantum window filter shuffle tuple "
    "column row table index cache stream packet socket thread kernel "
    "buffer vector matrix tensor graph node edge path cycle tree"
).split()

_NAV_ITEMS = ["Home", "About", "Products", "Careers", "Contact", "Blog"]

_EN_ENTITIES = {
    c: (t, s) for c, (t, s) in kb.ENTITIES.items() if not kb._is_zh(s[0])
}
_ZH_ENTITIES = {
    c: (t, s) for c, (t, s) in kb.ENTITIES.items() if kb._is_zh(s[0])
}
_HUB = "Acme Corporation"

_EN_RELS = [
    (rel, ht, tt, gaps)
    for rel, (ht, tt, gaps) in kb.RELATIONS.items()
    if not rel.startswith("zh_")
]
_ZH_RELS = [
    (rel, ht, tt, gaps)
    for rel, (ht, tt, gaps) in kb.RELATIONS.items()
    if rel.startswith("zh_")
]


def _entities_of_type(pool: Dict, etype: str) -> List[str]:
    return sorted(c for c, (t, _) in pool.items() if t == etype)


def _fact_sentence(rng: random.Random, force_entity: str | None = None):
    """One planted en fact -> (sentence_tokens, (subj_canon, rel, obj_canon))."""
    for _ in range(50):
        rel, ht, tt, gaps = rng.choice(_EN_RELS)
        heads = _entities_of_type(_EN_ENTITIES, ht)
        tails = _entities_of_type(_EN_ENTITIES, tt)
        if force_entity is not None:
            ftype = kb.ENTITIES[force_entity][0]
            if ftype == ht:
                head = force_entity
                tail = rng.choice(tails)
            elif ftype == tt:
                head = rng.choice(heads)
                tail = force_entity
            else:
                continue
        else:
            head = rng.choice(heads)
            tail = rng.choice(tails)
        if head == tail:
            continue
        gap = rng.choice(gaps)
        h_surf = rng.choice(kb.ENTITIES[head][1])
        t_surf = rng.choice(kb.ENTITIES[tail][1])
        tokens = h_surf.split() + list(gap) + t_surf.split()
        return tokens, (head, rel, tail)
    raise RuntimeError("could not build fact sentence")


def _distractor_sentence(rng: random.Random) -> List[str]:
    """Entity pair with a non-relation gap (candidate that must be
    filtered by the score threshold)."""
    a, b = rng.sample(sorted(_EN_ENTITIES), 2)
    gap = rng.choice(kb.DISTRACTOR_GAPS)
    return (
        rng.choice(kb.ENTITIES[a][1]).split()
        + list(gap)
        + rng.choice(kb.ENTITIES[b][1]).split()
    )


def _filler_sentence(rng: random.Random) -> List[str]:
    return [rng.choice(_FILLER_VOCAB) for _ in range(rng.randint(5, 12))]


def _zh_fact(rng: random.Random):
    rel, ht, tt, gaps = rng.choice(_ZH_RELS)
    head = rng.choice(_entities_of_type(_ZH_ENTITIES, ht))
    tail = rng.choice(_entities_of_type(_ZH_ENTITIES, tt))
    gap = rng.choice(gaps)
    sent = (
        kb.ENTITIES[head][1][0] + "".join(gap) + kb.ENTITIES[tail][1][0] + "工作"
    )
    return sent, (head, rel, tail)


def _render_html(title: str, paragraphs: List[str]) -> bytes:
    nav = "".join(f"<li><a href='/{x.lower()}'>{x}</a></li>" for x in _NAV_ITEMS)
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    html = (
        "<html><head>"
        f"<title>{title}</title>"
        "<style>body { font-size: 14px; }</style>"
        "<script>var tracking = 'on';</script>"
        "</head><body>"
        f"<nav><ul>{nav}</ul></nav>"
        "<header><h1>Example Site</h1></header>"
        f"<article>{body}</article>"
        "<footer>copyright 2024 example site</footer>"
        "</body></html>"
    )
    return html.encode("utf-8")


def make_page(
    i: int, seed: int = 42
) -> Tuple[PageRow, List[Tuple[str, str, str, str]]]:
    """Build page ``i`` of the corpus, independently of every other page.

    Per-page determinism (rng seeded from (seed, i) only) is what lets
    the corpus be synthesized *distributed* — executors generate
    disjoint id ranges with zero coordination — while staying byte-
    identical to the driver-side loop in :func:`make_pages`.
    """
    rng = random.Random((seed << 32) ^ i)
    url = f"https://site{rng.randint(0, 49)}.example.com/page/{i}"
    warc_ts = _BASE_TS + dt.timedelta(seconds=137 * i)
    roll = rng.random()

    if roll < 0.08:  # zh page
        lang = "zh"
        sents, facts = [], []
        for _ in range(rng.randint(1, 3)):
            s, f = _zh_fact(rng)
            sents.append(s + "。")
            facts.append(f)
        paragraphs = ["".join(sents)]
    elif roll < 0.18:  # zero-entity page
        lang = "en"
        facts = []
        paragraphs = [
            " ".join(_filler_sentence(rng)) + " ."
            for _ in range(rng.randint(2, 5))
        ]
    else:
        lang = "en"
        force = _HUB if rng.random() < 0.30 else None
        n_facts = rng.randint(1, 4)
        sent_tokens: List[List[str]] = []
        facts = []
        for k in range(n_facts):
            toks, fact = _fact_sentence(rng, force_entity=force if k == 0 else None)
            sent_tokens.append(toks)
            facts.append(fact)
        # ~20%: merge two fact sentences into one compound sentence
        if len(sent_tokens) >= 2 and rng.random() < 0.20:
            merged = sent_tokens[0] + ["and"] + sent_tokens[1]
            sent_tokens = [merged] + sent_tokens[2:]
        for _ in range(rng.randint(0, 2)):
            sent_tokens.insert(
                rng.randint(0, len(sent_tokens)), _distractor_sentence(rng)
            )
        for _ in range(rng.randint(0, 2)):
            sent_tokens.insert(
                rng.randint(0, len(sent_tokens)), _filler_sentence(rng)
            )
        # paragraphs of 1-3 sentences, each sentence "tok tok ... ."
        paragraphs = []
        while sent_tokens:
            k = min(len(sent_tokens), rng.randint(1, 3))
            paragraphs.append(
                " ".join(" ".join(t) + " ." for t in sent_tokens[:k])
            )
            sent_tokens = sent_tokens[k:]

    html = _render_html(f"synthetic page {i}", paragraphs)
    # crawler-extracted text: deliberately noisy (pipeline recomputes)
    crawler_text = None if rng.random() < 0.1 else " | ".join(paragraphs)
    page: PageRow = {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": crawler_text,
        "lang": lang,
    }
    return page, [(url, subj, rel, obj) for subj, rel, obj in facts]


def make_pages(
    n_pages: int, seed: int = 42
) -> Tuple[List[PageRow], List[Tuple[str, str, str, str]]]:
    """Build the corpus (driver-side loop over :func:`make_page`).

    Returns (pages, planted) where planted is a list of
    (url, subj_canonical, pred, obj_canonical) gold facts by
    construction.  The extractor may legitimately emit MORE triples
    than planted (nested-mention surfaces); planted is the sanity
    subset, the authoritative gold is the in-process extractor output.
    """
    pages: List[PageRow] = []
    planted: List[Tuple[str, str, str, str]] = []
    for i in range(n_pages):
        page, facts = make_page(i, seed=seed)
        pages.append(page)
        planted.extend(facts)
    return pages, planted
