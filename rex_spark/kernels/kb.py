"""Fixed knowledge base for the deterministic extractor and synthesizer.

REx ships untrained model architectures with no canonical checkpoint
(nothing to load weights from), so the "reference extractor" whose
triples we must match at P/R>=0.95 is this frozen, rule-based extractor
— run in-process as the oracle and inside pandas UDFs as the engine
(SURVEY.md §7 determinism note).  The relation taxonomy mirrors the
FIXTURES.md §5 subset; the gazetteer mirrors REx's entity-typed span
model (PER/ORG/LOC, rex/utils/tagging.py span tuples).

Everything here is a frozen constant: changing it changes the golden
outputs, so treat it like a model version (it is recorded in lineage
rows as ``model_version``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

MODEL_VERSION = "rule-extractor-v1"

# canonical name -> (entity_type, [surface variants seen in text])
# Variants are intentionally diverse (abbreviations, punctuation,
# spacing) to exercise canonicalization; matching happens on the
# lowercased token sequence (tokenize() lowercases for en).
ENTITIES: Dict[str, Tuple[str, List[str]]] = {
    # --- ORG (acme is the planted hub entity: ~30% of pages -> skew) ---
    # NOTE: surfaces are dot-free on purpose — the reference sent_seg
    # breaks on every "." (rex/utils/segmentation.py:59), so a dotted
    # abbreviation would split its own sentence.
    "Acme Corporation": ("ORG", ["acme corporation", "acme corp", "the acme company"]),
    "Globex": ("ORG", ["globex", "globex inc"]),
    "Initech": ("ORG", ["initech", "initech llc"]),
    "Umbrella Group": ("ORG", ["umbrella group", "umbrella grp"]),
    "Stark Industries": ("ORG", ["stark industries", "stark ind"]),
    "Wayne Enterprises": ("ORG", ["wayne enterprises", "wayne ent"]),
    "Tyrell Corporation": ("ORG", ["tyrell corporation", "tyrell corp"]),
    "Hooli": ("ORG", ["hooli"]),
    "Pied Piper": ("ORG", ["pied piper"]),
    "Cyberdyne Systems": ("ORG", ["cyberdyne systems", "cyberdyne"]),
    # --- PER ---
    "Alice Johnson": ("PER", ["alice johnson", "dr alice johnson"]),
    "Bob Smith": ("PER", ["bob smith", "mr bob smith"]),
    "Carol Danvers": ("PER", ["carol danvers"]),
    "David Lee": ("PER", ["david lee", "d lee"]),
    "Eva Green": ("PER", ["eva green"]),
    "Frank Miller": ("PER", ["frank miller"]),
    "Grace Hopper": ("PER", ["grace hopper", "g hopper"]),
    "Henry Ford": ("PER", ["henry ford"]),
    "Irene Adler": ("PER", ["irene adler"]),
    "Jack Ma": ("PER", ["jack ma"]),
    # --- LOC ---
    "Springfield": ("LOC", ["springfield"]),
    "Gotham City": ("LOC", ["gotham city", "gotham"]),
    "Metropolis": ("LOC", ["metropolis"]),
    "Shelbyville": ("LOC", ["shelbyville"]),
    "Riverdale": ("LOC", ["riverdale"]),
    "Oakdale": ("LOC", ["oakdale"]),
    "West Egg": ("LOC", ["west egg"]),
    "Emerald City": ("LOC", ["emerald city"]),
    # --- zh entities (char-token matching; tokenize(lang="zh")) ---
    "翠花": ("PER", ["翠花"]),
    "阿里巴巴": ("ORG", ["阿里巴巴"]),
    "杭州": ("LOC", ["杭州"]),
    "北京": ("LOC", ["北京"]),
}

# relation -> (head_type, tail_type, gap token patterns).  A candidate
# pair (head mention, tail mention) in one sentence matches a relation
# iff head precedes tail and the exact token gap between the spans
# equals one of the patterns.  (Directional, mirroring REx triple
# head/tail order: rex/data/transforms/entity_re.py:49-55.)
RELATIONS: Dict[str, Tuple[str, str, List[Tuple[str, ...]]]] = {
    "works_for": ("PER", "ORG", [("works", "for"), ("is", "employed", "by")]),
    "boss_of": ("PER", "ORG", [("is", "the", "boss", "of"), ("runs",), ("leads",)]),
    "founded": ("PER", "ORG", [("founded",), ("established",)]),
    "born_in": ("PER", "LOC", [("was", "born", "in",)]),
    "lives_in": ("PER", "LOC", [("lives", "in"), ("resides", "in")]),
    "spouse_of": ("PER", "PER", [("is", "married", "to")]),
    "headquartered_in": ("ORG", "LOC", [("is", "headquartered", "in"), ("is", "based", "in")]),
    "located_in": ("LOC", "LOC", [("is", "located", "in"), ("lies", "within")]),
    "member_of": ("PER", "ORG", [("is", "a", "member", "of"), ("joined",)]),
    "subsidiary_of": ("ORG", "ORG", [("is", "a", "subsidiary", "of"), ("is", "owned", "by")]),
    # zh: per-character gap patterns
    "zh_works_for": ("PER", "ORG", [tuple("在"),]),  # X 在 Y (工作 suffix ignored)
    "zh_located_in": ("ORG", "LOC", [tuple("位于")]),
}

# Deterministic pseudo-confidence for a matched pattern: base + bonus
# for shorter gaps (mirrors "model score" thresholding, T3).
SCORE_BASE = 0.90
SCORE_THRESHOLD = 0.5
# Distractor verbs that create entity pairs with NO relation pattern
# (candidate pairs that must be filtered by the threshold).
DISTRACTOR_GAPS: List[Tuple[str, ...]] = [
    ("met",), ("visited",), ("mentioned",), ("criticized",),
    ("spoke", "about"), ("wrote", "about"),
]


def gazetteer() -> Dict[str, List[Tuple[Tuple[str, ...], str, str]]]:
    """first_token -> [(token_tuple, ent_type, canonical), ...] for the
    linear-scan matcher.  en surfaces are stored as lowercase token
    tuples; zh surfaces as per-character tuples."""
    index: Dict[str, List[Tuple[Tuple[str, ...], str, str]]] = {}
    for canonical, (etype, surfaces) in ENTITIES.items():
        for surf in surfaces:
            toks = tuple(surf.split()) if not _is_zh(surf) else tuple(surf)
            index.setdefault(toks[0], []).append((toks, etype, canonical))
    # longest-match-first within a first-token bucket (stable order)
    for bucket in index.values():
        bucket.sort(key=lambda item: (-len(item[0]), item[0]))
    return index


def pattern_index() -> Dict[Tuple[str, str, Tuple[str, ...]], str]:
    """(head_type, tail_type, gap_tokens) -> relation."""
    idx: Dict[Tuple[str, str, Tuple[str, ...]], str] = {}
    for rel, (ht, tt, gaps) in RELATIONS.items():
        for gap in gaps:
            idx[(ht, tt, gap)] = rel
    return idx


def _is_zh(s: str) -> bool:
    return any("一" <= ch <= "鿿" for ch in s)
