"""The deterministic reference extractor (mention -> pair -> triple).

This is the frozen stand-in for REx's neural scorers (SURVEY.md §2.10):
- ``extract_mentions``  plays the NER/tagging role (M4/M5/W1): typed
  spans over tokens, gazetteer longest-match (overlaps allowed, like
  REx's span lists).
- ``score_pair``        plays the sentence-level RE scorer role (M1):
  a candidate (head, tail) pair gets a per-relation score; here the
  deterministic pattern match replaces the PCNN sigmoid
  (rex/models/sent_pcnn.py:11-55 row contract: pair in -> scores out).
- ``extract_sentence`` / ``extract_document`` compose the full path the
  Spark pipeline distributes; running them in-process IS the oracle the
  P/R>=0.95 contract compares against.

All functions are pure; the only state is the frozen KB (kb.py,
MODEL_VERSION recorded in lineage).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from . import kb
from .textnorm import sent_seg, tokenize

Mention = Tuple[str, str, int, int]  # (surface, ent_type, start, end_excl)
ScoredTriple = Tuple[str, str, str, int, int, int, int, float]
# (subj_surface, pred, obj_surface, h_start, h_end, t_start, t_end, score)

_GAZ = kb.gazetteer()
_PATTERNS = kb.pattern_index()
_MAX_GAP = max(len(g) for (_, _, g) in _PATTERNS)


def extract_mentions(tokens: Sequence[str]) -> List[Mention]:
    """Gazetteer matcher: all (possibly overlapping) typed spans.

    Longest match per (start, first-token) bucket wins per candidate,
    but matches starting at different positions may overlap — REx
    entity lists allow overlapping spans.
    """
    out: List[Mention] = []
    n = len(tokens)
    for i in range(n):
        bucket = _GAZ.get(tokens[i])
        if not bucket:
            continue
        for toks, etype, _canonical in bucket:
            m = len(toks)
            if i + m <= n and tuple(tokens[i : i + m]) == toks:
                out.append((" ".join(tokens[i : i + m]), etype, i, i + m))
                break  # longest-first bucket order: keep only longest at i
    return out


def score_pair(
    tokens: Sequence[str], head: Mention, tail: Mention
) -> Tuple[str, float] | None:
    """Deterministic per-pair relation score.

    head must precede tail with a gap of at most _MAX_GAP tokens whose
    exact token sequence appears in the pattern index for the pair's
    (head_type, tail_type); otherwise None (sub-threshold candidate).
    """
    _, h_type, _, h_end = head
    _, t_type, t_start, _ = tail
    gap_len = t_start - h_end
    if gap_len < 0 or gap_len > _MAX_GAP:
        return None
    gap = tuple(tokens[h_end:t_start])
    rel = _PATTERNS.get((h_type, t_type, gap))
    if rel is None:
        return None
    score = kb.SCORE_BASE + 0.1 / (1 + gap_len)
    return rel, round(score, 6)


def _score_into(
    best: Dict[Tuple[str, str, str], ScoredTriple],
    tokens: Sequence[str],
    head: Mention,
    tail: Mention,
) -> None:
    """Score one candidate pair and fold it into the keep-best dict
    (strictly-greater replacement, so score ties keep the FIRST
    encountered candidate — iteration order is part of the contract)."""
    if (head[2], head[3]) == (tail[2], tail[3]):
        return
    scored = score_pair(tokens, head, tail)
    if scored is None:
        return
    rel, score = scored
    if score < kb.SCORE_THRESHOLD:
        return
    key = (head[0], rel, tail[0])
    cand: ScoredTriple = (
        head[0], rel, tail[0], head[2], head[3], tail[2], tail[3], score,
    )
    prev = best.get(key)
    if prev is None or cand[7] > prev[7]:
        best[key] = cand


def extract_sentence_banded(
    tokens: Sequence[str], mentions: List[Mention] | None = None
) -> List[ScoredTriple]:
    """Gap-banded EXACT extraction: linear-cost path for sentences
    whose quadratic pair loop would blow past the cap (the
    long-document recovery VERDICT r3 #6 asked for).

    score_pair only ever accepts pairs with ``0 <= t_start - h_end <=
    _MAX_GAP``, so restricting each head's tail scan (via bisect on
    the position-sorted mention list) to exactly that band visits the
    complete set of candidates score_pair can accept, in the same
    (head, tail) lexicographic order as the quadratic loop — identical
    keep-first-on-tie behavior, hence output == the uncapped
    ``extract_sentence`` ALWAYS, at O(mentions x (_MAX_GAP + band
    occupancy)) instead of O(mentions^2) (pinned by
    tests/test_drop_metrics.py).  This supersedes windowed chunking
    (W5 chunk_windows) for this extractor: the gap bound makes
    locality exact, with no window-margin approximation and no span
    re-anchoring.
    """
    from bisect import bisect_left, bisect_right

    if mentions is None:
        mentions = extract_mentions(tokens)
    best: Dict[Tuple[str, str, str], ScoredTriple] = {}
    starts = [m[2] for m in mentions]  # ascending by construction
    for head in mentions:
        lo = bisect_left(starts, head[3])
        hi = bisect_right(starts, head[3] + _MAX_GAP)
        for tail in mentions[lo:hi]:
            _score_into(best, tokens, head, tail)
    return sorted(best.values())


def extract_sentence(
    tokens: Sequence[str], max_pairs: int | None = None
) -> List[ScoredTriple]:
    """Mentions -> all ordered candidate pairs -> scored triples.

    Candidate generation mirrors J1 (all head/tail mention pairs with
    distinct spans, rex/data/transforms/sent_re.py:50-63); scoring +
    thresholding mirrors T3.  Output is deduplicated on the triple key
    keeping the max score (the dedup-keep-best window, SURVEY.md §2.5).

    ``max_pairs``: if set and len(mentions)^2 exceeds it, the sentence
    switches to :func:`extract_sentence_banded` — the exact
    linear-cost path — instead of the quadratic loop (pre-r4 behavior
    dropped such sentences; they now extract fully).  The result is
    provably identical either way, so ``max_pairs`` is purely a COST
    bound, never a semantics knob.  None (default) keeps the
    reference-exact quadratic composition the P/R oracle compares
    against.  operators.extraction.candidate_pairs (the J1 pair-level
    query surface) retains its drop cap: the full pair set really is
    quadratic — only the gap-bounded scorer admits linear recovery.
    """
    mentions = extract_mentions(tokens)
    if max_pairs is not None and len(mentions) * len(mentions) > max_pairs:
        return extract_sentence_banded(tokens, mentions)
    best: Dict[Tuple[str, str, str], ScoredTriple] = {}
    for head in mentions:
        for tail in mentions:
            _score_into(best, tokens, head, tail)
    return sorted(best.values())


def extract_document(
    clean_text: str, lang: str = "en", max_pairs: int | None = None
) -> List[Tuple[int, str, List[str], List[ScoredTriple]]]:
    """clean_text -> [(sent_id, sentence, tokens, scored triples)].

    The segmentation language follows the page's lang column
    (BASELINE.json input_hint); anything non-zh uses en rules.
    ``max_pairs`` passes through to extract_sentence (None =
    reference-exact)."""
    seg_lang = "zh" if lang == "zh" else "en"
    out = []
    for sent_id, sent in enumerate(sent_seg(clean_text, lang=seg_lang)):
        tokens = tokenize(sent, lang=seg_lang)
        out.append(
            (sent_id, sent, tokens, extract_sentence(tokens, max_pairs=max_pairs))
        )
    return out


def document_triples(clean_text: str, lang: str = "en") -> List[Tuple[str, str, str]]:
    """Distinct (subj, pred, obj) set for one document (the comparable
    unit of rex/metrics/triple.py)."""
    seen = set()
    for _, _, _, triples in extract_document(clean_text, lang):
        for t in triples:
            seen.add((t[0], t[1], t[2]))
    return sorted(seen)
