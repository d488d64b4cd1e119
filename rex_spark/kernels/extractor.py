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


def extract_sentence(
    tokens: Sequence[str], max_pairs: int | None = None
) -> List[ScoredTriple]:
    """Mentions -> all ordered candidate pairs -> scored triples.

    Candidate generation mirrors J1 (all head/tail mention pairs with
    distinct spans, rex/data/transforms/sent_re.py:50-63); scoring +
    thresholding mirrors T3.  Output is deduplicated on the triple key
    keeping the max score (the dedup-keep-best window, SURVEY.md §2.5).

    ``max_pairs``: if set and len(mentions)^2 exceeds it, the sentence
    is skipped entirely (returns []) — the same whole-sentence cap as
    operators.extraction.candidate_pairs, so the fused and composable
    paths drop identically.  None (default) is reference-exact: the
    reference kernel has no cap, and the P/R oracle compares against
    the uncapped composition.
    """
    mentions = extract_mentions(tokens)
    if max_pairs is not None and len(mentions) * len(mentions) > max_pairs:
        return []
    best: Dict[Tuple[str, str, str], ScoredTriple] = {}
    for head in mentions:
        for tail in mentions:
            if (head[2], head[3]) == (tail[2], tail[3]):
                continue
            scored = score_pair(tokens, head, tail)
            if scored is None:
                continue
            rel, score = scored
            if score < kb.SCORE_THRESHOLD:
                continue
            key = (head[0], rel, tail[0])
            cand: ScoredTriple = (
                head[0], rel, tail[0], head[2], head[3], tail[2], tail[3], score,
            )
            prev = best.get(key)
            if prev is None or cand[7] > prev[7]:
                best[key] = cand
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
