"""Metric kernels: safe division, P/R/F1, faceted triple measurement.

Reference parity (re-expressed):
- ``safe_division`` / ``prf1``  <- /root/reference/rex/metrics/__init__.py:6-21
  (pinned by tests/metrics/test_prf1.py: zero denominators -> 0.0).
- ``measure_triple``            <- /root/reference/rex/metrics/triple.py:6-43:
  per-instance SET semantics (duplicates within an instance count once),
  four facets (triple / subject / object / relation), tp/fp/fn summed
  over instances, then P/R/F1 on the sums.

These in-process functions are the oracle; operators/metrics.py holds
the distributed DataFrame equivalent that must agree with them.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence, Tuple

Triple = Tuple[str, str, str]  # (subj, pred, obj) — or any hashable triple


def safe_division(num: float, den: float) -> float:
    return num / den if den else 0.0


def prf1(tp: int, fp: int, fn: int) -> Dict[str, float]:
    p = safe_division(tp, tp + fp)
    r = safe_division(tp, tp + fn)
    f1 = safe_division(2 * p * r, p + r)
    return {"p": p, "r": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


_FACETS = {
    "triple": lambda t: t,
    "subject": lambda t: t[0],
    "relation": lambda t: t[1],
    "object": lambda t: t[2],
}


def measure_triple(
    preds: Iterable[Sequence[Triple]], golds: Iterable[Sequence[Triple]]
) -> Dict[str, Dict[str, float]]:
    """Faceted P/R/F1 over aligned per-instance triple lists."""
    stat = {facet: {"tp": 0, "fp": 0, "fn": 0} for facet in _FACETS}
    for pred, gold in zip(preds, golds):
        pset, gset = set(pred), set(gold)
        for facet, proj in _FACETS.items():
            pf = {proj(t) for t in pset}
            gf = {proj(t) for t in gset}
            stat[facet]["tp"] += len(pf & gf)
            stat[facet]["fp"] += len(pf - gf)
            stat[facet]["fn"] += len(gf - pf)
    return {facet: prf1(**counts) for facet, counts in stat.items()}


def accuracy(preds: Sequence, golds: Sequence) -> float:
    """Fraction equal (rex/metrics/classification.py:10-18)."""
    if not golds:
        return 0.0
    return sum(p == g for p, g in zip(preds, golds)) / len(golds)
