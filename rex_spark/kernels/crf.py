"""Constrained Viterbi decode (SURVEY §2.10 M7).

The deterministic core of the reference's ConstraintCRF
(/root/reference/rex/modules/crf.py:961-1352): a Viterbi pass whose
transition structure is the BIO/BMES/BIOUL/IOB1 legality mask from
``allowed_transitions`` (crf.py:10-152), with no learned transition
weights — emissions come from the (stand-in) tagger, transitions
contribute 0 when legal and -inf when illegal, and START/END
constraints apply at the sequence boundaries.  The output sequence is
therefore the highest-emission LEGAL path; running the repo's BIO
decode (kernels/tagging.py) on it never hits an illegal transition.

Tag-string parsing mirrors the reference: ``tag = label[0]``,
``entity = label[1:]`` (dash included on both sides, so equality
comparisons match rex/modules/crf.py:36-49 exactly).

Tie-break: when two predecessor states score equally, the SMALLEST
predecessor tag id wins (numpy argmax semantics), making the decode
deterministic for equal-score paths.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

NEG_INF = float("-inf")


def is_transition_allowed(
    scheme: str, from_tag: str, from_entity: str, to_tag: str, to_entity: str
) -> bool:
    """Legality of from->to under the scheme (reference crf.py:57-152)."""
    if to_tag == "START" or from_tag == "END":
        return False
    if scheme == "BIOUL":
        if from_tag == "START":
            return to_tag in ("O", "B", "U")
        if to_tag == "END":
            return from_tag in ("O", "L", "U")
        return (
            (from_tag in ("O", "L", "U") and to_tag in ("O", "B", "U"))
            or (
                from_tag in ("B", "I")
                and to_tag in ("I", "L")
                and from_entity == to_entity
            )
        )
    if scheme == "BIO":
        if from_tag == "START":
            return to_tag in ("O", "B")
        if to_tag == "END":
            return from_tag in ("O", "B", "I")
        return to_tag in ("O", "B") or (
            to_tag == "I" and from_tag in ("B", "I") and from_entity == to_entity
        )
    if scheme == "IOB1":
        if from_tag == "START":
            return to_tag in ("O", "I")
        if to_tag == "END":
            return from_tag in ("O", "B", "I")
        return to_tag in ("O", "I") or (
            to_tag == "B" and from_tag in ("B", "I") and from_entity == to_entity
        )
    if scheme == "BMES":
        if from_tag == "START":
            return to_tag in ("B", "S")
        if to_tag == "END":
            return from_tag in ("E", "S")
        return (
            (to_tag in ("B", "S") and from_tag in ("E", "S"))
            or (
                to_tag == "M"
                and from_tag in ("B", "M")
                and from_entity == to_entity
            )
            or (
                to_tag == "E"
                and from_tag in ("B", "M")
                and from_entity == to_entity
            )
        )
    raise ValueError(f"Unknown constraint type: {scheme}")


def allowed_transitions(scheme: str, labels: Sequence[str]) -> List[Tuple[int, int]]:
    """All legal (from_id, to_id) pairs incl. the virtual START
    (id=num_labels) and END (id=num_labels+1) states."""
    num = len(labels)
    with_bounds = list(enumerate(labels)) + [(num, "START"), (num + 1, "END")]
    out = []
    for fi, fl in with_bounds:
        ft, fe = (fl, "") if fl in ("START", "END") else (fl[0], fl[1:])
        for ti, tl in with_bounds:
            tt, te = (tl, "") if tl in ("START", "END") else (tl[0], tl[1:])
            if is_transition_allowed(scheme, ft, fe, tt, te):
                out.append((fi, ti))
    return out


def _legality(scheme: str, labels: Sequence[str]):
    num = len(labels)
    allowed = set(allowed_transitions(scheme, labels))
    trans = [[(f, t) in allowed for t in range(num)] for f in range(num)]
    start_ok = [(num, t) in allowed for t in range(num)]
    end_ok = [(f, num + 1) in allowed for f in range(num)]
    return trans, start_ok, end_ok


def constrained_viterbi(
    emissions: Sequence[Sequence[float]],
    labels: Sequence[str],
    scheme: str = "BIO",
) -> List[int]:
    """Highest-scoring LEGAL tag-id path for one sequence.

    ``emissions[i][t]`` is the tagger score of label ``t`` at position
    ``i``.  If every path is illegal (cannot happen for schemes with an
    O/B start), falls back to per-position argmax.
    """
    n, num = len(emissions), len(labels)
    if n == 0:
        return []
    trans, start_ok, end_ok = _legality(scheme, labels)

    score = [
        emissions[0][t] if start_ok[t] else NEG_INF for t in range(num)
    ]
    back: List[List[int]] = []
    for i in range(1, n):
        nxt = [NEG_INF] * num
        ptr = [0] * num
        for t in range(num):
            e = emissions[i][t]
            best, best_f = NEG_INF, 0
            for f in range(num):
                if trans[f][t] and score[f] > best:
                    best, best_f = score[f], f
            if best > NEG_INF:
                nxt[t] = best + e
                ptr[t] = best_f
        back.append(ptr)
        score = nxt
    # END constraint on the final position
    final = [score[t] if end_ok[t] else NEG_INF for t in range(num)]
    best_t, best_v = 0, NEG_INF
    for t in range(num):
        if final[t] > best_v:
            best_v, best_t = final[t], t
    if best_v == NEG_INF:  # fully-masked corner: greedy fallback
        return [
            max(range(num), key=lambda t: (emissions[i][t], -t))
            for i in range(n)
        ]
    path = [best_t]
    for ptr in reversed(back):
        path.append(ptr[path[-1]])
    path.reverse()
    return path


def viterbi_tags(
    emissions: Sequence[Sequence[float]],
    labels: Sequence[str],
    scheme: str = "BIO",
) -> List[str]:
    """constrained_viterbi, mapped back to label strings."""
    return [labels[t] for t in constrained_viterbi(emissions, labels, scheme)]
