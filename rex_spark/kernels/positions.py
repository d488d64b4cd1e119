"""Position kernels: subsequence search, relative positions, start/end pairing.

Reference parity (re-expressed, not copied):
- ``find_all_positions``  <- /root/reference/rex/utils/position.py:6-45
  (behavior pinned by tests/utils/test_position.py:6-22): every
  occurrence of ``sub`` inside ``long`` as end-exclusive (start, end).
- ``relative_positions``  <- rex/utils/position.py:48-65.
- ``pair_start_end``      <- rex/utils/position.py:72-86 (MRC decode,
  W3): for each start index, the first end index in [start, next_start).
- ``find_element_in_list``<- rex/utils/position.py:68-69.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Union


def find_all_positions(
    long: Union[Sequence[Any], str], sub: Union[Sequence[Any], str]
) -> List[Tuple[int, int]]:
    """All end-exclusive (start, end) spans where ``sub`` occurs in ``long``.

    Overlapping matches are all reported (scan advances by 1), matching
    the reference.  Raises if sub is longer than long or types mismatch.
    """
    if isinstance(long, str) != isinstance(sub, str):
        raise TypeError("long and sub must both be str or both be sequences")
    n, m = len(long), len(sub)
    if m > n:
        raise ValueError("sub length exceeds long length")
    if m == 0:
        return []
    out: List[Tuple[int, int]] = []
    first = sub[0]
    for i in range(n - m + 1):
        if long[i] == first and tuple(long[i : i + m]) == tuple(sub):
            out.append((i, i + m))
    return out


def relative_positions(pos: int, max_length: int) -> List[int]:
    """``[abs(i - pos) for i in range(max_length)]`` with bounds check."""
    if pos < 0 or pos >= max_length:
        raise ValueError(f"pos {pos} not in [0, {max_length})")
    return [abs(i - pos) for i in range(max_length)]


def find_element_in_list(elements: Sequence[Any], element: Any) -> List[int]:
    return [i for i, el in enumerate(elements) if el == element]


def piecewise_mask(
    head_pos: int, tail_pos: int, seq_len: int, max_seq_len: int
) -> List[int]:
    """P5: PCNN's three-segment position mask (reference parity:
    rex/utils/mask.py:1-17, vectors pinned by its tests/utils/
    test_mask.py): 1 before the first entity position, 2 between the
    two, 3 from the later one to the sequence end, 0 in the padding
    tail.  Built from segment boundaries instead of a per-index scan.
    """
    if not (0 <= head_pos < seq_len) or not (0 <= tail_pos < seq_len):
        raise AssertionError("entity positions must lie inside the sequence")
    lo, hi = sorted((head_pos, tail_pos))
    b1 = min(lo, max_seq_len)
    b2 = min(hi, max_seq_len)
    b3 = min(seq_len, max_seq_len)
    return (
        [1] * b1
        + [2] * (b2 - b1)
        + [3] * (b3 - b2)
        + [0] * (max_seq_len - b3)
    )


def pad_tokens(tokens: Sequence, max_len: int, pad_token) -> List:
    """P6: truncate-then-pad to ``max_len``
    (rex/data/vocab.py:28-32 semantics)."""
    out = list(tokens[:max_len])
    return out + [pad_token] * (max_len - len(out))


def pad_mask(token_len: int, max_len: int) -> List[int]:
    """P6: 1 for real positions, 0 for padding
    (rex/data/vocab.py:21-25 semantics)."""
    n = min(token_len, max_len)
    return [1] * n + [0] * (max_len - n)


def decode_pointer_matrix(mat, offset: int = 0) -> List[Tuple[int, int, int]]:
    """W4: multi-class pointer-matrix decode — re-expression of
    rex/utils/position.py:119-132 (decode_multi_class_pointer_mat_span)
    for ONE instance.

    ``mat[cls][s][e] == 1`` marks a span; output is
    ``(s - offset, e + 1 - offset, cls)`` in torch-nonzero order
    (class asc, then row-major inside each class).  The single-class
    form (rex/utils/position.py:104-116) is ``cls`` fixed at 0.
    """
    out: List[Tuple[int, int, int]] = []
    for cls, plane in enumerate(mat):
        for s, row in enumerate(plane):
            for e, v in enumerate(row):
                if v == 1:
                    out.append((s - offset, e + 1 - offset, cls))
    return out


def one_hot(label_id: int, num_tags: int) -> List[int]:
    """P8: rex/data/label_encoder.py:65-68 (convert_to_one_hot)."""
    out = [0] * num_tags
    out[label_id] = 1
    return out


def multi_hot(label_ids: Sequence[int], num_tags: int) -> List[int]:
    """P8: rex/data/label_encoder.py:59-63 (convert_to_multi_hot)."""
    out = [0] * num_tags
    for label_id in label_ids:
        out[label_id] = 1
    return out


def pair_start_end(
    start_label: Sequence[int], end_label: Sequence[int]
) -> List[Tuple[int, int]]:
    """MRC span decode: for each start position (label==1), pair with the
    first end position >= start and < the next start position."""
    starts = [i for i, v in enumerate(start_label) if v == 1]
    ends = [i for i, v in enumerate(end_label) if v == 1]
    out: List[Tuple[int, int]] = []
    for k, s in enumerate(starts):
        nxt = starts[k + 1] if k + 1 < len(starts) else len(start_label)
        for e in ends:
            if s <= e < nxt:
                out.append((s, e))
                break
    return out
