"""Tag-sequence kernels: BIO/BMES decode (W1) and illegal-tag counting.

Reference parity (re-expressed): /root/reference/rex/utils/tagging.py:4-111.
The decode is a stateful left-to-right scan with these pinned quirks:
- chars/tags are truncated to the shorter of the two;
- tag type = everything after the first two chars ("B-PER" -> "PER"),
  tags of length <= 2 get type "default";
- an I/M whose type differs from the open entity closes the open entity
  (end-exclusive at the current index) and resets — the offending token
  is dropped (illegal-transition early stop);
- E closes the entity *including* the current token only when types
  match; on mismatch the open entity is still flushed but without the
  current char, and state resets either way;
- S flushes any open entity (without the current char) then emits the
  single-char entity;
- a still-open entity at sequence end is flushed with
  ``end = start + len(entity_chars)``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

Entity = Tuple[str, str, Tuple[int, int]]  # (surface, type, (start, end_excl))


def _tag_type(tag: str) -> str:
    return tag[2:] if len(tag) > 2 else "default"


def decode_tag_seq(chars: Sequence[str], tags: Sequence[str]) -> List[Entity]:
    """BIO/BMES tag sequence -> typed entity spans (see module docstring)."""
    k = min(len(chars), len(tags))
    chars, tags = chars[:k], tags[:k]

    out: List[Entity] = []
    ent_chars: List[str] = []
    ent_type = ""
    ent_start = -1

    def flush(end: int) -> None:
        nonlocal ent_chars, ent_type, ent_start
        if ent_chars:
            out.append(("".join(ent_chars), ent_type, (ent_start, end)))
        ent_chars, ent_type, ent_start = [], "", -1

    for idx in range(k):
        char, tag = chars[idx], tags[idx]
        head = tag[:1]
        cur_type = _tag_type(tag)

        if head == "B":
            flush(idx)
            ent_chars, ent_type, ent_start = [char], cur_type, idx
        elif head in ("I", "M"):
            if cur_type == ent_type and ent_chars:
                ent_chars.append(char)
            else:
                flush(idx)
        elif head == "E":
            if cur_type == ent_type and ent_chars:
                ent_chars.append(char)
            # reference quirk: end is idx+1 even when the type
            # mismatched and the current char was NOT appended
            flush(idx + 1)
        elif head == "S":
            flush(idx)
            out.append((char, cur_type, (idx, idx + 1)))
        else:  # O or anything else
            flush(idx)

    if ent_chars:
        out.append(("".join(ent_chars), ent_type, (ent_start, ent_start + len(ent_chars))))
    return out


def count_illegal_tags(tags: Sequence[str]) -> int:
    """Number of tags that violate BIO/BMES transition rules.

    I/M/E is illegal unless the previous tag head is B/I/M with the same
    type; S is illegal right after I/M.  (rex/utils/tagging.py:82-111)
    """
    n_illegal = 0
    last_type = "default"
    last_head = "O"
    for tag in tags:
        cur_type = _tag_type(tag)
        head = tag[:1]
        if head in ("I", "M", "E"):
            if last_head not in ("B", "I", "M") or cur_type != last_type:
                n_illegal += 1
        elif head == "S" and last_head in ("I", "M"):
            n_illegal += 1
        last_type = cur_type
        last_head = head
    return n_illegal
