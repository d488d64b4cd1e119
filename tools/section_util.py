"""Shared BASELINE.md section splicing for the evidence writers.

One implementation of the fragile "find marker, cut to the next ##
heading, re-splice the tail" logic that bench.py and the tools/ bench
scripts all need (an earlier inline version once truncated to EOF and
ate every following section — keep this in exactly one place).
"""

from __future__ import annotations


def replace_section(path: str, marker: str, section: str) -> None:
    """Replace (or append) the section starting at ``marker`` — a
    ``## ...`` heading line — up to the next ``## `` heading, keeping
    everything after it intact.  ``section`` should start with the
    marker line and end with a trailing newline."""
    with open(path) as f:
        text = f.read()
    tail = ""
    if marker in text:
        start = text.index(marker)
        nxt = text.find("\n## ", start + len(marker))
        if nxt != -1:
            tail = text[nxt + 1 :]
        text = text[:start].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(text.rstrip() + "\n\n" + section + tail)
