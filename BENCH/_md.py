"""Shared BASELINE.md section writer: replace a '## '-headed section in
place (matching on a stable header PREFIX anchored at a line start and
OUTSIDE fenced code blocks), or append if absent — the one copy of the
logic both bench harnesses use (two separate hand-maintained copies
produced two drift bugs)."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BENCH", "BASELINE.md")


def _section_spans(lines: list[str], header_prefix: str) -> list[tuple[int, int]]:  # noqa: E501
    """[start, end) line spans of sections whose header line EXACTLY
    equals header (modulo trailing whitespace — ADVICE r03 asked for
    exact matching: a prefix match would let '## Foo' swallow a sibling
    '## Foo (variant)' section). Fence-aware: a line inside a ``` fenced
    code block is NEITHER a matching header NOR a terminating '## '
    heading, so quoted headings in benchmark output can't truncate the
    sections around them."""
    fenced = _fenced_flags(lines)
    spans = []
    start = None
    for i, ln in enumerate(lines):
        if fenced[i]:
            continue
        if start is not None and ln.startswith("## "):
            spans.append((start, i))
            start = None
        if start is None and ln.rstrip() == header_prefix.rstrip():
            start = i
    if start is not None:
        spans.append((start, len(lines)))
    return spans


def _fenced_flags(lines: list[str],
                  skip: frozenset = frozenset()) -> list[bool]:
    """Per-line in-a-fenced-block flags. ADVICE r04 hardening: a fence
    closes only on a MATCHING marker (same char, ≥ opening length — the
    CommonMark rule), so ``` and ~~~ fences can't flip each other's
    state; and EVERY fence left dangling at EOF is retried as literal
    text (rescan without that opener, repeated until no dangler remains —
    review r5: a single retry let a second stray opener re-poison the
    file) instead of marking the rest of the file fenced — which made
    the target section unmatchable and let duplicates accumulate on
    every bench run. Terminates: each rescan permanently demotes one
    distinct marker line."""
    flags = [False] * len(lines)
    fence = None          # (char, length) of the open fence
    opener_idx = None
    for i, ln in enumerate(lines):
        s = ln.lstrip()
        if s[:3] in ("```", "~~~") and i not in skip:
            ch = s[0]
            n = len(s) - len(s.lstrip(ch))
            if fence is None:
                fence = (ch, n)
                opener_idx = i
                flags[i] = True
                continue
            # a CLOSER must be bare (CommonMark: no info string after the
            # marker — review r5 wave 2: accepting a quoted ```python
            # line as a closer would unfence the rest of the block)
            if (fence[0] == ch and n >= fence[1]
                    and not s.lstrip(ch).strip()):
                fence = None
                flags[i] = True
                continue
        flags[i] = fence is not None or i in skip
    if fence is not None:
        return _fenced_flags(lines, skip | {opener_idx})
    return flags


def replace_section(header_prefix: str, new_lines: list[str],
                    path: str = BASELINE) -> None:
    """Replace the section whose '## ...' header line EXACTLY matches
    header_prefix (outside fenced code blocks); append if absent. Every matching duplicate is removed —
    a file that accumulated copies from the old append-mode bug converges
    to one."""
    try:
        with open(path) as f:
            lines = f.read().split("\n")
    except OSError:
        lines = []
    for s, e in reversed(_section_spans(lines, header_prefix)):
        del lines[s:e]
    while lines and lines[-1] == "":
        lines.pop()
    out = lines + ([""] if lines else []) + list(new_lines)
    with open(path, "w") as f:
        f.write("\n".join(out).rstrip("\n") + "\n")
