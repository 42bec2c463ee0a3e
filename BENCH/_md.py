"""Shared BASELINE.md section writer: replace a '## '-headed section in
place (matching on a stable header PREFIX anchored at a line start), or
append if absent — the one copy of the logic both bench harnesses use
(two separate hand-maintained copies produced two drift bugs)."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BENCH", "BASELINE.md")


def replace_section(header_prefix: str, lines: list[str],
                    path: str = BASELINE) -> None:
    """Replace the section whose '## ...' header line STARTS WITH
    header_prefix (anchored at a line start, so prose mentions of the
    header text can't corrupt the file); append the section if absent."""
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        text = ""
    # remove EVERY matching section (not just the first): a file that
    # already accumulated duplicates from the old append-mode bug must
    # converge to one copy
    while True:
        anchor = None
        idx = text.find(f"\n{header_prefix}")
        if idx >= 0:
            anchor = idx + 1
        elif text.startswith(header_prefix):
            anchor = 0
        if anchor is None:
            break
        rest = text[anchor:]
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1:] if nxt >= 0 else ""
        text = text[:anchor].rstrip("\n") + ("\n" + tail if tail else "\n")
    with open(path, "w") as f:
        f.write(text.rstrip("\n") + "\n" + "\n".join(lines))
