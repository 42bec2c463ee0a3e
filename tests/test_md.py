"""BENCH/_md.py section writer (ADVICE r03): fence-aware, exact-anchored
section replacement — a quoted '## ' heading inside a fenced code block
must neither match as a section header nor terminate the section being
replaced."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "BENCH"))

from _md import replace_section  # noqa: E402


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def test_replace_section_in_place(tmp_path):
    p = str(tmp_path / "b.md")
    _write(p, "# Title\n\n## Alpha\na1\n\n## Beta\nb1\n\n## Gamma\ng1\n")
    replace_section("## Beta", ["## Beta", "b2"], path=p)
    text = open(p).read()
    assert "b2" in text and "b1" not in text
    assert "a1" in text and "g1" in text
    assert text.count("## Beta") == 1


def test_replace_section_ignores_fenced_headings(tmp_path):
    p = str(tmp_path / "b.md")
    _write(p, "## Alpha\na1\n```\n## Beta\nquoted, not a header\n```\n"
              "a2\n\n## Beta\nreal\n")
    # the fenced '## Beta' must not match: only the real section replaced,
    # and Alpha's body (including the fence) survives intact
    replace_section("## Beta", ["## Beta", "new"], path=p)
    text = open(p).read()
    assert "quoted, not a header" in text and "a2" in text
    assert "new" in text and "real" not in text


def test_replace_section_body_fence_does_not_truncate(tmp_path):
    p = str(tmp_path / "b.md")
    _write(p, "## Alpha\n```\n## looks-like-next\n```\ntail\n\n## Beta\nb1\n")
    replace_section("## Alpha", ["## Alpha", "fresh"], path=p)
    text = open(p).read()
    # the whole Alpha section (fence + tail) was replaced as one unit
    assert "looks-like-next" not in text and "tail" not in text
    assert "fresh" in text and "b1" in text


def test_replace_section_appends_when_absent_and_dedupes(tmp_path):
    p = str(tmp_path / "b.md")
    _write(p, "## Dup\nold1\n\n## Dup\nold2\n")
    replace_section("## Dup", ["## Dup", "one"], path=p)
    text = open(p).read()
    assert text.count("## Dup") == 1 and "old1" not in text and "old2" not in text
    replace_section("## New", ["## New", "n1"], path=p)
    assert "## New\nn1" in open(p).read()


def test_replace_section_recovers_from_dangling_fence(tmp_path):
    """ADVICE r04: an unclosed fence must not mark the rest of the file
    fenced — the target section stays matchable and duplicates do not
    accumulate across runs."""
    p = str(tmp_path / "b.md")
    _write(p, "## Alpha\n```\ndangling fence, never closed\n\n## Beta\nb1\n")
    replace_section("## Beta", ["## Beta", "b2"], path=p)
    text = open(p).read()
    assert "b2" in text and "b1" not in text
    assert text.count("## Beta") == 1
    # idempotent on rerun
    replace_section("## Beta", ["## Beta", "b3"], path=p)
    assert open(p).read().count("## Beta") == 1


def test_replace_section_mixed_fence_markers(tmp_path):
    """ADVICE r04: ``` and ~~~ fences must not flip each other's state;
    a ~~~ fence shields quoted headings just like ```."""
    p = str(tmp_path / "b.md")
    _write(p, "## Alpha\n~~~\n## Beta\nquoted\n~~~\n```\n~~~ not a closer\n"
              "```\na2\n\n## Beta\nreal\n")
    replace_section("## Beta", ["## Beta", "new"], path=p)
    text = open(p).read()
    assert "quoted" in text and "a2" in text and "~~~ not a closer" in text
    assert "new" in text and "real" not in text


def test_fence_closer_must_be_bare(tmp_path):
    """review r5 wave 2 (CommonMark): a quoted ```python inside a fenced
    block is NOT a closer — the quoted heading after it stays fenced."""
    p = str(tmp_path / "b.md")
    _write(p, "## Alpha\n```\n```python\n## Beta\nquoted\n```\na2\n\n"
              "## Beta\nreal\n")
    replace_section("## Beta", ["## Beta", "new"], path=p)
    text = open(p).read()
    assert "quoted" in text and "a2" in text
    assert "new" in text and "real" not in text
