"""Marker-based section ownership for BENCH_DETAIL.md.

Round 3's end-of-round rerun of one bench tool OVERWROTE the whole
document and silently dropped the large-alphabet flagship table
(round-3 verdict Weak #2).  Each generating tool now owns a named
section between HTML-comment markers and replaces ONLY its own section;
everything else in the file survives any single tool's rerun.
"""

from __future__ import annotations

import os

DOC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_DETAIL.md")

_HEADER = ("# Multi-config benchmark — TPU v5e single chip vs C++ "
           "reference single core\n\n"
           "Sections are owned and replaced by their generating tools "
           "(tools/_bench_doc.py); a rerun of one tool never drops "
           "another's table.\n")


def replace_section(name: str, content: str, path: str = DOC) -> None:
    """Replace (or append) the section owned by `name`.  `content` is
    the full section body, heading included."""
    start = f"<!-- section:{name} start -->"
    end = f"<!-- section:{name} end -->"
    block = f"{start}\n{content.rstrip()}\n{end}\n"
    if os.path.exists(path):
        text = open(path).read()
    else:
        text = _HEADER
    if start in text and end in text:
        pre = text[: text.index(start)]
        post = text[text.index(end) + len(end):].lstrip("\n")
        text = pre + block + ("\n" + post if post else "")
    else:
        text = text.rstrip("\n") + "\n\n" + block
    with open(path, "w") as f:
        f.write(text)
