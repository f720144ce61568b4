"""Marker-delimited markdown section splicing.

Round-5 postmortem: ``scale_rehearsal.py`` used
``text.split(marker, 1)[0]`` to replace its own section — which clobbers
EVERYTHING after the marker, including other tools' sections that sort
after it in the file. When the corpus rehearsal re-ran at round close it
silently deleted the relational rehearsal table (the round's headline
evidence). This module is the single shared splice: a writer owns ONLY
the span from its marker to the next ``<!-- `` marker (or EOF), so
multiple marker-delimited sections coexist no matter what order their
writers run in. tests/test_scale_md.py pins the behavior.
"""

from __future__ import annotations

import os

NEXT_MARKER = "<!-- "


def splice_section(path: str, marker: str, body: str) -> None:
    """Replace (or append) the section that starts at ``marker``.

    The section owned by ``marker`` extends to the next ``<!-- ``
    occurrence after it, or EOF. ``body`` is the section content WITHOUT
    the marker line; the marker is written as its own line.
    """
    section = marker + "\n" + body.rstrip("\n") + "\n"
    text = open(path).read() if os.path.exists(path) else ""
    start = text.find(marker)
    if start < 0:
        out = text.rstrip("\n") + "\n\n" + section if text.strip() else section
    else:
        after = text.find(NEXT_MARKER, start + len(marker))
        tail = text[after:] if after >= 0 else ""
        head = text[:start].rstrip("\n")
        out = (head + "\n\n" if head else "") + section
        if tail:
            out += "\n" + tail
    with open(path, "w") as fh:
        fh.write(out)
