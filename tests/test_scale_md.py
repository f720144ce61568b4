"""SCALE.md section integrity + the shared marker splice.

Round-5 postmortem: tools/scale_rehearsal.py replaced its section with
``text.split(marker, 1)[0]`` — clobbering EVERYTHING after its marker,
which silently deleted the relational rehearsal table (the round's
headline evidence) when the corpus rehearsal re-ran at round close.
These tests pin (a) that both rehearsal sections exist at HEAD and
(b) that the shared splice can never clobber a sibling section again,
regardless of writer order.
"""

import os

from tools.md_section import splice_section
from tools.rehearsal_stats import fit_stats

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scale_md_contains_both_rehearsal_sections():
    text = open(os.path.join(REPO, "SCALE.md")).read()
    assert "<!-- scale-rehearsal -->" in text
    assert "<!-- scale-rehearsal-relational -->" in text
    assert "<!-- layout-bench -->" in text  # also clobbered at r5 close
    # Each marker heads a non-empty measured table.
    corpus = text.split("<!-- scale-rehearsal -->", 1)[1]
    assert "| ext_minhash_lsh_pairs |" in corpus
    relational = text.split("<!-- scale-rehearsal-relational -->", 1)[1]
    assert "| tpch_q01_pricing_summary |" in relational
    assert "Max alpha:" in relational


def test_splice_replaces_only_own_section(tmp_path):
    p = str(tmp_path / "doc.md")
    with open(p, "w") as fh:
        fh.write("# Head prose\n\nhand-written strategy\n")
    splice_section(p, "<!-- a -->", "section A v1")
    splice_section(p, "<!-- b -->", "section B v1")
    # Re-running A (any order) must preserve B — the round-5 bug.
    splice_section(p, "<!-- a -->", "section A v2")
    text = open(p).read()
    assert "hand-written strategy" in text
    assert "section A v2" in text and "section A v1" not in text
    assert "section B v1" in text
    assert text.index("<!-- a -->") < text.index("<!-- b -->")
    # And updating B preserves A v2.
    splice_section(p, "<!-- b -->", "section B v2")
    text = open(p).read()
    assert "section A v2" in text and "section B v2" in text
    # Idempotent: same body twice -> same file.
    splice_section(p, "<!-- b -->", "section B v2")
    assert open(p).read() == text


def test_splice_appends_when_marker_absent(tmp_path):
    p = str(tmp_path / "doc.md")
    splice_section(p, "<!-- only -->", "body")
    assert open(p).read() == "<!-- only -->\nbody\n"


def test_fit_stats_flags_tail_cliff():
    # The exact round-5 miss: 1.26/1.35/2.67/77.05 at m=1/3/10/30 fit to
    # alpha ~1.1 — but the last leg's local slope is ~3, which the flag
    # must catch.
    alpha, max_slope = fit_stats([1, 3, 10, 30], [1.26, 1.35, 2.67, 77.05])
    assert alpha < 1.5  # the fit alone would NOT have flagged it
    assert max_slope > 2.5  # the per-leg slope does
    # A clean near-linear series stays unflagged.
    _, ok_slope = fit_stats([1, 3, 10, 30], [1.0, 2.8, 9.0, 27.5])
    assert ok_slope < 1.2


def test_fit_stats_single_multiplier_no_crash():
    # `python tools/scale_rehearsal.py 10` passes one leg; fitting a
    # slope through one point must degrade to (nan, 0.0), not raise
    # ZeroDivisionError (round-6 ADVICE).
    import math

    alpha, max_slope = fit_stats([10.0], [5.0])
    assert math.isnan(alpha)
    assert max_slope == 0.0
