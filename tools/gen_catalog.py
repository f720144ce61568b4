"""Generate QUERIES.md — the auto-built catalog of every driver query:
name, implementing function, one-line description (first docstring
sentence), and oracle status. Run after adding queries:

    python tools/gen_catalog.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import __spark_entry__ as e  # noqa: E402


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(line.strip() for line in doc.strip().splitlines())
    # cut at the first sentence end or the Scale note, whichever first
    text = re.split(r"\s+Scale[: ]", text)[0]
    m = re.match(r"(.+?\.)(\s|$)", text)
    out = (m.group(1) if m else text).strip()
    return out if len(out) <= 400 else out[:397] + "..."


def main() -> None:
    qs = e.queries()
    oracles = e.oracle_sql()
    rows = []
    for name, fn in sorted(qs.items()):
        mod = fn.__module__.replace("bigdatamanagement_spark.queries.", "")
        rows.append(
            (
                name,
                f"`{mod}.{fn.__name__}`",
                "oracle" if name in oracles else "rows-only",
                first_sentence(fn.__doc__),
            )
        )
    n_oracle = sum(1 for r in rows if r[2] == "oracle")
    lines = [
        "# QUERIES — auto-generated driver-query catalog",
        "",
        f"{len(rows)} queries ({n_oracle} DuckDB-oracle-checked, "
        f"{len(rows) - n_oracle} rows-only). Regenerate with "
        "`python tools/gen_catalog.py`. Descriptions are the first "
        "sentence of each implementing function's docstring; full "
        "semantics + scale notes live in the docstrings and SURVEY.md §8.",
        "",
        "| query | implementation | gate | what it computes |",
        "|---|---|---|---|",
    ]
    for name, impl, gate, desc in rows:
        desc = desc.replace("|", "\\|")
        lines.append(f"| {name} | {impl} | {gate} | {desc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(rows)} rows ({n_oracle} oracle)")


if __name__ == "__main__":
    main()
