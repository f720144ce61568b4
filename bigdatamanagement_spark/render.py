"""Text result renderers — behavior-matched S-11 parity.

Two reference surfaces:

- ``render_table(df)`` — SQLonRDS.java:280-361 ``displayResultSet``:
  per-column width = the longest rendered cell INCLUDING the header,
  NULLs render as the literal string ``NULL``, ``+--+`` borders, a
  pipe-framed "Query returned no results." line printed BEFORE the
  buffered table when empty (the reference println's it while the
  table sits in a StringBuilder), and a ``Total results: N`` footer
  only when N > 0.
- ``result_set_to_string(df, max_rows)`` — AmazonRedshift.java:550-578
  ``resultSetToString``: "Total columns" header, comma-joined column
  names, the first ``max_rows`` rows comma-joined (``null`` for NULL —
  Java's ``StringBuilder.append((Object) null)`` appends the four
  characters ``null``), and a footer counting ALL rows, not just the
  displayed ones.

Driver-side display utilities by nature (the reference collects the
whole ResultSet to compute widths); at scale callers bound the collect
with ``max_rows`` — only the footer's count touches the full frame,
and that is one distributed ``count()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _cell(value) -> str:
    return "NULL" if value is None else str(value)


def render_table(df: DataFrame, max_rows: int | None = None) -> str:
    """displayResultSet parity (SQLonRDS.java:280-361): widths computed
    over header + rendered rows; when ``max_rows`` caps the collect, the
    footer still reports the rendered count (the reference renders every
    row, so an uncapped call is bit-faithful to it).

    Empty results: the reference System.out.println's the message at
    SQLonRDS.java:329-331 while the table is still buffered in a
    StringBuilder, so its actual stdout shows the message BEFORE the
    (header-only) table — we reproduce that literal ordering."""
    header = list(df.columns)
    rows = df.limit(max_rows).collect() if max_rows is not None else df.collect()
    table = [header] + [[_cell(v) for v in row] for row in rows]
    widths = [
        max(len(r[i]) for r in table) for i in range(len(header))
    ]

    def border() -> str:
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def line(cells: list[str]) -> str:
        return "|" + "|".join(
            f" {c:<{w}} " for c, w in zip(cells, widths)
        ) + "|"

    out = [border(), line(header), border()]
    for r in table[1:]:
        out.append(line(r))
    out.append(border())
    if not rows:
        # message-first: the reference System.out.println's the padded
        # pipe-framed line immediately while the table is still buffered
        # in its StringBuilder (SQLonRDS.java:329-331)
        inner = sum(widths) + 3 * (len(header) - 1) - 1
        out.insert(0, "| " + f"{'Query returned no results.':<{inner}}" + " |")
    text = "\n".join(out) + "\n"
    if rows:
        text += f"Total results: {len(rows)}\n"
    return text


def result_set_to_string(df: DataFrame, max_rows: int = 10) -> str:
    """resultSetToString parity (AmazonRedshift.java:550-578): displays
    the first ``max_rows`` rows but counts EVERY row for the footer.
    NULL cells render as ``null`` — Java's StringBuilder.append on a
    null Object appends the literal string ``"null"``."""
    buf = [f"Total columns: {len(df.columns)}", ", ".join(df.columns)]
    shown = df.limit(max_rows).collect()
    for row in shown:
        buf.append(", ".join("null" if v is None else str(v) for v in row))
    total = df.count()
    buf.append(f"Total results: {total}")
    return "\n".join(buf)
