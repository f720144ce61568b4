"""Golden-string tests for the S-11 text renderers (render.py).

The expected strings are hand-derived from the reference algorithms
(SQLonRDS.java:280-361 displayResultSet, AmazonRedshift.java:550-578
resultSetToString) applied to a tiny frame — byte-for-byte layout:
widths, NULL cells, borders, footers, and the empty-result message.
"""

from bigdatamanagement_spark.render import render_table, result_set_to_string


def _frame(spark):
    return spark.createDataFrame(
        [(1, "Apple", "AAPL"), (3, "Handy Repair", None)],
        "id int, name string, ticker string",
    )


def test_render_table_golden(spark):
    got = render_table(_frame(spark))
    expected = (
        "+----+--------------+--------+\n"
        "| id | name         | ticker |\n"
        "+----+--------------+--------+\n"
        "| 1  | Apple        | AAPL   |\n"
        "| 3  | Handy Repair | NULL   |\n"
        "+----+--------------+--------+\n"
        "Total results: 2\n"
    )
    assert got == expected


def test_render_table_empty_result(spark):
    got = render_table(_frame(spark).filter("id = 99"))
    # message-first: the reference System.out.println's the padded
    # pipe-framed message at SQLonRDS.java:329-331 while the table is
    # still buffered, so the literal stdout shows it BEFORE the
    # header-only table (padding target 17 < len(message) so no pad)
    expected = (
        "| Query returned no results. |\n"
        "+----+------+--------+\n"
        "| id | name | ticker |\n"
        "+----+------+--------+\n"
        "+----+------+--------+\n"
    )
    assert got == expected
    assert "Total results" not in got  # footer only when rows > 0


def test_render_table_max_rows(spark):
    got = render_table(_frame(spark).orderBy("id"), max_rows=1)
    assert "Apple" in got and "Handy Repair" not in got
    assert got.endswith("Total results: 1\n")


def test_result_set_to_string_golden(spark):
    got = result_set_to_string(_frame(spark).orderBy("id"), max_rows=10)
    expected = (
        "Total columns: 3\n"
        "id, name, ticker\n"
        "1, Apple, AAPL\n"
        "3, Handy Repair, null\n"
        "Total results: 2"
    )
    assert got == expected


def test_result_set_to_string_counts_all_rows(spark):
    """The footer counts EVERY row even when maxRows truncates the
    display (AmazonRedshift.java:565-575: rowCount++ outside the if)."""
    got = result_set_to_string(_frame(spark).orderBy("id"), max_rows=1)
    assert got.count("\n") == 3  # header, cols, 1 row, footer
    assert got.endswith("Total results: 2")
