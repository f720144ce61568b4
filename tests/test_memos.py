"""memos.build_all error discipline (round-6 ADVICE): expected
missing-table absences skip; unexpected builder exceptions are RECORDED
(memo_build_failed) instead of silently swallowed — a broken builder
must surface in the bench artifact, not re-bill its first-touch cost to
the first query."""

import time

from pyspark.errors import AnalysisException

from bigdatamanagement_spark import memos


def test_build_all_records_unexpected_failures(spark, monkeypatch):
    calls = []

    def ok(spark_, sf):
        calls.append("ok")
        time.sleep(0.01)

    def missing(spark_, sf):
        raise AnalysisException("[PATH_NOT_FOUND] no such table")

    def missing_file(spark_, sf):
        raise FileNotFoundError("fixtures/absent.parquet")

    def broken(spark_, sf):
        raise ValueError("real regression")

    monkeypatch.setattr(
        memos,
        "MEMO_BUILDERS",
        {
            "good": ok,
            "absent_table": missing,
            "absent_file": missing_file,
            "regressed": broken,
        },
    )
    built, failed = memos.build_all(spark, "/nonexistent")
    assert calls == ["ok"]
    assert set(built) == {"good"} and built["good"] > 0
    # expected absences skip quietly; the real regression is recorded
    assert set(failed) == {"regressed"}
    assert failed["regressed"].startswith("ValueError")
