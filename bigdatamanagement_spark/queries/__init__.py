"""Query packs. Each module exposes:

- one function per query: ``(spark, sf_dir) -> DataFrame``
- ``QUERIES``: dict[str, callable] merged into __spark_entry__.queries()
- ``ORACLE``: dict[str, str] DuckDB SQL per query (same column aliases!)
  Queries without an ORACLE entry get the driver's weaker rows-only check.
"""
