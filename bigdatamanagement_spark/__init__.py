"""bigdatamanagement_spark — a PySpark-native analytics engine.

Re-expresses the full query/data-processing capability surface of the
reference repo (Akshaykumarky26/BigDataManagement, a 7-assignment tour of
SQLite / BigQuery / MySQL-RDS / Bigtable / Redis / Redshift / MongoDB)
as an idiomatic Spark DataFrame/SQL engine, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing).

Entry points:
    from bigdatamanagement_spark import Engine
    eng = Engine.local()
    eng.register_testdata("/root/testdata/sf0.01")
    eng.sql("SELECT ...").show()
"""

from bigdatamanagement_spark.engine import Engine
from bigdatamanagement_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
