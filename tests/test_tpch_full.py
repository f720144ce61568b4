"""Golden oracle tests for the extended TPC-H-shape pack (queries/tpch_full.py).

Every query hash-compares against DuckDB running the ORACLE SQL on the
same parquet. Extra invariants pin the adapted predicates: results are
non-empty wherever the shape would otherwise be vacuous (an empty
EXISTS/HAVING result trivially "matches" any oracle).
"""

import pytest

from bigdatamanagement_spark.queries import tpch_full
from tests.conftest import assert_matches_oracle

NONEMPTY = {
    "tpch_q01_pricing_summary",
    "tpch_q02_min_cost_supplier",
    "tpch_q03_shipping_priority",
    "tpch_q04_order_priority_check",
    "tpch_q05_local_supplier_volume",
    "tpch_q06_revenue_forecast",
    "tpch_q07_volume_shipping",
    "tpch_q08_market_share",
    "tpch_q09_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_concentrated_shippers",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
}


@pytest.mark.parametrize("name", sorted(tpch_full.QUERIES))
def test_tpch_full_oracle(spark, duck, sf_dir, name):
    df = tpch_full.QUERIES[name](spark, sf_dir)
    rows = df.collect()
    if name in NONEMPTY:
        assert rows, f"{name} unexpectedly empty — adapted predicate too narrow"
    assert_matches_oracle(df, duck, tpch_full.ORACLE[name])
