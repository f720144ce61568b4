"""Catalog drift gate (round-4 item 8): one source of truth.

Three hand-maintained surfaces have drifted from the registry before
(the `_PACKS` silent-miss trap: a pack imported in __spark_entry__ but
missing from the _PACKS list silently drops its queries). These tests
make every drift loud:

1. every module under bigdatamanagement_spark/queries/ that defines a
   QUERIES dict is registered in __spark_entry__._PACKS (the trap);
2. every ORACLE key in a pack names a query registered by SOME pack
   (no orphan oracles), and the driver-facing oracle_sql() keys are a
   subset of queries();
3. QUERIES.md is regenerated output — its table row count and the
   count claim in its header match the live registry (stale catalog
   fails CI; fix = `python tools/gen_catalog.py`).
"""

import importlib
import os
import pkgutil
import re

import __spark_entry__ as entry


def test_every_query_pack_is_registered():
    import bigdatamanagement_spark.queries as qpkg

    registered = {pack.__name__ for pack in entry._PACKS}
    missing = []
    for mod_info in pkgutil.iter_modules(qpkg.__path__):
        mod = importlib.import_module(
            f"bigdatamanagement_spark.queries.{mod_info.name}"
        )
        if hasattr(mod, "QUERIES") and mod.__name__ not in registered:
            missing.append(mod.__name__)
    assert not missing, (
        f"packs with QUERIES dicts missing from __spark_entry__._PACKS "
        f"(their queries are silently dropped): {missing}"
    )


def test_oracles_reference_registered_queries():
    qs = set(entry.queries())
    orphans = set(entry.oracle_sql()) - qs
    assert not orphans, f"oracle_sql keys with no queries() entry: {orphans}"
    for pack in entry._PACKS:
        pack_orphans = set(getattr(pack, "ORACLE", {})) - qs
        assert not pack_orphans, (pack.__name__, pack_orphans)


def test_queries_md_matches_registry():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    path = os.path.join(os.path.dirname(entry.__file__), "QUERIES.md")
    text = open(path).read()
    table_names = set(re.findall(r"^\| (\w+) \|", text, re.M)) - {"query"}
    live = set(qs)
    assert table_names == live, (
        f"QUERIES.md is stale (run `python tools/gen_catalog.py`): "
        f"missing={sorted(live - table_names)[:5]} "
        f"extra={sorted(table_names - live)[:5]}"
    )
    m = re.search(r"(\d+) queries \((\d+) DuckDB-oracle-checked", text)
    assert m, "QUERIES.md header count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(qs), len(oracles)), (
        "QUERIES.md header counts drifted — regenerate"
    )


def test_committed_sweep_artifacts_cover_full_registry():
    """Round-5 postmortem: PLAN_GATE.json (482) and INVARIANCE.json (479)
    were generated BEFORE the registry reached 484 — the last additions
    shipped unswept in the committed artifacts. Stale artifacts now fail
    CI: both must carry exactly the live registry's query count (and the
    plan gate zero violations, the invariance sweep zero mismatches)."""
    import json

    n = len(entry.queries())
    root = os.path.dirname(entry.__file__)

    gate = json.load(open(os.path.join(root, "PLAN_GATE.json")))
    assert gate["n_swept"] == n, (
        f"PLAN_GATE.json is stale: swept {gate['n_swept']} of {n} "
        f"registered queries — rerun `python tools/plan_gate.py`"
    )
    assert gate["n_violations"] == 0

    inv = json.load(open(os.path.join(root, "INVARIANCE.json")))
    assert inv["n_queries"] == n, (
        f"INVARIANCE.json is stale: swept {inv['n_queries']} of {n} "
        f"registered queries — rerun `python tools/invariance_sweep.py`"
    )
    assert inv["n_mismatches"] == 0 and inv["n_errors"] == 0
