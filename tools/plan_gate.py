"""CLI sweep of the global plan-health gate over the full registry.

Usage:
    python tools/plan_gate.py [--census]           # sf0.001 by default
    SPARK_GRAFT_GATE_SF=/root/testdata/sf0.01 python tools/plan_gate.py

--census prints every query's raw audit features (for calibrating the
allowlists); default mode prints only violations and exits non-zero if
any exist. tests/test_plan_gate.py runs the same sweep in CI.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    census = "--census" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.001")
    from bigdatamanagement_spark.plans.gate import audit_plan, gate_violations
    from bigdatamanagement_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="plan-gate", shuffle_partitions=8)
    registry = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_GATE_ONLY")
    if only:
        keep = set(only.split(","))
        registry = {k: v for k, v in registry.items() if k in keep}
    all_violations: list[str] = []
    t0 = time.time()
    for i, (name, fn) in enumerate(registry.items()):
        try:
            audit = audit_plan(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"name": name, "error": repr(exc)[:300]}))
            all_violations.append(f"{name}: plan build raised {exc!r:.200}")
            continue
        v = gate_violations(name, audit)
        all_violations.extend(v)
        if census:
            audit = dict(audit)
            audit["partitionless_windows"] = [
                n[:200] for n in audit["partitionless_windows"]
            ]
            print(json.dumps({"name": name, **audit}), flush=True)
        elif v:
            for line in v:
                print(f"VIOLATION {line}", flush=True)
        if (i + 1) % 50 == 0:
            print(
                f"# {i + 1}/{len(registry)} swept in {time.time() - t0:.0f}s",
                file=sys.stderr,
                flush=True,
            )
    print(
        f"# gate swept {len(registry)} queries in {time.time() - t0:.0f}s: "
        f"{len(all_violations)} violation(s)",
        file=sys.stderr,
    )
    if not only:
        # committed audit artifact: what the gate swept and found
        with open("PLAN_GATE.json", "w") as fh:
            json.dump(
                {
                    "n_swept": len(registry),
                    "n_violations": len(all_violations),
                    "violations": all_violations,
                    "seconds": round(time.time() - t0, 1),
                    "sf_dir": sf_dir,
                },
                fh,
                indent=1,
            )
    return 1 if all_violations and not census else 0


if __name__ == "__main__":
    raise SystemExit(main())
