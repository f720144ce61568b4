"""Relational-core scale rehearsal (round-5 judge item 1): the round-4
rehearsal measured only the dedup/ANN/text family — the relational core
(tpch_q01..q22, the t17/t18 event-window packs) had never been measured
above sf0.1. This runs all 22 TPC-H queries plus representative t17/t18
window headliners at m=1/3/10 over the consistent scaled generator
(tools/gen_scale_data.py --relational: lineitem 600k/1.8M/6.1M rows —
m=10 is sf1-shaped), warm (second-run) times, and fits the per-query
scaling exponent alpha = least-squares slope of log t vs log n.

Joins/aggregates under AQE should land near-linear (alpha <= ~1.2);
anything materially super-linear is a scale bug to file.

Appends an idempotent marker-delimited section to SCALE.md (separate
marker from the round-4 corpus rehearsal section, which is preserved).

Usage: python tools/scale_rehearsal_relational.py [m1 m2 ...]  (default 1 3 10)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REHEARSAL = [f"tpch_q{i:02d}" for i in range(1, 23)] + [
    # t17/t18 event-window headliners (events scale 100k/300k/1M)
    "t17_first_event_per_user_hour",
    "t17_top10_users_by_value",
    "t17_user_running_value",
    "t17_session_stats",
    "t17_daily_rollup_cascade",
    "t18_rolling_7d_active_users",
    "t18_trailing_hour_value",
    "t18_top_users_with_ties",
    "t18_weighted_median_value",
]


def _resolve_names(qs) -> list[str]:
    """Resolve tpch prefixes to full registry names."""
    names = []
    for q in REHEARSAL:
        if q in qs:
            names.append(q)
        else:
            hits = [k for k in qs if k.startswith(q + "_") or k.startswith(q)]
            assert len(hits) == 1, (q, hits)
            names.append(hits[0])
    return names


def _leg(tag: str, out_path: str) -> None:
    """Child mode: one multiplier per fresh process (see
    scale_rehearsal._leg — accumulated memo residency in a shared
    session inflates the last leg's measurements)."""
    import json

    import __spark_entry__ as entrymod
    from bigdatamanagement_spark.session import get_spark

    spark = get_spark(app_name=f"scale-rehearsal-relational-m{tag}")
    qs = entrymod.queries()
    sf_dir = f"/root/repo/fixtures/scale/m{tag}"
    out: dict[str, float] = {}
    for q in _resolve_names(qs):
        fn = qs[q]
        best = None
        for _ in range(2):  # second pass = warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = time.perf_counter() - t0
        out[q] = round(best, 3)
        print(f"m={tag} {q}: {out[q]}s", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh)


def main() -> None:
    import json
    import subprocess
    import tempfile

    argv = sys.argv[1:]
    if argv and argv[0] == "--leg":
        _leg(argv[1], argv[2])
        return
    mults = [float(a) for a in argv] or [1.0, 3.0, 10.0]
    names: list[str] = []
    times: dict[str, dict[float, float]] = {}
    for m in mults:
        tag = f"{m:g}"
        sf_dir = f"/root/repo/fixtures/scale/m{tag}"
        if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
            os.system(
                f"python tools/gen_scale_data.py {tag} {sf_dir}"
                " --relational-only"
            )
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out_path = tf.name
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", tag, out_path],
            check=True,
        )
        with open(out_path) as fh:
            leg = json.load(fh)
        os.unlink(out_path)
        names = names or list(leg)
        for q, t in leg.items():
            times.setdefault(q, {})[m] = t

    lines = [
        "## Measured relational-core rehearsal (round 5)",
        "",
        "Warm wall-times of tpch_q01..q22 + t17/t18 window headliners on",
        "the scaled relational generator (tools/gen_scale_data.py",
        "--relational: lineitem 611k/1.83M/6.12M, orders 150k/450k/1.5M,",
        "events 100k/300k/1M; non-key columns jointly bootstrap-resampled",
        "from sf0.1 so selectivities match across multipliers;",
        "nation/region fixed dims),",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]. "
        "alpha = least-squares slope of log t vs log n over the measured"
        " multipliers.",
        "JVM fixed overhead makes sub-second queries sub-linear; joins and",
        "aggregates under AQE should stay near alpha <= ~1.2.",
        "",
        "| query | "
        + " | ".join(f"m={m:g} (s)" for m in mults)
        + " | alpha | max leg slope |",
        "|---|" + "---|" * (len(mults) + 2),
    ]
    from tools.rehearsal_stats import SLOPE_FLAG, fit_stats

    worst = []
    flagged = []
    for q in names:
        alpha, max_slope = fit_stats(mults, [times[q][m] for m in mults])
        row = " | ".join(f"{times[q][m]:.2f}" for m in mults)
        mark = " ⚠" if max_slope > SLOPE_FLAG else ""
        lines.append(f"| {q} | {row} | {alpha:.2f} | {max_slope:.2f}{mark} |")
        worst.append((alpha, q))
        if max_slope > SLOPE_FLAG:
            flagged.append((q, max_slope))
    worst.sort(reverse=True)
    lines += [
        "",
        f"Max alpha: {worst[0][0]:.2f} ({worst[0][1]}); "
        f"queries above 1.2: "
        f"{[q for a, q in worst if a > 1.2] or 'none'}.",
    ]
    if flagged:
        lines += [
            "",
            f"FLAGGED (adjacent-leg slope > {SLOPE_FLAG}): "
            + ", ".join(f"{q} ({s:.2f})" for q, s in flagged)
            + " — a tail cliff the fitted alpha cannot see; scale bug to file.",
        ]
    # Shared marker-to-next-marker splice (tools/md_section.py): this
    # writer must never clobber sections that sort after its own.
    from tools.md_section import splice_section

    splice_section(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"),
        "<!-- scale-rehearsal-relational -->",
        "\n".join(lines),
    )
    print("updated SCALE.md relational rehearsal section")
    if flagged:
        print(f"FLAGGED: {flagged}")
        sys.exit(1)


if __name__ == "__main__":
    main()
