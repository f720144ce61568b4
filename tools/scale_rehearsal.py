"""sf1 scale rehearsal (round-4 item 4): measure how the dedup/ANN
family's wall-time grows from m=1 (sf0.1-shaped) through m=10
(sf1-shaped) on the consistent generator of tools/gen_scale_data.py,
and fit the per-query scaling exponent alpha from t ~ c * n^alpha
(least-squares over log n across the measured multipliers).

Each query runs twice per multiplier; the SECOND (warm) time is
recorded so JVM/Python-worker startup does not contaminate the m=1
denominator. Banded/blocked designs should land near alpha <= ~1.2
(n log n); anything materially super-linear is a scale bug to file.

Appends (idempotently replaces) a marker-delimited "Measured rehearsal"
section at the end of SCALE.md — the rest of that file is the
hand-written cross-cutting strategy doc and is left untouched.

Usage: python tools/scale_rehearsal.py [m1 m2 ...]   (default 1 3 10)

Subset runs: SPARK_GRAFT_REHEARSAL_ONLY=<comma names> measures just
those queries; it REQUIRES SPARK_GRAFT_REHEARSAL_MARKER=<marker-id>
naming a dedicated SCALE.md marker (<!-- marker-id -->) so a partial
run can never clobber the full table's section.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Only queries over documents/embeddings/events (the scale dirs carry
# just those three tables).
REHEARSAL = [
    # dedup family (banded / blocked / star-contraction)
    "ext_dedup_exact_groups",
    "ext_minhash_lsh_pairs",
    "ext_simhash_pairs",
    "ext_incremental_neardup",
    "ext_dedup_clusters",
    "ext_multi_signal_dedup",
    # text pipeline
    "ext_text_features",
    "ext_bigram_perplexity_by_source",
    "t66_perplexity_tiers",
    "ext_curation_funnel",
    "ext_training_set_manifest",
    # similarity / ANN
    "ext_embedding_neardup_pairs",
    "ext_cosine_topk",
    "ext_lsh_ann_topk",
    "ext_ivf_ann_topk",
    "ext_pq_ann_topk",
    "ext_semdedup_summary",
    # sketches / event-grain two-phase
    "t67_hll_trailing_actives",
    "ext_rolling_7d_hll_users",
    "t57_average_precision",
    # round-4 cont.: winnowing / DSIR / hygiene / curriculum / JL / quantile
    "t68_winnow_fingerprint_stats",
    "t68_winnow_candidate_pairs",
    "t69_dsir_resample_rates",
    "t70_nb_lang_confusion",
    "t70_cross_source_fp_leakage",
    "t71_curriculum_shards",
    "t72_jl_norm_concentration",
    "t73_histogram_quantile_windows",
    # round-7: the t77 retrieval pack's linearity rested on the df-cap
    # ARGUMENT (postings ≤ DF_CAP77 ⇒ pair join ships ≤ cap·|postings|
    # rows); rounds 4-6 proved plausible isn't measured — rehearse it.
    "t77_ngram_tfidf_pairs",
    "t77_bm25_topk",
    "t77_ngram_tfidf_pairs_relcap",
    "t77_bm25_topk_relcap",
]


def _active_rehearsal() -> list[str]:
    only = [
        s for s in os.environ.get("SPARK_GRAFT_REHEARSAL_ONLY", "").split(",")
        if s
    ]
    if only:
        unknown = [q for q in only if q not in REHEARSAL]
        assert not unknown, f"not in REHEARSAL: {unknown}"
        return only
    return REHEARSAL


def _leg(tag: str, out_path: str) -> None:
    """Child mode: measure ONE multiplier in a fresh process and dump
    {query: warm_seconds} JSON. One process per leg keeps a leg's
    measurements clean — in the single-process design every earlier
    multiplier's localCheckpointed memo blocks stayed resident, and the
    accumulated executor-memory pressure inflated the LAST leg's times
    ~3x (round 6 measured multi_signal at 41 s inside the old rehearsal
    vs 13 s isolated): the slope flag would cry wolf on a measurement
    artifact, not a plan property."""
    import json

    import __spark_entry__ as entrymod
    from bigdatamanagement_spark.session import get_spark

    spark = get_spark(app_name=f"scale-rehearsal-m{tag}")
    qs = entrymod.queries()
    sf_dir = f"/root/repo/fixtures/scale/m{tag}"
    out: dict[str, float] = {}
    for q in _active_rehearsal():
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
    active = _active_rehearsal()
    marker = os.environ.get("SPARK_GRAFT_REHEARSAL_MARKER", "scale-rehearsal")
    if active != REHEARSAL:
        assert marker != "scale-rehearsal", (
            "subset runs must set SPARK_GRAFT_REHEARSAL_MARKER to a"
            " dedicated section so they cannot clobber the full table"
        )
    times: dict[str, dict[float, float]] = {q: {} for q in active}
    for m in mults:
        tag = f"{m:g}"
        sf_dir = f"/root/repo/fixtures/scale/m{tag}"
        if not os.path.isdir(sf_dir):
            os.system(f"python tools/gen_scale_data.py {tag} {sf_dir}")
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out_path = tf.name
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", tag, out_path],
            check=True,
        )
        with open(out_path) as fh:
            leg = json.load(fh)
        os.unlink(out_path)
        for q, t in leg.items():
            times[q][m] = t

    title = (
        "## Measured sf1 rehearsal (round 4)"
        if marker == "scale-rehearsal"
        else f"## Measured rehearsal subset: {marker}"
    )
    lines = [
        title,
        "",
        "Wall-times of the dedup/ANN family on the consistent synthetic",
        "generator (tools/gen_scale_data.py; documents 5k/15k/50k,",
        "embeddings 2k/6k/20k, events 100k/300k/1M — m=10 is sf1-shaped),",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]. "
        "Warm (second-run) times; alpha = least-squares slope of",
        "log t vs log n over the measured multipliers. Banded/blocked",
        "designs should stay near alpha <= ~1.2; JVM overhead makes tiny",
        "queries sub-linear.",
        "",
        "| query | "
        + " | ".join(f"m={m:g} (s)" for m in mults)
        + " | alpha | max leg slope |",
        "|---|" + "---|" * (len(mults) + 2),
    ]
    from tools.rehearsal_stats import SLOPE_FLAG, fit_stats

    flagged = []
    for q in active:
        alpha, max_slope = fit_stats(mults, [times[q][m] for m in mults])
        row = " | ".join(f"{times[q][m]:.2f}" for m in mults)
        mark = " ⚠" if max_slope > SLOPE_FLAG else ""
        lines.append(f"| {q} | {row} | {alpha:.2f} | {max_slope:.2f}{mark} |")
        if max_slope > SLOPE_FLAG:
            flagged.append((q, max_slope))
    if flagged:
        lines += [
            "",
            f"FLAGGED (adjacent-leg slope > {SLOPE_FLAG}): "
            + ", ".join(f"{q} ({s:.2f})" for q, s in flagged)
            + " — a tail cliff the fitted alpha cannot see; scale bug to file.",
        ]
    # Splice ONLY this tool's marker-to-next-marker span: the round-5
    # split(marker)[0] form clobbered every section after the marker,
    # deleting the relational rehearsal table from SCALE.md.
    from tools.md_section import splice_section

    splice_section(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"),
        f"<!-- {marker} -->",
        "\n".join(lines),
    )
    print("updated SCALE.md rehearsal section")
    if flagged:
        print(f"FLAGGED: {flagged}")
        sys.exit(1)


if __name__ == "__main__":
    main()
