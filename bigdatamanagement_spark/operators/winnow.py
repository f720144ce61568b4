"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm): hash every k-word gram, slide a
window of w consecutive gram hashes over the document, and keep each
window's minimum. The guarantee: any shared run of at least k+w-1
words between two documents contributes at least one IDENTICAL
selected fingerprint to both — so overlap detection needs only the
selected set (expected density 2/(w+1) of the grams), never the full
gram stream.

Reference anchor (SURVEY §2): the fingerprint unit of the dedup family
(Q-dedup rows); upgrades ``text.fingerprint`` (1-hash winnowing, one
fingerprint per doc) to the positional windowed scheme whose selected
SET supports local (substring-level) overlap detection, not just
whole-document identity.

Construction (deliberately window-function-shaped, no array lambdas):
tokens -> posexplode to (doc, pos, tok) rows -> k-gram via lead()
-> 60-bit portable md5-slice hash -> min over
``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` -> distinct minima.
Every step is a row-level expression or a doc-keyed window, so the
DuckDB oracle is the IDENTICAL SQL (lead + frame min are ANSI), and
the whole pipeline rides ONE doc_id-keyed exchange (both windows share
the (doc_id, pos) sort). No higher-order lambda ever references an
outer expression, so none of the Catalyst recompute pathologies that
forced the ``array_sort(shuffle(...))`` fence in ``dedup.py`` can
arise — order-preserving arrays cannot use that fence (the sort would
destroy gram positions), which is exactly why this operator explodes
first and windows after.

Scale notes (100 TB):
- the posexplode fan-out is O(total tokens) single-token rows — the
  same volume every tokenizing operator already scans, shuffled ONCE
  on doc_id;
- per-doc window state is w hashes (bounded, tiny);
- the fingerprint table (doc_id, fp) is the ETL-time artifact —
  expected 2/(w+1) of the gram count — written bucketed by fp so the
  candidate-pair join is co-located;
- pair enumeration is fp-keyed (the LSH band-join shape) with a
  document-frequency cap bounding bucket fan-out; a boilerplate
  fingerprint shared by millions of docs is dropped by the cap (it
  carries no discriminative signal), identically on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from bigdatamanagement_spark.operators.text import tokens

K_WORDS = 4  # words per gram
W_WINDOW = 4  # gram hashes per winnowing window


def gram_hashes(
    df: DataFrame, id_col: str, text_col: str, k: int = K_WORDS
) -> DataFrame:
    """(doc_id, pos, h): 60-bit portable hash of the k-word gram starting
    at token position ``pos`` (0-based); h is NULL for the k-1 tail
    positions (lead() runs off the document). One doc-keyed exchange."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts: list[Column] = [F.col("tok")]
    for j in range(1, k):
        parts += [F.lit(" "), F.lead("tok", j).over(w)]
    gram = F.concat(*parts)  # concat null-propagates: tail grams -> NULL
    return toks.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long").alias("h"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = K_WORDS,
    w: int = W_WINDOW,
) -> DataFrame:
    """(doc_id, fp): the distinct winnowed fingerprint set — min gram
    hash of every complete w-gram window. Docs shorter than k+w-1
    tokens yield no rows (no complete window exists)."""
    g = gram_hashes(df, id_col, text_col, k)
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        g.select(
            "doc_id",
            F.min("h").over(win).alias("fp"),
            F.count("h").over(win).alias("_n"),
        )
        .where(F.col("_n") == w)
        .select("doc_id", "fp")
        .distinct()
    )


def candidate_pairs(
    fps: DataFrame, df_cap: int = 16, min_shared: int = 2
) -> DataFrame:
    """(doc_a, doc_b, shared): unordered doc pairs sharing at least
    ``min_shared`` fingerprints, counted over fingerprints whose
    document frequency is at most ``df_cap`` (hot boilerplate
    fingerprints are non-discriminative and would otherwise fan a
    single bucket quadratically — the same cap discipline as the LSH
    band join)."""
    # Pin the fingerprint table before its three references (df filter +
    # both self-join sides): callers hand in a derived pipeline (e.g.
    # t76's gram hashes behind a doc-keyed window) that would otherwise
    # re-execute once per branch. The capped table pins too — the
    # self-join reads it twice.
    fps = fps.localCheckpoint()
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("fp")
    )
    t = fps.join(keep, "fp").localCheckpoint()
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
