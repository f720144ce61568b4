"""BPE tokenizer training (merge discovery) as a declarative plan.

The byte-pair-encoding trainer (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016): start from
character symbols, repeatedly merge the most frequent adjacent symbol
pair. The reference has no tokenizer surface at all; a training-data
engine needs one (SURVEY §7.8 token counting is the APPLY side; this is
the TRAIN side).

Spark-first shape — NO driver loop, unlike the PageRank power method:
each round is expressed lazily, with the round's winning pair carried as
a ONE-ROW DataFrame cross-joined into the next round's merge expression.
The whole K-round training is a single declarative plan both engines can
run, so the oracle is chained CTEs with the argmax recomputed in SQL —
no constants baked from the Spark run.

Two cross-engine-portable primitives make this possible:
- symbol sequences are strings with every symbol wrapped in its own
  begin/end markers (``\x1e x \x1f``), so "merge pair (x, y)" is
  ``replace(s, '\x1ex\x1f\x1ey\x1f', '\x1exy\x1f')`` — string replace
  scans left-to-right non-overlapping in BOTH engines, which is
  exactly BPE's greedy merge semantics, and per-symbol markers mean
  back-to-back merge sites share NO characters (a single shared
  delimiter would make ``abab`` merge only once: the first
  replacement eats the boundary the second needs);
- pair counting splits the string and counts adjacent pairs weighted
  by corpus token frequency (exact BIGINT sums).

Scale: the corpus-frequency aggregate is one token-keyed shuffle; the
symbol table is VOCABULARY-sized (distinct tokens), not corpus-sized,
so the per-round work is small regardless of corpus volume. The vocab
table localCheckpoints once (it is the at-ingest vocab count — the same
materialization the unigram-LM scorer uses).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

RS = "\x1e"  # symbol-begin marker
US = "\x1f"  # symbol-end marker


def _adjacent_pairs(syms: DataFrame) -> DataFrame:
    """(sym_a, sym_b, cnt): adjacent-symbol pair counts weighted by
    token frequency. `syms` has (freq long, s string) with every symbol
    wrapped as \\x1e<sym>\\x1f."""
    t = F.split(F.substring(F.col("s"), F.lit(2), F.length("s") - 2), US + RS)
    pairs = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        syms.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("sym_a"), F.col("p.b").alias("sym_b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(vocab: DataFrame, rounds: int = 6) -> DataFrame:
    """Run `rounds` BPE merge rounds over a (token, freq) vocabulary.

    Returns one row per round: (round, sym_a, sym_b, merged, cnt) —
    the merge table a BPE tokenizer ships. Ties break (cnt DESC,
    sym_a ASC, sym_b ASC), so training is deterministic.
    """
    # The symbol table is vocabulary-sized; pin it once so the K-round
    # lazy chain doesn't re-run the corpus-frequency shuffle per round.
    syms = vocab.select(
        F.col("freq").cast("long").alias("freq"),
        F.regexp_replace(F.col("token"), "(.)", RS + "$1" + US).alias("s"),
    ).localCheckpoint(eager=True)

    out = None
    for r in range(1, rounds + 1):
        pairs = _adjacent_pairs(syms)
        win = pairs.orderBy(
            F.desc("cnt"), F.asc("sym_a"), F.asc("sym_b")
        ).limit(1)
        row = win.select(
            F.lit(r).alias("round"),
            "sym_a",
            "sym_b",
            F.concat("sym_a", "sym_b").alias("merged"),
            "cnt",
        )
        out = row if out is None else out.unionAll(row)
        syms = syms.crossJoin(F.broadcast(win.select("sym_a", "sym_b"))).select(
            "freq",
            F.replace(
                F.col("s"),
                F.concat(
                    F.lit(RS), "sym_a", F.lit(US + RS), "sym_b", F.lit(US)
                ),
                F.concat(F.lit(RS), "sym_a", F.col("sym_b"), F.lit(US)),
            ).alias("s"),
        )
    return out.orderBy("round")


def bpe_oracle_sql(vocab_sql: str, rounds: int = 6) -> str:
    """Chained-CTE DuckDB mirror: `vocab_sql` must be a CTE body
    producing (token, freq). Each round recomputes the argmax in SQL
    and carries it by cross join — same plan shape as the Spark side."""
    parts = [
        f"WITH vocab AS ({vocab_sql}),",
        "s0 AS (SELECT CAST(freq AS BIGINT) AS freq,"
        f" regexp_replace(token, '(.)', '{RS}\\1{US}', 'g') AS s FROM vocab)",
    ]
    sel = []
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""",p{r} AS (
                SELECT t[i] AS sym_a, t[i + 1] AS sym_b,
                       CAST(SUM(freq) AS BIGINT) AS cnt
                FROM (SELECT freq,
                             string_split(substr(s, 2, length(s) - 2),
                                          '{US}{RS}') AS t
                      FROM {prev}),
                     unnest(generate_series(1, len(t) - 1)) g(i)
                GROUP BY 1, 2
            ),
            w{r} AS (SELECT sym_a, sym_b, cnt FROM p{r}
                     ORDER BY cnt DESC, sym_a ASC, sym_b ASC LIMIT 1),
            s{r} AS (SELECT freq,
                            replace(s, '{RS}' || sym_a || '{US}{RS}' || sym_b || '{US}',
                                       '{RS}' || sym_a || sym_b || '{US}') AS s
                     FROM {prev}, w{r})"""
        )
        sel.append(
            f"SELECT {r} AS round, sym_a, sym_b,"
            f" sym_a || sym_b AS merged, cnt FROM w{r}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(sel) + "\nORDER BY round")
    return "\n".join(parts)


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """APPLY a trained merge table: encode every whitespace token of
    ``docs[text_col]`` with the merges (in round order) and add a
    ``n_pieces`` column — the corpus-side token accounting a trained
    tokenizer produces.

    The merge chain is built by COLLECTING the merge table (it is the
    tokenizer model — KBs, broadcast-sized by definition) and folding
    the same marker-string replace over the per-token symbol strings.
    One narrow map over the corpus; no shuffle."""
    rows = merges.orderBy("round").collect()
    toks = F.split(F.lower(F.trim(text_col)), "\\s+")
    enc = F.transform(toks, lambda t: F.regexp_replace(t, "(.)", RS + "$1" + US))

    # a closure factory, NOT `lambda s, _r=r`: PySpark reads lambda arity
    # to pick unary-vs-(element, index) form, so a default arg silently
    # turns the captured row into the index Column
    def merge_step(sym_a: str, sym_b: str):
        return lambda s: F.replace(
            s,
            F.lit(RS + sym_a + US + RS + sym_b + US),
            F.lit(RS + sym_a + sym_b + US),
        )

    for r in rows:
        enc = F.transform(enc, merge_step(r["sym_a"], r["sym_b"]))
    n_pieces = F.aggregate(
        enc,
        F.lit(0),
        lambda acc, s: acc
        + F.when(F.length(s) == 0, F.lit(0)).otherwise(
            F.length(s) - F.length(F.replace(s, F.lit(US), F.lit("")))
        ),
    )
    return docs.withColumn("n_pieces", n_pieces)


def bpe_apply_oracle_sql(vocab_sql: str, rounds: int = 6) -> str:
    """DuckDB mirror of train-then-apply: reuses the training CTE chain
    (w1..wK winners) and folds the same replaces over every corpus
    token, summarizing pieces per source."""
    train = bpe_oracle_sql(vocab_sql, rounds)
    # keep only the WITH-chain (drop the final merge-table SELECT)
    chain = train[: train.rindex("\nSELECT 1 AS round")]
    apply_ctes = [
        ",e0 AS (SELECT source, regexp_replace(tok, '(.)', "
        f"'{RS}\\1{US}', 'g') AS s FROM "
        "(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok"
        " FROM documents))"
    ]
    for r in range(1, rounds + 1):
        apply_ctes.append(
            f",e{r} AS (SELECT source,"
            f" replace(s, '{RS}' || sym_a || '{US}{RS}' || sym_b || '{US}',"
            f" '{RS}' || sym_a || sym_b || '{US}') AS s"
            f" FROM e{r - 1}, w{r})"
        )
    final = (
        f"\nSELECT source, COUNT(*) AS n_tokens,"
        f" CAST(SUM(length(s) - length(replace(s, '{US}', ''))) AS BIGINT)"
        f" AS total_pieces"
        f" FROM e{rounds} GROUP BY source ORDER BY source"
    )
    return chain + "\n" + "\n".join(apply_ctes) + final
