"""Oracle + property tests for the perplexity-tier pack (T66)."""

from bigdatamanagement_spark.queries import analytics48
from tests.conftest import assert_matches_oracle


def test_t66_oracle(spark, duck, sf_dir):
    df = analytics48.perplexity_tiers(spark, sf_dir)
    assert_matches_oracle(df, duck, analytics48.ORACLE["t66_perplexity_tiers"])


def test_tiers_partition_the_corpus(spark, duck, sf_dir):
    """Tier doc counts sum to the corpus; tier sizes are near-equal
    thirds; mean NLL is non-decreasing in tier (head < tail)."""
    rows = analytics48.perplexity_tiers(spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    n_corpus = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert n_total == n_corpus
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r.tier, [0, 0, 0])
        by_tier[r.tier][0] += r.n_docs
        by_tier[r.tier][1] += r.mean_nll_per_tok_micro * r.n_docs
        by_tier[r.tier][2] += 1
    sizes = [v[0] for _, v in sorted(by_tier.items())]
    assert max(sizes) - min(sizes) <= 1
    # corpus-level tier means must be monotone (tier 1 = lowest NLL)
    means = [v[1] / v[0] for _, v in sorted(by_tier.items())]
    assert means == sorted(means)
