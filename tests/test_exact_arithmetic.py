"""Cross-engine pins for the exact-arithmetic helpers
(operators/common.py) on ADVERSARIAL values — the 0.50145 class where
engine round() demonstrably splits (Spark rounds the decimal string,
DuckDB the binary double) and where a float aggregate could land
either side of a floor boundary.
"""

import duckdb
import pytest

# values whose nearest double sits a hair BELOW the printed midpoint
# (0.50145 is the historical sf0.1 flake), plus exact representables,
# negatives, and magnitude extremes of the testdata columns
NASTY = [
    0.50145,
    0.50155,
    0.07,
    0.1,
    19.98,
    104999.91,
    499993.18,
    -19.98,
    -0.04,
    0.005,
    -0.005,
    123456.78,
    0.0,
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_exact_scaled_int_agrees_and_reconstructs(spark, duck):
    """floor(x*100+0.5) as BIGINT must agree bit-for-bit between
    engines and reconstruct the 2-dp decimal (x == cents/100.0)."""
    from swift_readability_spark.operators.common import exact_scaled_int

    expr = exact_scaled_int("x")
    df = spark.createDataFrame([(v,) for v in NASTY], "x double")
    got_spark = [
        r[0] for r in df.selectExpr(f"{expr} AS c").orderBy("c").collect()
    ]
    got_duck = sorted(
        r[0]
        for r in duck.sql(
            "SELECT " + expr + " AS c FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            params=[NASTY],
        ).fetchall()
    )
    assert got_spark == got_duck
    # reconstruction: for 2-dp inputs the scaled int divided back is
    # the original double (0.005/-0.005 are 3-dp — they half-up to the
    # nearest cent by design, so they are excluded here)
    two_dp = [v for v in NASTY if v == round(v * 100) / 100]
    df2 = spark.createDataFrame([(v,) for v in two_dp], "x double")
    recon = [
        r[0]
        for r in df2.selectExpr(f"CAST({expr} AS DOUBLE) / 100.0 AS y")
        .orderBy("y")
        .collect()
    ]
    assert recon == sorted(two_dp)


def test_fround_agrees_on_midpoint_class(spark, duck):
    """fround (floor(x*10^k + 0.5)/10^k) must agree between engines on
    the string-vs-binary midpoint values where engine round() is KNOWN
    to split — and this test pins that split as the motivation."""
    from swift_readability_spark.operators.common import fround

    expr = fround("x", 4)
    df = spark.createDataFrame([(v,) for v in NASTY], "x double")
    got_spark = sorted(
        r[0] for r in df.selectExpr(f"{expr} AS y").collect()
    )
    got_duck = sorted(
        r[0]
        for r in duck.sql(
            "SELECT " + expr + " AS y FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            params=[NASTY],
        ).fetchall()
    )
    assert got_spark == got_duck
    # the motivating split: engine round() DISAGREES on 0.50145
    spark_round = spark.sql("SELECT round(0.50145D, 4)").collect()[0][0]
    duck_round = duck.sql("SELECT round(0.50145::DOUBLE, 4)").fetchone()[0]
    assert spark_round != duck_round, (
        "engine round() now agrees on 0.50145 — if Spark changed its "
        "string-based rounding, fround may no longer be needed"
    )


def test_sum64_and_sum128_agree_with_hugeint(spark, duck):
    """Exact integer sums: Spark's int64 fast path and the
    DECIMAL(38,0) 128-bit path must both equal DuckDB's HUGEINT sum,
    and casting the total to DOUBLE must agree bit-for-bit."""
    from swift_readability_spark.operators.common import (
        exact_scaled_int,
        spark_sum64,
        spark_sum128,
    )

    vals = NASTY * 1000  # 13k rows, partial sums across partitions
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(16)
    c = exact_scaled_int("x")
    row = df.selectExpr(
        f"CAST({spark_sum64(c)} AS DOUBLE) AS s64",
        f"CAST({spark_sum128(c)} AS DOUBLE) AS s128",
    ).collect()[0]
    duck_total = duck.sql(
        f"SELECT CAST(sum({c}) AS DOUBLE) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        params=[vals],
    ).fetchone()[0]
    assert row.s64 == duck_total
    assert row.s128 == duck_total


def test_corr_zero_variance_stratum_is_null_both_engines(spark, duck, tmp_path):
    """ADVICE r05: a market segment with zero variance in balance (or
    spend) must yield NULL corr in BOTH engines — never Infinity/NaN
    from the x/0.0 division (Spark) or an engine-specific inf/NULL
    (DuckDB)."""
    from swift_readability_spark.operators.relational import (
        CUSTOMER_CORR_SQL,
        customer_value_correlation,
    )

    # DEGEN: three customers, identical balances (variance 0), varying
    # spend.  LIVE: varying balances and spends (corr well-defined).
    customers = [
        (1, "DEGEN", 100.00), (2, "DEGEN", 100.00), (3, "DEGEN", 100.00),
        (4, "LIVE", 10.00), (5, "LIVE", 20.00), (6, "LIVE", 30.00),
    ]
    orders = [
        (10, 1, 50.00), (11, 2, 75.00), (12, 3, 99.00),
        (13, 4, 11.00), (14, 5, 22.00), (15, 6, 35.00),
    ]
    spark.createDataFrame(
        customers, "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")

    got = {
        r["c_mktsegment"]: r["bal_spend_corr"]
        for r in customer_value_correlation(spark, str(tmp_path)).collect()
    }
    assert got["DEGEN"] is None
    assert got["LIVE"] is not None and abs(got["LIVE"] - 1.0) < 0.05

    duck.sql(
        f"CREATE OR REPLACE VIEW customer AS SELECT * FROM read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    duck.sql(
        f"CREATE OR REPLACE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    oracle = {
        seg: corr
        for seg, _n, corr, _cov in duck.sql(CUSTOMER_CORR_SQL).fetchall()
    }
    assert oracle["DEGEN"] is None
    assert oracle["LIVE"] == got["LIVE"]


def test_vertical_tab_whitespace_agrees_both_engines(spark, duck, tmp_path):
    """The Java-vs-RE2 \\s divergence class (ADVICE r05), closed
    corpus-wide in round 6: every oracled tokenization/normalization
    uses the explicit [ \\t\\n\\x0b\\f\\r] class, so a document
    containing a vertical tab (in Java's \\s but NOT RE2's) produces
    identical token counts and content hashes in both engines."""
    rows = [
        (0, "alpha\x0bbeta gamma", "en", "s", 16),
        (1, "plain text here", "en", "s", 15),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    duck.sql(
        f"CREATE OR REPLACE VIEW documents AS"
        f" SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )

    from swift_readability_spark.operators.curation import (
        CORPUS_REPORT_SQL,
        corpus_report,
    )
    from swift_readability_spark.operators.dedup import DEDUP_EXACT_SQL, dedup_exact
    from swift_readability_spark.operators.text import (
        NORM_LENGTH_SQL,
        PII_SQL,
        QUALITY_SQL,
        TOKEN_COUNTS_SQL,
        normalized_text_length,
        pii_scan,
        quality_score,
        token_counts,
    )

    for builder, sql in (
        (token_counts, TOKEN_COUNTS_SQL),
        (dedup_exact, DEDUP_EXACT_SQL),
        (quality_score, QUALITY_SQL),
        (normalized_text_length, NORM_LENGTH_SQL),
        (pii_scan, PII_SQL),
        (corpus_report, CORPUS_REPORT_SQL),
    ):
        s_rows = sorted(
            [tuple(r) for r in builder(spark, str(tmp_path)).collect()]
        )
        d_rows = sorted([tuple(r) for r in duck.sql(sql).fetchall()])
        assert s_rows == d_rows, (builder.__name__, s_rows, d_rows)
    # the \x0b doc must actually tokenize as 3 words (non-vacuous)
    toks = {r.doc_id: r.ws_tokens for r in token_counts(spark, str(tmp_path)).collect()}
    assert toks[0] == 3
