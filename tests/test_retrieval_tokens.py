"""t22/t23 share f31's pretokenizer: case and punctuation don't split terms.

The r4 verdict flagged that BM25 tokenized by bare split(' ') while f31
shipped a class-aware pretokenizer — invisible on the fixture's
31-token vocabulary, wrong on real text ('spark.' ≠ 'spark'). These
tests pin the unified normalization on constructed corpora where the
difference is visible.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_case_and_punctuation_do_not_split_terms(spark):
    """'Use Spark. SPARK!' holds the term 'spark' twice."""
    from ai_iceberg_demo_spark.functions.text import lexical_terms

    df = spark.createDataFrame([(1, "Use Spark. SPARK!")], "doc_id long, text string")
    row = df.select(lexical_terms(F.col("text")).alias("t")).first()
    assert row["t"] == ["use", "spark", ".", "spark", "!"]
    assert row["t"].count("spark") == 2


def test_bm25_scores_identical_for_cased_and_punctuated_twin(spark):
    """Two docs whose normalized term multisets are equal score equal:
    'Spark. merge' vs 'spark . MERGE' — under split(' ') the first
    would have tf('spark')=0 and the pair would diverge."""
    from ai_iceberg_demo_spark.functions.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "Spark. merge"),
            (2, "spark . MERGE"),
            (3, "stream filler words here"),  # keep df/idf non-degenerate
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs).collect()}
    assert 1 in got and 2 in got
    assert got[1] == got[2]
    assert got[1] > 0


def test_spark_terms_match_duckdb_twin(spark):
    """lexical_terms and lexical_terms_sql produce identical arrays on
    mixed-class text (the property the t22/t23 oracle hash rests on)."""
    import duckdb

    from ai_iceberg_demo_spark.functions.text import lexical_terms, lexical_terms_sql

    text = "It's 2026: Spark-SQL beats split(' ') by 10x, isn't it?"
    df = spark.createDataFrame([(text,)], "text string")
    spark_toks = df.select(lexical_terms(F.col("text")).alias("t")).first()["t"]
    con = duckdb.connect()
    con.execute("CREATE TABLE one(text VARCHAR)")
    con.execute("INSERT INTO one VALUES (?)", [text])
    duck_toks = con.execute(
        f"SELECT {lexical_terms_sql('text')} AS t FROM one"
    ).fetchone()[0]
    assert spark_toks == duck_toks
