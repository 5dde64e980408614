"""Embedding seam tests — V1: JVM path == pandas provider path."""

from __future__ import annotations

import numpy as np

from ai_iceberg_demo_spark.functions.embedding import (
    DEFAULT_DIM,
    embed_texts,
    hash_embed_df,
)
from ai_iceberg_demo_spark.tables import load_table
from tests.conftest import SF_DIR


def _as_matrix(rows, col="embedding"):
    return np.array([list(r[col]) for r in rows])


def test_jvm_and_pandas_paths_agree(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(100)
    jvm = hash_embed_df(docs).orderBy("doc_id").collect()
    seam = (
        embed_texts(docs).select("doc_id", "embedding").orderBy("doc_id").collect()
    )
    assert [r.doc_id for r in jvm] == [r.doc_id for r in seam]
    assert np.allclose(_as_matrix(jvm), _as_matrix(seam), atol=1e-9)


def test_embedding_is_unit_norm_and_deterministic(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(50)
    a = _as_matrix(hash_embed_df(docs).orderBy("doc_id").collect())
    b = _as_matrix(hash_embed_df(docs).orderBy("doc_id").collect())
    assert np.array_equal(a, b)
    norms = np.sqrt((a * a).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-4)  # components rounded to 6dp
    assert a.shape[1] == DEFAULT_DIM


def test_identical_texts_embed_identically(spark):
    docs = spark.createDataFrame(
        [(1, "spark join shuffle"), (2, "spark join shuffle"), (3, "totally different words")],
        "doc_id long, text string",
    )
    m = {r.doc_id: np.array(r.embedding) for r in hash_embed_df(docs).collect()}
    assert np.array_equal(m[1], m[2])
    cos_13 = float(m[1] @ m[3])
    assert cos_13 < 0.99


def test_custom_provider_is_used(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")

    def ones_provider(texts):
        return np.ones((len(texts), 4))

    out = embed_texts(docs, dim=4, provider=ones_provider).collect()
    assert list(out[0].embedding) == [1.0, 1.0, 1.0, 1.0]
