"""Derive an NX-scale perf-rehearsal fixture from an existing sf dir.

The driver ships sf{0.001,0.01,0.1}; the 100 TB charter wants evidence
that headline plans survive another 10x, so this tool replicates a
fixture N times with key-offset remapping and writes it to a scratch
dir (default /tmp/sf1). It is a PERF fixture only — correctness
oracles keep running against the driver's own parquet.

Replication preserves what the plans depend on:
- referential structure: copy c offsets every key by c * (max_key+1)
  and remaps FKs to copy c's parents, so join fan-outs and group
  cardinalities scale like real data (10x orders, 10x customers,
  same orders-per-customer);
- nation/region stay fixed (dims: broadcast either way);
- events keep their timestamps (10x rows per window pane — the
  realistic direction for windowed aggs) with user_id/event_id offset;
- documents get a copy-specific token interleaved every 6 words, so a
  copy's INTERNAL near-dup structure mirrors the original (both
  members of a dup pair get the same insertions) while copies of the
  same doc are NOT near-dups of each other (most shingles differ) —
  i.e. 10x the corpus at the ORIGINAL duplicate density. A
  suffix-only change was measured to inflate MinHash/Jaccard
  candidate pairs ~45x at 10x data — a 10x-dup-density workload, not
  a scaling measurement;
- embeddings get a copy-specific offset vector (0.15·sin per dim):
  within-copy cosines are preserved (same offset both sides), while
  cross-copy cosine drops well below dedup thresholds, for the same
  constant-density reason.

Usage: python tools/gen_scale_fixture.py [src_sf_dir] [dst_dir] [N]
"""

from __future__ import annotations

import os
import sys

import duckdb


def generate(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() or 4)}")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    strides = {}
    for table, key in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        strides[table] = con.sql(f"SELECT MAX({key}) + 1 FROM {t(table)}").fetchone()[0]
    strides["user"] = con.sql(f"SELECT MAX(user_id) + 1 FROM {t('events')}").fetchone()[0]

    copies = f"(SELECT UNNEST(RANGE({n})) AS c)"
    sqls = {
        "nation": f"SELECT * FROM {t('nation')}",
        "region": f"SELECT * FROM {t('region')}",
        "customer": f"""
            SELECT c_custkey + c * {strides['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {t('customer')}, {copies}""",
        "supplier": f"""
            SELECT s_suppkey + c * {strides['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {t('supplier')}, {copies}""",
        "part": f"""
            SELECT p_partkey + c * {strides['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {t('part')}, {copies}""",
        "orders": f"""
            SELECT o_orderkey + c * {strides['orders']} AS o_orderkey,
                   o_custkey + c * {strides['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {t('orders')}, {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + c * {strides['orders']} AS l_orderkey,
                   l_partkey + c * {strides['part']} AS l_partkey,
                   l_suppkey + c * {strides['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {t('lineitem')}, {copies}""",
        "events": f"""
            SELECT event_id + c * {strides['events']} AS event_id, ts,
                   user_id + c * {strides['user']} AS user_id,
                   event_type, value, props
            FROM {t('events')}, {copies}""",
        "documents": f"""
            SELECT doc_id + c * {strides['documents']} AS doc_id,
                   CASE WHEN c = 0 THEN text
                        ELSE ARRAY_TO_STRING(FLATTEN(LIST_TRANSFORM(
                                 STR_SPLIT(text, ' '),
                                 (w, i) -> CASE WHEN i % 6 = 0
                                                THEN [w, 's' || c]
                                                ELSE [w] END)), ' ') END AS text,
                   lang, source,
                   LENGTH(CASE WHEN c = 0 THEN text
                               ELSE ARRAY_TO_STRING(FLATTEN(LIST_TRANSFORM(
                                        STR_SPLIT(text, ' '),
                                        (w, i) -> CASE WHEN i % 6 = 0
                                                       THEN [w, 's' || c]
                                                       ELSE [w] END)), ' ') END)
                       AS n_chars
            FROM {t('documents')}, {copies}""",
        "embeddings": f"""
            SELECT vec_id + c * {strides['embeddings']} AS vec_id,
                   CAST(LIST_TRANSFORM(embedding,
                        (x, i) -> CASE WHEN c = 0 THEN x
                                       ELSE x + 0.15 * SIN(c * 131 + i * 17) END)
                        AS FLOAT[]) AS embedding,
                   label
            FROM {t('embeddings')}, {copies}""",
    }
    # The planted-twin salting convention reserves doc_id >= 2e6
    # (vector/dedup.py _TWIN_DOC_OFFSET); a fixture whose genuine
    # doc_ids cross it would be silently misclassified by the oracle
    # side of d3/d6/d7/d2b. The Spark side also guards per-row.
    max_doc = strides["documents"] * n - 1
    if max_doc >= 2_000_000:
        raise SystemExit(
            f"replicated max doc_id {max_doc} >= _TWIN_DOC_OFFSET 2000000: "
            "raise the offset in vector/dedup.py (and its oracle twins) "
            "before generating a fixture this large"
        )
    # same convention for the embeddings table: d5b reserves
    # vec_id >= 1e6 for planted twins (vector/dedup.py _D5B_TWIN_OFFSET)
    max_vec = strides["embeddings"] * n - 1
    if max_vec >= 1_000_000:
        raise SystemExit(
            f"replicated max vec_id {max_vec} >= _D5B_TWIN_OFFSET 1000000: "
            "raise the offset in vector/dedup.py (and its oracle twin) "
            "before generating a fixture this large"
        )
    for name, sql in sqls.items():
        out = os.path.join(dst, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {rows} rows -> {out}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, n)
