"""Property-based invariants (hypothesis) for the text/vector operators.

The oracle suite pins exact values on the fixtures; these pin the
*algebraic* properties that must hold on ANY input — the contracts a
user of the engine relies on when their data doesn't look like TPC-H.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.functions.embedding import DEFAULT_DIM, hash_embed_df
from ai_iceberg_demo_spark.functions.text import CHUNK_OVERLAP, CHUNK_SIZE, chunk_starts

# modest example counts: every example runs a (local, small) Spark job
PROP = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

# BMP-but-not-surrogate text so Python slicing and Spark substring agree
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), min_size=0, max_size=2600
)
_words = st.lists(st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=8), min_size=1, max_size=30)


@PROP
@given(texts=st.lists(_text, min_size=1, max_size=6))
def test_chunking_reconstructs_text(spark, texts):
    """chunks[0] + tail-of-each-subsequent-chunk == original text, and
    no chunk exceeds CHUNK_SIZE — for arbitrary text, not fixtures."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING")
    rows = (
        df.select("doc_id", "text", F.posexplode(chunk_starts(F.col("text"))).alias("idx", "start"))
        .select("doc_id", "idx", F.substring("text", F.col("start") + 1, CHUNK_SIZE).alias("chunk"))
        .collect()
    )
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["idx"], r["chunk"]))
    for i, t in enumerate(texts):
        chunks = [c for _, c in sorted(by_doc[i])]
        assert all(len(c) <= CHUNK_SIZE for c in chunks)
        rebuilt = chunks[0] + "".join(c[CHUNK_OVERLAP:] for c in chunks[1:])
        assert rebuilt == t


@PROP
@given(words=_words)
def test_hash_embedding_is_unit_norm_and_order_invariant(spark, words):
    """Embedding has unit l2 norm, ignores token order, and doubling
    the document leaves the (normalized) vector unchanged."""
    forward = " ".join(words)
    reversed_ = " ".join(reversed(words))
    doubled = forward + " " + forward
    df = spark.createDataFrame(
        [(0, forward), (1, reversed_), (2, doubled)], "doc_id INT, text STRING"
    )
    out = {r["doc_id"]: r["embedding"] for r in hash_embed_df(df).collect()}
    norm = math.sqrt(sum(x * x for x in out[0]))
    assert abs(norm - 1.0) < 1e-4
    assert out[0] == out[1], "token order changed the embedding"
    assert out[0] == out[2], "doubling the doc changed the normalized embedding"
    assert len(out[0]) == DEFAULT_DIM


@PROP
@given(words=_words, salt=st.integers(min_value=2, max_value=8))
def test_salted_collect_equals_plain_on_generated_data(spark, words, salt):
    from ai_iceberg_demo_spark.operators.skew import salted_collect_list

    df = spark.createDataFrame(
        [(w[0], w, i) for i, w in enumerate(words)], "k STRING, v STRING, rid INT"
    )
    plain = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r["k"]: sorted(r["v_list"])
        for r in salted_collect_list(df, "k", "v", salt_from=["rid"], n_salts=salt).collect()
    }
    assert plain == salted


@PROP
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user_id
            st.integers(min_value=0, max_value=20),     # ts (seconds)
            st.sampled_from(["click", "purchase", "view"]),
            st.floats(min_value=0, max_value=10, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_join_matches_python_reference(spark, events):
    """j8's window formulation equals the naive per-row 'latest click
    at-or-before' definition on arbitrary (possibly ts-colliding) data."""
    from datetime import datetime, timedelta

    from ai_iceberg_demo_spark.operators.joins import asof_attach

    base = datetime(2024, 1, 1)
    rows = [
        (i, u, base + timedelta(seconds=ts), et, v)
        for i, (u, ts, et, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )
    got = {
        r["event_id"]: (r["click_event_id"], r["click_value"])
        for r in asof_attach(df).collect()
    }
    purchases = [r for r in rows if r[3] == "purchase"]
    assert set(got) == {r[0] for r in purchases}, "every purchase appears exactly once"
    for eid, u, ts, _, _ in purchases:
        clicks = [r for r in rows if r[3] == "click" and r[1] == u and r[2] <= ts]
        expect = max(clicks, key=lambda r: (r[2], r[0]), default=None)
        if expect is None:
            assert got[eid] == (None, None), f"purchase {eid}: expected no match"
        else:
            assert got[eid] == (expect[0], expect[4]), f"purchase {eid}"


def test_winnowing_robust_to_padding(spark):
    """Whitespace padding perturbs only boundary k-grams: the winnowed
    fingerprint sets of text and '  text  ' overlap heavily — the
    property that makes winnowing the byte-level near-dup key (t16)."""
    from ai_iceberg_demo_spark.functions.text import winnow_df
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR).limit(20).select("doc_id", "text")
    padded = docs.select("doc_id", F.concat(F.lit("  "), "text", F.lit("  ")).alias("text"))
    a = {r["doc_id"]: set(r["fingerprints"]) for r in winnow_df(docs).collect()}
    b = {r["doc_id"]: set(r["fingerprints"]) for r in winnow_df(padded).collect()}
    for doc_id, fps in a.items():
        inter = len(fps & b[doc_id])
        union = len(fps | b[doc_id])
        assert inter / union >= 0.8, f"doc {doc_id}: jaccard {inter/union:.2f}"


def test_histogram_sketch_is_mergeable_and_within_one_bin_of_exact(spark):
    """a11b's contract: (1) per-shard histograms sum elementwise to the
    whole-table histogram (the mergeability that makes it incremental);
    (2) every interpolated quantile sits within one bin width of the
    exact holistic percentile (a11)."""
    from ai_iceberg_demo_spark.operators.aggregates import (
        _HIST_PS,
        _HIST_W,
        a11b_histogram_quantiles,
        price_histogram,
    )
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, "lineitem", SF_DIR)

    direct = {
        (r["l_returnflag"], r["bin"]): r["cnt"]
        for r in price_histogram(li).collect()
    }
    # build 7 genuinely independent per-shard histograms, then merge by
    # elementwise addition — must equal the whole-table histogram
    shards = [
        price_histogram(li.filter(F.col("l_orderkey") % 7 == k)) for k in range(7)
    ]
    merged: dict = {}
    for shard in shards:
        for r in shard.collect():
            key = (r["l_returnflag"], r["bin"])
            merged[key] = merged.get(key, 0) + r["cnt"]
    assert merged == direct

    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.percentile("l_extendedprice", F.lit(p)).alias(f"q{int(p*100)}")
                for p in _HIST_PS
            ]
        )
        .collect()
    }
    for r in a11b_histogram_quantiles(spark, SF_DIR).collect():
        for p in _HIST_PS:
            col = f"q{int(p*100)}"
            assert abs(r[col] - exact[r["l_returnflag"]][col]) <= _HIST_W, (
                r["l_returnflag"], col)


def test_zorder_key_is_bijective_and_prunes_box_queries(spark):
    """o6: the Morton key is a bijection of the (xb, yb) bucket pair,
    stays in [0, 2^16), and a 2-d box query touches no more target
    files under the z layout than under a single-dimension linear
    layout — the property that justifies paying for the clustering
    write."""
    from ai_iceberg_demo_spark.operators.ordering_sets import (
        _Z_FILE_SPAN,
        o6_zorder_key,
    )
    from tests.conftest import SF_DIR

    rows = o6_zorder_key(spark, SF_DIR).collect()
    assert rows
    pairs = {(r["xb"], r["yb"]) for r in rows}
    zvals = {r["zvalue"] for r in rows}
    assert len(zvals) == len(pairs)  # bijection on observed buckets
    assert all(0 <= r["zvalue"] < 1 << 16 for r in rows)
    assert all(r["zfile"] == r["zvalue"] // _Z_FILE_SPAN for r in rows)

    # 16x16 box anchored at the densest observed corner
    x0 = min(r["xb"] for r in rows)
    y0 = min(r["yb"] for r in rows)
    box = [r for r in rows if x0 <= r["xb"] < x0 + 16 and y0 <= r["yb"] < y0 + 16]
    assert box
    z_files = {r["zfile"] for r in box}
    linear_files = {(r["xb"] * 256 + r["yb"]) // _Z_FILE_SPAN for r in box}
    assert len(z_files) <= len(linear_files)


@given(
    st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60)
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_packing_split_tiles_any_token_distribution(spark, token_counts):
    """u19's segment math on arbitrary doc sizes (including docs far
    larger than one bin): complete tiling, interior bins exactly full,
    segments never cross boundaries."""
    from collections import defaultdict

    from ai_iceberg_demo_spark.operators.sampling import (
        PACK_BUDGET,
        pack_positions,
    )
    import pyspark.sql.functions as PF

    rows = [(i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    packed = pack_positions(df, order_col="doc_id", tokens_col="n")
    budget = PF.lit(PACK_BUDGET).cast("bigint")
    s = PF.col("bin_id") * budget + PF.col("bin_offset")
    end = s + PF.col("n")
    segs = packed.select(
        "doc_id", "n", s.alias("s"),
        PF.explode(PF.sequence((s / budget).cast("bigint"),
                               ((end - 1) / budget).cast("bigint"))).alias("b"),
    )
    seg_start = PF.greatest(PF.col("s"), PF.col("b") * budget)
    seg_end = PF.least(PF.col("s") + PF.col("n"), (PF.col("b") + 1) * budget)
    out = segs.select(
        "doc_id", "b", (seg_end - seg_start).alias("seg_len"),
        (seg_start - PF.col("b") * budget).alias("bin_offset"),
    ).collect()

    per_doc = defaultdict(int)
    per_bin = defaultdict(int)
    for r in out:
        assert r["seg_len"] > 0
        assert r["bin_offset"] + r["seg_len"] <= PACK_BUDGET
        per_doc[r["doc_id"]] += r["seg_len"]
        per_bin[r["b"]] += r["seg_len"]
    assert per_doc == dict(rows)
    for b, filled in per_bin.items():
        if b != max(per_bin):
            assert filled == PACK_BUDGET


@given(
    st.dictionaries(st.integers(0, 60), st.integers(0, 5), min_size=1, max_size=40),
    st.data(),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_snapshot_diff_recovers_arbitrary_mutations(spark, old_rows, data):
    """m8's engine (snapshot_diff): for ANY old snapshot and ANY
    generated set of deletes/updates/inserts, the diff classifies
    exactly the mutated keys — nothing missed, nothing invented."""
    from ai_iceberg_demo_spark.operators.mutations import snapshot_diff

    keys = sorted(old_rows)
    deletes = set(data.draw(st.lists(st.sampled_from(keys), unique=True,
                                     max_size=len(keys))))
    updatable = [k for k in keys if k not in deletes]
    updates = set(data.draw(st.lists(st.sampled_from(updatable), unique=True,
                                     max_size=len(updatable)))) if updatable else set()
    inserts = {k + 1000: 9 for k in data.draw(
        st.lists(st.integers(0, 60), unique=True, max_size=10))}

    new_rows = {
        k: (v + 100 if k in updates else v)
        for k, v in old_rows.items() if k not in deletes
    }
    new_rows.update(inserts)

    old_df = spark.createDataFrame(list(old_rows.items()), "k long, v long")
    new_df = spark.createDataFrame(list(new_rows.items()), "k long, v long")
    got = snapshot_diff(old_df, new_df, keys=["k"], compare_cols=["v"]).collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r["change_type"], set()).add(r["k"])
    # updates with v+100 always differ, so expected sets are exact
    assert by_type.get("delete", set()) == deletes
    assert by_type.get("insert", set()) == set(inserts)
    assert by_type.get("update", set()) == updates


@given(
    st.dictionaries(st.integers(0, 60), st.integers(0, 5), min_size=1, max_size=40),
    st.data(),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_changelog_roundtrip_is_identity(spark, old_rows, data):
    """The CDC round-trip law: changelog_apply(old, snapshot_diff(old,
    new)) reconstructs new EXACTLY, for any old snapshot and any
    delete/update/insert combination."""
    from ai_iceberg_demo_spark.operators.mutations import (
        changelog_apply,
        snapshot_diff,
    )

    keys = sorted(old_rows)
    deletes = set(data.draw(st.lists(st.sampled_from(keys), unique=True,
                                     max_size=len(keys))))
    updatable = [k for k in keys if k not in deletes]
    updates = set(data.draw(st.lists(st.sampled_from(updatable), unique=True,
                                     max_size=len(updatable)))) if updatable else set()
    inserts = {k + 1000: 9 for k in data.draw(
        st.lists(st.integers(0, 60), unique=True, max_size=10))}

    new_rows = {
        k: (v + 100 if k in updates else v)
        for k, v in old_rows.items() if k not in deletes
    }
    new_rows.update(inserts)

    old_df = spark.createDataFrame(list(old_rows.items()), "k long, v long")
    new_df = spark.createDataFrame(list(new_rows.items()), "k long, v long")
    diff = snapshot_diff(old_df, new_df, keys=["k"], compare_cols=["v"])
    rebuilt = changelog_apply(old_df, diff, keys=["k"], value_cols=["v"])
    assert {(r["k"], r["v"]) for r in rebuilt.collect()} == set(new_rows.items())


def test_countmin_never_underestimates_and_merges(spark):
    """a16: for EVERY vocabulary token the sketch estimate >= the exact
    count (the count-min guarantee), and summing the sketches of two
    disjoint corpus halves cell-wise equals the whole-corpus sketch
    (mergeability — what lets 100 TB shards sketch independently)."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.operators.aggregates import (
        cms_bucket,
        countmin_sketch,
    )
    from ai_iceberg_demo_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    toks = docs.select("doc_id", PF.explode(PF.split("text", " ")).alias("tok"))
    sketch = countmin_sketch(toks)

    vocab = toks.groupBy("tok").agg(PF.count("*").alias("exact"))
    vb = vocab.select(
        "tok",
        "exact",
        PF.explode(PF.sequence(PF.lit(0), PF.lit(3))).alias("row"),
    ).select("tok", "exact", "row", cms_bucket(PF.col("tok"), PF.col("row")).alias("bucket"))
    est = (
        vb.join(sketch, ["row", "bucket"])
        .groupBy("tok", "exact")
        .agg(PF.min("cnt").alias("estimate"))
    )
    bad = est.filter(PF.col("estimate") < PF.col("exact")).count()
    assert bad == 0

    half_a = countmin_sketch(toks.filter(PF.col("doc_id") % 2 == 0))
    half_b = countmin_sketch(toks.filter(PF.col("doc_id") % 2 == 1))
    merged = (
        half_a.unionByName(half_b)
        .groupBy("row", "bucket")
        .agg(PF.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(sketch).count() == 0
    assert sketch.exceptAll(merged).count() == 0


def test_dataset_manifest_digest_is_layout_free_and_tamper_evident(spark):
    """u25: the content digest must be identical under any partition
    layout (commutative sum) and must CHANGE when any single row's
    text changes (tamper evidence for dataset releases)."""
    import pyspark.sql.functions as PF

    from ai_iceberg_demo_spark.operators.sampling import u25_dataset_manifest
    from ai_iceberg_demo_spark.tables import load_table, clear_table_cache
    from tests.conftest import SF_DIR

    base = {
        (r["source"], r["split"]): r["content_digest"]
        for r in u25_dataset_manifest(spark, SF_DIR).collect()
    }
    assert base

    docs = load_table(spark, "documents", SF_DIR)
    # layout independence: same digest from a deliberately reshuffled frame
    row_digest = PF.conv(
        PF.substring(
            PF.md5(PF.concat(PF.col("doc_id").cast("string"), PF.lit(":"), PF.col("text"))),
            1, 12,
        ), 16, 10,
    ).cast("long")
    shuffled = (
        docs.repartition(7, "lang")
        .groupBy("source")
        .agg(PF.sum(row_digest).alias("d"))
        .collect()
    )
    per_source = {}
    for (src, _), d in base.items():
        per_source[src] = per_source.get(src, 0) + d
    assert {r["source"]: r["d"] for r in shuffled} == per_source

    # tamper evidence: flip one doc's text → that (source, split) digest moves
    victim = docs.orderBy("doc_id").first()
    tampered = docs.withColumn(
        "text",
        PF.when(PF.col("doc_id") == victim["doc_id"], PF.concat(PF.col("text"), PF.lit(" x")))
        .otherwise(PF.col("text")),
    )
    t_digest = {
        r["source"]: r["d"]
        for r in tampered.groupBy("source").agg(PF.sum(row_digest).alias("d")).collect()
    }
    assert t_digest[victim["source"]] != per_source[victim["source"]]
    assert all(
        t_digest[s] == per_source[s] for s in per_source if s != victim["source"]
    )


@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=24),
    st.sampled_from([("a", "a"), ("a", "b"), ("b", "c"), ("c", "c")]),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fold_merge_matches_python_reference(spark, toks, pair):
    """f32's JVM fold must equal a straightforward Python BPE merge
    pass (leftmost, non-overlapping) on arbitrary token sequences —
    including pathological self-overlapping runs like a,a,a."""
    from ai_iceberg_demo_spark.functions.text import _fold_merge

    p1, p2 = pair

    def ref(ts):
        out = []
        for t in ts:
            if out and out[-1] == p1 and t == p2:
                out[-1] = f"{p1} {p2}"
            else:
                out.append(t)
        return out

    df = spark.createDataFrame([(toks,)], "m array<string>")
    got = df.select(
        _fold_merge(F.col("m"), F.lit(p1), F.lit(p2)).alias("m")
    ).first()["m"]
    assert got == ref(toks)


@given(st.lists(st.floats(min_value=-3, max_value=3, allow_nan=False),
                min_size=2, max_size=20))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cusum_fold_matches_python_reference(spark, zs):
    """t38's aggregate() recursion must equal the textbook CUSUM
    recurrence computed in Python on arbitrary standardized series."""
    k = 0.5
    zs = [round(z, 6) for z in zs]

    def ref(series):
        s, out = 0.0, []
        for z in series:
            s = max(0.0, s + z - k)
            out.append(s)
        return out

    df = spark.createDataFrame([(zs,)], "zs array<double>")
    got = df.select(
        F.aggregate(
            F.col("zs"),
            F.array(F.lit(0.0)),
            lambda acc, z: F.concat(
                acc,
                F.array(F.greatest(F.lit(0.0), F.element_at(acc, -1) + z - F.lit(k))),
            ),
        ).alias("ss")
    ).first()["ss"][1:]
    assert len(got) == len(zs)
    for g, r in zip(got, ref(zs)):
        assert abs(g - r) < 1e-9


@PROP
@given(words=_words, seed=st.integers(0, 10**6))
def test_bag_fingerprint_is_permutation_invariant(spark, words, seed):
    """d22's bag signature: ANY permutation of a document's tokens
    yields the same bag_fp, and two docs with different multisets get
    different fps (md5 collision aside) — the contract that lets the
    bag tier collapse reorderings no matter how they arise."""
    import random

    rng = random.Random(seed)
    shuffled = list(words)
    rng.shuffle(shuffled)
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(shuffled)), (2, " ".join(words + ["zzextra"]))],
        "doc_id INT, text STRING",
    )
    bag = F.md5(
        F.encode(
            F.concat_ws(" ", F.array_sort(F.split(F.lower(F.trim(F.col("text"))), " "))),
            "UTF-8",
        )
    )
    rows = {r["doc_id"]: r["fp"] for r in df.select("doc_id", bag.alias("fp")).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


@PROP
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-5, 5, allow_nan=False, allow_infinity=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_binary_pack_hamming_is_a_metric_on_sign_vectors(spark, vecs):
    """v29's two-word packing: for ANY vectors, the packed XOR+popcount
    distance equals the numpy sign-vector hamming (identity), is
    symmetric, zero iff equal sign patterns, and ≤ 64."""
    import numpy as np

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )

    def pack(vec, lo: bool):
        half = F.slice(vec, 1 if lo else 33, 32)
        bits = F.transform(
            half,
            lambda x, i: F.when(
                x > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)

    codes = {
        r["vec_id"]: (r["lo"], r["hi"])
        for r in df.select(
            "vec_id",
            pack(F.col("embedding"), True).alias("lo"),
            pack(F.col("embedding"), False).alias("hi"),
        ).collect()
    }
    signs = {i: np.asarray(v) > 0 for i, v in enumerate(vecs)}
    for a in codes:
        for b in codes:
            ham = bin(codes[a][0] ^ codes[b][0]).count("1") + bin(
                codes[a][1] ^ codes[b][1]
            ).count("1")
            exact = int((signs[a] != signs[b]).sum())
            assert ham == exact
            assert 0 <= ham <= 64
            if ham == 0:
                assert (signs[a] == signs[b]).all()


def _classic_bpe_merge(sym: list[str], l: str, r: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _two_pass_replace_merge(sym: list[str], l: str, r: str) -> list[str]:
    # the exact t97 spelling: literal non-overlapping left-to-right
    # replace (identical semantics in Python str.replace, Java
    # String.replace and DuckDB REPLACE), applied twice
    w = "|" + "|".join(sym) + "|"
    s, m = f"|{l}|{r}|", f"|{l}{r}|"
    w = w.replace(s, m).replace(s, m)
    return [x for x in w.split("|") if x]


@given(
    st.text(alphabet="ab", min_size=2, max_size=14),
    st.sampled_from(["aa", "ab", "ba", "bb"]),
)
@settings(max_examples=400, deadline=None)
def test_t97_two_pass_replace_merge_equals_classic_bpe(word, pair):
    """t97's delimiter-REPLACE merge application vs reference greedy
    left-to-right BPE, on the adversarial 2-letter alphabet. The one
    documented divergence: an odd run of ≥5 of a repeated symbol
    (l==r) permutes the segmentation (token MULTISET still equal) —
    excluded here exactly as the docstring claims; everything else
    must match element-for-element."""
    l, r = pair[0], pair[1]
    sym = list(word)
    classic = _classic_bpe_merge(sym, l, r)
    two = _two_pass_replace_merge(sym, l, r)
    if l == r and l * 5 in word:
        # long same-symbol runs: pass-1's consumed delimiters can cost
        # merges outright (|a|a|a|a|a|a| -> [aa,a,aa,a]); the invariant
        # that survives is lossless reconstruction
        assert "".join(two) == "".join(classic) == word
    else:
        assert two == classic
