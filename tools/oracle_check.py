"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every query in __spark_entry__.queries() at the given sf, runs
the matching oracle_sql() through DuckDB over the same parquet files,
and compares row count + column names + order-insensitive value hash
(floats rounded, columns sorted by name — mirroring the driver's
described comparison). Use this BEFORE the driver does:

    python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}" if v == v else "NaN"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = ["\x1f".join(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


#: DuckDB output types that pandas renders as float64 (or otherwise
#: differently from Spark), silently breaking the driver's value-hash
#: even when every value matches.  u19 hit this in r5: a window SUM over
#: BIGINT promotes to HUGEINT (int128), pandas shows `32.0`, Spark `32`.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "INT128", "UHUGEINT")


def lint_oracle_types(sf_dir: str = "/root/testdata/sf0.001") -> list[str]:
    """Scan every oracle's DuckDB *output schema* for forbidden types.

    Uses ``DESCRIBE <sql>`` (plans, doesn't execute) so the scan is cheap
    at any sf.  Returns ["name: col TYPE", ...] — empty means clean.
    """
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    hits = []
    for name, sql in e.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # DESCRIBE chokes → surface, don't hide
            hits.append(f"{name}: DESCRIBE failed: {exc}")
            continue
        for col, ctype, *_ in desc:
            if any(bad in str(ctype).upper() for bad in _FORBIDDEN_ORACLE_TYPES):
                hits.append(f"{name}: {col} {ctype}")
    con.close()
    return hits


def main() -> int:
    if "--lint-types" in sys.argv[1:]:
        rest = [a for a in sys.argv[1:] if a != "--lint-types"]
        sf_dir = rest[0] if rest else "/root/testdata/sf0.001"
        hits = lint_oracle_types(sf_dir)
        for h in hits:
            print(f"TYPE-LINT  {h}")
        print(f"{len(hits)} forbidden-typed oracle output columns")
        return 1 if hits else 0

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as e
    from ai_iceberg_demo_spark.session import get_spark

    spark = get_spark("oracle_check")
    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = only or list(qs)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        finally:
            # per-query persists (d2/d5/d8/g1/g2/v14/v18/pipeline
            # diamonds) are rebuilt on every call — drop them so a full
            # 200+-query sweep doesn't accumulate a session's worth of
            # dead cached partitions (mirrors tools/sweep.py).
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rows {len(spdf)} != {len(odf)}")
        if sorted(spdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(spdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            h1, h2 = value_hash(spdf), value_hash(odf)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show a small diff sample
                cols = sorted(spdf.columns)
                s1 = {"\x1f".join(_norm_cell(v) for v in r) for r in spdf[cols].itertuples(index=False)}
                s2 = {"\x1f".join(_norm_cell(v) for v in r) for r in odf[cols].itertuples(index=False)}
                only_spark = list(s1 - s2)[:3]
                only_duck = list(s2 - s1)[:3]
                if only_spark:
                    problems.append(f"spark-only rows (cols {cols}): {only_spark}")
                if only_duck:
                    problems.append(f"duckdb-only rows: {only_duck}")
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    from ai_iceberg_demo_spark.facade import release_caches

    leftover = release_caches(spark)
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail out of {len(names)}")
    print(f"cached RDDs after cleanup: {leftover}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
