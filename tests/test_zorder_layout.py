"""o6's z-order claim measured ON DISK (r4 verdict #7).

The Morton-key projection is oracle-checked; this test writes the
sf0.1 events fixture in the z layout and in a linear (xb, yb) layout,
reads back each file's column min/max — exactly the stats an
Iceberg/Delta/parquet-footer pruning scan consults — and counts the
files a box/slice predicate must read under each layout.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ai_iceberg_demo_spark.tables import load_table

SF01 = "/root/testdata/sf0.1"
N_FILES = 64


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF01, "events.parquet")),
    reason="sf0.1 fixture absent (single-fixture environment)",
)
def test_zorder_layout_prunes_files_on_disk(spark, tmp_path):
    """The z layout must (a) match the linear layout's pruning on
    box/x-constrained scans within Morton boundary overhead, and
    (b) beat it decisively on a y-only slice — the query shape that
    forces a full scan of any x-major linear layout. Both layouts get
    the same file count, so the comparison is pure clustering."""
    from ai_iceberg_demo_spark.operators.ordering_sets import (
        zorder_key,
        zorder_layout_write,
    )

    ev = load_table(spark, "events", SF01)
    keyed = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("xb"),
        (F.dayofyear(F.col("ts").cast("date")) % 256).alias("yb"),
    ).withColumn("zvalue", zorder_key(F.col("xb"), F.col("yb")))

    zdir = str(tmp_path / "zlay")
    ldir = str(tmp_path / "linlay")
    zorder_layout_write(keyed, zdir, N_FILES)
    keyed.repartitionByRange(N_FILES, "xb", "yb").write.mode("overwrite").parquet(ldir)

    def file_stats(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        return (
            df.groupBy("f")
            .agg(
                F.min("xb").alias("x0"),
                F.max("xb").alias("x1"),
                F.min("yb").alias("y0"),
                F.max("yb").alias("y1"),
            )
            .collect()
        )

    def files_scanned(stats, xlo, xhi, ylo, yhi):
        """Files whose min/max box intersects the predicate box — the
        set a stats-based file-skipping scan actually opens."""
        return sum(
            1
            for s in stats
            if s["x1"] >= xlo and s["x0"] < xhi and s["y1"] >= ylo and s["y0"] < yhi
        )

    zs, ls = file_stats(zdir), file_stats(ldir)
    assert len(zs) == len(ls) == N_FILES

    # 2-d box: z within Morton boundary overhead of the linear layout,
    # and far below a full scan
    z_box = files_scanned(zs, 32, 48, 8, 24)
    l_box = files_scanned(ls, 32, 48, 8, 24)
    assert z_box <= l_box + 3
    assert z_box <= N_FILES // 4

    # y-only slice: the x-major linear layout cannot prune at all
    # (every file spans the full yb range); z reads less than 60%
    z_y = files_scanned(zs, 0, 256, 0, 8)
    l_y = files_scanned(ls, 0, 256, 0, 8)
    assert l_y >= int(N_FILES * 0.9)
    assert z_y <= int(l_y * 0.6)

    # sanity: each z file covers a COMPACT y range (median span far
    # under the domain), which is what produced the pruning
    spans = sorted(s["y1"] - s["y0"] for s in zs)
    assert spans[len(spans) // 2] <= 16
