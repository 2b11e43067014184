"""Z-order clustering: measured row-group skipping via parquet stats."""

import glob

import pyarrow.parquet as pq

from postpy_spark.operators.zorder import zorder_write


def _row_groups(path, xcol, ycol):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats = {}
            for c in range(rg.num_columns):
                col = rg.column(c)
                name = col.path_in_schema
                if name in (xcol, ycol) and col.statistics is not None:
                    stats[name] = (col.statistics.min, col.statistics.max)
            spans.append(stats)
    return spans


def _intersecting(spans, col, lo, hi):
    return sum(1 for s in spans if s[col][0] <= hi and s[col][1] >= lo)


def test_zorder_prunes_row_groups_on_both_axes(spark, tmp_path):
    """A table sorted linearly by x cannot skip on y; the z-ordered layout
    must prune row groups on EITHER axis."""
    df = spark.range(200_000).selectExpr(
        "CAST(id % 317 AS BIGINT) AS x",
        "CAST((id * 7919) % 1013 AS BIGINT) AS y",
        "id AS payload",
    )
    linear = str(tmp_path / "linear")
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.option("maxRecordsPerFile", "20000").mode("overwrite").parquet(linear))
    zpath = str(tmp_path / "zord")
    zorder_write(df, zpath, ["x", "y"], bits=6, num_files=16,
                 max_records_per_file=20_000)

    lin = _row_groups(linear, "x", "y")
    zrd = _row_groups(zpath, "x", "y")
    assert abs(len(lin) - len(zrd)) <= max(len(lin), len(zrd))  # sanity

    # y-only box: linear-by-x keeps every group; z-order must skip most
    lin_y = _intersecting(lin, "y", 100, 150)
    z_y = _intersecting(zrd, "y", 100, 150)
    assert lin_y == len(lin)                       # no pruning without clustering
    assert z_y <= 0.6 * len(zrd), (z_y, len(zrd))  # real pruning with it

    # x-only box: z-order still prunes (fewer bits per axis than pure sort)
    z_x = _intersecting(zrd, "x", 50, 80)
    assert z_x < len(zrd)

    # correctness: same rows both layouts
    a = spark.read.parquet(linear).agg({"payload": "sum"}).collect()[0][0]
    b = spark.read.parquet(zpath).agg({"payload": "sum"}).collect()[0][0]
    assert a == b
