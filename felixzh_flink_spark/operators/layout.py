"""Data-layout operators — multi-dimensional clustering for scan pruning.

Beyond-reference capability (the lakehouse side of a 100 TB deployment):
parquet scans prune with per-file/row-group min-max statistics, but a
table range-partitioned on ONE key only prunes filters on that key.
Z-ORDER clustering interleaves the bits of several (bucketed) keys into
one sort key, so files become tight hyper-rectangles in key space and
min-max pruning works for filters on ANY of the clustered columns — the
same layout trick Delta's `OPTIMIZE ZORDER BY` and Iceberg's
`rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`
apply, expressed here as plain Spark expressions + a range-partitioned
write (no table format required).

Everything is a pure Column expression (codegen, no UDFs) plus one
`repartitionByRange` on the z-value — the standard total-sort shuffle
shape. Bucketing to the fixed [0, 2^bits) domain either comes from the
caller (ids: `pmod`; already-int dims) or from broadcast quantile edges
(`sampling.quantile_bins_approx`'s GK sketch path) so no global sort is
needed to normalize value ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(bucketed: list[Column], bits: int = 8) -> Column:
    """Interleave the low `bits` bits of each (already [0, 2^bits)-
    bucketed, integer) column into one bigint Morton / Z-curve key:
    bit b of column i lands at position b·n + i. Static expression tree
    of bits × n shifts/masks — whole-stage codegen, no UDF.

    Total key width = bits × len(bucketed) ≤ 63 (bigint).

    String entries in `bucketed` are treated as column NAMES and the
    whole interleave folds to ONE F.expr (r8 plan-time fold: the
    Column-API form cost bits × n × ~5 py4j round-trips per call);
    Column entries keep the incremental form (a Column cannot be
    rendered into SQL text). Identical integer arithmetic either way."""
    n = len(bucketed)
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds bigint range")
    if all(isinstance(c, str) for c in bucketed):
        terms = " + ".join(
            f"(shiftrightunsigned(cast(`{c}` as bigint), {b}) & 1L) "
            f"* {1 << (b * n + i)}L"
            for b in range(bits) for i, c in enumerate(bucketed))
        return F.expr(f"cast(0 as bigint) + {terms}")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(bucketed):
            bit = F.shiftrightunsigned(c.cast("bigint"), b).bitwiseAND(
                F.lit(1))
            z = z + (bit * F.lit(1 << (b * n + i))).cast("bigint")
    return z


def range_bucket(col: str | Column, lo, hi, bits: int = 8) -> Column:
    """Bucket a value into [0, 2^bits) by LINEAR position in [lo, hi] —
    the z-order normalizer. Must be order-preserving (high-order range
    buckets, never modulo: a mod bucket scrambles range locality and
    min-max pruning gets nothing). For skewed domains use quantile edges
    (`sampling.quantile_bins_approx`) instead of the linear map — any
    monotone bucketing works for pruning. `lo`/`hi` may be literals or
    Columns (e.g. a broadcast 1-row MIN/MAX aggregate, keeping the
    whole layout computation one lazy plan)."""
    c = F.col(col) if isinstance(col, str) else col
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    n = 1 << bits
    b = F.floor((c.cast("double") - lo_c.cast("double"))
                / (hi_c.cast("double") - lo_c.cast("double") + F.lit(1e-12))
                * F.lit(n))
    return F.least(F.greatest(b, F.lit(0)), F.lit(n - 1)).cast("bigint")


def write_zordered(df: DataFrame, path: str, bucketed: list[Column],
                   bits: int = 8, n_files: int = 16,
                   mode: str = "overwrite") -> None:
    """Write `df` z-order-clustered: range-partition + sort on the
    interleaved key, one output file per range — every file covers a
    tight hyper-rectangle of the clustered key space, so min-max stats
    prune scans filtered on ANY clustered column (verified against
    parquet footer metadata in the unit suite)."""
    z = zorder_value(bucketed, bits).alias("_z")
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, F.col("_z"))
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode(mode).parquet(path))


def compact_parquet(spark, path: str, target_mb: int = 128,
                    sort_by: list[str] | None = None) -> dict:
    """Small-file compaction — the maintenance job every long-running
    ingest needs (micro-batch sinks and per-epoch state writes shed
    small files; at 100 TB the resulting open-cost dominates scans).
    Rewrites `path` into ceil(total_bytes / target_mb) files, optionally
    sorted (pair with `zorder_value` columns for clustered compaction),
    and swaps the directory through the same Hadoop-FS rename discipline
    as the state sinks (`functions/stateio`): write to a sibling
    `_compact_tmp`, move the old dir aside to `_compact_old`, move the
    new one in, drop the old. The swap is two renames, NOT one atomic
    operation: a crash between them leaves `path` absent with the
    complete old data parked at `_compact_old` — the next invocation
    detects that state and rolls the old directory back before
    compacting (no reader ever sees a MIX of old and new files, but a
    reader in the crash window sees a missing path until recovery runs).
    Both renames raise on failure (`StateFS.rename` checks Hadoop's
    boolean), so a refused move aborts with the table intact instead of
    reporting success.

    Returns {"files_before", "files_after", "rows"} for the caller's
    maintenance log."""
    from felixzh_flink_spark.functions.stateio import state_fs

    fs = state_fs(spark, path)
    tmp = path.rstrip("/") + "_compact_tmp"
    old = path.rstrip("/") + "_compact_old"
    # crash recovery from a previous invocation:
    #  - old exists, path missing  -> died between the two renames: the
    #    parked directory IS the table; roll it back.
    #  - old exists, path exists   -> died after the swap, before the
    #    cleanup delete: the parked directory is superseded; drop it.
    if fs.exists(old):
        if not fs.exists(path):
            fs.rename(old, path)
        else:
            fs.delete(old)
    df = spark.read.parquet(path)
    rows = df.count()
    files_before = sum(
        1 for f in fs.listdir(path) if f.endswith(".parquet"))
    # size via the FS content summary (one namenode call, no file loop)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    total = jpath.getFileSystem(
        spark._jsc.hadoopConfiguration()).getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(total) // (target_mb << 20)))
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    fs.delete(tmp)
    out.write.mode("overwrite").parquet(tmp)
    fs.delete(old)
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old)
    files_after = sum(
        1 for f in fs.listdir(path) if f.endswith(".parquet"))
    return {"files_before": files_before, "files_after": files_after,
            "rows": rows}
