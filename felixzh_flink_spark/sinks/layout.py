"""Z-order data layout — multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
footers carry per-column min/max, and both Spark's scan (row-group level)
and any file-pruning catalog skip data whose stats exclude the predicate.
Sorting clusters ONE column; a 2-D box query (user AND time, key AND
value) on a single-sorted table still intersects almost every file on the
second dimension. Interleaving the bits of both keys (the Z/Morton curve)
bounds every file to a small rectangle in BOTH dimensions, so 2-D
predicates skip most files — the Delta/Iceberg `OPTIMIZE ZORDER BY`
recipe, implemented here with plain expressions + repartitionByRange.
The tradeoff: with F files a z-layout prunes each dimension to ~1/√F
(vs 1/F for the sorted dimension of a single sort, and NO pruning on
its other dimensions) — choose z-order when queries filter on more
than one column.

Everything is JVM expressions (literal-shift bit interleave inside
codegen); the only extra pass is one tiny min/max aggregate to scale the
columns. No counterpart in the reference (it has no storage layout
surface at all).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Linear-scale a numeric column onto the [0, 2^bits) integer grid.
    Linear scaling suits roughly-uniform keys; for skewed keys substitute
    quantile boundaries (approx_percentile) — the interleave below is
    agnostic to how cells were assigned."""
    span = (mx - mn) or 1.0
    cells = (1 << bits) - 1
    return F.least(
        F.lit(cells),
        F.greatest(F.lit(0),
                   F.floor((col.cast("double") - F.lit(float(mn)))
                           / F.lit(span) * F.lit(cells + 1)).cast("bigint")),
    )


def interleave_bits(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton interleave of two `bits`-bit integers: bit i of `a` lands at
    position 2i, bit i of `b` at 2i+1. Literal shift amounts → pure
    whole-stage-codegen arithmetic, 2·bits OR terms."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_value(df: DataFrame, col_a: str, col_b: str,
                 bits: int = 8, alias: str = "_zv") -> DataFrame:
    """Attach the z-value for two numeric columns. One tiny min/max
    aggregate (collected: 4 scalars) scales each column to the grid."""
    r = df.agg(F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)).head()
    if any(v is None for v in r):
        raise ValueError(
            f"cannot z-order on ({col_a}, {col_b}): input is empty or a "
            f"layout column is entirely null (min/max: {tuple(r)})")
    za = _scaled(F.col(col_a), float(r[0]), float(r[1]), bits)
    zb = _scaled(F.col(col_b), float(r[2]), float(r[3]), bits)
    return df.withColumn(alias, interleave_bits(za, zb, bits))


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   bits: int = 8, num_files: int = 16) -> None:
    """Write `df` z-order-clustered on (col_a, col_b): range-partition by
    z-value (one shuffle — same cost class as the sort a single-column
    layout needs anyway), sort within partitions, drop the helper column.
    Each output file then covers a compact Z-curve segment ⇒ a small
    min/max rectangle in both dimensions ⇒ box predicates skip most files
    on footer stats alone."""
    (zorder_value(df, col_a, col_b, bits)
     .repartitionByRange(num_files, "_zv")
     .sortWithinPartitions("_zv")
     .drop("_zv")
     .write.mode("overwrite").parquet(path))


def file_bounding_boxes(path: str, col_a: str, col_b: str) -> list[dict]:
    """Per-file (min, max) of both layout columns read from parquet
    footers — metadata only, zero row reads. Test/inspection helper for
    quantifying skippability (the runtime analog is the scan's own
    row-group stats pruning)."""
    import glob
    import os

    import pyarrow.parquet as pq

    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in (col_a, col_b) and c.statistics is not None:
                    st = c.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
        # a file counts only when BOTH columns have footer stats — stats
        # for just one (all-null other column, stats disabled) would
        # KeyError; such files are conservatively unprunable, so skip
        # them here and let callers treat absent boxes as must-read
        if all(c in mins for c in (col_a, col_b)):
            boxes.append({"file": os.path.basename(f),
                          col_a: (mins[col_a], maxs[col_a]),
                          col_b: (mins[col_b], maxs[col_b])})
    return boxes


def files_intersecting_box(boxes: list[dict], col_a: str, col_b: str,
                           a_range: tuple, b_range: tuple) -> int:
    """How many files a box predicate must read, by footer stats."""
    n = 0
    for box in boxes:
        (a_lo, a_hi), (b_lo, b_hi) = box[col_a], box[col_b]
        if a_hi >= a_range[0] and a_lo <= a_range[1] \
                and b_hi >= b_range[0] and b_lo <= b_range[1]:
            n += 1
    return n
