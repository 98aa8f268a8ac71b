"""Data-layout primitives: Z-order (Morton) clustering keys.

The optimization Delta's OPTIMIZE ZORDER / Iceberg's sort-order rewrite
apply before parking 100 TB on disk: interleaving the bits of several
filter columns gives one sort key under which min/max file statistics
prune well on EVERY interleaved column, not just the leading one.

The key is pure integer bit arithmetic (shifts/ands over values already
reduced to ``bits``-bit ints), a flat projection — codegen CSE covers the
repeated shifts, no lambda bodies — so keys are bit-identical in any
engine and the layout decision is value-testable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str | Column], bits: int = 8) -> Column:
    """Morton-interleave ``len(cols)`` integer columns, each already in
    [0, 2^bits): bit b of column ci lands at position b*ncols + ci. The
    caller reduces raw values into range first (modulo, or
    ``((v - lo) * (2^bits - 1)) DIV (hi - lo)`` against known stats —
    keep it integer arithmetic so keys stay engine-portable)."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for ci, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + ci)
    return z


def zorder_layout(df: DataFrame, cols: list[str | Column],
                  bits: int = 8, n_files: int = 64) -> DataFrame:
    """The write-side shape: range-partition by the Z key into ``n_files``
    output groups and sort within each — every output file then holds one
    contiguous stretch of the space-filling curve, so its min/max stats
    bound a small hyper-rectangle on EVERY interleaved column (that is
    the pruning win; a lexicographic sort only bounds the leading one).
    Follow with ``.write.parquet(...)`` / ``toTable`` in production."""
    z = zorder_key(cols, bits).alias("_z")
    return (df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z"))
