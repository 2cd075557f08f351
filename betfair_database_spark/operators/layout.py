"""Z-order (Morton) data layout: multi-dimensional clustering for scan
pruning — the write-side half of making a 100 TB table cheap to read.

Parquet pruning works off per-row-group min/max statistics. A table sorted
by ONE column prunes filters on that column only; filters on any other
column still read every row group. Interleaving the bits of several columns
into one Morton key and range-partitioning + sorting by it gives every row
group a TIGHT min/max range on EVERY participating dimension at once — the
same trick Delta's OPTIMIZE ZORDER BY and Hudi clustering apply.

Everything is column expressions (the bit interleave unrolls to
shiftleft/or terms inside whole-stage codegen); the write is
``repartitionByRange`` on the key (one range exchange, sampled bounds,
AQE-friendly) + an in-partition sort. No Python, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: str, lo: float, hi: float, bits: int) -> Column:
    """Map col to an integer rank in [0, 2^bits): linear scale over
    [lo, hi], clamped (values outside the stated bounds land on the edge
    cells rather than corrupting the interleave). NULL → cell 0."""
    cells = 1 << bits
    x = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    cell = F.floor(x * F.lit(cells)).cast("bigint")
    return F.coalesce(
        F.greatest(F.lit(0), F.least(F.lit(cells - 1), cell)), F.lit(0)
    )


def zorder_key(dims: list[tuple[str, float, float]], bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` bits of each (column, lo, hi) dim.

    Bit j of dim d lands at position j * ndims + d — dims cycle, so no
    dimension dominates the prefix. Total key width = bits * ndims
    (keep <= 63: e.g. 2 dims x 16 bits, 3 x 16, 4 x 15). lo/hi are the
    clustering bounds — table min/max or stable domain constants; at scale
    use constants (a recluster must not depend on a full min/max pass).
    """
    ndims = len(dims)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a BIGINT key")
    key = F.lit(0).cast("bigint")
    for d, (col, lo, hi) in enumerate(dims):
        cell = _scaled(col, lo, hi, bits)
        for j in range(bits):
            # bit j of this dim -> bit j*ndims + d of the key
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, j).bitwiseAND(F.lit(1)), j * ndims + d
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[tuple[str, float, float]],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``dims``:
    range-partition on the key (contiguous z-ranges per task → per file),
    sort within partitions, drop the helper column. After this, a filter on
    ANY single dim (or any conjunction) prunes row groups via parquet
    min/max stats instead of scanning the table."""
    keyed = df.withColumn("_zorder", zorder_key(dims, bits))
    (
        keyed.repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
