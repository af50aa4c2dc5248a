"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Beyond-reference capability: parquet readers skip row groups whose
min/max stats exclude a predicate, but a sort on one column destroys
locality on every other. Interleaving the bits of several columns'
rank-space positions (the Morton curve) gives every participating
column tight per-file ranges simultaneously, so selective filters on
ANY of them prune files — the technique behind Delta/Iceberg Z-ORDER
clustering.

Scale design: rank computation is `percent_rank` per column (one window
over the full frame — at 100 TB swap in approx quantile boundaries
computed on a sample, same layout quality); the interleave is pure
JVM bit arithmetic; the final `repartitionByRange(zvalue)` is ONE
range shuffle, identical cost to any global sort-and-write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

BITS_PER_DIM = 16


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``cols`` (each an int in [0, 2^bits)) into one
    long: bit b of dim d lands at position b*ndims + d."""
    n = len(cols)
    parts = []
    for d, c in enumerate(cols):
        for b in range(bits):
            bit = F.shiftright(c.bitwiseAND(F.lit(1 << b)).cast("long"), b)
            parts.append(F.shiftleft(bit, b * n + d))
    return reduce(lambda a, x: a + x, parts).alias("__z")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = BITS_PER_DIM,
) -> None:
    """Write ``df`` to parquet clustered on the Morton curve of ``cols``.

    Each column is mapped to rank space with ``percent_rank`` (value
    distribution doesn't matter — only order does), quantized to
    ``bits`` bits, interleaved, and range-partitioned on the z-value so
    every output file covers a compact hyper-rectangle of the key
    space.
    """
    # materialize each rank ONCE as a real column: passing the window
    # expression itself into _interleave would re-inline it per bit
    # (16× per column — Catalyst does not dedup window expressions;
    # the CollapseProject pitfall pinned in this repo's plan tests)
    ranked = df
    for i, c in enumerate(cols):
        ranked = ranked.withColumn(
            f"__r{i}",
            (F.percent_rank().over(W.orderBy(c)) * ((1 << bits) - 1)).cast(
                "int"
            ),
        )
    z = ranked.withColumn(
        "__z", _interleave([F.col(f"__r{i}") for i in range(len(cols))], bits)
    ).drop(*[f"__r{i}" for i in range(len(cols))])
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax(path: str, column: str) -> list[tuple]:
    """(file, min, max) of ``column`` per parquet file — lets callers
    (and tests) measure how much a filter could skip."""
    import pyarrow.parquet as pq
    import glob
    import os

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((os.path.basename(f), lo, hi))
    return out


def skip_fraction(spans: list[tuple], lo, hi) -> float:
    """Fraction of files a range predicate [lo, hi] could skip given
    per-file (name, min, max) spans."""
    skippable = sum(
        1 for _, mn, mx in spans if mn is not None and (mx < lo or mn > hi)
    )
    return skippable / max(len(spans), 1)
