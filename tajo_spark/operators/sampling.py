"""Deterministic sampling operators for reproducible dataset splits.

Beyond-reference capability: training pipelines need sampling that is
(a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) row-local (no shuffle, no global state). The
standard trick is hashing a stable row id and comparing a fixed-width
hex prefix against a threshold — every engine with md5 reproduces the
exact same membership, unlike ``TABLESAMPLE``/``df.sample`` whose RNG
is engine- and partitioning-dependent.

Scale design: both operators are pure per-row projections/filters — no
shuffle, no driver state, trivially parallel at 100 TB; the md5 cost is
one digest per row (negligible next to the scan).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def id_md5(id_col: Column) -> Column:
    """md5 hex of the stringified id — THE shared hash recipe every
    sampling operator (and oracle SQL via ``md5(CAST(id AS VARCHAR))``)
    uses; keep the cast chain identical everywhere or cross-engine
    membership diverges."""
    return F.md5(id_col.cast("string").cast("binary"))


def _bucket2(id_col: Column) -> Column:
    """First 2 hex chars of md5(id) — a uniform value in 256 buckets,
    compared lexicographically (hex strings are fixed-width lowercase,
    so string order == numeric order in every engine)."""
    return F.substring(id_md5(id_col), 1, 2)


def split_column(
    id_col: Column,
    cuts: Sequence[tuple[str, str]] = (("train", "cc"), ("val", "e6")),
    default: str = "test",
) -> Column:
    """Deterministic split label from a stable id.

    ``cuts`` are (label, exclusive-upper-bound) pairs over the 2-hex-char
    md5 prefix, checked in order; rows above every bound get ``default``.
    The default boundaries ('cc'=204, 'e6'=230) give ≈79.7 / 10.2 / 10.1 %.
    """
    b = _bucket2(id_col)
    expr = None
    for label, bound in cuts:
        cond = b < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(default))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by a 16-bit md5-prefix
    threshold on ``id_col`` — the same rows on every run, engine, and
    partitioning. Granularity is 1/65536; ``fraction >= 1`` keeps
    everything, ``<= 0`` keeps nothing."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    prefix = F.substring(id_md5(F.col(id_col)), 1, 4)
    return df.filter(prefix < F.lit(sample_threshold_hex(fraction)))


def sample_threshold_hex(fraction: float) -> str:
    """The 4-hex-char threshold ``deterministic_sample`` compares
    against — exposed so SQL oracles embed the identical literal. Only
    meaningful for 0 < fraction < 1 (a 5-char '10000' would compare
    wrongly against 4-char prefixes, so it is rejected)."""
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    return format(min(int(fraction * 65536), 65535), "04x")
