"""GeoIP lookups as a broadcast prefix-table join — the deployment
shape behind the registry's ``geoip_*`` stubs.

The reference resolves IPs against a local MaxMind database file
(tajo-core/.../function/geoip/GeoIPUtil.java loads the path from
``tajo.function.geoip-database-location``); that artifact cannot ship,
so ``functions/registry.py`` exposes the same SQL names with a
deterministic stub. This module is the documented production path
(SCALE.md): the CIDR→country table is metadata-sized (a full GeoLite
country snapshot is a few hundred thousand rows), so the lookup is a
**broadcast equi-join on a /16 bucket with a range residual** — never
a per-row UDF over a shared file, and never a nested-loop range join:

* each CIDR block explodes into the /16 buckets it covers (a block
  narrower than /16 yields exactly one row, so the expansion stays
  metadata-sized);
* the fact side computes ``(ip_int >> 16)`` — a pure projection — and
  equi-joins the broadcast buckets, with ``BETWEEN net_start AND
  net_end`` as the hash-join residual.

At 100 TB the fact side never shuffles: the plan is scan → project →
BroadcastHashJoin (pinned in tests/test_function_surface.py).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET_SHIFT = 16  # /16 buckets: 65k ranges cover all of IPv4


def _flatten_nested_blocks(
    blocks_int: list[tuple[int, int, str]]
) -> list[tuple[int, int, str]]:
    """Nested CIDR ranges → disjoint intervals, narrowest block wins.

    GeoIP data routinely nests blocks (a /8 country default with /24
    carve-outs); joining raw overlapping ranges duplicates fact rows
    (ADVICE r03).  CIDR blocks are either disjoint or fully nested, so
    a single O(n log n) stack sweep resolves most-specific-prefix
    driver-side — the runtime join stays a zero-shuffle single-match
    BroadcastHashJoin instead of needing a per-row dedup window over
    the fact table.  Exact duplicate ranges: the last listed wins.
    """
    out: list[list] = []

    def emit(lo: int, hi: int, cc: str) -> None:
        if lo > hi:
            return
        if out and out[-1][2] == cc and out[-1][1] + 1 == lo:
            out[-1][1] = hi  # merge adjacent same-country intervals
        else:
            out.append([lo, hi, cc])

    # outer blocks sort before their inner carve-outs
    ordered = sorted(blocks_int, key=lambda b: (b[0], -(b[1] - b[0])))
    stack: list[tuple[int, int, str]] = []
    cursor = 0
    for s, e, cc in ordered:
        while stack and stack[-1][1] < s:
            ps, pe, pcc = stack.pop()
            emit(max(cursor, ps), pe, pcc)
            cursor = pe + 1
        if stack:
            ts, _te, tcc = stack[-1]
            emit(max(cursor, ts), s - 1, tcc)
        cursor = s
        stack.append((s, e, cc))
    while stack:
        ps, pe, pcc = stack.pop()
        emit(max(cursor, ps), pe, pcc)
        cursor = pe + 1
    return [tuple(iv) for iv in out]


def cidr_lookup_table(
    spark: SparkSession, blocks: list[tuple[str, str]]
) -> DataFrame:
    """(bucket, net_start, net_end, cc) from [(cidr, country_code)].

    Overlapping (nested) CIDR blocks are flattened to disjoint
    most-specific intervals first — see :func:`_flatten_nested_blocks`
    — so every IP matches AT MOST ONE row and the fact join can never
    duplicate rows.  Expansion to covered /16 buckets happens
    driver-side: the block list is configuration (GeoIPUtil.java's
    database analogue), not data, and the expanded table stays
    metadata-sized.
    """
    blocks_int = []
    for cidr, cc in blocks:
        net = ipaddress.ip_network(cidr, strict=False)
        blocks_int.append(
            (int(net.network_address), int(net.broadcast_address), cc)
        )
    rows = []
    for start, end, cc in _flatten_nested_blocks(blocks_int):
        for bucket in range(start >> _BUCKET_SHIFT, (end >> _BUCKET_SHIFT) + 1):
            rows.append((bucket, start, end, cc))
    return spark.createDataFrame(
        rows, "bucket BIGINT, net_start BIGINT, net_end BIGINT, cc STRING"
    )


def _ip_to_long(ip: F.Column) -> F.Column:
    parts = F.split(ip, r"\.")
    return (
        parts[0].cast("bigint") * 16777216
        + parts[1].cast("bigint") * 65536
        + parts[2].cast("bigint") * 256
        + parts[3].cast("bigint")
    )


def attach_country_code(
    df: DataFrame,
    lookup: DataFrame,
    ip_col: str = "ip",
    out_col: str = "country_code",
) -> DataFrame:
    """Left-join ``df`` to the broadcast CIDR table; unmatched or
    malformed IPs get NULL (same contract as the reference's
    geoip_country_code returning null on lookup failure)."""
    ip_int = _ip_to_long(F.col(ip_col))
    fact = df.withColumn("__ip_int", ip_int).withColumn(
        "__bucket", F.shiftright("__ip_int", _BUCKET_SHIFT).cast("bigint")
    )
    joined = fact.join(
        F.broadcast(lookup),
        (fact["__bucket"] == lookup["bucket"])
        & fact["__ip_int"].between(lookup["net_start"], lookup["net_end"]),
        "left",
    )
    return joined.select(
        *[df[c] for c in df.columns], F.col("cc").alias(out_col)
    )


def in_country(
    df: DataFrame, lookup: DataFrame, cc: str, ip_col: str = "ip"
) -> DataFrame:
    """geoip_in_country over the prefix table: rows whose IP resolves
    to ``cc`` (GeoIPCountryInet4.java semantics)."""
    tagged = attach_country_code(df, lookup, ip_col=ip_col)
    return tagged.filter(F.col("country_code") == cc).drop("country_code")
