"""Registry-order pins: the driver truncates CORRECTNESS at ~50 queries
in registration order, so ordering IS the driver-evidence strategy —
regressing it silently forfeits green rows for whole operator families.
"""

from __future__ import annotations

from tajo_spark.queries.registry import _DRIVER_VERIFIED, all_queries


def test_unverified_queries_register_first():
    names = list(all_queries())
    seen_verified = False
    for n in names:
        if n in _DRIVER_VERIFIED:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified query {n!r} registered after verified ones — "
                "it may fall outside the driver's per-round cap"
            )


def test_round1_backlog_outranks_new_curation_queries():
    """§2.3–§2.7/TPC-H queries (round-1 backlog, VERDICT next-round #1)
    must precede the round-2 'curation' category inside the unverified
    block."""
    q = all_queries()
    names = list(q)
    last_relational = max(
        names.index(n)
        for n in names
        if n.startswith(("join_", "agg_", "sort_", "setop_", "subq_",
                         "window_", "micro_"))
        and n not in _DRIVER_VERIFIED
    )
    first_curation = min(
        names.index(n)
        for n, spec in q.items()
        if spec.category == "curation"
    )
    assert last_relational < first_curation


def test_every_query_has_an_oracle():
    assert [n for n, s in all_queries().items() if s.oracle is None] == []
