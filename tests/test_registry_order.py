"""Registry-order pins: the driver truncates CORRECTNESS at ~50 queries
in registration order, so ordering IS the driver-evidence strategy —
regressing it silently forfeits green rows for whole operator families.

The verified set is DERIVED from the checked-in CORRECTNESS_r*.json
artifacts (VERDICT.md r03 next-round #1: the hand-maintained frozenset
went stale two rounds running).  These tests fail if the derivation
drops a green driver row or breaks the unverified-first ordering.
"""

from __future__ import annotations

import json
from pathlib import Path

from tajo_spark.queries.registry import (
    all_queries,
    driver_verified,
    tracked_artifacts,
)

REPO_ROOT = Path(__file__).resolve().parents[1]


def _artifact_rows() -> dict[str, list[dict]]:
    # Tracked-only, matching driver_verified()'s derivation: an
    # UNTRACKED artifact the driver drops after the final commit must
    # not change what these gates consider truth (VERDICT r06 #1).
    rows: dict[str, list[dict]] = {}
    for path in tracked_artifacts():
        for name, row in json.loads(path.read_text()).items():
            rows.setdefault(name, []).append(row)
    return rows


def test_every_hash_green_artifact_row_is_verified():
    """Every hash-green name in any checked-in CORRECTNESS artifact must
    be in the derived verified set — the exact staleness the r02/r03
    verdicts flagged can no longer happen silently."""
    all_queries()  # populate REGISTRY
    verified = driver_verified()
    greens = {
        name
        for name, rows in _artifact_rows().items()
        if any(r.get("hash_match") is True for r in rows)
    }
    assert greens, "no CORRECTNESS artifacts found at repo root"
    missing = greens - verified
    assert not missing, f"hash-green driver rows not marked verified: {missing}"


def test_rows_only_greens_requeue_once_they_gain_an_oracle():
    """A rows-only green (err == 'no_oracle') whose query NOW has an
    oracle must be re-queued (unverified) until a hash-green row lands —
    the pack_sequences r01→r02 upgrade path, kept as a rule."""
    q = all_queries()
    verified = driver_verified()
    for name, rows in _artifact_rows().items():
        if name not in q:
            continue
        hash_green = any(r.get("hash_match") is True for r in rows)
        rows_only = any(
            r.get("err") == "no_oracle" and r.get("spark_rows") is not None
            for r in rows
        )
        if rows_only and not hash_green and q[name].oracle is not None:
            assert name not in verified, (
                f"{name} has only a rows-only row but now has an oracle — "
                "it must re-queue for a hash-green driver row"
            )


def test_unverified_queries_register_first():
    names = list(all_queries())
    verified = driver_verified()
    seen_verified = False
    for n in names:
        if n in verified:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified query {n!r} registered after verified ones — "
                "it may fall outside the driver's per-round cap"
            )


def test_backlog_fits_driver_cap():
    """The whole unverified block must fit inside the driver's ~50-query
    window, or some names never get driver evidence this round."""
    names = list(all_queries())
    verified = driver_verified()
    unverified = [n for n in names if n not in verified]
    assert len(unverified) <= 50, (
        f"{len(unverified)} unverified queries exceed the driver cap; "
        "ordering within the block decides who gets evidence"
    )


def test_every_query_has_an_oracle():
    assert [n for n, s in all_queries().items() if s.oracle is None] == []


def test_registry_names_bind_to_their_own_functions():
    # Guard against the stacked-decorator hazard: an @query block
    # accidentally inserted between another query's decorator and its
    # def makes BOTH names register the same body (caught live in
    # round 4 — multimodal_phash_neardup silently served
    # dedup_paragraphs' output). Function names must track query names
    # (one legacy exception predating the rule), and no two names may
    # share a body.
    from tajo_spark.queries.registry import all_queries

    qs = all_queries()
    legacy = {"pack_sequences": "pack_sequences_q"}
    for name, spec in qs.items():
        assert spec.spark.__name__ == legacy.get(name, name), (
            name, spec.spark.__name__
        )
    bodies = [id(spec.spark) for spec in qs.values()]
    assert len(bodies) == len(set(bodies))


def test_registry_md_is_fresh():
    # REGISTRY.md is the generated audit index of the query surface
    # (VERDICT r04 #9); regenerating must reproduce the committed file
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import gen_registry_md

    with open(os.path.join(repo, "REGISTRY.md")) as fh:
        committed = fh.read()
    assert gen_registry_md.generate() == committed, (
        "REGISTRY.md is stale — run: python tools/gen_registry_md.py --write"
    )


def test_round_artifacts_are_git_tracked():
    """Standing gate for the 3-round-running hygiene wart (VERDICT r09
    task 1): the round number LEAKCHECK.json carries must have
    git-TRACKED CORRECTNESS_r{N}.json and BENCH_r{N}.json siblings.
    Red means a driver round landed whose evidence artifacts were never
    committed — commit them and regenerate REGISTRY.md."""
    import subprocess

    leak = REPO_ROOT / "LEAKCHECK.json"
    if not leak.exists():
        return  # pre-first-round tree
    rnd = json.loads(leak.read_text()).get("round")
    if not isinstance(rnd, int):
        return
    tracked = set(
        subprocess.run(
            ["git", "-C", str(REPO_ROOT), "ls-files",
             "CORRECTNESS_r*.json", "BENCH_r*.json", "LEAKCHECK.json"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.split()
    )
    missing = [
        name
        for name in (f"CORRECTNESS_r{rnd:02d}.json", f"BENCH_r{rnd:02d}.json")
        if (REPO_ROOT / name).exists() and name not in tracked
    ]
    assert missing == [], (
        f"round-{rnd} driver artifacts exist but are untracked: "
        f"{missing} — `git add` them (and regenerate REGISTRY.md) so "
        "evidence derivation sees them"
    )
    assert "LEAKCHECK.json" in tracked


def test_freshness_survives_an_untracked_driver_artifact():
    """Simulate the exact race that reddened r05 and r06: the driver
    drops a strictly-newer CORRECTNESS artifact into the working tree
    AFTER the builder's final commit.  The freshness gate must stay
    green — evidence derives from git-TRACKED artifacts only, so the
    untracked file is invisible until committed (VERDICT r06 #1)."""
    import os
    import sys

    sys.path.insert(0, str(REPO_ROOT / "tools"))
    import gen_registry_md

    before = gen_registry_md.generate()
    fake = REPO_ROOT / "CORRECTNESS_r98.json"
    assert not fake.exists()
    some_name = next(iter(all_queries()))
    try:
        fake.write_text(json.dumps({
            some_name: {
                "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 1,
                "oracle_rows": 1, "err": None,
            },
            "a_brand_new_query_the_builder_never_saw": {
                "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 1,
                "oracle_rows": 1, "err": None,
            },
        }))
        assert gen_registry_md.generate() == before, (
            "an UNTRACKED newer artifact changed the regenerated "
            "REGISTRY.md — the driver race is back"
        )
        # And the verified-set derivation is equally blind to it.
        from tajo_spark.queries import registry as reg
        greens, _ = reg._load_driver_rows()
        assert "a_brand_new_query_the_builder_never_saw" not in greens
    finally:
        os.unlink(fake)
