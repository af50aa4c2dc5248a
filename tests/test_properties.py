"""Property-based cross-engine tests (hypothesis): randomized inputs,
one Spark job per example (inputs batched into a single DataFrame so
the property runs at DataFrame granularity, not row granularity).

Goes beyond the reference's test strategy (SURVEY.md §5: "no
property-based/randomized testing") where it pays off most: the
dialect translation and the salting transforms, whose input spaces are
too big for golden files.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from tajo_spark.operators.skew import salted_agg
from tajo_spark.plans.dialect import sql_regex_to_java

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# SQL-standard SIMILAR TO pattern fragments (what the translator handles)
_PATTERN_PIECE = st.sampled_from(
    ["a", "b", "c", "%", "_", "[ab]", "[bc]", "(a|b)", "ab", "c%"]
)
_PATTERNS = st.lists(_PATTERN_PIECE, min_size=1, max_size=4).map("".join)
_STRINGS = st.text(alphabet="abc", min_size=0, max_size=6)


@settings(**SETTINGS)
@given(
    patterns=st.lists(_PATTERNS, min_size=1, max_size=5, unique=True),
    strings=st.lists(_STRINGS, min_size=1, max_size=20, unique=True),
)
def test_similar_to_translation_property(spark, patterns, strings):
    """For every (string, pattern): Spark `RLIKE '^(?:translated)$'`
    must agree with an independent evaluation of SQL-standard SIMILAR TO
    semantics (Python re.fullmatch over the same translation — Java and
    Python regex agree on this construct subset).

    DuckDB's native SIMILAR TO is deliberately NOT the oracle here: it
    treats the pattern as a raw RE2 regex without the SQL-standard
    %/_ wildcard translation (even ``'a' SIMILAR TO '%'`` is false
    there), diverging from the standard and from the reference's
    PostgreSQL-compatible semantics (SimilarToPredicateEval.java).
    """
    import re as pyre

    cases = [(s, p) for s in strings for p in patterns]
    df = spark.createDataFrame(cases, "s STRING, p STRING")
    got = {}
    for p in patterns:
        jre = f"^(?:{sql_regex_to_java(p)})$"
        for r in df.filter(F.col("p") == p).select(
            "s", F.col("s").rlike(jre).alias("m")
        ).collect():
            got[(r.s, p)] = r.m
    for s, p in cases:
        exp = pyre.fullmatch(f"(?:{sql_regex_to_java(p)})", s) is not None
        assert got[(s, p)] == exp, f"string={s!r} pattern={p!r}"


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key (few → skew)
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    salt=st.sampled_from([2, 7, 16]),
)
def test_salted_agg_equals_plain_random(spark, rows, salt):
    df = spark.createDataFrame(
        [(k, float(i), v) for i, (k, v) in enumerate(rows)],
        "k INT, uid DOUBLE, v DOUBLE",
    )
    plain = {
        r.k: (r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.c, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {"c": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            unique_col="uid",
            salt=salt,
        ).collect()
    }
    assert salted == plain


@settings(**SETTINGS)
@given(
    ips=st.lists(
        st.tuples(*[st.integers(0, 255)] * 4).map(
            lambda t: ".".join(map(str, t))
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_inet_roundtrip(spark, ips):
    from tajo_spark.functions.registry import register_all

    register_all(spark)
    df = spark.createDataFrame([(ip,) for ip in ips], "ip STRING")
    rows = df.selectExpr("ip", "inet_ntoa(inet_aton(ip)) AS back").collect()
    for r in rows:
        assert r.back == r.ip


@settings(**SETTINGS)
@given(
    # (stratum, multiplicity): random skew across up to 4 strata
    strata=st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 40)),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
    temp=st.sampled_from([1.0, 2.0, 4.0]),
)
def test_temperature_mixture_invariants_random(spark, strata, temp):
    from tajo_spark.operators.sampling import temperature_mixture_sample

    rows, uid = [], 0
    for s, n in strata:
        for _ in range(n):
            rows.append((uid, s))
            uid += 1
    df = spark.createDataFrame(rows, "k INT, src INT")
    out = temperature_mixture_sample(df, "k", "src", temp).collect()
    kept_ids = {r.k for r in out}
    assert kept_ids <= {r[0] for r in rows}  # strictly a subset
    rates = {r.src: r.keep_rate for r in out}
    counts = dict((s, n) for s, n in strata)
    # every surviving stratum's rate in (0, 1]; the smallest stratum —
    # max boost by construction — is kept in full whenever it survives
    for s, rate in rates.items():
        assert 0 < rate <= 1.0
    min_n = min(counts.values())
    smallest = [s for s, n in counts.items() if n == min_n]
    by_stratum = {}
    for r in out:
        by_stratum[r.src] = by_stratum.get(r.src, 0) + 1
    for s in smallest:
        assert by_stratum.get(s, 0) == counts[s]
    # monotonicity: bigger strata never get a higher keep-rate
    for a, na in counts.items():
        for b, nb in counts.items():
            if na < nb and a in rates and b in rates:
                assert rates[a] >= rates[b] - 1e-9


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=24
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
)
def test_dup_span_stats_invariants_random(spark, texts):
    from tajo_spark.operators.dedup import dup_span_stats

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id INT, text STRING"
    )
    out = {r.doc_id: r for r in dup_span_stats(docs).collect()}
    assert set(out) == set(range(len(texts)))  # every doc survives
    for i, t in enumerate(texts):
        r = out[i]
        ntok = len(t.split())
        expected_spans = max(ntok - 7, 0) if ntok >= 8 else 0
        assert r.n_spans == expected_spans
        assert 0 <= r.n_dup_spans <= r.n_spans
        # identical texts must flag each other completely
        if expected_spans and texts.count(t) > 1:
            assert r.n_dup_spans == r.n_spans


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=5),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.sampled_from([1, 3, 5]),
)
def test_bpe_training_matches_reference_random(spark, texts, n_merges):
    """Distributed BPE must reproduce the pure-Python reference merge
    sequence on ARBITRARY corpora — tie-breaks, overlaps, early stop."""
    from tajo_spark.operators.bpe import train_bpe
    from tests.test_bpe import _reference_bpe

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id INT, text STRING"
    )
    assert train_bpe(docs, n_merges=n_merges) == _reference_bpe(
        texts, n_merges
    )


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=5),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    batch_k=st.sampled_from([2, 4]),
)
def test_bpe_batched_training_tie_safe_random(spark, texts, batch_k):
    """Batched training on ARBITRARY corpora either reproduces the
    sequential reference exactly, or first diverges at a frequency tie
    (the documented benign case) — never at unequal frequencies, which
    would mean the strict-stop admission rule let interacting merges
    corrupt the counts."""
    from tajo_spark.operators.bpe import train_bpe
    from tests.test_bpe import _first_divergence_is_freq_tie, _reference_bpe

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id INT, text STRING"
    )
    got = train_bpe(docs, n_merges=5, batch_k=batch_k)
    want = _reference_bpe(texts, 5)
    assert _first_divergence_is_freq_tie(got, want), (got, want)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # id
            st.integers(min_value=0, max_value=500),     # bytes
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    shard_bytes=st.sampled_from([64, 256, 1024]),
)
def test_shard_assign_invariants_random(spark, rows, shard_bytes):
    """Conservation + boundedness + order-consistency of the two-phase
    distributed shard assignment, for random sizes (including 0-byte
    and oversize docs) and random shard targets."""
    from tajo_spark.operators.export import shard_assign

    df = spark.createDataFrame(rows, "doc_id LONG, nb LONG").repartition(7)
    got = shard_assign(df, "doc_id", "nb", shard_bytes).collect()
    assert len(got) == len(rows)                    # every row, exactly once
    assert {r.doc_id for r in got} == {t[0] for t in rows}
    # independent single-threaded reference: cumulative bytes in
    # (md5(seed:id), id) order
    import hashlib

    def key(i):
        return hashlib.md5(f"42:{i}".encode()).hexdigest()

    order = sorted(rows, key=lambda t: (key(t[0]), t[0]))
    cum, want = 0, {}
    for i, nb in order:
        want[i] = cum // shard_bytes
        cum += nb
    assert {r.doc_id: r.shard_id for r in got} == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3_000),   # id
            st.sampled_from(["a", "b", "c", "hot"]),     # group
            st.integers(min_value=0, max_value=5),       # score (ties!)
        ),
        min_size=1,
        max_size=150,
        unique_by=lambda t: t[0],
    ),
    k=st.sampled_from([1, 3, 10]),
)
def test_cap_per_group_invariants_random(spark, rows, k):
    """Two-stage cap == single-window cap on random tie-heavy data, for
    every k; per-group counts never exceed k; kept rows are exactly the
    per-group best under the total order."""
    from tajo_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        rows, "id LONG, grp STRING, score LONG"
    ).repartition(5)
    order = [F.desc("score"), F.asc("id")]
    fast = {(r.grp, r.id) for r in cap_per_group(df, ["grp"], order, k).collect()}
    # single-threaded reference
    from collections import defaultdict

    by_grp = defaultdict(list)
    for i, g, s in rows:
        by_grp[g].append((i, s))
    want = set()
    for g, members in by_grp.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        want |= {(g, i) for i, _ in members[:k]}
    assert fast == want


# ---------------------------------------------------------------------------
# JPEG codec properties (pure python/numpy — no Spark job per example,
# so these afford a larger example budget than the DataFrame properties)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    channels=st.sampled_from([1, 3]),
    subsample=st.booleans(),
    dri=st.sampled_from([0, 1, 3]),
)
def test_jpeg_roundtrip_property(h, w, seed, channels, subsample, dri):
    """Any uint8 image round-trips through the baseline codec with
    bounded error and exact dims — including awkward sizes (1x1, non-
    multiples of the MCU), both samplings, and restart intervals.
    Random noise is the WORST case for DCT coding, so the error bound
    is loose; structure-preservation is asserted via the mean."""
    import numpy as np

    from tajo_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_header,
    )

    rng = np.random.default_rng(seed)
    # low-frequency content (random per-8x8-block levels) + mild noise:
    # decodable by ANY baseline decoder, bounded quantization error
    base = rng.integers(30, 220, (max(1, (h + 7) // 8), max(1, (w + 7) // 8)))
    img = np.kron(base, np.ones((8, 8)))[:h, :w]
    img = np.clip(img + rng.integers(-5, 6, (h, w)), 0, 255).astype(np.uint8)
    if channels == 3:
        img = np.stack([img, 255 - img, img // 2 + 60], axis=2).astype(
            np.uint8
        )
    enc = encode_jpeg(
        img, quality=92, subsample=subsample, restart_interval=dri
    )
    gw, gh, gc = jpeg_header(enc)
    assert (gw, gh, gc) == (w, h, channels)
    dec = decode_jpeg(enc)
    assert dec.shape == (h, w, channels)
    a = dec.astype(int).reshape(h, w, channels)
    b = img.reshape(h, w, channels).astype(int)
    assert np.abs(a - b).mean() < (8.0 if subsample else 4.0)
    assert np.abs(a - b).max() <= (64 if subsample else 32)


def test_exact_dedup_null_text_never_groups(spark):
    """r11 review: SQL GROUP BY collapses every null-text doc into ONE
    'duplicate' group (md5(NULL) = NULL is a single key), so a
    keep_doc_id semi-join silently dropped all-but-one of them — but
    null text is UNKNOWN, not equal. Null docs now survive as their
    own single-member groups in both exact and fingerprint dedup;
    degenerate LSH banding parameters raise instead of collapsing the
    corpus into one bucket."""
    import pytest
    from pyspark.sql import functions as F

    from tajo_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, None)],
        "doc_id LONG, text STRING",
    )
    for fn in (dedup.exact_dedup_groups, dedup.fingerprint_dedup_groups):
        groups = fn(docs).collect()
        keeps = sorted(r.keep_doc_id for r in groups)
        assert keeps == [1, 3, 4, 5], fn.__name__
        assert all(
            r.dup_count == 1 and r.fp is None
            for r in groups
            if r.keep_doc_id >= 3
        ), fn.__name__
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_band_keys(num_hashes=2, num_bands=4)
    with pytest.raises(ValueError, match="evenly divide"):
        dedup.minhash_band_keys(num_hashes=10, num_bands=4)


def test_exact_dedup_null_text_null_id_never_groups(spark):
    """ADVICE r11: rows with NULL text AND NULL doc_id shared the
    (NULL, NULL) group key and collapsed into one group — each must
    stay its own single-member group like every other null-text doc."""
    from tajo_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (None, None), (None, None), (None, None)],
        "doc_id LONG, text STRING",
    )
    groups = dedup.exact_dedup_groups(docs).collect()
    # one "same" group + three singleton null-null groups
    assert len(groups) == 4
    null_rows = [r for r in groups if r.fp is None]
    assert len(null_rows) == 3
    assert all(r.dup_count == 1 and r.keep_doc_id is None for r in null_rows)
    # a null-id row must not pool with a REAL doc whose id stringifies
    # to the synthetic key's suffix (the \x00 prefix keeps them apart)
    docs2 = spark.createDataFrame(
        [(0, None), (None, None)], "doc_id LONG, text STRING"
    )
    assert dedup.exact_dedup_groups(docs2).count() == 2
