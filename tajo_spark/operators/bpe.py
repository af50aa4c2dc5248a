"""Distributed BPE tokenizer training — the vocabulary-learning step of
an LLM data pipeline (byte-pair encoding, Sennrich et al. 2016, public
algorithm).

Beyond-reference capability. Scale design (classic BPE trains on the
WORD-FREQUENCY DICTIONARY, not the raw corpus):

* One corpus scan aggregates ``(word, count)`` — after that, every
  merge round touches |distinct words| rows (Zipf: orders of magnitude
  smaller than the corpus, and shrinking as merges consolidate).
* Per round: explode adjacent symbol pairs weighted by word count, one
  two-phase groupBy for pair frequencies, a TakeOrdered(1) for the best
  pair (the ONLY driver-visible value per round — one (pair, freq)
  scalar, never data), then a pure-HOF fold rewrites each word's symbol
  array with the merge applied. Lineage is truncated per round via
  ``localCheckpoint`` exactly like connected components.
* The merge fold is left-to-right non-overlapping (the standard BPE
  greedy pass): after ``(a,a)→aa`` the new symbol never re-merges with
  the next ``a`` in the same round, because the fold compares the
  ORIGINAL pair symbols.

Determinism: ties on frequency break by lexicographic pair order, so
any engine (and the pytest pure-Python reference) reproduces the exact
merge sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tajo_spark.operators.text import tokens as _tokens

END_MARK = "</w>"  # end-of-word sentinel, as in the public algorithm


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — the one full-corpus scan."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols() -> F.Column:
    """word → [c, h, a, r, s, </w>]."""
    chars = F.split(F.col("w"), "")
    return F.concat(
        F.filter(chars, lambda c: c != ""), F.array(F.lit(END_MARK))
    )


def _adjacent_pairs(pieces: F.Column) -> F.Column:
    """[(p1, p2), ...] adjacent symbol pairs of a symbol array."""
    n = F.size(pieces)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(pieces, i).alias("a"),
                F.element_at(pieces, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _merge_pair(pieces: F.Column, a: str, b: str) -> F.Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a||b.

    HOF fold building the new array: append each symbol, except when
    the accumulator ends with ``a`` and the incoming symbol is ``b`` —
    then replace that tail element with the merged symbol. Comparing
    against the ORIGINAL ``a`` keeps the pass non-overlapping (a fresh
    merge result never immediately re-merges).
    """
    merged = a + b
    return F.aggregate(
        pieces,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, freq), ...]`` in merge order.

    Stops early when no adjacent pair repeats (freq < 2 means merging
    would memorize single occurrences). The returned list is the
    tokenizer's merge table — metadata-sized by construction (one row
    per merge), which is why collecting it to the driver is correct.
    """
    state = (
        word_freq(docs, text_col)
        .select("cnt", _initial_symbols().alias("pieces"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            state.select(
                "cnt", F.explode(_adjacent_pairs(F.col("pieces"))).alias("p")
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0].freq < 2:
            break
        a, b, freq = best[0].a, best[0].b, int(best[0].freq)
        merges.append((rank, a, b, freq))
        state = state.select(
            "cnt", _merge_pair(F.col("pieces"), a, b).alias("pieces")
        ).localCheckpoint()
    return merges


def bpe_merge_table(
    spark: SparkSession, docs: DataFrame, n_merges: int = 8
) -> DataFrame:
    """The merge list as a DataFrame (rank, left, right, freq)."""
    return spark.createDataFrame(
        train_bpe(docs, n_merges=n_merges),
        "rank INT, left STRING, right STRING, freq BIGINT",
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge table: (doc_id, n_chars_tok,
    n_bpe_tokens) — the encode stage of the tokenizer.

    Each merge is one more pure-HOF fold over the per-word symbol
    arrays (same left-to-right pass as training), applied in rank
    order; the whole encode is a single zero-shuffle projection per
    document, so at 100 TB it rides the scan. Token accounting comes
    back aggregated per doc (words exploded once, map-side combine).
    """
    words = docs.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    pieces = _initial_symbols()
    n_chars = F.size(pieces)
    for _rank, a, b, _freq in merges:
        pieces = _merge_pair(pieces, a, b)
    return (
        words.select(
            "doc_id",
            n_chars.alias("nc"),
            F.size(pieces).alias("nt"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("nc").cast("long").alias("n_chars_tok"),
            F.sum("nt").cast("long").alias("n_bpe_tokens"),
        )
    )
