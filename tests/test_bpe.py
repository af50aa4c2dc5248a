"""Distributed BPE trainer vs a pure-Python reference implementation
(the public Sennrich et al. algorithm) — the merge SEQUENCE must match
exactly, including lexicographic tie-breaks and early stop."""

from __future__ import annotations

import collections

from tajo_spark.operators.bpe import END_MARK, train_bpe


def _reference_bpe(texts, n_merges):
    wf = collections.Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wf[w] += 1
    state = {tuple(list(w) + [END_MARK]): c for w, c in wf.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for pieces, c in state.items():
            for i in range(len(pieces) - 1):
                pairs[(pieces[i], pieces[i + 1])] += c
        if not pairs:
            break
        (a, b), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merges.append((rank, a, b, freq))
        new_state = collections.Counter()
        for pieces, c in state.items():
            out, i = [], 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == a
                    and pieces[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            new_state[tuple(out)] += c
        state = new_state
    return merges


TEXTS = [
    "the theme then there the then",
    "other brother the mother there",
    "thin this the them then theme",
    "aaa aaaa aa aaa banana bandana",
]


def test_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id INT, text STRING"
    )
    got = train_bpe(docs, n_merges=6)
    want = _reference_bpe(TEXTS, 6)
    assert got == want, f"\ngot:  {got}\nwant: {want}"
    # 'th' must be the first merge in this corpus, freq = sum of all
    # th-initial word occurrences
    assert got[0][1:3] == ("t", "h")


def test_bpe_overlapping_runs_merge_left_to_right(spark):
    # 'aaaa' with pair (a,a): greedy non-overlapping pass → aa aa, and
    # the reference implementation agrees by construction
    docs = spark.createDataFrame([(0, "aaaa aaaa aaa")], "doc_id INT, text STRING")
    got = train_bpe(docs, n_merges=2)
    want = _reference_bpe(["aaaa aaaa aaa"], 2)
    assert got == want


def test_bpe_early_stop_on_unique_text(spark):
    docs = spark.createDataFrame(
        [(0, "abcdefg")], "doc_id INT, text STRING"
    )
    # every adjacent pair occurs once → no merge reaches freq 2
    assert train_bpe(docs, n_merges=4) == []
