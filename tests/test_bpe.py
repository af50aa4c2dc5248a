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


def test_bpe_apply_matches_reference_encode(spark):
    from tajo_spark.operators.bpe import apply_bpe

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id INT, text STRING"
    )
    merges = train_bpe(docs, n_merges=6)
    got = {
        r.doc_id: (r.n_chars_tok, r.n_bpe_tokens)
        for r in apply_bpe(docs, merges).collect()
    }

    def encode_len(word):
        pieces = list(word) + [END_MARK]
        for _r, a, b, _f in merges:
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            pieces = out
        return len(pieces)

    for doc_id, text in enumerate(TEXTS):
        ws = [w for w in text.strip().lower().split() if w]
        want = (
            sum(len(w) + 1 for w in ws),
            sum(encode_len(w) for w in ws),
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    # merging strictly compresses on this corpus
    assert all(t < c for c, t in got.values())


def _first_divergence_is_freq_tie(got, want):
    """True iff the sequences agree, or first disagree at a rank where
    both chose pairs of EQUAL frequency (the benign batching tie)."""
    for g, w in zip(got, want):
        if g != w:
            return g[3] == w[3]
    return True


def test_bpe_batched_matches_sequential_without_ties(spark):
    # mutually non-interacting batches reproduce the sequential merge
    # sequence exactly when no frequency tie crosses a batch boundary
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id INT, text STRING"
    )
    want = _reference_bpe(TEXTS, 6)
    for k in (2, 4, 8):
        got = train_bpe(docs, n_merges=6, batch_k=k)
        assert _first_divergence_is_freq_tie(got, want), (k, got, want)
        # on THIS corpus the sequences are in fact identical (no
        # boundary ties) — pin the strong form too
        assert got == want, (k, got, want)


def test_bpe_batched_tie_divergence_is_benign(spark):
    # Documented divergence: admitting (c,d) in the same batch as (a,z)
    # is safe by the strict-stop rule, but sequential recounting sees
    # the NEW pair (az,y) — tied at freq 5 and lexicographically before
    # (c,d) — and prefers it. Both choices are frequency-5 merges; the
    # learned vocabularies differ only in merge order within the tie.
    texts = ["azy " * 5 + "azw " * 2 + "cd " * 5]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id INT, text STRING")
    seq = _reference_bpe(texts, 2)
    batched = train_bpe(docs, n_merges=2, batch_k=2)
    assert seq[0] == batched[0]  # top pair agrees: (a,z) freq 7
    assert seq[1] != batched[1]  # the tie diverges...
    assert seq[1][3] == batched[1][3] == 5  # ...at equal frequency
    assert batched[1][1:3] == ("c", "d")
    assert seq[1][1:3] == ("az", "y")
    assert _first_divergence_is_freq_tie(batched, seq)


def test_bpe_batched_strict_stop_blocks_interacting_pairs(spark):
    # (b,</w>) ties the would-be second admission and shares b with the
    # top pair (a,b) → the batch must stop at ONE merge, and the next
    # round recounts (sequential equivalence preserved)
    texts = ["ab " * 6 + "cd " * 5]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id INT, text STRING")
    got = train_bpe(docs, n_merges=3, batch_k=4)
    want = _reference_bpe(texts, 3)
    assert got == want, (got, want)


def test_bpe_local_fast_path_is_bit_identical_to_distributed(spark):
    # the size-gated driver-local merge loop (local_dict_max_rows)
    # must reproduce the distributed path's merge sequence EXACTLY —
    # including candidate truncation, batched admission, and the
    # documented boundary-tie behavior — for every batch_k
    corpora = [TEXTS, ["azy " * 5 + "azw " * 2 + "cd " * 5]]
    for texts in corpora:
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id INT, text STRING"
        )
        for k in (1, 2, 8):
            local = train_bpe(docs, n_merges=6, batch_k=k)
            dist = train_bpe(
                docs, n_merges=6, batch_k=k, local_dict_max_rows=0
            )
            assert local == dist, (k, local, dist)


def test_bpe_local_gate_overflows_to_distributed(spark):
    # a dictionary bigger than the gate must take the distributed path
    # and still produce the same merges (gate=1 forces overflow here)
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id INT, text STRING"
    )
    got = train_bpe(docs, n_merges=4, batch_k=2, local_dict_max_rows=1)
    want = train_bpe(docs, n_merges=4, batch_k=2)
    assert got == want


def test_bpe_apply_chunked_folds_match_single_fold(spark):
    # expression-depth capping (localCheckpoint every fold_chunk
    # merges) must not change the encode result
    from tajo_spark.operators.bpe import apply_bpe

    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id INT, text STRING"
    )
    merges = train_bpe(docs, n_merges=6)
    one = {
        r.doc_id: (r.n_chars_tok, r.n_bpe_tokens)
        for r in apply_bpe(docs, merges, fold_chunk=64).collect()
    }
    chunked = {
        r.doc_id: (r.n_chars_tok, r.n_bpe_tokens)
        for r in apply_bpe(docs, merges, fold_chunk=2).collect()
    }
    assert one == chunked


def test_local_trainer_property_matches_reference():
    """Property pin (pure Python, no Spark): the driver-local merge
    loop at batch_k=1 IS the textbook sequential algorithm — on random
    corpora it must reproduce _reference_bpe's merge sequence exactly,
    including tie-breaks, truncation interplay, and early stop."""
    import random

    from tajo_spark.operators.bpe import END_MARK, _train_local

    rng = random.Random(11)
    alphabet = "abcde"
    for trial in range(50):
        words = [
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 6))
            )
            for _ in range(rng.randint(1, 30))
        ]
        text = " ".join(words)
        wf = collections.Counter(w for w in text.split() if w)
        local_words = [
            (c, list(w) + [END_MARK]) for w, c in sorted(wf.items())
        ]
        n = rng.randint(1, 10)
        got = _train_local(local_words, n_merges=n, batch_k=1)
        want = _reference_bpe([text], n)
        assert got == want, (trial, text, got, want)
