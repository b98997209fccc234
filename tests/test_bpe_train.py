"""Distributed BPE trainer golden tests (functions/bpe.py).

No SQL oracle exists (greedy iterative training), so the gate is an
EXACT match against an independent pure-Python BPE reference — the
classic word-frequency-dict implementation, written from the Sennrich
et al. (2016) algorithm description, sharing no code with the engine —
in both the classic one-merge-per-round mode (``merges_per_round=1``)
and the batched mode (top-k pairwise non-conflicting merges per round,
applied in one simultaneous greedy fold).
"""

from __future__ import annotations

from collections import Counter

import pytest

from polars_trading_spark.functions.bpe import bpe_token_budget, bpe_train


def _ref_tokens(text: str) -> list[str]:
    """Mirror functions/text.py::tokens — lowercase, strip to [a-z0-9 ],
    collapse whitespace."""
    import re

    norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def _ref_bpe_train(texts, n_merges, min_pair_count=2, k=1, window=None):
    """Independent reference: greedy BPE on the word-frequency dict.

    ``k=1`` is the classic algorithm.  ``k>1`` is the batched variant:
    each round scans the top-``window`` pairs in (count desc, left,
    right) order, greedily selects up to ``k`` pairwise token-disjoint
    merges, and applies them ALL in one left-to-right fold (a merge
    fires whenever (accumulated-last, next) matches ANY selected pair).
    """
    window = window if window is not None else 8 * k
    words = Counter()
    for t in texts:
        words.update(_ref_tokens(t))
    segs = {w: list(w) for w in words}
    merges = []
    while len(merges) < n_merges:
        kk = min(k, n_merges - len(merges))
        pairs = Counter()
        for w, c in words.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        cands = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:window]
        selected, used = [], set()
        for (left, right), cnt in cands:
            if cnt < min_pair_count:
                break
            if left in used or right in used:
                continue
            selected.append((left, right, cnt))
            used.update((left, right))
            if len(selected) == kk:
                break
        if not selected:
            break
        pairset = {(left, right) for left, right, _ in selected}
        for w, s in segs.items():
            out = []
            for x in s:
                if out and (out[-1], x) in pairset:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            segs[w] = out
        for left, right, cnt in selected:
            merges.append((len(merges) + 1, left, right, left + right, cnt))
    return merges, {w: len(s) for w, s in segs.items()}, dict(words)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "low lower lowest newer newest widest wide",
    "hugging faces hug hugs hugged hugging",
    "aaa aaaa aa aaa banana bandana",
    "the the the and and of of of of",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(CORPUS)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def _got_merges(merges_df):
    return [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]


def test_bpe_train_classic_matches_reference_exactly(docs, spark):
    merges_df, words_df = bpe_train(
        docs, n_merges=12, min_pair_count=2, merges_per_round=1
    )
    ref_merges, ref_seg_counts, ref_counts = _ref_bpe_train(CORPUS, 12, 2, k=1)
    assert _got_merges(merges_df) == ref_merges
    got_words = {
        r["word"]: (r["word_count"], r["n_bpe_tokens"])
        for r in words_df.collect()
    }
    assert set(got_words) == set(ref_counts)
    for w in ref_counts:
        assert got_words[w] == (ref_counts[w], ref_seg_counts[w]), w


@pytest.mark.parametrize("k", [3, 8])
def test_bpe_train_batched_matches_batched_reference(docs, spark, k):
    merges_df, words_df = bpe_train(
        docs, n_merges=12, min_pair_count=2, merges_per_round=k
    )
    ref_merges, ref_seg_counts, _ = _ref_bpe_train(CORPUS, 12, 2, k=k)
    assert _got_merges(merges_df) == ref_merges
    got_seg = {r["word"]: r["n_bpe_tokens"] for r in words_df.collect()}
    assert got_seg == ref_seg_counts


def test_bpe_train_batched_rounds_scale_as_vocab_over_k(docs, spark):
    # the whole point of batching: ~n_merges/k sequential Spark rounds.
    # Spark's merge list is pinned exact-equal to the reference (test
    # above), and the reference's round count is directly countable —
    # 12 merges at k=8 must take far fewer rounds than the classic 12.
    rounds = {}
    for k in (1, 8):
        n, merges = 0, []
        texts, counter = CORPUS, Counter()
        for t in texts:
            counter.update(_ref_tokens(t))
        segs = {w: list(w) for w in counter}
        while len(merges) < 12:
            n += 1
            got, segs2, _ = _ref_bpe_train(texts, len(merges) + k, 2, k=k)
            if len(got) == len(merges):
                break
            merges = got
        rounds[k] = n
    assert rounds[1] == 12
    assert rounds[8] <= 2


def test_bpe_train_early_stop_and_overlap_semantics(spark):
    # 'aaaa' x3: pair (a,a) counts 3 occurrences x 3 docs... reference
    # decides; key check = greedy leftmost non-overlap ('aaaa' -> aa,aa)
    texts = ["aaaa aaaa", "aaaa"]
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    merges_df, words_df = bpe_train(
        df, n_merges=50, min_pair_count=2, merges_per_round=1
    )
    ref_merges, ref_seg_counts, _ = _ref_bpe_train(texts, 50, 2, k=1)
    assert _got_merges(merges_df) == ref_merges
    got_seg = {r["word"]: r["n_bpe_tokens"] for r in words_df.collect()}
    assert got_seg == ref_seg_counts
    # early stop: merge count << 50
    assert len(ref_merges) < 50
    # batched mode early-stops identically on this corpus
    merges_b, _ = bpe_train(df, n_merges=50, min_pair_count=2)
    ref_b, _, _ = _ref_bpe_train(texts, 50, 2, k=8)
    assert _got_merges(merges_b) == ref_b


def test_bpe_token_budget_matches_reference(docs, spark):
    n_merges = 8
    merges_df, words_df = bpe_train(docs, n_merges=n_merges)
    out = {r["source"]: r for r in bpe_token_budget(docs, words_df).collect()}
    _, ref_seg_counts, _ = _ref_bpe_train(CORPUS, n_merges, 2, k=8)
    for src in ("s0", "s1"):
        texts = [t for i, t in enumerate(CORPUS) if f"s{i % 2}" == src]
        ws = sum(len(_ref_tokens(t)) for t in texts)
        bpe = sum(
            ref_seg_counts[w] for t in texts for w in _ref_tokens(t)
        )
        r = out[src]
        assert r["whitespace_tokens"] == ws
        assert r["bpe_tokens"] == bpe
        assert r["bpe_per_word"] == pytest.approx(round(bpe / ws, 6))
        assert r["n_docs"] == len(texts)
        assert r["n_oov_words"] == 0  # training corpus: full coverage


def test_bpe_token_budget_oov_fallback(docs, spark):
    # apply the vocabulary trained on CORPUS to a SHIFTED corpus: OOV
    # words contribute their character count (unmerged segmentation),
    # never zero, and are counted in n_oov_words.
    _, words_df = bpe_train(docs, n_merges=8)
    vocab = {r["word"]: r["n_bpe_tokens"] for r in words_df.collect()}
    shifted = ["the quick zyzzyva qqq", "xylophone the dog"]
    sdf = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(shifted)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    r = bpe_token_budget(sdf, words_df).collect()[0]
    exp_bpe = exp_oov = 0
    for t in shifted:
        for w in _ref_tokens(t):
            if w in vocab:
                exp_bpe += vocab[w]
            else:
                exp_bpe += len(w)
                exp_oov += 1
    assert r["bpe_tokens"] == exp_bpe
    assert r["n_oov_words"] == exp_oov
    assert exp_oov > 0  # the scenario actually exercises the fallback


def test_bpe_train_validation(docs):
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)
    with pytest.raises(ValueError):
        bpe_train(docs, min_pair_count=0)
    with pytest.raises(ValueError):
        bpe_train(docs, merges_per_round=0)
    with pytest.raises(ValueError):
        bpe_train(docs, merges_per_round=8, candidate_window=4)


def _ref_encode(texts, n_merges, k=8):
    """Independent reference encode: re-run the reference trainer to get
    final segmentations, assign ids chars-sorted-first then merges by
    rank (first rank wins on string collisions), and map every doc's
    words through segmentation (char fallback for OOV, -1 for unknown
    chars)."""
    window = 8 * k
    words = Counter()
    for t in texts:
        words.update(_ref_tokens(t))
    segs = {w: list(w) for w in words}
    merges = []
    while len(merges) < n_merges:
        kk = min(k, n_merges - len(merges))
        pairs = Counter()
        for w, c in words.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        cands = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:window]
        selected, used = [], set()
        for (left, right), cnt in cands:
            if cnt < 2:
                break
            if left in used or right in used:
                continue
            selected.append((left, right, cnt))
            used.update((left, right))
            if len(selected) == kk:
                break
        if not selected:
            break
        pairset = {(left, right) for left, right, _ in selected}
        for w, s in segs.items():
            out = []
            for x in s:
                if out and (out[-1], x) in pairset:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            segs[w] = out
        for left, right, cnt in selected:
            merges.append((len(merges) + 1, left, right, left + right, cnt))
    chars = sorted({c for w in words for c in w})
    ids = {c: i for i, c in enumerate(chars)}
    for rank, left, right, merged, _ in merges:
        ids.setdefault(merged, len(chars) + rank - 1)
    enc = {}
    for t in texts:
        out = []
        for w in _ref_tokens(t):
            for tok in segs.get(w, list(w)):
                out.append(ids.get(tok, -1))
        enc[t] = out
    return enc, segs, ids


def test_bpe_encode_matches_reference(docs, spark):
    from polars_trading_spark.functions.bpe import bpe_encode

    merges_df, words_df = bpe_train(docs, n_merges=12)
    out = {
        r["doc_id"]: r
        for r in bpe_encode(docs, merges_df, words_df).collect()
    }
    enc, segs, ids = _ref_encode(CORPUS, 12, k=8)
    assert len(out) == len(CORPUS)
    for i, t in enumerate(CORPUS):
        r = out[i]
        assert list(r["token_ids"]) == enc[t], (i, t)
        ws = _ref_tokens(t)
        assert r["n_words"] == len(ws)
        assert r["n_tokens"] == sum(len(segs[w]) for w in ws)
        assert r["n_oov_words"] == 0  # encoding the training corpus
        assert r["n_unk"] == 0


def test_bpe_encode_oov_and_unk_and_empty(docs, spark):
    from polars_trading_spark.functions.bpe import bpe_encode

    merges_df, words_df = bpe_train(docs, n_merges=12)
    other = spark.createDataFrame(
        [
            (100, "the unseenword zz9", "en", "s0", 18),
            (101, "???", "en", "s0", 3),  # normalizes to zero tokens
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r["doc_id"]: r for r in bpe_encode(other, merges_df, words_df).collect()}
    _, segs, ids = _ref_encode(CORPUS, 12, k=8)
    r = out[100]
    # 'the' is in-vocab; 'unseenword' and 'zz9' fall back to chars
    want = [ids[t] for t in segs["the"]]
    want += [ids.get(c, -1) for c in "unseenword"]
    want += [ids.get(c, -1) for c in "zz9"]
    assert list(r["token_ids"]) == want
    assert r["n_words"] == 3
    assert r["n_oov_words"] == 2
    # '9' never appears in the training corpus (a digit-free pangram
    # plus words) -> UNK; 'z' IS known via 'lazy'
    assert ids.get("9") is None and ids.get("z") is not None
    assert want.count(-1) == 1
    assert r["n_unk"] == 1
    # empty doc keeps its row with an empty id array
    r2 = out[101]
    assert (r2["n_words"], r2["n_tokens"], list(r2["token_ids"])) == (0, 0, [])


def test_bpe_vocab_ids_chars_then_ranks(docs, spark):
    from polars_trading_spark.functions.bpe import bpe_vocab

    merges_df, words_df = bpe_train(docs, n_merges=12)
    vocab = {r["token"]: r["token_id"] for r in bpe_vocab(merges_df, words_df).collect()}
    _, _, ids = _ref_encode(CORPUS, 12, k=8)
    assert vocab == ids
    assert len(set(vocab.values())) == len(vocab)  # ids are unique


def test_bpe_pack_sequences_budgets_by_bpe_counts(docs, spark):
    from polars_trading_spark.functions.bpe import bpe_encode
    from polars_trading_spark.functions.corpus import bpe_pack_sequences

    merges_df, words_df = bpe_train(docs, n_merges=12)
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode(docs, merges_df, words_df).collect()
    }
    out = bpe_pack_sequences(
        docs, words_df, budget_tokens=16, n_shards=2
    ).collect()
    assert {r["doc_id"] for r in out} == set(enc)
    for r in out:
        # budgeted by the REAL tokenizer count
        assert r["n_tokens"] == enc[r["doc_id"]]
    # greedy invariant: within a (shard, seq), offsets are a prefix sum
    # and the sequence respects the budget unless it is a single
    # oversized document
    from collections import defaultdict

    seqs = defaultdict(list)
    for r in out:
        seqs[(r["shard"], r["seq_id"])].append(r)
    for rows in seqs.values():
        rows.sort(key=lambda r: r["seq_offset"])
        total = sum(r["n_tokens"] for r in rows)
        assert total <= 16 or len(rows) == 1
        off = 0
        for r in rows:
            assert r["seq_offset"] == off
            off += r["n_tokens"]


def test_bpe_train_shared_cache_identical_results(docs, spark):
    # Round 14: inside a shared_signature_cache() block the trained
    # tokenizer is cached per (corpus plan, params) — repeated calls
    # must return the identical merge list and word table, and both
    # must equal the uncached result.
    from polars_trading_spark.functions.dedup import shared_signature_cache

    merges_plain, words_plain = bpe_train(docs, n_merges=12)
    ref_merges = _got_merges(merges_plain)
    ref_words = {
        r["word"]: (r["word_count"], r["n_bpe_tokens"])
        for r in words_plain.collect()
    }
    with shared_signature_cache():
        m1, w1 = bpe_train(docs, n_merges=12)
        m2, w2 = bpe_train(docs, n_merges=12)  # served from the cache
        assert w2 is w1  # cache hit returns the same word table
        assert _got_merges(m1) == ref_merges
        assert _got_merges(m2) == ref_merges
        got1 = {
            r["word"]: (r["word_count"], r["n_bpe_tokens"])
            for r in w1.collect()
        }
        assert got1 == ref_words
        # different params must NOT collide in the cache
        m3, _ = bpe_train(docs, n_merges=12, merges_per_round=1)
        ref_classic, _, _ = _ref_bpe_train(CORPUS, 12, 2, k=1)
        assert _got_merges(m3) == ref_classic
