"""Property-based exactness checks for the integer-arithmetic
operators: the Spark PageRank/BPE computations must agree
unit-for-unit with straightforward pure-Python references on ARBITRARY
inputs — the contract that lets their DuckDB oracles (the same math,
third implementation) hash-match at any scale."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# -- references --------------------------------------------------------------


def _py_pagerank(edges, iterations, scale=10**9, num=85, den=100, seeds=None):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    tele = ((den - num) * scale) // den
    t = {n: (tele if seeds is None or n in seeds else 0) for n in nodes}
    r = {n: (scale if seeds is None or n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        r = {n: t[n] + (num * inflow[n]) // den for n in nodes}
    return r


def _py_bpe_merge(seq, left, right):
    out, pend = [], None
    for x in seq:
        if pend is None:
            pend = x
        elif pend == left and x == right:
            out.append(left + right)
            pend = None
        else:
            out.append(pend)
            pend = x
    if pend is not None:
        out.append(pend)
    return out


def _py_bpe_train(texts, n_merges, min_freq):
    words: dict[str, int] = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    segs = {w: list(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: dict[tuple, int] = {}
        for w, freq in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + freq
        if not any(c >= min_freq for c in pairs.values()):
            break
        # deterministic argmax: max count, then lexicographically least pair
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if best[1] < min_freq:
            break
        merges.append((step, best[0][0], best[0][1], best[1]))
        segs = {w: _py_bpe_merge(s, best[0][0], best[0][1]) for w, s in segs.items()}
    return merges


edges_st = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).map(
        lambda p: (f"n{p[0]}", f"n{p[1]}")
    ),
    min_size=1,
    max_size=15,
).map(lambda es: sorted(set(es)))

texts_st = st.lists(
    st.lists(
        st.sampled_from(["ab", "abc", "aab", "ba", "bb", "a", "cab"]),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_st, iters=st.integers(0, 4))
def test_pagerank_matches_python_reference(spark, edges, iters):
    from data_ingestion_framework_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(df, iterations=iters, checkpoint_every=0).collect()
    }
    assert got == _py_pagerank(edges, iters)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_st, iters=st.integers(1, 3))
def test_trustrank_matches_python_reference(spark, edges, iters):
    from data_ingestion_framework_spark.operators.graph import pagerank

    seeds = {edges[0][0]}
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(
            df, iterations=iters, checkpoint_every=0, seeds=sdf
        ).collect()
    }
    assert got == _py_pagerank(edges, iters, seeds=seeds)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st, n=st.integers(1, 3))
def test_bpe_train_matches_python_reference(spark, texts, n):
    from data_ingestion_framework_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_train_merges(df, n_merges=n, min_freq=1).collect()
    ]
    assert got == _py_bpe_train(texts, n, 1)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st, n=st.integers(1, 4))
def test_bpe_batched_apply_equals_sequential_apply(spark, texts, n):
    """The batched fold == k sequential merges: applying the batched
    trainer's merge list one-at-a-time with the pure-Python fold over
    the raw vocabulary reproduces the Spark-side final segmentation
    exactly (pairs within a round are symbol-disjoint, so a single
    chained pass and k separate passes cannot differ)."""
    from data_ingestion_framework_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merge_df, vocab = bpe_train_merges(
        df, n_merges=n, min_freq=1, batch_size=max(2, n), return_vocab=True
    )
    merges = [(r["left"], r["right"]) for r in merge_df.collect()]
    got = {r["w"]: r["n_sym"] for r in vocab.collect()}
    words = set()
    for t in texts:
        words.update(w for w in " ".join(t.lower().split()).split(" ") if w)
    for w in words:
        s = list(w)
        for left, right in merges:
            s = _py_bpe_merge(s, left, right)
        assert got[w] == len(s), (w, merges)


def test_bpe_batched_equals_sequential_on_disjoint_corpus(spark):
    """When the top-k pairs are pairwise symbol-disjoint and no merge
    creates a higher-ranked pair, batched and sequential training are
    IDENTICAL — merge table and all."""
    from data_ingestion_framework_spark.operators.text import bpe_train_merges

    texts = ["ab ab ab ab cd cd cd ef ef gh"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    seq = [
        tuple(r)
        for r in bpe_train_merges(df, n_merges=4, batch_size=1).collect()
    ]
    bat = [
        tuple(r)
        for r in bpe_train_merges(df, n_merges=4, batch_size=4).collect()
    ]
    assert seq == bat == [
        (1, "a", "b", 4),
        (2, "c", "d", 3),
        (3, "e", "f", 2),
        (4, "g", "h", 1),
    ]


def test_bpe_batched_skips_overlapping_pairs(spark):
    """A pair sharing a symbol with an earlier in-round selection is
    skipped (its count may be stale), picked up by the next round's
    recount instead — never applied on stale counts."""
    from data_ingestion_framework_spark.operators.text import bpe_train_merges

    # "aba" x3: pairs (a,b) cnt 3, (b,a) cnt 3 — (a,b) wins the tie,
    # (b,a) overlaps it and must wait for the recount round, where
    # after the (a,b) merge "aba" -> [ab, a] the pair (b,a) is GONE
    # and (ab, a) cnt 3 is the true next merge.
    df = spark.createDataFrame([("aba aba aba",)], "text string")
    got = [
        tuple(r) for r in bpe_train_merges(df, n_merges=2, batch_size=2).collect()
    ]
    assert got == [(1, "a", "b", 3), (2, "ab", "a", 3)]
    seq = [
        tuple(r) for r in bpe_train_merges(df, n_merges=2, batch_size=1).collect()
    ]
    assert got == seq


def _py_viterbi(word, vocab, k=1024, big=10**15):
    """Reference DP: combined = cost*k + pieces, lexicographic min."""
    n = len(word)
    best = [0] + [big] * n
    for i in range(1, n + 1):
        for piece, cost in vocab.items():
            s = i - len(piece)
            if s >= 0 and word[s:i] == piece and best[s] < big:
                best[i] = min(best[i], best[s] + cost * k + 1)
    return (best[n] // k, best[n] % k) if best[n] < big else (None, None)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st, top_n=st.integers(2, 8))
def test_viterbi_tokenizer_matches_python_reference(spark, texts, top_n):
    """substring_vocab + viterbi_segment_words against a plain-Python
    witness: same rank costs, same (cost, fewest-pieces) argmin per
    word — the integer-packed DP fold is the reference recurrence."""
    from data_ingestion_framework_spark.operators.text import (
        substring_vocab,
        viterbi_segment_words,
    )

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    vocab_df = substring_vocab(df, max_piece_len=3, top_n=top_n)
    vocab = {r["piece"]: r["cost_units"] for r in vocab_df.collect()}
    # python witness of the vocab builder
    freqs: dict[str, int] = {}
    words: dict[str, int] = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, 4):
                if i + l <= len(w):
                    p = w[i : i + l]
                    freqs[p] = freqs.get(p, 0) + f
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    # kept set = top_n ∪ single chars; cost = rank WITHIN the kept set
    kept = [
        p
        for r, (p, _) in enumerate(ranked, 1)
        if r <= top_n or len(p) == 1
    ]
    want_vocab = {p: i for i, p in enumerate(kept, 1)}
    assert vocab == want_vocab
    got = {
        r["w"]: (r["vit_cost_units"], r["vit_n_pieces"])
        for r in viterbi_segment_words(df, vocab_df).collect()
    }
    for w in words:
        assert got[w] == _py_viterbi(w, vocab), (w, vocab)


def test_substring_vocab_rejects_uncapped_top_n(spark):
    """The eager kept-set collect is only sound for vocabulary-sized
    outputs — a top_n above the control-plane cap must raise up front
    (before any job runs), enforcing the docstring's claim."""
    import pytest

    from data_ingestion_framework_spark.operators.text import (
        SUBSTRING_VOCAB_MAX_KEPT,
        substring_vocab,
    )

    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="control-plane cap"):
        substring_vocab(df, top_n=SUBSTRING_VOCAB_MAX_KEPT + 1)


def test_viterbi_unsegmentable_word_returns_null(spark):
    from data_ingestion_framework_spark.operators.text import (
        viterbi_segment_words,
    )

    df = spark.createDataFrame([("ab zq",)], "text string")
    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2), ("ab", 3), ("z", 4)],
        "piece string, cost_units long",
    )
    got = {
        r["w"]: (r["vit_cost_units"], r["vit_n_pieces"])
        for r in viterbi_segment_words(df, vocab).collect()
    }
    # 'ab': piece 'ab' costs 3 as ONE piece (packed 3*1024+1) vs
    # 'a'+'b' costing 3 as TWO pieces — fewest-pieces tiebreak wins
    assert got["ab"] == (3, 1)
    assert got["zq"] == (None, None)  # 'q' not in vocab


def test_viterbi_token_counts_null_propagates_per_doc(spark):
    """A document containing an unsegmentable word gets NULL totals —
    not a silently undercounted sum — while sibling documents whose
    words all segment keep exact counts (F.sum alone would skip the
    NULL word and report a plausible-but-wrong total)."""
    from data_ingestion_framework_spark.operators.text import (
        viterbi_token_counts,
    )

    df = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab zq")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame(
        [("a", 1), ("b", 2), ("ab", 3), ("z", 4)],
        "piece string, cost_units long",
    )
    got = {
        r["doc_id"]: (r["viterbi_tokens"], r["viterbi_cost_units"])
        for r in viterbi_token_counts(df, vocab).collect()
    }
    assert got[1] == (2, 6)  # two 'ab' pieces, cost 3 each
    assert got[2] == (None, None)  # 'zq' fails -> doc total unknown


def test_viterbi_empty_vocab_raises(spark):
    import pytest

    from data_ingestion_framework_spark.operators.text import (
        viterbi_segment_words,
    )

    df = spark.createDataFrame([("ab",)], "text string")
    empty = spark.createDataFrame([], "piece string, cost_units long")
    with pytest.raises(ValueError, match="empty vocabulary"):
        viterbi_segment_words(df, empty)


def _py_viterbi_pieces(word, vc):
    big, k = 10**15, 1024
    n = len(word)
    best = [0] + [big] * n
    for i in range(1, n + 1):
        cands = [
            best[s - 1] + vc[word[s - 1 : i]] * k + 1
            for s in range(1, i + 1)
            if word[s - 1 : i] in vc and best[s - 1] < big
        ]
        best[i] = min(cands) if cands else big
    if best[n] >= big:
        return None
    p, segs = n, []
    while p > 0:
        for s in range(1, p + 1):  # smallest start = longest piece
            piece = word[s - 1 : p]
            if (
                piece in vc
                and best[s - 1] < big
                and best[s - 1] + vc[piece] * k + 1 == best[p]
            ):
                segs.append(piece)
                p = s - 1
                break
    return list(reversed(segs))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st, top_n=st.integers(2, 8))
def test_unigram_em_round_matches_python_reference(spark, texts, top_n):
    """One hard-EM round against a plain-Python witness: the E-step's
    argmin segmentation (longest-piece backtrace tiebreak), the
    M-step's occurrence-weighted piece counts, and the
    round(-ln(p)·1e6) integer costs all match exactly."""
    import math

    from data_ingestion_framework_spark.operators.text import (
        substring_vocab,
        unigram_em_costs,
        viterbi_segment_pieces,
    )

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    vocab_df = substring_vocab(df, max_piece_len=3, top_n=top_n)
    vc = {r["piece"]: r["cost_units"] for r in vocab_df.collect()}
    words: dict[str, int] = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    got = {
        r["w"]: r["pieces"]
        for r in viterbi_segment_pieces(df, vocab_df).collect()
    }
    for w in words:
        assert got[w] == _py_viterbi_pieces(w, vc), (w, vc)
    counts: dict[str, int] = {}
    for w, f in words.items():
        for p in _py_viterbi_pieces(w, vc):
            counts[p] = counts.get(p, 0) + f
    total = sum(counts.values())
    want = {
        p: (math.floor(-math.log(c / total) * 1e6 + 0.5), c)
        for p, c in counts.items()
    }
    em = {
        r["piece"]: (r["cost_units"], r["piece_count"])
        for r in unigram_em_costs(df, vocab_df).collect()
    }
    assert em == want


# -- iterated EM with pruning (round-12: the full Kudo trainer loop) ---------

_EM_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog and a rat",
    "rats chase cats and dogs chase rats",
    "on and on the song goes on",
    "log the data log the facts",
    "facts about cats facts about dogs",
    "sat in the sun sat in the shade",
    "the sun and the moon and the stars",
    "chase the moon chase the stars",
]


def test_unigram_em_train_total_cost_non_increasing(spark):
    """Hard-EM invariant (round-11 verdict #2's done-gate): without
    pruning, the corpus's total Viterbi cost is non-increasing across
    rounds — new segmentation beats old under the new costs (argmin),
    and the M-step maximizes the fixed segmentation's likelihood. The
    ±0.5-unit cost rounding allows at most 1 unit per tokenized piece
    of slack per side."""
    from data_ingestion_framework_spark.operators.text import (
        substring_vocab,
        unigram_em_costs,
        viterbi_token_counts,
        word_frequencies,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_EM_TEXTS)], "doc_id long, text string"
    )
    wf = word_frequencies(df).localCheckpoint()
    vocab = substring_vocab(df, max_piece_len=3, top_n=30, word_freqs=wf)
    totals, tokens = [], []
    for _ in range(3):
        vocab = unigram_em_costs(df, vocab, word_freqs=wf)
        rows = viterbi_token_counts(df, vocab, words=wf).collect()
        assert all(r["viterbi_cost_units"] is not None for r in rows)
        totals.append(sum(r["viterbi_cost_units"] for r in rows))
        tokens.append(sum(r["viterbi_tokens"] for r in rows))
    for r in range(len(totals) - 1):
        assert totals[r + 1] <= totals[r] + tokens[r] + tokens[r + 1], (
            r,
            totals,
            tokens,
        )


def test_prune_vocab_bottom_drops_lowest_count_multichar(spark):
    from data_ingestion_framework_spark.operators.text import (
        prune_vocab_bottom,
    )

    vocab = spark.createDataFrame(
        [
            ("ab", 100, 2),
            ("cd", 90, 1),
            ("ef", 80, 1),
            ("gh", 70, 9),
            ("i", 60, 1),
            ("j", 50, 1),
        ],
        "piece string, cost_units bigint, piece_count bigint",
    )
    # 4 multi-char pieces, num/den = 1/2 -> drop 2 lowest-count
    # (ties piece ASC): cd (1), ef (1); singles always survive
    kept = {
        r["piece"] for r in prune_vocab_bottom(vocab, 1, 2).collect()
    }
    assert kept == {"ab", "gh", "i", "j"}
    # prune_num=0 is the identity
    all_kept = {
        r["piece"] for r in prune_vocab_bottom(vocab, 0, 2).collect()
    }
    assert all_kept == {"ab", "cd", "ef", "gh", "i", "j"}
    try:
        prune_vocab_bottom(vocab, 2, 2)
        raise AssertionError("expected ValueError on prune_num >= prune_den")
    except ValueError:
        pass


def test_unigram_em_train_single_round_matches_em_costs(spark):
    from data_ingestion_framework_spark.operators.text import (
        substring_vocab,
        unigram_em_costs,
        unigram_em_train,
    )

    df = spark.createDataFrame(
        [(t,) for t in _EM_TEXTS], "text string"
    )
    vocab = substring_vocab(df, max_piece_len=3, top_n=20)
    one = {
        r["piece"]: (r["cost_units"], r["piece_count"])
        for r in unigram_em_costs(df, vocab).collect()
    }
    trained = {
        r["piece"]: (r["cost_units"], r["piece_count"])
        for r in unigram_em_train(df, vocab, rounds=1).collect()
    }
    assert trained == one


def test_em_cost_units_clear_of_rounding_boundaries(spark):
    """Round-11 verdict #8 (watch item pin): the M-step rounds the
    transcendental -ln(p)·1e6, so a 1-ULP ln divergence between
    engines could only flip a cost if the value sat within a ULP of a
    .5 boundary. Assert every cost in the GRADED pipeline's two
    M-steps (corpus_unigram_em2_pruned at sf0.01) clears the boundary
    by a wide margin — any future cross-engine flake is then
    diagnosable as something else in minutes."""
    import math

    from data_ingestion_framework_spark.operators.text import (
        prune_vocab_bottom,
        substring_vocab,
        unigram_em_costs,
        word_frequencies,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    wf = word_frequencies(docs).localCheckpoint()
    vocab0 = substring_vocab(docs, max_piece_len=4, top_n=50, word_freqs=wf)
    v1 = unigram_em_costs(docs, vocab0, word_freqs=wf)
    v2 = unigram_em_costs(
        docs, prune_vocab_bottom(v1, 1, 5), word_freqs=wf
    )
    for vocab in (v1, v2):
        rows = vocab.collect()
        total = sum(r["piece_count"] for r in rows)
        for r in rows:
            z = -math.log(r["piece_count"] / total) * 1e6
            dist = abs((z % 1.0) - 0.5)
            assert dist > 1e-6, (r["piece"], z)


def test_prune_vocab_cap_collect_is_limit_bounded(spark, monkeypatch):
    """ADVICE r12 invariant, r15 single-job form: the control-plane
    cap guard must run before an UNBOUNDED vocabulary can land on the
    driver. The probe and the collect are now one limit(cap + 1) job —
    so the pinned property is that every driver materialization in
    prune_vocab_bottom is bounded at cap + 1 rows (the guard then
    raises from the bounded result), never the whole oversized vocab.
    Driven by shrinking the cap under a 3-row vocab."""
    from data_ingestion_framework_spark.operators import text as text_mod

    vocab = spark.createDataFrame(
        [("ab", 100, 2), ("cd", 90, 1), ("e", 60, 1)],
        "piece string, cost_units bigint, piece_count bigint",
    )
    monkeypatch.setattr(text_mod, "SUBSTRING_VOCAB_MAX_KEPT", 2)
    sizes: list[int] = []
    orig_collect = type(vocab).collect

    def spy(self):
        rows = orig_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(type(vocab), "collect", spy)
    try:
        text_mod.prune_vocab_bottom(vocab, 1, 2)
        raise AssertionError("expected ValueError above the vocab cap")
    except ValueError as e:
        assert "control-plane cap" in str(e)
    assert sizes, "the guard never materialized the bounded probe"
    assert all(n <= text_mod.SUBSTRING_VOCAB_MAX_KEPT + 1 for n in sizes), (
        "a driver materialization exceeded the cap+1 bound: "
        f"{sizes} (the 3-row vocab must arrive limit-truncated)"
    )


def test_bpe_merge_chain_matches_per_step_chain(spark):
    """r16 opt: a round's single parsed-expression merge chain
    (_bpe_merge_chain) segments exactly like chaining _bpe_merge_step
    per merge — including the interacting case where an earlier merge
    in the round CREATES instances of a later pair (sequential
    application order is the pinned semantics), and symbols that would
    break naive SQL quoting."""
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.operators.text import (
        _bpe_merge_chain,
        _bpe_merge_step,
    )

    rows = [
        (["a", "b", "x", "a", "b"],),
        (["a", "b", "c", "a", "b", "a"],),
        (["'", "\\", "`", "'", "\\"],),   # quoting hazards as symbols
        (["ab", "x", "a", "b", "x"],),    # pre-existing merged symbol
        ([],),
        (["a"],),
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    pairs = [("a", "b"), ("ab", "x"), ("'", "\\")]
    syms_old = F.col("syms")
    for l, r in pairs:
        syms_old = _bpe_merge_step(syms_old, F.lit(l), F.lit(r))
    old = df.select(syms_old.alias("s")).collect()
    mp, syms_new = _bpe_merge_chain(pairs)
    new = df.withColumn("__mp", mp).select(syms_new.alias("s")).collect()
    assert old == new


def test_viterbi_max_piece_len_hint_value_identity(spark):
    """r16 opt: passing the vocab builder's own max_piece_len bound
    skips the per-stage max(length) probe job; any bound >= the true
    max yields identical segmentations (extra candidate lengths find
    no vocab match in the span join)."""
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.operators import text as TX

    df = spark.createDataFrame(
        [("abcab abc ab a xyz",), ("ababab cdcd",)], "text string"
    )
    vocab = TX.substring_vocab(df, max_piece_len=4, top_n=20)
    probe = TX.viterbi_token_counts(df.withColumn("doc_id", F.lit(1)), vocab)
    hint4 = TX.viterbi_token_counts(
        df.withColumn("doc_id", F.lit(1)), vocab, max_piece_len=4
    )
    hint9 = TX.viterbi_token_counts(
        df.withColumn("doc_id", F.lit(1)), vocab, max_piece_len=9
    )
    ref = sorted(tuple(r) for r in probe.collect())
    assert sorted(tuple(r) for r in hint4.collect()) == ref
    assert sorted(tuple(r) for r in hint9.collect()) == ref


def test_viterbi_best_col_expr_matches_lambda(spark):
    """r16 opt: the forward-DP fold and the backtrace fold are single
    parsed expressions; pin value identity against frozen copies of
    the lambda builders on a (w, __edges) frame."""
    from pyspark.sql import functions as F

    from data_ingestion_framework_spark.operators import text as TX
    from data_ingestion_framework_spark.operators.text import (
        _VITERBI_BIG as big,
        _VITERBI_K as k,
        _viterbi_best_col,
    )

    def old_best():
        def step(acc, i):
            cands = F.transform(
                F.filter(F.col("__edges"), lambda e: e.getField("e") == i),
                lambda e: F.when(
                    F.element_at(acc, e.getField("s")) < big,
                    F.element_at(acc, e.getField("s"))
                    + e.getField("c") * k
                    + 1,
                ).otherwise(F.lit(big).cast("bigint")),
            )
            return F.array_append(
                acc, F.coalesce(F.array_min(cands), F.lit(big).cast("bigint"))
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.length("w")),
            F.array(F.lit(0).cast("bigint")),
            step,
        )

    docs = spark.createDataFrame(
        [("abcab ab ba xq abcabc",), ("aaaa bb a",)], "text string"
    )
    vocab = TX.substring_vocab(docs, max_piece_len=3, top_n=10)
    base = TX._viterbi_base(docs, vocab, "text", "piece", "cost_units", 64)
    new = base.select("w", _viterbi_best_col().alias("b")).collect()
    old = base.select("w", old_best().alias("b")).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))
    # and the backtraced pieces re-segment every word consistently
    seg = TX.viterbi_segment_pieces(docs, vocab, max_word_len=64)
    for r in seg.collect():
        assert r["pieces"] is not None and "".join(r["pieces"]) == r["w"]
