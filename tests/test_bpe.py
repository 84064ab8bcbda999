"""BPE tokenizer-training primitives (operators/bpe.py).

The single round is oracle-gated by the driver (`bpe_merge_round` in the
registry); these tests pin the pieces the oracle cannot see — the greedy
non-overlapping merge fold, the deterministic tiebreak, and the ITERATED
trainer against a pure-Python textbook implementation of Sennrich 2016
(the same one-round-oracle / iterated-test split as kmeans_round).
"""

from __future__ import annotations

from collections import Counter

import pytest

from xena_gdc_etl_spark.operators import bpe


# --- pure-Python textbook reference ---------------------------------------

def ref_init(word_freqs: dict) -> dict:
    return {
        tuple(w) + (bpe.EOW,): f for w, f in word_freqs.items()
    }


def ref_pair_counts(segments: dict) -> Counter:
    counts: Counter = Counter()
    for syms, f in segments.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] += f
    return counts


def ref_top(counts: Counter):
    # count desc, then (lhs, rhs) asc — the engine's total order
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def ref_apply(segments: dict, pair) -> dict:
    left, right = pair
    out = {}
    for syms, f in segments.items():
        merged, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == left
                and syms[i + 1] == right
            ):
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = f
    return out


def ref_train(word_freqs: dict, n: int):
    seg = ref_init(word_freqs)
    merges = []
    for _ in range(n):
        counts = ref_pair_counts(seg)
        if not counts:
            break
        pair = ref_top(counts)
        merges.append(pair)
        seg = ref_apply(seg, pair)
    return merges, seg


def _wf_df(spark, word_freqs: dict):
    return spark.createDataFrame(
        list(word_freqs.items()), "word string, freq bigint"
    )


# --- unit pins -------------------------------------------------------------

def test_init_segments_chars_plus_eow(spark):
    seg = {
        r.word: (list(r.symbols), r.freq)
        for r in bpe.bpe_init_segments(
            _wf_df(spark, {"the": 5, "a": 2})
        ).collect()
    }
    assert seg == {
        "the": (["t", "h", "e", bpe.EOW], 5),
        "a": (["a", bpe.EOW], 2),
    }


def test_pair_counts_weighted_by_freq(spark):
    seg = bpe.bpe_init_segments(_wf_df(spark, {"ab": 3, "ba": 2}))
    got = {
        (r.lhs, r.rhs): r.pair_count
        for r in bpe.bpe_pair_counts(seg).collect()
    }
    assert got == {
        ("a", "b"): 3,
        ("b", bpe.EOW): 3,
        ("b", "a"): 2,
        ("a", bpe.EOW): 2,
    }


def test_apply_merge_greedy_non_overlapping(spark):
    # [a,a,a] -> [aa,a], [a,a,a,a] -> [aa,aa]: the textbook greedy rule
    df = spark.createDataFrame(
        [("x", ["a", "a", "a"], 1), ("y", ["a", "a", "a", "a"], 1)],
        "word string, symbols array<string>, freq bigint",
    )
    got = {
        r.word: list(r.symbols)
        for r in bpe.bpe_apply_merge(df, "a", "a").collect()
    }
    assert got == {"x": ["aa", "a"], "y": ["aa", "aa"]}


def test_apply_merge_merged_symbol_not_re_merged(spark):
    # after (t,h)->th, a 'th' symbol must not match a lone 't' or 'h'
    df = spark.createDataFrame(
        [("w", ["t", "h", "t", "h", "h"], 1)],
        "word string, symbols array<string>, freq bigint",
    )
    got = bpe.bpe_apply_merge(df, "t", "h").collect()[0]
    assert list(got.symbols) == ["th", "th", "h"]


def test_top_merges_deterministic_tiebreak(spark):
    # equal counts break on (lhs, rhs) ascending
    df = spark.createDataFrame(
        [("b", "a", 5), ("a", "b", 5), ("a", "a", 5), ("c", "c", 9)],
        "lhs string, rhs string, pair_count bigint",
    )
    got = [
        (r.lhs, r.rhs, r.pair_count, r.rnk)
        for r in bpe.bpe_top_merges(df, k=3).orderBy("rnk").collect()
    ]
    assert got == [
        ("c", "c", 9, 1),
        ("a", "a", 5, 2),
        ("a", "b", 5, 3),
    ]


def test_merge_round_replays_frozen_merges(spark):
    wf = {"the": 10, "then": 4, "hen": 3}
    ref_seg = ref_apply(ref_apply(ref_init(wf), ("t", "h")), ("th", "e"))
    ref_counts = ref_pair_counts(ref_seg)
    out = bpe.bpe_merge_round(
        _wf_df(spark, wf), merges=[("t", "h"), ("th", "e")], k=100
    ).collect()
    got = {(r.lhs, r.rhs): r.pair_count for r in out}
    assert got == dict(ref_counts)


# --- iterated-trainer composition pin --------------------------------------

@pytest.mark.parametrize("n_merges", [1, 3, 5])
def test_train_matches_textbook_reference(spark, n_merges):
    wf = {
        "low": 5,
        "lower": 2,
        "newest": 6,
        "widest": 3,
        "new": 2,
        "a": 1,
    }
    exp_merges, exp_seg = ref_train(wf, n_merges)
    merges, seg = bpe.bpe_train(_wf_df(spark, wf), n_merges)
    assert merges == exp_merges
    got_seg = {
        tuple(r.symbols): r.freq for r in seg.collect()
    }
    assert got_seg == exp_seg


def test_train_matches_reference_on_random_corpora(spark):
    """Property pin: on randomized small-alphabet corpora (adversarial
    for merge interactions — lots of repeated symbols and ties) the
    distributed trainer tracks the textbook reference exactly, merges
    AND final segmentation. Deterministic seed, several corpora."""
    import random

    rng = random.Random(0xB9E)
    for case in range(6):
        words = {
            "".join(
                rng.choice("ab" if case % 2 else "abc")
                for _ in range(rng.randint(1, 7))
            ): rng.randint(1, 9)
            for _ in range(rng.randint(3, 12))
        }
        n = rng.randint(1, 4)
        exp_merges, exp_seg = ref_train(words, n)
        merges, seg = bpe.bpe_train(_wf_df(spark, words), n)
        assert merges == exp_merges, (case, words, n)
        got = {tuple(r.symbols): r.freq for r in seg.collect()}
        assert got == exp_seg, (case, words, n)


def ref_train_batched(word_freqs: dict, n: int, per_round: int):
    """Pure-Python mirror of the disjoint-batch trainer: per round, take
    counted pairs in (count desc, pair asc) order, keep only pairs
    symbol-disjoint from those already accepted this round, apply the
    batch sequentially."""
    seg = ref_init(word_freqs)
    merges = []
    while len(merges) < n:
        counts = ref_pair_counts(seg)
        if not counts:
            break
        want = min(per_round, n - len(merges))
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        batch, used = [], set()
        for pair, _c in ordered:
            if want == 1 or not (set(pair) & used):
                batch.append(pair)
                used.update(pair)
                if len(batch) == want:
                    break
        for pair in batch:
            merges.append(pair)
            seg = ref_apply(seg, pair)
    return merges, seg


def test_train_batched_matches_batched_reference(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2}
    for per_round in (2, 3):
        exp_m, exp_s = ref_train_batched(wf, 6, per_round)
        got_m, got_s = bpe.bpe_train(
            _wf_df(spark, wf), 6, merges_per_round=per_round
        )
        assert got_m == exp_m, per_round
        assert {
            tuple(r.symbols): r.freq for r in got_s.collect()
        } == exp_s, per_round


def test_train_batched_accepts_only_symbol_disjoint_pairs(spark):
    # 'aba' makes the top pairs (a,b) and (b,a) share symbols: a batch
    # of 2 must accept (a,b) [count ties broken lexicographically] and
    # SKIP (b,a), falling through to a disjoint pair instead
    wf = {"abacd": 4}
    merges, _ = bpe.bpe_train(_wf_df(spark, wf), 2, merges_per_round=2)
    assert merges[0] == ("a", "b")
    l, r = merges[1]
    assert not ({l, r} & {"a", "b"}), merges
    # every adjacent batch window is pairwise symbol-disjoint
    sym0, sym1 = set(merges[0]), set(merges[1])
    assert not (sym0 & sym1)


def test_train_batched_merge_list_is_valid_encoder_input(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "wide": 2}
    merges, seg = bpe.bpe_train(_wf_df(spark, wf), 6, merges_per_round=3)
    ranks = {m: i for i, m in enumerate(merges)}
    # encoding every training word with the batched merge list must
    # reproduce the trainer's own final segmentation
    final = {"".join(s).replace(bpe.EOW, ""): list(s) for s in
             {tuple(r.symbols) for r in seg.collect()}}
    for w in wf:
        assert bpe.encode_word(w, ranks) == final[w], w


# --- encoding -----------------------------------------------------------

def test_encode_word_matches_sequential_merge_application():
    """Priority (rank-order) encoding must equal applying the training
    merges sequentially in order — the property that makes encode
    consistent with the trainer's segmentation."""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, _ = ref_train(wf, 6)
    ranks = {m: i for i, m in enumerate(merges)}
    for word in list(wf) + ["lowest", "newer", "wide", "zq"]:
        seq = {tuple(word) + (bpe.EOW,): 1}
        for m in merges:
            seq = ref_apply(seq, m)
        assert bpe.encode_word(word, ranks) == list(next(iter(seq)))


def test_bpe_encode_reproduces_training_segments(spark):
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, seg = ref_train(wf, 5)
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low unseen")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: list(r.subwords)
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    exp_seg = {w: bpe.encode_word(w, {m: i for i, m in enumerate(merges)})
               for w in ["low", "lower", "newest", "widest", "unseen"]}
    # training words must land on their final training segmentation
    train_final = {"".join(s).replace(bpe.EOW, ""): list(s) for s in seg}
    for w in wf:
        assert exp_seg[w] == train_final[w]
    assert out[1] == exp_seg["low"] + exp_seg["lower"] + exp_seg["newest"]
    assert out[2] == exp_seg["widest"] + exp_seg["low"] + exp_seg["unseen"]


def test_bpe_encode_keeps_wordless_docs(spark):
    docs = spark.createDataFrame(
        [(1, "low low"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: list(r.subwords)
        for r in bpe.bpe_encode(docs, [("l", "o")]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2] == [] and out[3] == []
    assert out[1] == ["lo", "w", bpe.EOW] * 2


def test_bpe_encode_plan_has_no_pertoken_python(spark):
    """The Python stage must sit on the DISTINCT-WORD frame: the plan's
    single Arrow stage hangs off a Deduplicate/aggregate of words, and
    the token stream reaches the output through join+flatten only."""
    docs = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    plan = (
        bpe.bpe_encode(docs, [("a", bpe.EOW)])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Deduplicate" in plan or "Aggregate" in plan


def test_train_stops_when_no_pairs(spark):
    # single-char words exhaust after merging with </w>
    merges, seg = bpe.bpe_train(_wf_df(spark, {"a": 3}), 5)
    # round 1 merges (a, </w>); afterwards every word is ONE symbol, no
    # pairs remain, and the trainer stops early instead of erroring
    assert merges == [("a", bpe.EOW)]
    assert [list(r.symbols) for r in seg.collect()] == [["a" + bpe.EOW]]
