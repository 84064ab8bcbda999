"""In-engine BPE tokenizer-training primitives.

Byte-pair-encoding subword training (Sennrich, Haddow & Birch, ACL 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public):
start from words segmented into characters plus an end-of-word marker,
repeatedly count adjacent symbol pairs weighted by word frequency and
merge the most frequent pair (greedy left-to-right, non-overlapping).

Spark decomposition — each round is cheap and shuffle-light because ALL
work happens on the **vocabulary frame** (distinct words + corpus
frequency), never the token stream:

* the word-frequency frame comes off the shared (doc, tok, tf) artifact
  (one partial-agg groupBy over vocab-sized rows — the corpus text is
  never re-read between rounds);
* :func:`bpe_pair_counts` is one explode + one partial-agg groupBy keyed
  on the pair — map-side combine collapses the pair stream to the
  distinct-adjacent-pair count (≲ a few × vocab), so the round's only
  shuffle moves kilobytes at any corpus scale;
* the argmax uses sort + ``limit(k)`` (Spark's distributed TakeOrdered),
  NOT a single-task window over the full counts frame; the tiebreak is
  total and deterministic (count desc, lhs asc, rhs asc);
* :func:`bpe_apply_merge` rewrites the frozen segments with ONE
  constant-size higher-order fold per round (no join, no shuffle), and
  the iterated trainer localCheckpoints per round so lineage stays flat
  — the same discipline as the alternating-star CC loop.

Single-round semantics under a FROZEN state are oracle-gated
(``bpe_merge_round`` in the workload registry); the iterated trainer is
pinned against a pure-Python textbook implementation in
tests/test_bpe.py, the same split as kmeans_round / quality_logreg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: End-of-word marker appended to every character segmentation, so merges
#: can distinguish word-final from word-internal contexts (Sennrich 2016
#: uses the same device). Multi-char, so it can never collide with a
#: single-character symbol.
EOW = "</w>"


def bpe_init_segments(
    word_freqs: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """(word, freq) → (word, symbols, freq): the round-0 frozen state —
    every word split into characters with the end-of-word marker
    appended. Runs on the vocabulary frame, one narrow projection."""
    chars = F.filter(
        F.split(F.col(word_col), ""), lambda c: c != F.lit("")
    )
    return word_freqs.select(
        F.col(word_col).alias("word"),
        F.concat(chars, F.array(F.lit(EOW))).alias("symbols"),
        F.col(freq_col).alias("freq"),
    )


def bpe_pair_counts(segments: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency —
    (lhs, rhs, pair_count). One explode + one partial-agg groupBy keyed
    on the pair; a word contributes ``size(symbols) - 1`` pairs.

    ``slice``/``transform`` index bookkeeping: ``slice`` is 1-based,
    the ``[..]`` array subscript and the transform lambda index are
    0-based, so ``slice(symbols, 1, size-1)`` paired with
    ``symbols[i + 1]`` walks exactly the adjacent pairs.
    """
    pairs = F.expr(
        "transform(slice(symbols, 1, size(symbols) - 1),"
        " (s, i) -> struct(s AS lhs, symbols[i + 1] AS rhs))"
    )
    return (
        segments.select(
            F.explode(pairs).alias("p"), F.col("freq")
        )
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_top_merges(pair_counts: DataFrame, k: int = 20) -> DataFrame:
    """Deterministic top-k merge candidates: (lhs, rhs, pair_count, rnk)
    ordered by count desc then (lhs, rhs) asc — a total order, so the
    k-boundary is unambiguous. sort+limit is Spark's distributed
    TakeOrdered; the row_number window runs on the ≤k surviving rows
    only (never a single-task window over the full counts frame)."""
    order = [F.col("pair_count").desc(), F.col("lhs"), F.col("rhs")]
    top = pair_counts.orderBy(*order).limit(k)
    return top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )


def _merge_fold(left: str, right: str) -> Column:
    """One greedy left-to-right, non-overlapping merge pass over the
    symbols array as a single higher-order fold: append each symbol,
    except when the accumulator ends with ``left`` and the incoming
    symbol is ``right`` — then replace the tail with the merged symbol.
    Greedy-non-overlap falls out of the fold order: a just-merged tail
    equals ``left+right``, which never string-equals ``left`` (symbols
    compare as whole strings), so [a,a,a] → [aa,a] exactly like the
    reference implementation."""
    merged = F.lit(left + right)
    return F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply_merge(
    segments: DataFrame, left: str, right: str
) -> DataFrame:
    """Apply one merge to the frozen segments — a narrow per-row fold,
    no shuffle. Returns the new (word, symbols, freq) state."""
    return segments.withColumn("symbols", _merge_fold(left, right))


def bpe_merge_round(
    word_freqs: DataFrame,
    merges: "list[tuple[str, str]] | tuple" = (),
    k: int = 20,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """ONE training round under a frozen merge list: segment, replay the
    frozen merges, count pairs, emit the deterministic top-k candidates.
    ``merges=()`` is round 1 — the character-vocab state."""
    seg = bpe_init_segments(word_freqs, word_col, freq_col)
    for left, right in merges:
        seg = bpe_apply_merge(seg, left, right)
    return bpe_top_merges(bpe_pair_counts(seg), k=k)


def encode_word(word: str, ranks: "dict[tuple[str, str], int]") -> "list[str]":
    """Textbook BPE encoding of ONE word: start from characters + EOW,
    repeatedly apply the highest-priority (lowest-rank) applicable merge,
    greedy left-to-right non-overlapping per pass — the same rule the
    trainer's fold implements, so words seen in training encode to their
    final training segments. Pure Python: this runs on the VOCABULARY
    frame only (see :func:`bpe_encode`), never per token."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, best_rank = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        left, right = best
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
        syms = merged
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: "list[tuple[str, str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """Tokenize documents under a TRAINED merge list → (id, subwords).

    Scale shape — the Python encode loop runs on the VOCABULARY frame
    (distinct words, Arrow-batched mapInPandas), never the token stream:
    a 100 TB corpus has a vocab orders of magnitude smaller than its
    token count, so the expensive per-word merge search is paid once per
    distinct word and the corpus-scale work is one join of the per-doc
    word list against the segmented vocab (AQE broadcasts the vocab side
    when it fits, which it essentially always does) plus a JVM-side
    flatten. Mirrors the train-side discipline: the token stream is
    only ever exploded/joined, never iterated in Python.

    ``lowercase`` must match how the training word frequencies were
    built (the workload's shared tf artifact lowercases).
    """
    from xena_gdc_etl_spark.operators.text import WS_RE

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = docs.select(
        F.col(id_col),
        F.array_remove(F.split(text, WS_RE), "").alias(
            "__words"
        ),
    )
    vocab = toks.select(
        F.explode("__words").alias("word")
    ).distinct()

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subwords": [
                        encode_word(w, ranks) for w in pdf["word"]
                    ],
                }
            )

    seg = vocab.mapInPandas(
        _encode, schema="word string, subwords array<string>"
    )
    exploded = toks.select(
        F.col(id_col), F.posexplode("__words").alias("__pos", "word")
    )
    encoded = (
        exploded.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "subwords"))
                    ),
                    lambda s: s["subwords"],
                )
            ).alias("subwords")
        )
    )
    # a document with no words vanishes in the explode; it must come
    # back as an EMPTY subword list, not disappear from the corpus
    return toks.select(id_col).join(encoded, id_col, "left").select(
        F.col(id_col),
        F.coalesce(
            "subwords", F.array().cast("array<string>")
        ).alias("subwords"),
    )


def bpe_train(
    word_freqs: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    merges_per_round: int = 1,
) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Iterated trainer: rounds of count → argmax → apply. Driver
    transfer is top-``merges_per_round`` rows per round (the same
    bounded-state discipline as the kmeans/logreg trainers); the
    segment state localCheckpoints per round so lineage depth stays
    constant. Returns (merge list in application order, final
    segments).

    ``merges_per_round=1`` (default) is the EXACT textbook trainer —
    each merge is the true argmax after all earlier merges. Larger
    values are the standard scale approximation for real vocabularies
    (tens of thousands of merges would otherwise mean that many
    strictly sequential Spark rounds): per round, take the top counted
    pairs in order but keep only those SYMBOL-DISJOINT from the pairs
    already accepted this round: a pair sharing a symbol with an
    accepted merge has its count invalidated by it, while a disjoint
    pair's occurrences are untouched (neither of its symbols
    participates in the other merge), so every count in the batch is
    still the true pre-round count when applied. Each batch applies
    sequentially in count order, so the merge LIST remains a valid
    rank-ordered encoder input. The approximation is solely that
    merges CREATED mid-round (e.g. a new (ab, c) pair after merging
    (a, b)) cannot outrank the rest of the batch until the next round
    — the standard distributed-BPE trade.
    """
    if merges_per_round < 1:
        raise ValueError(
            f"merges_per_round must be >= 1, got {merges_per_round}"
        )
    seg = bpe_init_segments(word_freqs, word_col, freq_col)
    merges: "list[tuple[str, str]]" = []
    while len(merges) < n_merges:
        want = min(merges_per_round, n_merges - len(merges))
        # over-fetch so disjointness filtering still fills the batch
        # when the top pairs share symbols
        # collect() row order after a windowed projection is not
        # contractually count-desc — sort by the explicit rank column
        # so batch selection always walks true argmax order
        top = sorted(
            bpe_top_merges(
                bpe_pair_counts(seg), k=max(want * 4, want)
            ).collect(),
            key=lambda r: r["rnk"],
        )
        if not top:
            break
        batch: "list[tuple[str, str]]" = []
        used: "set[str]" = set()
        for r in top:
            pair = (r["lhs"], r["rhs"])
            if want == 1 or not ({pair[0], pair[1]} & used):
                batch.append(pair)
                used.update(pair)
                if len(batch) == want:
                    break
        for left, right in batch:
            merges.append((left, right))
            seg = bpe_apply_merge(seg, left, right)
        seg = seg.localCheckpoint(eager=True)
    return merges, seg
