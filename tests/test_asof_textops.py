"""Unit tests for the as-of join and the newer text/contamination operators:
exact expectations on tiny frames, covering the tie/NULL/no-match edges the
oracle comparison can't isolate.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from xena_gdc_etl_spark.operators.asof import asof_join
from xena_gdc_etl_spark.operators.dedup import ngram_contamination
from xena_gdc_etl_spark.operators.text import repetition_scores, tfidf_keywords


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def rows(df, *cols):
    out = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in out.collect())


def _events(spark, data):
    return spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])


def test_asof_basic_backward_match(spark):
    left = _events(spark, [(10, 1, _ts("2024-01-01T10:00"), 5.0)])
    right = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T09:00"), 1.0),
            (2, 1, _ts("2024-01-01T09:30"), 2.0),
            (3, 1, _ts("2024-01-01T11:00"), 3.0),  # after left — ignored
        ],
    )
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
    )
    assert rows(out, "event_id", "asof_event_id", "asof_value") == [(10, 2, 2.0)]


def test_asof_equal_ts_matches_and_tiebreaks(spark):
    t = _ts("2024-01-01T09:00")
    left = _events(spark, [(10, 1, t, 5.0)])
    # two right rows at the SAME (key, ts): greatest right_order wins
    right = _events(spark, [(1, 1, t, 1.0), (2, 1, t, 2.0)])
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
    )
    assert rows(out, "asof_event_id", "asof_value") == [(2, 2.0)]


def test_asof_no_prior_row_yields_nulls(spark):
    left = _events(spark, [(10, 1, _ts("2024-01-01T08:00"), 5.0)])
    right = _events(spark, [(1, 1, _ts("2024-01-01T09:00"), 1.0)])
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["event_id"], right_order=["event_id"],
    )
    assert rows(out, "event_id", "asof_event_id", "asof_ts") == [(10, None, None)]


def test_asof_null_payload_does_not_mix_rows(spark):
    # The latest right row has a NULL value column; a naive per-column
    # last(ignorenulls) carry would leak 1.0 from the older row into it.
    left = _events(spark, [(10, 1, _ts("2024-01-01T10:00"), 5.0)])
    right = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T09:00"), 1.0),
            (2, 1, _ts("2024-01-01T09:30"), None),
        ],
    )
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["event_id", "value"], right_order=["event_id"],
    )
    assert rows(out, "asof_event_id", "asof_value") == [(2, None)]


def test_asof_keys_do_not_cross(spark):
    left = _events(spark, [(10, 1, _ts("2024-01-01T10:00"), 5.0)])
    right = _events(spark, [(1, 2, _ts("2024-01-01T09:00"), 1.0)])
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["event_id"], right_order=["event_id"],
    )
    assert rows(out, "event_id", "asof_event_id") == [(10, None)]


def test_repetition_scores_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),      # words: 2/4 dup; bigrams [a b, b a, a b] → 1/3 dup
            (2, "x y z"),        # no repetition
            (3, "w"),            # single word: no bigrams → NULL
            (4, ""),             # empty: NULLs
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.5
    assert got[1]["dup_bigram_frac"] == round(1 - 2 / 3, 6)
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["dup_bigram_frac"] is None
    assert got[4]["n_words"] == 0
    assert got[4]["dup_word_frac"] is None


def test_ngram_contamination_counts(spark):
    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z q"), (3, "a b")], ["doc_id", "text"]
    )
    test = spark.createDataFrame([(100, "a b c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_contamination(train, test, n=3).collect()}
    # doc 1: trigrams {a b c, b c d} → 1 hit of 2
    assert (out[1]["n_grams"], out[1]["n_hit"], out[1]["contam_frac"]) == (2, 1, 0.5)
    # doc 2: no overlap
    assert (out[2]["n_grams"], out[2]["n_hit"]) == (2, 0)
    # doc 3: too short for trigrams → absent
    assert 3 not in out


def test_tfidf_keywords_ranking(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple banana common"), (2, "banana common"), (3, "common")],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["tok"]))
    # doc 1: apple (tf=2) first; banana (df=2) over common (df=3)
    assert sorted(by_doc[1]) == [(1, "apple"), (2, "banana")]
    assert sorted(by_doc[2]) == [(1, "banana"), (2, "common")]
    # rarer token ⇒ higher idf score within equal tf
    scores = {r["tok"]: r["tfidf"] for r in out if r["doc_id"] == 2}
    assert scores["banana"] > scores["common"]


# ---- property test: asof_join ≡ pandas merge_asof on random inputs ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ev = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),    # user_id
        st.integers(min_value=0, max_value=20),   # ts offset (seconds)
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_raw=_ev, right_raw=_ev)
def test_asof_join_matches_pandas_merge_asof(spark, left_raw, right_raw):
    import pandas as pd

    base = pd.Timestamp("2024-01-01")

    def frame(raw, id_start):
        return pd.DataFrame(
            {
                "event_id": range(id_start, id_start + len(raw)),
                "user_id": [u for u, _ in raw],
                "ts": [base + pd.Timedelta(seconds=s) for _, s in raw],
            }
        ).astype(
            {"event_id": "int64", "user_id": "int64", "ts": "datetime64[ns]"}
        )

    left_pd = frame(left_raw, 1000)
    right_pd = frame(right_raw, 0)
    # merge_asof picks the positionally-last right row among equal
    # (user, ts); sorting by (ts, event_id) makes that the max event_id —
    # the same contract as right_order=["event_id"]
    schema = "event_id long, user_id long, ts timestamp"
    out = asof_join(
        spark.createDataFrame(left_pd, schema=schema)
        if len(left_pd)
        else spark.createDataFrame([], schema=schema),
        spark.createDataFrame(right_pd, schema=schema)
        if len(right_pd)
        else spark.createDataFrame([], schema=schema),
        on=["user_id"],
        ts_col="ts",
        right_cols=["event_id"],
        right_order=["event_id"],
    ).toPandas()

    if len(left_pd):
        expected = pd.merge_asof(
            left_pd.sort_values(["ts", "event_id"]),
            right_pd.sort_values(["ts", "event_id"]).rename(
                columns={"event_id": "asof_event_id", "ts": "asof_ts"}
            )[["user_id", "asof_ts", "asof_event_id"]],
            left_on="ts",
            right_on="asof_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
    else:
        expected = left_pd.assign(asof_event_id=None, asof_ts=None)

    key = ["event_id", "user_id"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = expected.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    for col in ("asof_event_id", "asof_ts"):
        g = got[col].tolist()
        e = exp[col].tolist()
        for gv, evv in zip(g, e):
            g_null = gv is None or (isinstance(gv, float) and pd.isna(gv)) or gv is pd.NaT
            e_null = evv is None or (isinstance(evv, float) and pd.isna(evv)) or evv is pd.NaT
            assert g_null == e_null, (col, gv, evv)
            if not g_null:
                assert gv == evv, (col, gv, evv)


# ---- point-in-interval join edges ----

def test_interval_join_half_open_and_degenerate(spark):
    from xena_gdc_etl_spark.operators.interval import point_interval_join

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00")), (2, _ts("2024-01-01T01:00")),
         (3, _ts("2024-01-01T02:00"))],
        ["pid", "pt"],
    )
    ivs = spark.createDataFrame(
        [
            # [00:00, 02:00): matches pids 1,2 — NOT 3 (half-open end)
            (10, _ts("2024-01-01T00:00"), _ts("2024-01-01T02:00")),
            # degenerate end == start: matches nothing
            (11, _ts("2024-01-01T01:00"), _ts("2024-01-01T01:00")),
        ],
        ["iid", "win_start", "win_end"],
    )
    out = point_interval_join(
        pts, ivs, point_ts="pt", start_col="win_start", end_col="win_end",
        bin_seconds=3600,
    )
    assert rows(out, "pid", "iid") == [(1, 10), (2, 10)]


def test_interval_join_spanning_many_bins_no_duplicates(spark):
    from xena_gdc_etl_spark.operators.interval import point_interval_join

    # interval spans 5 one-hour bins; each matching point must appear ONCE
    pts = spark.createDataFrame(
        [(i, _ts(f"2024-01-01T0{i}:30")) for i in range(6)], ["pid", "pt"]
    )
    ivs = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:30"), _ts("2024-01-01T04:30"))],
        ["iid", "win_start", "win_end"],
    )
    out = point_interval_join(
        pts, ivs, point_ts="pt", start_col="win_start", end_col="win_end",
        bin_seconds=3600,
    )
    # pids 0..3 in [00:30, 04:30); pid 4 at 04:30 excluded (half-open)
    assert rows(out, "pid", "iid") == [(0, 10), (1, 10), (2, 10), (3, 10)]


def test_word_chunks_drops_partial_tail(spark):
    from pyspark.sql import functions as F

    from xena_gdc_etl_spark.operators.text import _tokens, word_chunks

    df = spark.createDataFrame(
        [("a b c d e f g",), ("a b",), ("",)], ["text"]
    )
    rows = df.select(
        word_chunks(_tokens(F.col("text")), 3).alias("ch")
    ).collect()
    assert rows[0].ch == ["a b c", "d e f"]  # 'g' tail dropped
    assert rows[1].ch == []  # shorter than width -> no backward sequence
    assert rows[2].ch == []


def test_passage_dedup_stats_flags_shared_chunks(spark):
    from xena_gdc_etl_spark.operators.text import passage_dedup_stats

    shared = "one two three four five six seven eight nine ten"
    tail_a = "tail words beyond the first chunk boundary right here ok"
    tail_b = "different continuation text of exactly ten more words here x"
    docs = spark.createDataFrame(
        [
            (0, shared + " " + tail_a),  # 20 words -> 2 chunks
            (1, shared + " " + tail_b),  # 20 words -> 2 chunks
            (2, "totally unrelated words that never repeat anywhere at all no"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in passage_dedup_stats(docs, width=10).collect()}
    # docs 0 and 1 share their first 10-word chunk
    assert rows[0].n_shared == 1 and rows[1].n_shared == 1
    assert rows[2].n_shared == 0
    assert rows[0].shared_frac == 0.5  # 1 of its 2 chunks


def test_quality_filter_rules(spark):
    from xena_gdc_etl_spark.operators.text import quality_filter

    ok = " ".join(f"word{i}" for i in range(40))
    too_short = "tiny doc here"
    all_dupes = " ".join(["same"] * 50)
    docs = spark.createDataFrame(
        [(0, ok), (1, too_short), (2, all_dupes)], ["doc_id", "text"]
    )
    kept = {r.doc_id for r in quality_filter(docs).collect()}
    assert kept == {0}  # 1 fails min_words, 2 fails dup_word_frac


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_raw=_ev, right_raw=_ev)
def test_asof_join_forward_matches_pandas(spark, left_raw, right_raw):
    import pandas as pd

    base = pd.Timestamp("2024-01-01")

    def frame(raw, id_start):
        return pd.DataFrame(
            {
                "event_id": range(id_start, id_start + len(raw)),
                "user_id": [u for u, _ in raw],
                "ts": [base + pd.Timedelta(seconds=s) for _, s in raw],
            }
        ).astype(
            {"event_id": "int64", "user_id": "int64", "ts": "datetime64[ns]"}
        )

    left_pd = frame(left_raw, 1000)
    right_pd = frame(right_raw, 0)
    schema = "event_id long, user_id long, ts timestamp"
    out = asof_join(
        spark.createDataFrame(left_pd, schema=schema)
        if len(left_pd)
        else spark.createDataFrame([], schema=schema),
        spark.createDataFrame(right_pd, schema=schema)
        if len(right_pd)
        else spark.createDataFrame([], schema=schema),
        on=["user_id"],
        ts_col="ts",
        right_cols=["event_id"],
        right_order=["event_id"],
        direction="forward",
    ).toPandas()

    if len(left_pd):
        # forward merge_asof picks the positionally-FIRST equal-ts right
        # row; sorting right by (ts asc, event_id desc) makes that the max
        # event_id — the greatest-under-right_order contract
        expected = pd.merge_asof(
            left_pd.sort_values(["ts", "event_id"]),
            right_pd.sort_values(
                ["ts", "event_id"], ascending=[True, False]
            ).rename(
                columns={"event_id": "asof_event_id", "ts": "asof_ts"}
            )[["user_id", "asof_ts", "asof_event_id"]],
            left_on="ts",
            right_on="asof_ts",
            by="user_id",
            direction="forward",
            allow_exact_matches=True,
        )
    else:
        expected = left_pd.assign(asof_event_id=None, asof_ts=None)

    key = ["event_id", "user_id"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = expected.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    import math

    def null(v):
        return v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v))

    for col in ("asof_event_id", "asof_ts"):
        for gv, evv in zip(got[col].tolist(), exp[col].tolist()):
            assert null(gv) == null(evv), (col, gv, evv)
            if not null(gv):
                assert pd.Timestamp(gv) == pd.Timestamp(evv) if col == "asof_ts" else int(gv) == int(evv)


def test_asof_join_tolerance_nulls_far_matches(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:10:00"), (2, 1, "2024-01-01 09:00:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(100, 1, "2024-01-01 00:05:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))

    out = {r.event_id: r for r in asof_join(
        left, right, on=["user_id"], ts_col="ts", right_cols=["event_id"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).collect()}
    assert out[1].asof_event_id == 100       # 5 min back, inside tolerance
    assert out[2].asof_event_id is None      # ~9h back, nulled

    fwd = {r.event_id: r for r in asof_join(
        left, right, on=["user_id"], ts_col="ts", right_cols=["event_id"],
        direction="forward", tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).collect()}
    # no right row at-or-after either left ts -> both null
    assert fwd[1].asof_event_id is None and fwd[2].asof_event_id is None


def test_unigram_logprob_scores_exact(spark):
    from math import log

    from xena_gdc_etl_spark.operators.text import unigram_logprob_scores

    docs = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a c"),
        ],
        ["doc_id", "text"],
    )
    # corpus: a=3, b=1, c=1, N=5
    out = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    exp1 = (2 * (log(5) - log(3)) + (log(5) - log(1))) / 3
    exp2 = ((log(5) - log(3)) + (log(5) - log(1))) / 2
    assert abs(out[1]["lm_score"] - round(exp1, 6)) < 1e-9
    assert abs(out[2]["lm_score"] - round(exp2, 6)) < 1e-9
    # the doc made of rarer tokens scores HIGHER (less in-distribution)
    assert out[2]["lm_score"] > out[1]["lm_score"]


def test_commonness_buckets_deterministic_split(spark):
    from xena_gdc_etl_spark.operators.text import commonness_buckets

    # six docs, one language: commonness ranks 1..6 -> head/head/middle/
    # middle/tail/tail. "x"-docs share a common token; unique-token docs
    # sink to the tail.
    rows = [
        (1, "x x x x", "en"),
        (2, "x x x", "en"),
        (3, "x x", "en"),
        (4, "x q", "en"),
        (5, "q r", "en"),
        (6, "s t", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r["bucket"] for r in commonness_buckets(docs).collect()}
    assert out[1] == "head" and out[2] == "head"
    assert out[3] == "middle" and out[4] == "middle"
    assert out[5] == "tail" and out[6] == "tail"


def test_bigram_lm_known_values(spark):
    from xena_gdc_etl_spark.operators import text as tx
    import math

    # corpus: "a b a b c" and "a b". bigram counts: (a b)x3, (b a)x1, (b c)x1
    # head counts: c1(a)=3, c1(b)=2
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in tx.bigram_logprob_scores(docs).collect()}
    assert out[0].n_bigrams == 4 and out[1].n_bigrams == 1
    # doc1: single bigram (a b): -ln(c2/c1) = ln(3) - ln(3)... c1(a)=3, c2=3
    assert out[1].bigram_lm == 0.0
    # doc0: 2*(ln3-ln3) + (ln2-ln1) + (ln2-ln1) over 4
    exp = round((2 * math.log(2)) / 4, 6)
    assert abs(out[0].bigram_lm - exp) < 1e-9

    # docs with <2 tokens have no bigrams and drop out
    short = spark.createDataFrame([(5, "solo")], ["doc_id", "text"])
    assert tx.bigram_logprob_scores(short).count() == 0


def test_token_entropy_known_values(spark):
    """H=0 for a single repeated token; H=1 bit for a 50/50 pair; uniform
    4 tokens → 2 bits. Computed off the (doc_id, tok, tf) artifact."""
    from xena_gdc_etl_spark.operators.text import doc_term_freqs, token_entropy

    docs = spark.createDataFrame(
        [
            (0, "a a a a"),
            (1, "a a b b"),
            (2, "a b c d"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy)
        for r in token_entropy(doc_term_freqs(docs)).collect()
    }
    assert out[0] == (4, 1, 0.0)
    assert out[1] == (4, 2, 1.0)
    assert out[2] == (4, 4, 2.0)


def test_mixture_temperature_limits(spark):
    """T=1 reproduces natural shares (resample_factor 1 everywhere);
    higher T compresses the spread toward uniform (low-resource factor
    rises above 1, high-resource falls below)."""
    from xena_gdc_etl_spark.operators.sampling import mixture_temperature

    docs = spark.createDataFrame(
        [("big", 900), ("small", 100)],
        ["source", "n_tokens"],
    )
    t1 = {
        r.source: r
        for r in mixture_temperature(docs, temperature=1.0).collect()
    }
    assert t1["big"].resample_factor == 1.0
    assert t1["small"].resample_factor == 1.0
    t4 = {
        r.source: r
        for r in mixture_temperature(docs, temperature=4.0).collect()
    }
    assert t4["small"].resample_factor > 1.0 > t4["big"].resample_factor
    # weights still sum to 1
    assert abs(t4["small"].temp_weight + t4["big"].temp_weight - 1.0) < 1e-6


def test_cdc_chunks_shift_robust(spark):
    """The whole point of content-defined chunking: a prefix insertion
    changes only the chunk it lands in — every later chunk re-emerges
    byte-identical (fixed-size chunking would shift them all). Also:
    chunk concatenation reconstructs the token stream exactly; empty
    docs produce no rows."""
    from xena_gdc_etl_spark.operators.text import content_defined_chunks

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(0, base), (1, ""), (2, "solo")], ["doc_id", "text"]
    )
    out = sorted(
        content_defined_chunks(docs, divisor=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc  # empty doc → no chunks
    assert [r.chunk for r in by_doc[2]] == ["solo"]
    # reconstruction
    assert " ".join(r.chunk for r in by_doc[0]) == base
    assert [r.chunk_id for r in by_doc[0]] == list(range(len(by_doc[0])))
    assert all(r.n_tokens == len(r.chunk.split()) for r in out if r.chunk)

    shifted = spark.createDataFrame(
        [(0, "xprefix " + base)], ["doc_id", "text"]
    )
    c1 = [r.chunk for r in content_defined_chunks(docs.filter("doc_id=0"), divisor=3).collect()]
    c2 = [r.chunk for r in content_defined_chunks(shifted, divisor=3).collect()]
    # all but the first chunk survive the insertion verbatim, in order
    assert c1[1:] == c2[1:]
    assert c1[0] != c2[0]


def test_bm25_scores_hand_computed(spark):
    """Two docs, one query term: tf/df/length arithmetic checked against a
    hand-computed BM25 value (k1=1.2, b=0.75)."""
    import math

    from xena_gdc_etl_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [(0, "cat dog cat"), (1, "dog mouse"), (2, "bird")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["cat"]).collect()}
    # only doc 0 contains 'cat'
    assert set(out) == {0}
    n, df, tf, dl, avgdl = 3, 1, 2, 3, (3 + 2 + 1) / 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(out[0] - round(want, 6)) < 1e-9


def test_bm25_scores_rejects_empty_terms(spark):
    import pytest

    from xena_gdc_etl_spark.operators.text import bm25_scores

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_scores(docs, [])


_bm25_docs = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_bm25_docs, terms=st.sets(st.sampled_from(["a", "b", "c", "ab", "ca"]), min_size=1, max_size=3))
def test_bm25_matches_pure_python_reference(spark, texts, terms):
    """Property parity: the distributed BM25 equals a from-scratch python
    implementation (same tokenization, same k1/b, round-6) on arbitrary
    tiny corpora — including empty docs, docs with no query terms, and
    single-token corpora."""
    import math
    import re

    from xena_gdc_etl_spark.operators.text import bm25_scores

    k1, b = 1.2, 0.75
    toks = {
        i: [t for t in re.split(r"[ \t\n\r\f]+", txt.lower()) if t]
        for i, txt in enumerate(texts)
    }
    tfs = {
        i: {t: ts.count(t) for t in set(ts)} for i, ts in toks.items() if ts
    }
    if not tfs:
        # all-empty corpus: the operator yields no rows
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        assert bm25_scores(docs, sorted(terms)).count() == 0
        return
    n = len(tfs)
    avgdl = sum(len(toks[i]) for i in tfs) / n
    df = {
        q: sum(1 for i in tfs if q in tfs[i]) for q in terms
    }
    want = {}
    for i, tf in tfs.items():
        s = 0.0
        hit = False
        for q in terms:
            if q in tf and df[q]:
                hit = True
                idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
                dl = len(toks[i])
                s += idf * tf[q] * (k1 + 1) / (
                    tf[q] + k1 * (1 - b + b * dl / avgdl)
                )
        if hit:
            want[i] = round(s, 6)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.bm25 for r in bm25_scores(docs, sorted(terms)).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])
