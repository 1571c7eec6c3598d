"""Invariants for the training-run data-prep queries (plans/training.py):
two-phase rank parity vs the naive global window, mixture budget
conservation, a pure-Python bigram-NLL replay, and SemDeDup twin recovery."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F

from ccirecommenderdatapipeline_spark.plans.training import (
    q_bigram_perplexity,
    q_mixture_resample,
    q_semantic_dedup,
    q_training_order_shuffle,
    two_phase_rank,
)
from tests.conftest import SF_MED, SF_SMALL


@st.composite
def keyed_rows(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    return [(i, draw(st.sampled_from(["a", "b", "c"]))) for i in ids]


@settings(max_examples=10, deadline=None)
@given(rows=keyed_rows())
def test_two_phase_rank_matches_naive_window(spark, rows):
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING").withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    )
    got = {
        r["doc_id"]: r["rk"]
        for r in two_phase_rank(df, "k", part_cols=("source",)).collect()
    }
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    want = {
        r["doc_id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(rows=keyed_rows())
def test_two_phase_rank_bucket_expr_matches_naive_window(spark, rows):
    # custom monotone bucket over a NULLABLE numeric key: floor(val/8)
    # buckets must reproduce the naive-window ranks exactly, and NULL keys
    # (whose bucket expression is NULL) must be coalesced to the sentinel
    # bucket and ranked FIRST (Spark's ASC NULLS FIRST), not dropped.
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING").withColumn(
        "val",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("double")).otherwise(
            (F.col("doc_id") % 97).cast("double") - 48.5
        ),
    )
    got = {
        r["doc_id"]: r["rk"]
        for r in two_phase_rank(
            df, "val", part_cols=("source",),
            bucket=F.floor(F.col("val") / 8),
        ).collect()
    }
    w = Window.partitionBy("source").orderBy("val", "doc_id")
    want = {
        r["doc_id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


def test_training_order_is_a_permutation(spark):
    rows = q_training_order_shuffle(spark, SF_SMALL).collect()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    # position order == key order
    by_pos = sorted(rows, key=lambda r: r["pos"])
    keys = [(r["shuffle_key"], r["doc_id"]) for r in by_pos]
    assert keys == sorted(keys)


def test_mixture_resample_conserves_budget(spark):
    rows = q_mixture_resample(spark, SF_SMALL).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r["doc_id"], r["source"]), set()).add(r["epoch"])
    # epochs per doc are exactly 1..n_repeats
    for r in rows:
        eps = per_doc[(r["doc_id"], r["source"])]
        assert eps == set(range(1, r["n_repeats"] + 1))
    # per-source row total equals the temperature target
    from ccirecommenderdatapipeline_spark.plans.quality import (
        MIX_BUDGET,
        q_corpus_mix,
    )
    targets = {
        r["source"]: r["target_docs"] for r in q_corpus_mix(spark, SF_SMALL).collect()
    }
    got = Counter(r["source"] for r in rows)
    assert dict(got) == {s: t for s, t in targets.items() if t > 0}
    assert sum(got.values()) <= MIX_BUDGET


def test_bigram_nll_matches_pure_python_replay(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in q_bigram_perplexity(spark, SF_SMALL).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    toks = {
        d: [t for t in re.sub("[^a-z]+", " ", txt.lower()).split(" ") if t]
        for d, txt in docs.items()
    }
    bigrams = {d: list(zip(ts, ts[1:])) for d, ts in toks.items() if len(ts) >= 2}
    c2 = Counter(bg for bgs in bigrams.values() for bg in bgs)
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    vocab = len({t for ts in toks.values() for t in ts})
    assert set(got) == set(bigrams)
    # r11 nano-nat replay: integer unit sum, order-free
    from ccirecommenderdatapipeline_spark.operators.lnq import LN_UNIT_SCALE

    def lnu(x: float) -> int:
        v = math.log(x) * LN_UNIT_SCALE
        return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

    for d, bgs in bigrams.items():
        acc = sum(lnu((c2[bg] + 1.0) / (c1[bg[0]] + vocab)) for bg in bgs)
        want = round(-acc / len(bgs) / LN_UNIT_SCALE, 4)
        assert got[d] == (len(bgs), want)


def test_semantic_dedup_recovers_injected_twins(spark):
    pairs = {
        (r["vec_a"], r["vec_b"]) for r in q_semantic_dedup(spark, SF_MED).collect()
    }
    n_vecs = spark.read.parquet(f"{SF_MED}/embeddings.parquet").count()
    # every injected recrawl twin lands in its original's cluster at cos ~1
    missing = [
        v for v in range(n_vecs) if (v, v + 100000) not in pairs
    ]
    assert missing == []


def test_semantic_dedup_scaled_codebook_recall_vs_fixed_k(spark):
    """The corpus-scaled codebook (k = ceil(sqrt(N))) must keep the pair
    recall of the legacy fixed-16-centroid form: every near-duplicate pair
    the coarse blocking found should still co-locate under the finer one
    (recrawl twins sit at cosine ~1, far inside any cluster boundary)."""
    from ccirecommenderdatapipeline_spark.plans.training import (
        _semantic_dedup_plan,
    )

    scaled = {
        (r["vec_a"], r["vec_b"])
        for r in _semantic_dedup_plan(spark, SF_MED, k=None).collect()
    }
    fixed = {
        (r["vec_a"], r["vec_b"])
        for r in _semantic_dedup_plan(spark, SF_MED, k=16).collect()
    }
    assert fixed, "fixed-k baseline found no pairs — fixture broken"
    recall = len(scaled & fixed) / len(fixed)
    assert recall >= 0.95, f"scaled-k recall {recall:.3f} vs fixed-k"


def test_bpe_merge_pairs_shape(spark):
    from ccirecommenderdatapipeline_spark.plans.training import (
        BPE_TOP,
        q_bpe_merge_pairs,
    )
    rows = q_bpe_merge_pairs(spark, SF_SMALL).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, BPE_TOP + 1)
    )
    counts = [r["pair_count"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 and r["pair"].isalpha() for r in rows)
    assert all(r["n_words"] >= 1 for r in rows)


def test_key_skew_profile_consistency(spark):
    from ccirecommenderdatapipeline_spark.plans.warehouse import q_key_skew_profile
    from collections import Counter

    (row,) = q_key_skew_profile(spark, SF_SMALL).collect()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select("l_suppkey")
    c = Counter(r["l_suppkey"] for r in li.collect())
    assert row["n_rows"] == sum(c.values())
    assert row["n_keys"] == len(c)
    assert row["max_cnt"] == max(c.values())
    assert row["min_cnt"] == min(c.values())
    best = min(k for k, v in c.items() if v == row["max_cnt"])
    assert (row["top_key"], row["top_cnt"]) == (best, c[best])
    assert row["skew_ratio"] == row["max_cnt"] * row["n_keys"] / row["n_rows"]


@settings(max_examples=8, deadline=None)
@given(rows=keyed_rows())
def test_two_phase_running_sum_matches_naive_window(spark, rows):
    df = (
        spark.createDataFrame(rows, "doc_id LONG, source STRING")
        .withColumn("k", F.md5(F.col("doc_id").cast("string")))
        .withColumn("n", (F.col("doc_id") % 37).cast("long"))
    )
    got = {
        r["doc_id"]: (r["rk"], r["rs"])
        for r in two_phase_rank(
            df, "k", part_cols=("source",), sum_col="n", sum_out="rs"
        ).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["doc_id"]: (r["rk"], r["rs"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("rs", F.sum("n").over(w).cast("long"))
        .collect()
    }
    assert got == want


def test_training_pipeline_layout_invariants(spark):
    from ccirecommenderdatapipeline_spark.plans.training import (
        PIPE_CTX,
        q_training_pipeline,
    )

    rows = sorted(
        q_training_pipeline(spark, SF_MED).collect(), key=lambda r: r["pos"]
    )
    # dense positions, contiguous token layout, bins consistent
    assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
    cum = 0
    for r in rows:
        assert r["start_tok"] == cum
        cum += r["n_tokens"]
        assert r["first_bin"] == r["start_tok"] // PIPE_CTX
        assert r["last_bin"] == (r["start_tok"] + r["n_tokens"] - 1) // PIPE_CTX
    # dedup kept originals over recrawl twins: no doc appears in both forms
    ids = {r["doc_id"] for r in rows}
    assert not {i for i in ids if i >= 100000 and i - 100000 in ids}


def test_token_budget_selection_is_prefix_exact(spark):
    """Per source: ranks of the selected docs are a dense prefix 1..k (the
    greedy draw can't skip a doc), every cumulative sum stays within the
    budget and equals the replayed running sum of the selected sizes, and
    adding the FIRST unselected doc would overflow the budget (maximality)."""
    from ccirecommenderdatapipeline_spark.plans.training import (
        TOKEN_BUDGET,
        q_token_budget_selection,
    )

    rows = q_token_budget_selection(spark, SF_SMALL).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1)), src
        run = 0
        for r in rs:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
        assert run <= TOKEN_BUDGET


def test_boilerplate_scrub_roundtrip_and_bounds(spark):
    """Docs with nothing dropped must rebuild to their ORIGINAL text
    byte-for-byte (chunk split + ordered reassembly is lossless), kept +
    dropped must account for every chunk, and the scrub must actually fire
    on this corpus (some doc loses a chunk, none loses everything... unless
    it legitimately does — then clean_text is '' and n_kept 0)."""
    from ccirecommenderdatapipeline_spark.plans.quality import (
        q_boilerplate_ngram_scrub,
    )
    from ccirecommenderdatapipeline_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in q_boilerplate_ngram_scrub(spark, SF_SMALL).collect()}
    orig = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    }
    assert out.keys() == orig.keys()
    n_edited = 0
    for did, r in out.items():
        assert r["n_kept"] + r["n_dropped"] == r["n_chunks"]
        if r["n_dropped"] == 0:
            assert r["clean_text"] == orig[did]
        else:
            n_edited += 1
            assert len(r["clean_text"]) < len(orig[did])
    assert n_edited > 0  # the corpus-frequency gate fires at this SF


def test_weighted_sample_wr_invariants(spark):
    """A-ES weighted draw: exactly K docs per source, draws densely
    numbered 1..K in non-increasing key order, keys non-positive
    (u in (0, 1] so ln(u) <= 0), weights positive, and the plan prunes
    with WindowGroupLimit so the shuffle moves top-K rows only."""
    from ccirecommenderdatapipeline_spark.plans.sampling import (
        WSAMPLE_K,
        q_weighted_sample_wr,
    )

    df = q_weighted_sample_wr(spark, SF_SMALL)
    assert "WindowGroupLimit" in df._jdf.queryExecution().executedPlan().toString()
    rows = df.collect()
    by_src = {}
    for r in rows:
        assert r["weight"] > 0 and r["sel_key"] <= 0
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["draw"])
        assert [r["draw"] for r in rs] == list(range(1, WSAMPLE_K + 1)), src
        keys = [r["sel_key"] for r in rs]
        assert keys == sorted(keys, reverse=True), src
