"""Unit tests for training-data operators: text analysis, dedup,
similarity search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simkit_spark.functions.dedup import (
    exact_dedup,
    minhash_band_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from simkit_spark.functions.similarity import cosine_topk, lsh_topk
from simkit_spark.functions.text import add_token_count, lang_id, quality_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  Quick   Brown Fox jumps over the lazy dog"),  # normalized dup
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup
        (5, "der hund und die katze ist das haus und der baum"),
        (6, "completely different content about spark engines"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_count(spark, docs):
    got = {r["doc_id"]: r["n_tokens"] for r in add_token_count(docs).collect()}
    assert got[1] == 9
    assert got[7] == 0


def test_quality_features(spark, docs):
    q = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert q[1]["stopword_ratio"] == pytest.approx(round(2 / 9, 6), abs=1e-6)
    assert 0 <= q[1]["alpha_ratio"] <= 1


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[5] == "de"


def test_exact_dedup(spark, docs):
    d = exact_dedup(docs).collect()
    by_keep = {r["keep_doc_id"]: r["n_dups"] for r in d}
    # docs 1,2,3 collapse onto keeper 1
    assert by_keep[1] == 3
    assert by_keep[4] == 1


def test_minhash_near_dup_found(spark, docs):
    sigs = minhash_signatures(docs)
    assert sigs.groupBy("doc_id").count().where(F.col("count") != 16).count() == 0
    pairs = minhash_band_pairs(sigs)
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got  # exact dups always collide
    jac = ngram_jaccard_pairs(docs, pairs)
    jmap = {(r["src"], r["dst"]): r["jaccard"] for r in jac.collect()}
    assert jmap[(1, 2)] == pytest.approx(1.0)
    if (1, 4) in jmap:
        assert 0.2 < jmap[(1, 4)] < 1.0


def test_simhash_similarity(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[1] == sh[2] == sh[3]  # same token multiset after normalize

    def hamm(a, b):
        return bin(a ^ b).count("1")

    assert hamm(sh[1], sh[4]) <= hamm(sh[1], sh[6])


@pytest.fixture(scope="module")
def vecs(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.randn(20, 16)
    rows = [(i, (base[i % 20] + (0.01 * rng.randn(16) if i >= 20 else 0)).tolist()) for i in range(40)]
    return spark.createDataFrame(rows, "id long, vec array<double>").cache()


def test_cosine_topk_exact(spark, vecs):
    top1 = cosine_topk(vecs, k=1, n_blocks=3)
    got = {r["src"]: r["dst"] for r in top1.collect()}
    # each perturbed copy's nearest neighbor is its original (and vice versa)
    for i in range(20):
        assert got[i + 20] == i
        assert got[i] == i + 20


def test_lsh_topk_recall(spark, vecs):
    exact = {(r["src"], r["dst"]) for r in cosine_topk(vecs, k=1, n_blocks=3).collect()}
    approx = {(r["src"], r["dst"]) for r in lsh_topk(vecs, k=1, dim=16, n_planes=8, n_bands=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_neardup_resolve_clusters(spark):
    """Near-dup resolution: shingle-similar docs collapse to one keeper
    per cluster; unique docs keep themselves."""
    from simkit_spark.functions.dedup import neardup_resolve

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        ("a1", base),
        ("a2", base + " extra"),                      # near-dup of a1
        ("b1", "completely different text about spark engines and parquet files"),
        ("c1", "another unrelated document mentioning graphs laplacians and clusters"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: (r["keep_doc_id"], r["cluster_size"]) for r in
           neardup_resolve(docs, tau=0.5).collect()}
    assert out["a1"] == ("a1", 2) and out["a2"] == ("a1", 2)
    assert out["b1"] == ("b1", 1)
    assert out["c1"] == ("c1", 1)


# ---------------------------------------------------------------- curation
def test_stratified_sample_exact_quota_and_partition_invariance(spark):
    """Exactly min(k, stratum size) per stratum; the sampled SET is
    identical whatever the input partitioning (the hash order is a
    property of the data, not the plan)."""
    from simkit_spark.functions.curation import stratified_sample

    rows = [(f"d{i}", "en" if i % 3 else "fr") for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string")
    out = stratified_sample(docs, k=10, strata_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add((r["doc_id"], r["rank"]))
    assert len(by_lang["en"]) == 10 and len(by_lang["fr"]) == 10
    assert {r["rank"] for r in out if r["lang"] == "en"} == set(range(1, 11))
    # tiny stratum: all of it survives
    rows2 = rows + [("z1", "zz"), ("z2", "zz")]
    docs2 = spark.createDataFrame(rows2, "doc_id string, lang string")
    out2 = stratified_sample(docs2, k=10, strata_col="lang")
    assert out2.where("lang = 'zz'").count() == 2
    # repartition must not change the chosen set
    shuffled = stratified_sample(docs.repartition(7, "doc_id"), k=10,
                                 strata_col="lang").collect()
    assert {(r["doc_id"], r["rank"]) for r in shuffled} == {
        (r["doc_id"], r["rank"]) for r in out}


def test_doc_chunks_reconstruct_and_overlap(spark):
    """Windows advance by chunk-overlap tokens; stripping each window's
    first `overlap` tokens (after window 0) reconstructs the doc."""
    from simkit_spark.functions.curation import doc_chunks

    text = " ".join(f"t{i}" for i in range(150))
    docs = spark.createDataFrame(
        [("a", text), ("b", "short doc"), ("c", "   ")],
        "doc_id string, text string")
    out = doc_chunks(docs, chunk=64, overlap=16).collect()
    assert not [r for r in out if r["doc_id"] == "c"]  # empty -> no rows
    b = [r for r in out if r["doc_id"] == "b"]
    assert len(b) == 1 and b[0]["chunk_text"] == "short doc"
    a = sorted([r for r in out if r["doc_id"] == "a"], key=lambda r: r["chunk_id"])
    # n=150, chunk 64, stride 48 -> starts 0, 48, 96 -> 3 windows
    assert [r["start_token"] for r in a] == [0, 48, 96]
    assert [r["n_chunk_tokens"] for r in a] == [64, 64, 54]
    rebuilt = a[0]["chunk_text"].split()
    for r in a[1:]:
        rebuilt += r["chunk_text"].split()[16:]
    assert rebuilt == text.split()


def test_contamination_detects_planted_leak(spark):
    """A training doc sharing a 5-gram with an eval doc is flagged;
    clean docs are not. Eval membership is the deterministic md5 split,
    so plant the leak by probing which side each doc landed on."""
    from simkit_spark.functions.curation import contamination

    leak = "alpha beta gamma delta epsilon"
    rows = [(f"d{i}", f"unique{i} filler{i} words{i} here{i} now{i} end{i}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    split = contamination(docs, ngram=5, eval_mod=4)
    train_ids = {r["doc_id"] for r in split.select("doc_id").collect()}
    eval_id = next(i for i, _ in rows if i not in train_ids)
    train_id = next(i for i, _ in rows if i in train_ids)
    rows2 = [(i, leak + " tail" if i in (eval_id, train_id) else t) for i, t in rows]
    out = {r["doc_id"]: (r["n_shared"], r["contaminated"]) for r in
           contamination(spark.createDataFrame(rows2, "doc_id string, text string"),
                         ngram=5, eval_mod=4).collect()}
    assert out[train_id][1] is True and out[train_id][0] >= 1
    clean = [v for k, v in out.items() if k != train_id]
    assert all(v == (0, False) for v in clean)


def test_repetition_features(spark):
    from simkit_spark.functions.text import repetition_features

    docs = spark.createDataFrame(
        [("a", "spark spark spark spark is fast"),
         ("b", "all words here are different ones"),
         ("c", "   "), ("d", "one")],
        "doc_id string, text string")
    out = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert out["a"]["distinct_ratio"] == 0.5         # 3 distinct / 6
    assert out["a"]["top_bigram_n"] == 3             # "spark spark" x3
    assert out["a"]["top_bigram_ratio"] == 0.6       # 3 of 5 bigrams
    assert out["b"]["distinct_ratio"] == 1.0 and out["b"]["top_bigram_n"] == 1
    assert out["c"]["n_tokens"] == 0 and out["c"]["top_bigram_ratio"] == 0.0
    assert out["d"]["n_tokens"] == 1 and out["d"]["top_bigram_n"] == 0


def test_pii_scrub(spark):
    """Planted PII is redacted in order (email -> ip -> phone) with
    per-kind counts; clean text passes through untouched."""
    from simkit_spark.functions.text import pii_scrub

    docs = spark.createDataFrame(
        [("a", "mail a@b.co and b@c.org, host 10.0.0.1, call +1 (555) 123-4567"),
         ("b", "nothing sensitive 42 here")],
        "doc_id string, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out["a"]["n_email"] == 2 and out["a"]["n_ip"] == 1 and out["a"]["n_phone"] == 1
    assert out["a"]["clean_text"] == "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE>"
    assert out["b"]["clean_text"] == "nothing sensitive 42 here"
    assert (out["b"]["n_email"], out["b"]["n_ip"], out["b"]["n_phone"]) == (0, 0, 0)


def test_pack_sequences_invariants(spark):
    """Budget-aligned packing: offsets below budget, whole docs (doc
    never split), bins total < 2*budget, deterministic under
    repartitioning, every doc packed exactly once."""
    from simkit_spark.functions.curation import pack_sequences

    rows = [(f"d{i}", " ".join(["w"] * (5 + (i * 37) % 90))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = pack_sequences(docs, budget=100, shards=3, seed=42).collect()
    assert len(out) == 60 and len({r["doc_id"] for r in out}) == 60
    assert all(0 <= r["offset_tokens"] < 100 for r in out)
    # bin totals: capped tokens per (shard, bin) < 2*budget
    totals = {}
    for r in out:
        totals[(r["shard"], r["bin_id"])] = totals.get((r["shard"], r["bin_id"]), 0) + min(
            r["n_tokens"], 100)
    assert all(t < 200 for t in totals.values()), totals
    # most bins are well filled (the aligned split wastes < 1 doc per bin)
    assert sum(t >= 100 for t in totals.values()) >= len(totals) // 2
    out2 = pack_sequences(docs.repartition(7), budget=100, shards=3, seed=42).collect()
    assert {tuple(r) for r in out2} == {tuple(r) for r in out}


def test_global_shuffle_invariants(spark):
    """Deterministic shuffle: every doc exactly once, dense 1..size pos
    per shard, shards roughly balanced, invariant under repartitioning,
    and actually shuffled (not id order)."""
    from simkit_spark.functions.curation import global_shuffle

    rows = [(f"d{i:03d}",) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id string")
    out = global_shuffle(docs, n_shards=4, seed=42).collect()
    assert len(out) == 120 and len({r["doc_id"] for r in out}) == 120
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] >= 120 // 4 - 20 and sizes[-1] <= 120 // 4 + 20
    # not the identity order: within a shard, doc_ids are not sorted
    ordered = sorted(out, key=lambda r: (r["shard"], r["pos"]))
    ids_in_pos_order = [r["doc_id"] for r in ordered]
    assert ids_in_pos_order != sorted(ids_in_pos_order)
    out2 = global_shuffle(docs.repartition(7), n_shards=4, seed=42).collect()
    assert {tuple(r) for r in out2} == {tuple(r) for r in out}
    # a different seed produces a different order
    out3 = global_shuffle(docs, n_shards=4, seed=7).collect()
    assert {tuple(r) for r in out3} != {tuple(r) for r in out}


def test_tfidf_topk_ranks_discriminative_terms(spark):
    """A term shared by every doc scores below a doc-unique term with
    equal tf; ranks dense 1..k; ties break on term asc."""
    from simkit_spark.functions.text import tfidf_topk

    rows = [
        ("a", "common zebra zebra common common"),
        ("b", "common yak yak common common"),
        ("c", "common common common common apple"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = tfidf_topk(docs, k=2).collect()
    top = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    # tf(common)=3 everywhere but df=3 -> idf=1·ln(4/4)+1=1 -> score 3;
    # zebra/yak: tf=2, df=1 -> score 2*(ln(2)+1) ≈ 3.386 -> wins
    assert top["a"] == "zebra" and top["b"] == "yak"
    # in c, apple tf=1 scores 1.693 < common 4.0 -> common wins
    assert top["c"] == "common"
    for doc in ("a", "b", "c"):
        ranks = sorted(r["rank"] for r in out if r["doc_id"] == doc)
        assert ranks == [1, 2]


def test_tfidf_topk_empty_and_partition_invariant(spark):
    from simkit_spark.functions.text import tfidf_topk

    rows = [("a", "x y z"), ("b", "   "), ("c", "x x q")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = tfidf_topk(docs, k=3).collect()
    assert not [r for r in out if r["doc_id"] == "b"]  # no tokens, no rows
    out2 = tfidf_topk(docs.repartition(5), k=3).collect()
    assert {tuple(r) for r in out2} == {tuple(r) for r in out}


def test_bm25_topk_matches_bruteforce(spark):
    """Exact score/rank parity with a pure-python BM25 over a corpus
    with repeated terms and varied doc lengths."""
    import math

    from simkit_spark.functions.text import bm25_topk

    rows = [
        ("a", "scan scan table join join join"),
        ("b", "scan table"),
        ("c", "join scan scan scan scan scan scan scan"),
        ("d", "table table hash"),
        ("e", "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    toks = {d: t.split() for d, t in rows if t.split()}
    tf = {(d, w): ts.count(w) for d, ts in toks.items() for w in set(ts)}
    dl = {d: len(ts) for d, ts in toks.items()}
    n, s = len(toks), sum(dl.values())
    df_t: dict[str, int] = {}
    for _, w in tf:
        df_t[w] = df_t.get(w, 0) + 1
    qs = sorted(df_t, key=lambda w: (-df_t[w], w))[:2]  # scan, table (df 3, 3)
    want = {}
    for w in qs:
        scored = sorted(
            (
                (
                    -math.log(1.0 + (n - df_t[w] + 0.5) / (df_t[w] + 0.5))
                    * (tf[(d, w)] * 2.2)
                    / (tf[(d, w)] + 1.2 * (0.25 + 0.75 * (dl[d] * n) / s)),
                    d,
                )
                for d in toks
                if (d, w) in tf
            )
        )
        for r, (neg, d) in enumerate(scored, 1):
            want[(w, d)] = (tf[(d, w)], round(-neg, 6), r)
    out = bm25_topk(docs, n_queries=2, k=10).collect()
    got = {(r["term"], r["doc_id"]): (r["tf"], r["score"], r["rank"]) for r in out}
    assert got == want
    out2 = bm25_topk(docs.repartition(5), n_queries=2, k=10).collect()
    assert {tuple(r) for r in out2} == {tuple(r) for r in out}


def test_bm25_length_normalization_and_k_cut(spark):
    """Same tf, shorter doc -> higher BM25; rank <= k enforced."""
    from simkit_spark.functions.text import bm25_topk

    rows = [("short", "q w"), ("long", "q w " + "pad " * 30)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = bm25_topk(docs, n_queries=1, k=1).collect()
    assert len(out) == 1 and out[0]["rank"] == 1
    # q/w/pad df ties break asc -> query term is 'pad'? no: df(pad)=1,
    # df(q)=df(w)=2 -> highest-df tie (q, w) -> 'q' wins asc
    assert out[0]["term"] == "q"
    assert out[0]["doc_id"] == "short"


def test_embedding_stats_matches_numpy(spark):
    import numpy as np

    from simkit_spark.functions.similarity import embedding_stats

    rng = np.random.RandomState(7)
    vecs = rng.rand(40, 5)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    out = {r["dim"]: r for r in embedding_stats(df).collect()}
    assert set(out) == set(range(5))
    for d in range(5):
        col = vecs[:, d]
        assert out[d]["mean"] == round(float(col.mean()), 6)
        assert out[d]["std"] == round(float(col.std()), 6)
        assert out[d]["lo"] == round(float(col.min()), 6)
        assert out[d]["hi"] == round(float(col.max()), 6)


def test_token_quantiles_matches_numpy(spark):
    import numpy as np

    from simkit_spark.functions.text import token_quantiles

    rows = [(f"d{i}", "en" if i % 2 else "fr", " ".join(["w"] * (1 + i % 13)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = {(r["lang"], r["q"]): r["value"] for r in
           token_quantiles(docs, qs=(0.5, 0.9)).collect()}
    for lang in ("en", "fr"):
        counts = [1 + i % 13 for i in range(40) if ("en" if i % 2 else "fr") == lang]
        for q in (0.5, 0.9):
            want = round(float(np.percentile(counts, q * 100, method="linear")), 6)
            assert out[(lang, q)] == want, (lang, q)


def test_lm_score_hand_computed(spark):
    """Add-0.5 bigram LM on a 4-doc corpus, checked against the closed
    form: C(a,b)=2, C(b,a)=1, C(a,.)=2, C(b,.)=1, V=3."""
    import math

    from simkit_spark.functions.text import lm_score

    docs = spark.createDataFrame(
        [("d1", "A b  a"), ("d2", "a B"), ("d3", "x"), ("d4", "")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_logprob"]) for r in lm_score(docs).collect()}
    p_ba = math.log((2 + 0.5) / (2 + 0.5 * 3))   # P(b|a)
    p_ab = math.log((1 + 0.5) / (1 + 0.5 * 3))   # P(a|b)
    assert out["d1"] == (2, round((p_ba + p_ab) / 2, 6))
    assert out["d2"] == (1, round(p_ba, 6))
    assert out["d3"] == (0, None)
    assert out["d4"] == (0, None)


def test_lm_score_partition_invariant_and_orders_fluency(spark):
    """Repeated common phrasing scores higher than a shuffled one-off;
    result is partitioning-independent."""
    from simkit_spark.functions.text import lm_score

    rows = [(f"c{i}", "the cat sat on the mat") for i in range(10)]
    rows += [("odd", "mat the on sat cat the")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r["lm_logprob"] for r in lm_score(docs).collect()}
    assert out["c0"] > out["odd"]
    b = {r["doc_id"]: r["lm_logprob"] for r in lm_score(docs.repartition(7)).collect()}
    assert out == b


def test_importance_sample_matches_exact_rule(spark):
    """Keep iff md5-fraction < rate*w*n/sum_w — replicated in python."""
    import hashlib

    from simkit_spark.functions.curation import importance_sample

    rows = [(f"d{i}", (i * 7) % 50 + 1) for i in range(200)] + [("z", 0), ("nn", None)]
    docs = spark.createDataFrame(rows, "doc_id string, n_chars long")
    rate, seed = 0.3, 42
    pos = [(d, w) for d, w in rows if w]
    sum_w, n = sum(w for _, w in pos), len(pos)
    want = {}
    for d, w in pos:
        u = int(hashlib.md5(f"{d}:{seed}".encode()).hexdigest()[:8], 16) / 2**32
        p = rate * w * n / sum_w
        if u < p:
            want[d] = (w, round(min(p, 1.0), 6))
    got = {
        r["doc_id"]: (r["w"], r["p_keep"])
        for r in importance_sample(docs, "n_chars", rate, seed=seed).collect()
    }
    assert got == want and 0 < len(got) < len(pos)


def test_importance_sample_uniform_weights_and_bad_rate(spark):
    import pytest

    from simkit_spark.functions.curation import importance_sample

    docs = spark.createDataFrame(
        [(f"d{i}", 10) for i in range(100)], "doc_id string, w long"
    )
    out = importance_sample(docs, "w", 1.0).collect()
    # uniform weights at rate 1: p = 1 for every doc, all kept
    assert len(out) == 100 and all(r["p_keep"] == 1.0 for r in out)
    with pytest.raises(ValueError):
        importance_sample(docs, "w", 0.0)


def test_word_ranks_matches_counter(spark):
    from collections import Counter

    from simkit_spark.functions.text import word_ranks

    texts = ["the cat sat", "the cat", "the", "", "  ", "dog the cat"]
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    c = Counter(w for t in texts for w in t.lower().split())
    total = sum(c.values())
    order = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, want = 0, {}
    for r, (w, cnt) in enumerate(order, 1):
        cum += cnt
        want[w] = (cnt, r, round(cum / total, 6))
    for nr in (1, 3, 16):
        got = {
            r["word"]: (r["cnt"], r["rank"], r["cum_share"])
            for r in word_ranks(docs, n_ranges=nr).collect()
        }
        assert got == want, nr
    assert word_ranks(docs.where("text = 'nope'")).count() == 0


def test_priority_sample_contract(spark):
    from simkit_spark.functions.curation import priority_sample

    docs = spark.createDataFrame(
        [(i, f"text {i}", 10 + i) for i in range(50)],
        "doc_id long, text string, n_chars long",
    )
    out = priority_sample(docs, "n_chars", k=10).collect()
    assert len(out) == 10
    # estimator: w_est = max(w, tau) >= w, and tau is a single value
    taus = {round(r.w_est, 9) for r in out if r.w_est > r.weight}
    assert all(r.w_est >= r.weight for r in out)
    assert len(taus) <= 1
    # deterministic: same seed -> same sample; different seed -> moves
    again = priority_sample(docs, "n_chars", k=10).collect()
    assert sorted(r.id for r in out) == sorted(r.id for r in again)
    moved = priority_sample(docs, "n_chars", k=10, seed=7).collect()
    assert sorted(r.id for r in out) != sorted(r.id for r in moved)
    # n <= k: everything sampled, tau = 0 -> w_est == w
    small = priority_sample(docs.limit(5), "n_chars", k=10).collect()
    assert len(small) == 5 and all(r.w_est == float(r.weight) for r in small)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must"):
        priority_sample(docs, "n_chars", k=0)


def test_priority_sample_estimator_unbiased_shape(spark):
    """sum of w_est over the whole sample should sit near the true
    total weight (the subset-sum estimator property), deterministic
    here by fixed seed."""
    from simkit_spark.functions.curation import priority_sample

    docs = spark.createDataFrame(
        [(i, "t", 100 + (i * 37) % 900) for i in range(400)],
        "doc_id long, text string, n_chars long",
    )
    true_total = sum(100 + (i * 37) % 900 for i in range(400))
    out = priority_sample(docs, "n_chars", k=80).collect()
    est = sum(r.w_est for r in out)
    assert abs(est - true_total) / true_total < 0.25, (est, true_total)


def test_kmv_distinct_exact_below_k_and_estimates_above(spark):
    from simkit_spark.functions.sketch import kmv_distinct

    # 40 distinct values, k=64: sketch is exact
    small = spark.createDataFrame(
        [(i % 40,) for i in range(500)], "v long"
    )
    row = kmv_distinct(small, "v", k=64).collect()[0]
    assert row.n_kept == 40 and row.est_distinct == 40.0

    # 20k distinct, k=256: estimate within ~4/sqrt(k-2) rel. error
    # (deterministic: fixed hash family, no flakiness)
    big = spark.createDataFrame([(i,) for i in range(20_000)], "v long")
    row = kmv_distinct(big, "v", k=256).collect()[0]
    assert row.n_kept == 256
    rel = abs(row.est_distinct - 20_000) / 20_000
    assert rel < 4 / (254 ** 0.5), (row.est_distinct, rel)

    # duplicates don't move the sketch: same estimate with every row 3x
    dup = big.unionAll(big).unionAll(big)
    row2 = kmv_distinct(dup, "v", k=256).collect()[0]
    assert (row2.kth_hash, row2.est_distinct) == (row.kth_hash, row.est_distinct)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must"):
        kmv_distinct(big, "v", k=2)


def test_mixture_sample_allocation_and_caps(spark):
    """Largest-remainder allocation: floors + top-ups sum to the
    budget; over-allocated sources cap at availability; the draw is
    the stratified hash order; partition-invariant."""
    import pytest as _pytest

    from simkit_spark.functions.curation import mixture_sample

    rows = [(f"d{i}", f"s{i % 4}") for i in range(40)]  # 10 docs/source
    docs = spark.createDataFrame(rows, "doc_id string, source string")
    # weights 1:1:3:5 of budget 17 -> quotas 1.7, 1.7, 5.1, 8.5;
    # floors 1,1,5,8 (sum 15), remainders .7,.7,.1,.5 -> top-ups to
    # s0, s1 (tie .7/.7 both topped; r=2) => alloc 2,2,5,8
    out = mixture_sample(
        docs, budget=17, weights={"s0": 1, "s1": 1, "s2": 3, "s3": 5}
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
        assert r["rank"] <= r["alloc"]
    assert {s: len(v) for s, v in by_src.items()} == {
        "s0": 2, "s1": 2, "s2": 5, "s3": 8}
    assert {s: v[0]["alloc"] for s, v in by_src.items()} == {
        "s0": 2, "s1": 2, "s2": 5, "s3": 8}
    # cap: budget larger than a source -> min(alloc, available) rows
    out2 = mixture_sample(docs, budget=40, weights={"s0": 9, "s1": 1}).collect()
    n = {}
    for r in out2:
        n[r["source"]] = n.get(r["source"], 0) + 1
    # alloc s0=36 capped at 10 available; s1=4
    assert n == {"s0": 10, "s1": 4}
    # sources not in weights contribute nothing
    assert not any(r["source"] in ("s2", "s3") for r in out2)
    # partition invariance
    again = mixture_sample(
        docs.repartition(7, "doc_id"), budget=17,
        weights={"s0": 1, "s1": 1, "s2": 3, "s3": 5},
    ).collect()
    assert {(r["doc_id"], r["rank"]) for r in again} == {
        (r["doc_id"], r["rank"]) for r in out}
    # validation
    with _pytest.raises(ValueError):
        mixture_sample(docs, budget=-1, weights={"s0": 1})
    with _pytest.raises(ValueError):
        mixture_sample(docs, budget=5, weights={})
    with _pytest.raises(ValueError):
        mixture_sample(docs, budget=5, weights={"s0": 0})
