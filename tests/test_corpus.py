"""Corpus-curation operators (operators/corpus.py) + stratified sampler."""

from pyspark.sql import functions as F

from pyspark_xgboost_spark.operators import corpus, sampling
from pyspark_xgboost_spark.sources import load_table
from pyspark_xgboost_spark.utils import ascii_tokens
from tests.conftest import SF_DIR


def _chk_repetition_stats_bounds_and_handmade_doc(spark):
    # bounds need a sample, not the corpus: the interpreted HOF
    # expressions make full sf0.001 evaluation the single most
    # expensive call in the suite, and limit() pushes into the
    # map-only plan (oracle + invariance sweeps cover full results)
    rows = corpus.text_repetition_stats(spark, SF_DIR).limit(64).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_frac"] < 1.0
        assert 0.0 < r["top_bigram_frac"] <= 1.0
    # hand-checked degenerate doc: "a a a a" -> dup 3/4, top bigram 3/3
    df = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    one = (
        df.select("doc_id", F.expr(corpus._TOKS).alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n"),
            F.size(F.array_distinct("toks")).alias("u"),
        )
        .collect()[0]
    )
    assert (one["n"], one["u"]) == (4, 1)


def _chk_chunking_covers_text_exactly(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = corpus.doc_chunk_fixed(spark, SF_DIR)
    # no shuffle: map-only plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    lens = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = lens[doc_id]
        # stride-aligned starts, contiguous idx, final chunk reaches EOF
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["chunk_start"] == c["chunk_idx"] * 192 + 1
            assert 1 <= c["chunk_len"] <= 256
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_len"] - 1 == n


def _chk_contamination_test_docs_excluded_and_hits_positive(spark):
    rows = corpus.contamination_check(spark, SF_DIR).collect()
    for r in rows:
        assert r["doc_id"] % 50 != 0
        assert r["n_hits"] >= 1


def _chk_packing_is_dense_within_source(spark):
    rows = corpus.doc_pack_greedy(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["bin_id"] == cum // 2048
            assert r["bin_offset"] == cum % 2048
            cum += docs[r["doc_id"]]


def _chk_vocab_topk_ordered_and_bounded(spark):
    rows = corpus.corpus_vocab_topk(spark, SF_DIR).collect()
    assert len(rows) <= 50
    dfs = [(r["df"], r["term"]) for r in rows]
    assert dfs == sorted(dfs, key=lambda t: (-t[0], t[1]))
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert all(0 < d <= n_docs for d, _ in dfs)


def _chk_embedding_centroids_shape_and_range(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    rows = corpus.embedding_centroids(spark, SF_DIR).collect()
    assert len(rows) == n_labels * 64
    counts = {r["label"]: r["n_members"] for r in rows}
    truth = {r["label"]: r["cnt"] for r in emb.groupBy("label").agg(F.count("*").alias("cnt")).collect()}
    assert counts == truth
    # quantized mean must sit within the component min/max
    lo, hi = emb.select(
        F.min(F.array_min("embedding")), F.max(F.array_max("embedding"))
    ).first()
    for r in rows:
        assert float(lo) - 0.001 <= r["centroid"] <= float(hi) + 0.001


def _chk_stratified_sample_rates(spark):
    out = {
        r["source"]: r["n_sampled"]
        for r in sampling.sample_stratified_by_source(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    rates = {0: 26 / 256, 1: 52 / 256, 2: 77 / 256, 3: 102 / 256}
    for src, n in out.items():
        stratum = int(src[3:]) % 4
        # generous tolerance at sf0.001 counts; just check ordering pressure
        assert 0 < n <= totals[src]
    # sources in stratum 3 should sample at a higher *rate* than stratum 0
    # in aggregate (law of large numbers over all sources per stratum)
    agg = {0: [0, 0], 3: [0, 0]}
    for src, total in totals.items():
        st = int(src[3:]) % 4
        if st in agg:
            agg[st][0] += out.get(src, 0)
            agg[st][1] += total
    if agg[0][1] and agg[3][1]:
        assert agg[3][0] / agg[3][1] > agg[0][0] / agg[0][1]


def _chk_bigram_topk_ordered_and_handchecked(spark):
    rows = corpus.corpus_bigram_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    # hand-count the top bigram from raw text
    top = rows[0]["bigram"]
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    count = 0
    for d in docs:
        toks = ascii_tokens(d["text"])
        count += sum(
            1 for a, b in zip(toks, toks[1:]) if f"{a} {b}" == top
        )
    assert count == rows[0]["n"]


def _chk_bigram_topk_plan_single_shuffle_topk(spark):
    plan = (
        corpus.corpus_bigram_topk(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1  # only the bigram-keyed agg shuffles


def _chk_unigram_logprob_consistency(spark):
    rows = corpus.text_unigram_logprob(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["avg_logprob"] < 0  # probabilities < 1
        assert r["n_tokens"] > 0
        assert abs(
            r["avg_logprob"] - r["sum_lp_micro"] / 1e6 / r["n_tokens"]
        ) < 1e-12
    # hand-score one document under the corpus unigram LM
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    from collections import Counter

    freq = Counter()
    for d in docs:
        freq.update(ascii_tokens(d["text"]))
    total = sum(freq.values())
    import math

    d0 = docs[0]
    toks = ascii_tokens(d0["text"])
    hand = sum(round(math.log(freq[t] / total) * 1e6) for t in toks)
    got = {r["doc_id"]: r for r in rows}[d0["doc_id"]]
    assert got["sum_lp_micro"] == hand
    assert got["n_tokens"] == len(toks)


def _chk_unigram_logprob_single_token_pass(spark):
    plan = (
        corpus.text_unigram_logprob(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the exploded token relation is evaluated ONCE (window count, not a
    # re-scanned aggregate joined back — the tf-idf double-eval trap)
    assert plan.count("Generate") == 1
    assert "Window" in plan


def _chk_whitening_stats_shape_and_moments(spark):
    rows = corpus.embedding_whitening_stats(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings")
    n_vec = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    assert len(rows) == dim
    for r in rows:
        assert r["n"] == n_vec
        assert r["variance"] >= 0
        assert -1.0 < r["mean"] < 1.0
    # hand-check one dimension with the same quantization
    vecs = [v["embedding"] for v in emb.select("embedding").collect()]
    import math

    qv = [math.floor(float(v[0]) * 1000) for v in vecs]
    s, s2, n = sum(qv), sum(x * x for x in qv), len(qv)
    r0 = {r["pos"]: r for r in rows}[0]
    assert abs(r0["mean"] - s / 1000.0 / n) < 1e-12
    assert abs(r0["variance"] - (s2 / n - (s / n) ** 2) / 1e6) < 1e-9


def _chk_whitening_stats_single_exchange(spark):
    plan = (
        corpus.embedding_whitening_stats(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def _chk_outlier_robust_z_approx_conf(spark):
    """spark_graft.approx_percentiles=true swaps exact percentile for
    the mergeable approx_percentile sketch (the documented 100 TB
    path). Same schema, same rows scored, and on sf0.001's integer
    lengths the sketch at accuracy 10000 is exact, so scores match."""
    exact = {
        r.doc_id: r.robust_z
        for r in corpus.outlier_robust_z(spark, SF_DIR).collect()
    }
    spark.conf.set("spark_graft.approx_percentiles", "true")
    try:
        approx_df = corpus.outlier_robust_z(spark, SF_DIR)
        approx = {r.doc_id: r.robust_z for r in approx_df.collect()}
        plan = approx_df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark_graft.approx_percentiles")
    assert "approx_percentile" in plan
    assert set(approx) == set(exact)
    for k, v in exact.items():
        assert abs(approx[k] - v) < 0.51, (k, v, approx[k])


def _chk_bpe_pretokenize_matches_python_re(spark):
    import re

    from pyspark_xgboost_spark.operators.text import text_bpe_pretokenize
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = {r["doc_id"]: r for r in text_bpe_pretokenize(spark, SF_DIR).collect()}
    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r]")
    for d in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect():
        toks = pat.findall(d["text"].lower())
        if not toks:
            assert d["doc_id"] not in got
            continue
        g = got[d["doc_id"]]
        assert g["n_pretokens"] == len(toks)
        assert g["n_word"] == sum(t[0].isalpha() for t in toks)
        assert g["n_number"] == sum(t[0].isdigit() for t in toks)
        assert g["n_punct"] == sum(not t[0].isalnum() for t in toks)
        assert g["n_word"] + g["n_number"] + g["n_punct"] == g["n_pretokens"]


def _chk_importance_resample_prefers_target_lang(spark):
    """DSIR selection must (a) match a pure-Python recompute of the
    smoothed log-ratio scores and (b) enrich the target language."""
    import collections
    import math

    from pyspark_xgboost_spark.operators.corpus import (
        _DSIR_K,
        corpus_importance_resample,
    )
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    rows = corpus_importance_resample(spark, SF_DIR).collect()
    assert len(rows) == _DSIR_K
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    cf, ct = collections.Counter(), collections.Counter()
    toks = {}
    for d in docs:
        ts = ascii_tokens(d["text"])
        toks[d["doc_id"]] = ts
        for t in ts:
            cf[t] += 1
            if d["lang"] == "en":
                ct[t] += 1
    n, v = sum(cf.values()), len(cf)
    nt = sum(ct[t] * 1 for t in cf if t in ct)
    scores = {}
    for doc_id, ts in toks.items():
        s = 0
        for t in ts:
            lp_t = round(math.log((ct.get(t, 0) + 1) / (nt + v)) * 1000000)
            lp_c = round(math.log(cf[t] / n) * 1000000)
            s += lp_t - lp_c
        scores[doc_id] = s
    expect = sorted(scores, key=lambda d: (-scores[d], d))[:_DSIR_K]
    assert [r["doc_id"] for r in rows] == sorted(
        expect, key=lambda d: (-scores[d], d)
    ) or {r["doc_id"] for r in rows} == set(expect)
    for r in rows:
        assert r["score_micro"] == scores[r["doc_id"]]
    # enrichment: the selected set is more 'en' than the corpus base rate
    lang = {d["doc_id"]: d["lang"] for d in docs}
    sel_en = sum(lang[r["doc_id"]] == "en" for r in rows) / len(rows)
    base_en = sum(d["lang"] == "en" for d in docs) / len(docs)
    assert sel_en > base_en


def _chk_bigram_perplexity_matches_python_recompute(spark):
    import collections
    import math

    from pyspark_xgboost_spark.operators.corpus import text_perplexity_bigram
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = {r["doc_id"]: r for r in text_perplexity_bigram(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    bigrams, cb, cu = {}, collections.Counter(), collections.Counter()
    for d in docs:
        ts = ascii_tokens(d["text"])
        if len(ts) < 2:
            assert d["doc_id"] not in got
            continue
        bs = [(ts[i] + " " + ts[i + 1], ts[i]) for i in range(len(ts) - 1)]
        bigrams[d["doc_id"]] = bs
        for b, p in bs:
            cb[b] += 1
            cu[p] += 1
    v = len(cu)
    for doc_id, bs in bigrams.items():
        s = sum(
            round(math.log((cb[b] + 1) / (cu[p] + v)) * 1000000) for b, p in bs
        )
        g = got[doc_id]
        assert g["n_bigrams"] == len(bs)
        assert g["sum_lp_micro"] == s
        assert abs(g["nll_per_bigram"] - (s / -1000000.0 / len(bs))) < 1e-12


def _chk_temperature_mixture_sqrt_rule(spark):
    import math

    from pyspark_xgboost_spark.operators.sampling import (
        sample_temperature_mixture,
    )
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    rows = sample_temperature_mixture(spark, SF_DIR).collect()
    by_lang = {r["lang"]: r for r in rows}
    src = load_table(spark, SF_DIR, "documents").groupBy("lang").agg(
        {"n_chars": "sum", "*": "count"}
    ).collect()
    expect = {
        r["lang"]: (r["count(1)"], r["sum(n_chars)"]) for r in src
    }
    s_micro = {
        lang: round(math.sqrt(avail) * 1000000) for lang, (_, avail) in expect.items()
    }
    tot = sum(s_micro.values())
    for lang, (n, avail) in expect.items():
        g = by_lang[lang]
        assert (g["n_docs"], g["avail"]) == (n, avail)
        assert g["s_micro"] == s_micro[lang]
        assert g["weight_ppm"] == s_micro[lang] * 1000000 // tot
    # temperature scaling compresses the spread: max/min weight ratio
    # strictly below the raw size ratio
    ws = [r["weight_ppm"] for r in rows]
    sizes = [expect[r["lang"]][1] for r in rows]
    assert max(ws) / min(ws) < max(sizes) / min(sizes)


def _chk_kgram_novelty_matches_sequential_recompute(spark):
    """Novelty must equal the truly SEQUENTIAL definition: grams never
    seen in any lower-doc_id document."""
    from pyspark_xgboost_spark.operators.corpus import corpus_kgram_novelty
    from pyspark_xgboost_spark.sources import load_table
    from tests.conftest import SF_DIR

    got = {r["doc_id"]: r for r in corpus_kgram_novelty(spark, SF_DIR).collect()}
    docs = sorted(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect(),
        key=lambda d: d["doc_id"],
    )
    seen = set()
    any_partial = False
    for d in docs:
        ts = ascii_tokens(d["text"])
        grams = {
            " ".join(ts[i : i + 5]) for i in range(len(ts) - 4)
        }
        if not grams:
            assert d["doc_id"] not in got
            continue
        novel = {g for g in grams if g not in seen}
        seen |= grams
        g = got[d["doc_id"]]
        assert g["n_grams"] == len(grams)
        assert g["n_novel"] == len(novel)
        assert g["novelty_bp"] == int(len(novel) / len(grams) * 10000)
        if 0 < len(novel) < len(grams):
            any_partial = True
    assert any_partial  # the fixture really contains cross-doc overlap


def _chk_bpe_train_and_apply_match_reference_python(spark):
    """One shared pass: corpus_bpe_merges must reproduce a pure-Python
    reference BPE (greedy leftmost merge, count-desc then lexicographic
    argmax) on the identical lowercased word-frequency dict, and
    corpus_bpe_tokenize_apply must agree with a reference encode using
    those same merges. Combined so BPE trains once for both halves."""
    from collections import Counter

    from pyspark_xgboost_spark.operators.corpus import (
        _BPE_MAX_WORD,
        _BPE_ROUNDS,
        corpus_bpe_merges,
        corpus_bpe_tokenize_apply,
    )

    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in corpus_bpe_merges(spark, SF_DIR).collect()
    ]

    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    freq: Counter = Counter()
    for row in docs:
        for w in ascii_tokens(row["text"]):
            if w and len(w) <= _BPE_MAX_WORD:
                freq[w] += 1
    vocab = {tuple(w): f for w, f in freq.items()}

    def encode(syms, merges):
        for l, r in merges:
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    expect = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, l, r, cnt))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            key = tuple(encode(list(syms), [(l, r)]))
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab

    assert got == expect

    # apply half: per-source compression report vs reference encode
    merges = [(l, r) for _rnd, l, r, _c in got]
    got_apply = {
        r["source"]: (r["n_docs"], r["sum_chars"], r["sum_tokens"])
        for r in corpus_bpe_tokenize_apply(spark, SF_DIR).collect()
    }
    expect_apply: dict = {}
    for row in docs:
        n_chars = n_toks = 0
        for w in ascii_tokens(row["text"]):
            if not w or len(w) > _BPE_MAX_WORD:
                continue
            n_chars += len(w)
            n_toks += len(encode(list(w), merges))
        d, c, t = expect_apply.get(row["source"], (0, 0, 0))
        expect_apply[row["source"]] = (d + 1, c + n_chars, t + n_toks)

    assert got_apply == expect_apply
    for _d, c, t in got_apply.values():
        assert t < c  # merges genuinely compress


# Pooled contract sweep (smoke-sweep discipline; see test_plans_r11).
_POOLED_CHECKS = [_chk_repetition_stats_bounds_and_handmade_doc, _chk_chunking_covers_text_exactly, _chk_contamination_test_docs_excluded_and_hits_positive, _chk_packing_is_dense_within_source, _chk_vocab_topk_ordered_and_bounded, _chk_embedding_centroids_shape_and_range, _chk_stratified_sample_rates, _chk_bigram_topk_ordered_and_handchecked, _chk_bigram_topk_plan_single_shuffle_topk, _chk_unigram_logprob_consistency, _chk_unigram_logprob_single_token_pass, _chk_whitening_stats_shape_and_moments, _chk_whitening_stats_single_exchange, _chk_outlier_robust_z_approx_conf, _chk_bpe_pretokenize_matches_python_re, _chk_importance_resample_prefers_target_lang, _chk_bigram_perplexity_matches_python_recompute, _chk_temperature_mixture_sqrt_rule, _chk_kgram_novelty_matches_sequential_recompute, _chk_bpe_train_and_apply_match_reference_python]


# session-conf mutators run in the serial lane
def test_corpus_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _POOLED_CHECKS, serial=[_chk_outlier_robust_z_approx_conf])
