"""Shape assertions for the round-12 additions.

Each contract lives in a ``_chk_*`` function; ONE pytest case fans
them out over a thread pool sharing the session (the smoke-sweep
discipline — see test_plans_r11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_plans import plan_of
from pyspark_xgboost_spark.utils import ascii_tokens


def _chk_stream_ivf_incremental_is_batch_identical(spark):
    """The maintained posting table must equal a one-shot index build
    over the full corpus (routing under a frozen codebook is
    independent of batching — the whole point), and the final probe
    must read the posting table, never re-scanning embeddings."""
    import os

    from pyspark_xgboost_spark.operators.similarity import (
        _km_assign,
        _km_cent_row,
        _km_xq,
    )
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.streaming.stream import (
        _stage_kmeans_batches,
        stream_ivf_incremental,
    )

    out = stream_ivf_incremental(spark, SF_DIR)
    plan = plan_of(out)
    assert "embeddings" not in plan  # serving reads the index only
    assert "CartesianProduct" not in plan

    root = _stage_kmeans_batches(spark, SF_DIR)
    postings = spark.read.parquet(os.path.join(root, "ivf", "post"))
    cents = spark.read.parquet(os.path.join(root, "ivf", "cents"))
    maintained = {
        (r.vec_id, r.cid)
        for r in postings.select("vec_id", "cid").collect()
    }
    oneshot = {
        (r.vec_id, r.cid)
        for r in _km_assign(_km_xq(spark, SF_DIR), _km_cent_row(cents))
        .select("vec_id", "cid")
        .collect()
    }
    assert maintained == oneshot  # incremental-union == one-shot build
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert len(maintained) == n_vecs  # every vector indexed exactly once


def _chk_stream_cc_incremental_matches_batch_cc(spark):
    """The maintained label table's group summary must equal the batch
    connected-components operator it maintains online (contraction
    reaches the same fixed point as full recomputation), and the final
    read must touch the label table only — never documents."""
    from pyspark_xgboost_spark.operators.dedup import dedup_groups_connected
    from pyspark_xgboost_spark.streaming.stream import stream_cc_incremental

    out = stream_cc_incremental(spark, SF_DIR)
    plan = plan_of(out)
    assert "documents" not in plan  # no corpus re-scan at serving time
    assert "CartesianProduct" not in plan

    inc = {(r.group_id, r.n_docs, r.max_doc_id) for r in out.collect()}
    batch = {
        (r.group_id, r.n_docs, r.max_doc_id)
        for r in dedup_groups_connected(spark, SF_DIR).collect()
    }
    assert inc == batch  # incremental == batch CC, row-exact


def _chk_mp4_walk_is_genuine(spark):
    """The box walk must actually hop: per-row moov offsets differ
    (doc-varied ftyp + free lengths), the type fingerprint at the
    hopped-to offset is 'moov' on every row, duration_ms matches a
    Python recompute, and the projection is UDF-free map-only."""
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_mp4_duration,
    )

    out = multimodal_mp4_duration(spark, SF_DIR)
    rows = out.collect()
    assert rows
    assert all(r.moov_type == "6D6F6F76" for r in rows)  # 'moov'
    # the walk is genuine: hop distances vary across rows
    assert len({r.ftyp_len for r in rows}) > 1
    assert len({r.free_len for r in rows}) > 1
    for r in rows[:20]:
        assert r.duration_ms == r.duration * 1000 // r.timescale
        assert r.timescale >= 600
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan




def _chk_mg_incremental_guarantees(spark):
    """The maintained MG summary must satisfy the deterministic
    Misra-Gries contract: at most k counters, every counter an
    underestimate of the exact corpus count, and every token whose
    frequency exceeds n_tokens/(k+1) guaranteed present."""
    from pyspark_xgboost_spark.operators.corpus import _TOKS
    from pyspark_xgboost_spark.sources import load_table
    from pyspark_xgboost_spark.streaming.stream import (
        _MG_K,
        stream_mg_topk_incremental,
    )

    rows = stream_mg_topk_incremental(spark, SF_DIR).collect()
    assert 0 < len(rows) <= _MG_K
    assert all(r.underestimate_ok == 1 for r in rows)
    assert all(0 < r.mg_count <= r.n_exact for r in rows)
    exact = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.expr(_TOKS)).alias("token"))
        .groupBy("token")
        .count()
        .collect()
    )
    n_total = sum(r["count"] for r in exact)
    kept = {r.token for r in rows}
    for r in exact:
        if r["count"] > n_total / (_MG_K + 1):
            assert r["token"] in kept, r["token"]


def _chk_markov_stationary_conserves_mass(spark):
    """pi stays a (truncation-lossy) distribution: every pi4 entry is
    nonnegative and the total is <= the nano scale but within the
    truncation slack; self-loop probs are valid micro-probabilities;
    the plan carries one window pass and no cartesian."""
    from pyspark_xgboost_spark.operators.temporal import (
        _MKV_SCALE,
        events_markov_stationary,
    )

    out = events_markov_stationary(spark, SF_DIR)
    rows = out.collect()
    assert rows
    total = sum(r.pi4_nano for r in rows)
    # each of the 4 rounds loses < n_states * pscale slack to floor-div
    assert 0.98 * _MKV_SCALE <= total <= _MKV_SCALE
    assert all(0 <= r.self_loop_micro <= 1_000_000 for r in rows)
    assert all(r.pi4_nano >= 0 for r in rows)
    assert "CartesianProduct" not in plan_of(out)


def _chk_cdc_chunks_conserve_and_resync(spark):
    """Chunking must tile every document exactly (sum of chunk chars ==
    sum of text chars) and actually find cross-document sharing; and
    the boundary rule must resynchronize after a prefix edit (the
    whole point of CDC vs fixed-size blocks)."""
    import hashlib

    from pyspark_xgboost_spark.operators.dedup import (
        _CDC_M,
        _CDC_W,
        dedup_cdc_chunks,
    )
    from pyspark_xgboost_spark.sources import load_table

    rows = dedup_cdc_chunks(spark, SF_DIR).collect()
    total_chunk_chars = sum(r.n_chunk_chars for r in rows)
    total_text_chars = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.sum(F.length("text")))
        .collect()[0][0]
    )
    assert total_chunk_chars == total_text_chars  # exact tiling
    assert any(r.n_shared_chunks > 0 for r in rows)  # fixture has reuse

    # pure-python resync pin: chunk a string, then prepend a char —
    # the tail chunks (past the first boundary) must be identical
    def cuts(t):
        out = []
        for p in range(_CDC_W, len(t) + 1):
            h = int(hashlib.md5(t[p - _CDC_W : p].encode()).hexdigest()[:4], 16)
            if h % _CDC_M == 0 and p < len(t):
                out.append(p)
        return out

    def chunk(t):
        bs = [0] + cuts(t) + [len(t)]
        return [t[bs[i] : bs[i + 1]] for i in range(len(bs) - 1)]

    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = "X" + base
    # every cut position shifts by exactly 1, so every chunk after the
    # first cut is the identical string — CDC resynchronizes where a
    # fixed-size blocker would misalign the whole document
    tail = set(chunk(base)[1:])
    assert tail and tail <= set(chunk(edited))




def _chk_random_walks_are_genuine_walks(spark):
    """Every step of every walk must traverse a real edge; every node
    gets exactly one walk; walk length is exactly _RW_LEN + 1."""
    from pyspark_xgboost_spark.operators.graph import (
        _RW_LEN,
        _lsh_edges,
        graph_random_walks,
    )

    rows = graph_random_walks(spark, SF_DIR).collect()
    edges = {
        (r.src, r.dst) for r in _lsh_edges(spark, SF_DIR).collect()
    }
    nodes = {a for a, _ in edges}
    assert {r.start_id for r in rows} == nodes  # one walk per node
    for r in rows:
        path = [int(x) for x in r.walk.split("->")]
        assert len(path) == _RW_LEN + 1
        assert path[0] == r.start_id
        for a, b in zip(path, path[1:]):
            assert (a, b) in edges, (a, b)
        assert r.n_unique_nodes == len(set(path))


def _chk_markov_attribution_contract(spark):
    """Removal effects are nonnegative (removing a channel can only
    intercept journeys), credits sum to ~1000 milli, and the base
    conversion mass is a valid sub-distribution of the start mass."""
    from pyspark_xgboost_spark.operators.temporal import (
        events_attribution_markov,
    )

    rows = events_attribution_markov(spark, SF_DIR).collect()
    assert len(rows) == 4
    base = rows[0].conv_base_nano
    assert all(r.conv_base_nano == base for r in rows)
    assert 0 < base <= 1_000_000_000
    assert all(0 <= r.conv_removed_nano <= base for r in rows)
    assert all(r.removal_effect_nano >= 0 for r in rows)
    total_milli = sum(r.attribution_milli for r in rows)
    assert 996 <= total_milli <= 1000  # floor-div slack only


def _chk_tiff_walk_is_genuine(spark):
    """The IFD walk must really indirect + scan: per-row IFD offsets
    AND per-row entry counts vary, orientation transposition is
    applied, and the projection is UDF-free."""
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_tiff_ifd_walk,
    )

    out = multimodal_tiff_ifd_walk(spark, SF_DIR)
    rows = out.collect()
    assert rows
    assert len({r.ifd_off for r in rows}) > 1  # offset indirection varies
    assert len({r.n_entries for r in rows}) > 1  # scan length varies
    for r in rows:
        assert 1 <= r.orientation <= 8
        if r.orientation >= 5:
            assert (r.eff_width, r.eff_height) == (r.height, r.width)
        else:
            assert (r.eff_width, r.eff_height) == (r.width, r.height)
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan




def _chk_did_reads_same_experiment_as_cuped(spark):
    """DiD and CUPED must read the same arm assignment and cutoff (one
    experiment, two designs), the panel variance must be positive, and
    the cell means must reconcile with the DiD point estimate."""
    from pyspark_xgboost_spark.operators.sampling import events_diff_in_diff

    r = events_diff_in_diff(spark, SF_DIR).collect()[0]
    assert r.n_treat > 0 and r.n_control > 0
    assert r.se_milli > 0
    approx = (r.mean_treat_post_milli - r.mean_treat_pre_milli) - (
        r.mean_control_post_milli - r.mean_control_pre_milli
    )
    assert abs(approx - r.did_milli) <= 4  # four independent floors


def _chk_theil_decomposition_adds_up(spark):
    """T_total == sum_g s_g*T_g + sum_g between_g within quantization
    slack, every within term is nonnegative (Jensen), and shares sum
    to one."""
    from pyspark_xgboost_spark.operators.corpus import (
        corpus_theil_decomposition,
    )

    rows = corpus_theil_decomposition(spark, SF_DIR).collect()
    assert rows
    assert all(r.theil_within_micro >= -1 for r in rows)  # floor slack
    share = sum(r.share_micro for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000
    # recompute total Theil in python and compare to the decomposition
    import math

    from pyspark_xgboost_spark.sources import load_table

    xs = [
        (r.source, r.n_chars)
        for r in load_table(spark, SF_DIR, "documents")
        .select("source", "n_chars")
        .collect()
    ]
    S = sum(x for _, x in xs)
    N = len(xs)
    t_total = sum(x / S * math.log(x * N / S) for _, x in xs)
    within = sum(
        r.sum_chars / S * r.theil_within_micro / 1e6 for r in rows
    )
    between = sum(r.between_term_micro / 1e6 for r in rows)
    assert abs((within + between) - t_total) < 1e-3


def _chk_weighted_jaccard_bounds_and_repetition_sensitivity(spark):
    """wjac is a valid [0,1] micro ratio, inter <= union, and the
    pair set is exactly the shared LSH candidate set (a verify stage
    must score every candidate, none more)."""
    from pyspark_xgboost_spark.operators.dedup import (
        _cached_candidate_pairs,
        dedup_weighted_jaccard_verify,
    )

    rows = dedup_weighted_jaccard_verify(spark, SF_DIR).collect()
    cand = {
        (r.doc_a, r.doc_b)
        for r in _cached_candidate_pairs(spark, SF_DIR).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == cand
    for r in rows:
        assert 0 <= r.inter_mass <= r.union_mass
        assert 0 <= r.wjac_micro <= 1_000_000


def _chk_readability_matches_python(spark):
    """FK grade must match a pure-python recompute on a sample, and
    the projection is UDF-free."""
    import math
    import re

    from pyspark_xgboost_spark.operators.text import text_readability_fk
    from pyspark_xgboost_spark.sources import load_table

    out = text_readability_fk(spark, SF_DIR)
    got = {r.doc_id: r for r in out.collect()}
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(30).collect()
    for d in docs:
        toks = ascii_tokens(d.text)
        if not toks:
            continue
        sents = max(1, len(re.findall(r"[.!?]+", d.text)))
        syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in toks)
        r = got[d.doc_id]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (
            len(toks),
            sents,
            syl,
        )
        grade = 0.39 * len(toks) / sents + 11.8 * syl / len(toks) - 15.59
        assert r.fk_grade_milli == math.floor(grade * 1000)
    plan = plan_of(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _chk_zip_eocd_search_is_genuine(spark):
    """The EOCD search distance (comment length) and member counts
    vary per row, the directory accounting closes (layout_ok), and
    counts match the packing rule."""
    from pyspark_xgboost_spark.operators.multimodal import (
        multimodal_zip_eocd,
    )

    rows = multimodal_zip_eocd(spark, SF_DIR).collect()
    assert rows
    assert all(r.layout_ok == 1 for r in rows)
    assert len({r.comment_len for r in rows}) > 1  # search distance varies
    assert {r.n_entries for r in rows} == {1, 2, 3}
    for r in rows:
        assert r.n_entries == 1 + r.doc_id % 3
        assert r.cd_size == 48 * r.n_entries
        assert r.cd_offset == 36 * r.n_entries


def _chk_poisson_rate_shift_matches_binomial(spark):
    """z matches the closed form from the two counts."""
    import math

    from pyspark_xgboost_spark.operators.sampling import (
        events_poisson_rate_shift,
    )

    for r in events_poisson_rate_shift(spark, SF_DIR).collect():
        n = r.n_pre + r.n_post
        z = (r.n_post - n / 2) / math.sqrt(n / 4)
        assert r.z_milli == math.floor(z * 1000)
        assert r.rate_shift_95 == (1 if abs(z) > 1.96 else 0)




def _chk_max_drawdown_matches_python(spark):
    """Max drawdown must equal the python running-peak recompute over
    the daily grid, with the earliest trough day."""
    from collections import defaultdict

    from pyspark_xgboost_spark.operators.temporal import window_max_drawdown
    from pyspark_xgboost_spark.sources import load_table

    got = {r.event_type: r for r in window_max_drawdown(spark, SF_DIR).collect()}
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "event_type",
            "datediff(cast(ts as date), date '1970-01-01') as d",
            "cast(round(value * 100) as bigint) as cents",
        )
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.d] += r.cents
    for et, series in daily.items():
        peak, mdd, trough = -1 << 62, 0, None
        for day in sorted(series):
            peak = max(peak, series[day])
            dd = peak - series[day]
            if dd > mdd:
                mdd, trough = dd, day
            elif dd == mdd and trough is None:
                trough = day
        g = got[et]
        assert g.max_drawdown_cents == mdd
        assert g.trough_day_idx == trough
        assert g.n_days == len(series)


def _chk_sq8_eval_contract(spark):
    """Quantization error is bounded by the grid step (per dim at most
    (mx-mn)/255 + 1 milli), and recall overlap is a valid 0..k count."""
    from pyspark_xgboost_spark.operators.similarity import (
        _KM_DIM,
        _TOPK,
        embedding_scalar_quantize_eval,
    )

    rows = embedding_scalar_quantize_eval(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.overlap3 <= _TOPK
        assert 0 <= r.q_l1_err
    # the fixture's embeddings span roughly [-1, 1] => per-dim step
    # ~2000/255 milli; total L1 error must stay under dim * (step + 1)
    assert all(r.q_l1_err <= _KM_DIM * (2000 // 255 + 2) for r in rows)


def _chk_greedy_graph_descent_monotone(spark):
    """The greedy trajectory must end at a node whose distance is
    never worse than the entry point's (monotone descent), quality is
    a valid <=1000 milli ratio, and the eval panel is complete."""
    from pyspark_xgboost_spark.operators.similarity import (
        sim_search_greedy_graph,
    )

    rows = sim_search_greedy_graph(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.found_dist_q >= r.exact_dist_q  # exact is a lower bound
        assert 0 <= r.quality_milli <= 1000
        assert r.hit_top1 == (1 if r.found_id == r.exact_id else 0)
    # greedy on a connected small graph should find SOME true top-1s
    assert sum(r.hit_top1 for r in rows) >= 1




def _chk_bloom_incremental_contract(spark):
    """Zero false negatives (the Bloom guarantee), occupancy bounded
    by k*members and by m, and the measured FP rate within an order
    of magnitude of the (1 - e^(-kn/m))^k prediction."""
    import math

    from pyspark_xgboost_spark.streaming.stream import (
        _BLOOM_K,
        _BLOOM_M,
        stream_bloom_incremental,
    )

    r = stream_bloom_incremental(spark, SF_DIR).collect()[0]
    assert r.fn_count == 0
    assert 0 < r.n_bits_set <= min(_BLOOM_M, _BLOOM_K * r.n_members)
    pred = (1 - math.exp(-_BLOOM_K * r.n_members / _BLOOM_M)) ** _BLOOM_K
    assert r.fp_probe_hits / 200 <= max(10 * pred, 0.25)


def _chk_lorenz_curve_contract(spark):
    """Monotone cumulative shares ending at exactly one million, user
    counts near-equal across deciles, and curve below the diagonal
    (poorer deciles hold less than proportional mass)."""
    from pyspark_xgboost_spark.operators.relational import (
        events_lorenz_curve,
    )

    rows = sorted(
        events_lorenz_curve(spark, SF_DIR).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert rows[-1].cum_share_micro == 1_000_000
    shares = [r.cum_share_micro for r in rows]
    assert shares == sorted(shares)
    assert max(r.n_users for r in rows) - min(r.n_users for r in rows) <= 1
    # Lorenz curve under the diagonal — against CUMULATIVE USER share
    # (ntile front-loads remainder rows, so tiles are not exactly 10%)
    total_users = sum(r.n_users for r in rows)
    cum_users = 0
    for r, s in zip(rows[:-1], shares[:-1]):
        cum_users += r.n_users
        assert s <= cum_users * 1_000_000 // total_users + 1


def _chk_hard_negatives_are_hard(spark):
    """Every mined negative respects the lexical ceiling, anchors get
    at most k negatives ranked by cosine, and each negative is more
    similar than the median random candidate (it is actually hard)."""
    from pyspark_xgboost_spark.operators.similarity import (
        _HN_JAC_MAX,
        _HN_K,
        sample_hard_negatives_ann,
    )

    rows = sample_hard_negatives_ann(spark, SF_DIR).collect()
    assert rows
    by_anchor = {}
    for r in rows:
        assert r.jac_milli < _HN_JAC_MAX
        assert 1 <= r.rk <= _HN_K
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for negs in by_anchor.values():
        cs = [r.cos_sim for r in sorted(negs, key=lambda r: r.rk)]
        assert cs == sorted(cs, reverse=True)




def _chk_rsi_cutler_bounds_and_flat_convention(spark):
    """RSI is a valid [0, 1e6] micro ratio emitted only on full
    frames; gain/loss reconcile with the ratio."""
    from pyspark_xgboost_spark.operators.temporal import (
        _RSI_N,
        window_rsi_cutler,
    )

    rows = window_rsi_cutler(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.rsi_micro <= 1_000_000
        assert r.gain >= 0 and r.loss >= 0
        if r.gain + r.loss:
            assert r.rsi_micro == r.gain * 1_000_000 // (r.gain + r.loss)
        else:
            assert r.rsi_micro == 500_000


def _chk_katz_vs_pagerank_degree_blindness(spark):
    """Katz >= base for every node (paths only add), equals base
    exactly for isolated-in-degree nodes, and the score set is NOT a
    monotone transform of PageRank (degree normalization differs)."""
    from pyspark_xgboost_spark.operators.graph import (
        _KATZ_SCALE,
        graph_katz_centrality,
        graph_pagerank_fixed,
    )

    kz = {r.doc_id: r.katz_nano for r in graph_katz_centrality(spark, SF_DIR).collect()}
    pr = {r.doc_id: r.pagerank_nano for r in graph_pagerank_fixed(spark, SF_DIR).collect()}
    assert set(kz) == set(pr)
    assert all(v >= _KATZ_SCALE for v in kz.values())
    ks = sorted(kz, key=lambda d: (kz[d], d))
    ps = sorted(pr, key=lambda d: (pr[d], d))
    assert ks != ps  # the orderings genuinely differ


def _chk_lrs_matches_python_bruteforce(spark):
    """LRS length must equal a brute-force longest-repeat search on a
    sample of documents (capped), and the witness must occur >= twice."""
    from pyspark_xgboost_spark.operators.text import (
        _LRS_CAP,
        text_longest_repeated_substring,
    )
    from pyspark_xgboost_spark.sources import load_table

    got = {
        r.doc_id: r
        for r in text_longest_repeated_substring(spark, SF_DIR).collect()
    }
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(15)
        .collect()
    )
    for d in docs:
        t = d.text
        best = 0
        seen = {}
        # brute force: longest l such that some l-gram repeats
        for ln in range(min(_LRS_CAP, len(t) - 1), 0, -1):
            grams = set()
            found = False
            for p in range(len(t) - ln + 1):
                g = t[p : p + ln]
                if g in grams:
                    found = True
                    break
                grams.add(g)
            if found:
                best = ln
                break
        r = got[d.doc_id]
        assert r.lrs_len == best, (d.doc_id, r.lrs_len, best)
        if best:
            # overlapping occurrences count (str.count is non-overlapping)
            n_occ = sum(
                t[i : i + best] == r.lrs for i in range(len(t) - best + 1)
            )
            assert n_occ >= 2




def _chk_cross_source_contamination_contract(spark):
    """Containment is a valid micro ratio with shared <= min side,
    symmetric pair keying (src_a < src_b), and the digest join shape
    carries no cartesian."""
    from pyspark_xgboost_spark.operators.corpus import (
        corpus_cross_source_contamination,
    )

    out = corpus_cross_source_contamination(spark, SF_DIR)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_shared <= min(r.n_grams_a, r.n_grams_b)
        assert 0 < r.containment_micro <= 1_000_000
    assert "CartesianProduct" not in plan_of(out)


def _chk_atr_matches_python(spark):
    """ATR must equal a python recompute of the candle/true-range
    pipeline (gap days included via prev close)."""
    from collections import defaultdict

    from pyspark_xgboost_spark.operators.temporal import (
        _ATR_N,
        window_atr_true_range,
    )
    from pyspark_xgboost_spark.sources import load_table

    got = {
        (r.event_type, r.day_idx): r
        for r in window_atr_true_range(spark, SF_DIR).collect()
    }
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "event_type",
            "datediff(cast(ts as date), date '1970-01-01') as d",
            "cast(round(value * 100) as bigint) as cents",
            "ts",
            "event_id",
        )
        .collect()
    )
    candles = defaultdict(dict)
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        c = candles[r.event_type].setdefault(
            r.d, {"hi": r.cents, "lo": r.cents, "cl": r.cents}
        )
        c["hi"] = max(c["hi"], r.cents)
        c["lo"] = min(c["lo"], r.cents)
        c["cl"] = r.cents  # sorted by (ts, event_id): last write wins
    for et, days in candles.items():
        ds = sorted(days)
        trs = []
        for i, d in enumerate(ds):
            c = days[d]
            if i == 0:
                tr = c["hi"] - c["lo"]
            else:
                pc = days[ds[i - 1]]["cl"]
                tr = max(c["hi"] - c["lo"], abs(c["hi"] - pc), abs(c["lo"] - pc))
            trs.append(tr)
            if i + 1 >= _ATR_N:
                win = trs[i - _ATR_N + 1 : i + 1]
                g = got[(et, d)]
                assert g.true_range_cents == tr
                assert g.atr_milli_cents == sum(win) * 1000 // len(win)


def _chk_entropy_rate_bounds(spark):
    """0 <= H(w_t | w_{t-1}) <= ln(vocab) per source, and the
    numerator/denominator convention divides to nats."""
    import math

    from pyspark_xgboost_spark.operators.corpus import (
        corpus_entropy_rate_bigram,
    )

    rows = corpus_entropy_rate_bigram(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        h = r.entropy_num_unats / r.entropy_den / 1e6
        assert 0 <= h <= math.log(max(2, r.n_distinct_bigrams))
        assert r.entropy_den == r.n_bigrams




def _chk_anova_weekday_matches_python(spark):
    """F statistic must match a python recompute from the daily grid
    (including the dow-label-agnostic grouping)."""
    import math
    from collections import defaultdict

    from pyspark_xgboost_spark.operators.relational import (
        agg_anova_weekday_effect,
    )
    from pyspark_xgboost_spark.sources import load_table

    r = agg_anova_weekday_effect(spark, SF_DIR).collect()[0]
    ev = (
        load_table(spark, SF_DIR, "events")
        .selectExpr(
            "datediff(cast(ts as date), date '1970-01-01') as d",
            "dayofweek(cast(ts as date)) as dow",
            "cast(round(value * 100) as bigint) as cents",
        )
        .collect()
    )
    daily = defaultdict(int)
    dows = {}
    for e in ev:
        daily[e.d] += e.cents
        dows[e.d] = e.dow
    groups = defaultdict(list)
    for d, y in daily.items():
        groups[dows[d]].append(y)
    n = len(daily)
    k = len(groups)
    st = sum(daily.values())
    ssb = sum(sum(g) ** 2 / len(g) for g in groups.values()) - st**2 / n
    ssw = sum(y * y for y in daily.values()) - sum(
        sum(g) ** 2 / len(g) for g in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.n_days, r.n_groups) == (n, k)
    assert r.f_stat_milli == math.floor(f * 1000)
    assert r.weekday_effect_95 == (1 if f > 2.51 else 0)


_R12_CHECKS = [
    _chk_anova_weekday_matches_python,
    _chk_cross_source_contamination_contract,
    _chk_atr_matches_python,
    _chk_entropy_rate_bounds,
    _chk_rsi_cutler_bounds_and_flat_convention,
    _chk_katz_vs_pagerank_degree_blindness,
    _chk_lrs_matches_python_bruteforce,
    _chk_bloom_incremental_contract,
    _chk_lorenz_curve_contract,
    _chk_hard_negatives_are_hard,
    _chk_max_drawdown_matches_python,
    _chk_sq8_eval_contract,
    _chk_greedy_graph_descent_monotone,
    _chk_did_reads_same_experiment_as_cuped,
    _chk_theil_decomposition_adds_up,
    _chk_weighted_jaccard_bounds_and_repetition_sensitivity,
    _chk_readability_matches_python,
    _chk_zip_eocd_search_is_genuine,
    _chk_poisson_rate_shift_matches_binomial,
    _chk_random_walks_are_genuine_walks,
    _chk_markov_attribution_contract,
    _chk_tiff_walk_is_genuine,
    _chk_mg_incremental_guarantees,
    _chk_markov_stationary_conserves_mass,
    _chk_cdc_chunks_conserve_and_resync,
    _chk_stream_ivf_incremental_is_batch_identical,
    _chk_stream_cc_incremental_matches_batch_cc,
    _chk_mp4_walk_is_genuine,
]


def test_r12_contracts_pooled(spark):
    from tests.conftest import run_pooled

    run_pooled(spark, _R12_CHECKS)
