#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB on the same parquet views the driver
uses — the single-process comparison row for BENCH_NOTES.md.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [spark_bench.json]

DuckDB timings are the MIN of 5 runs. Min, not median: host contention
is strictly additive noise, so the minimum estimates the uncontended
time and — unlike the median, which drifts ±10% when load shifts
between whole invocations — lands floor-straddling queries stably on
one side of the 50 ms floor run after run. (The r11 "(floor~)"
hysteresis band existed solely to absorb that median flicker; with a
stable estimator it is retired.) With a Spark bench JSON as the third
arg, prints the per-query RATIOS table on the oracle-comparable subset
and flags every query over the 2x-of-DuckDB bar. The Spark side of the
flag/cap logic uses the bench's min-of-runs map ("queries_min", r13+)
for the SAME reason the DuckDB side uses min-of-5 — median-vs-min was
asymmetric under contention and flickered waiver-boundary queries
across the bar with zero code change; the median map still prints and
still carries the headline total. Exceptions to the 2x bar:

- (floor): DuckDB < 50 ms — the ratio measures planning constants, not
  data processing, on both sides;
- (constant): the Spark excess over DuckDB is under 0.35 s — within
  Spark's fixed multi-stage scheduling overhead at local[32]/32
  partitions (measured: pure-map queries run 0.09-0.13 s regardless of
  work; each shuffle stage adds ~0.1 s — see BENCH_NOTES rounds 3-4,
  incl. sf0.01-vs-sf0.1 scaling evidence that these queries are
  constant-dominated);
- EXPLAINED: documented rows where the comparison is semantically
  lopsided (the oracle states a query's output CONTRACT, not the same
  work) or measured constant-dominated — each carries its one-line
  justification AND a max absolute Spark time. The cap is checked
  INDEPENDENTLY of the floor/constant waivers (before them, and even
  when the ratio is under the bar): a query whose absolute time blows
  its cap re-flags no matter which waiver would otherwise hide it.

The Spark JSON must be the Bench "total_detail" line (the full per-query
map), NOT the compact "total" headline line — the headline subset covers
~28 queries and would silently shrink the gate to a quarter of the
surface, so a comparable-subset floor (MIN_COMPARABLE) enforces this.

Exits 1 on: a NEW unexplained >2x row, an EXPLAINED row over its cap, a
non-positive Spark time (a query that crashed every bench run), or a
comparable subset smaller than MIN_COMPARABLE.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

RUNS = 5              # duck time = min of RUNS (see module docstring)
DUCK_FLOOR_S = 0.05   # below this, the ratio measures planning constants
CONSTANT_S = 0.35     # Spark fixed multi-stage scheduling overhead bound
RATIO_BAR = 2.0
MIN_COMPARABLE = 80   # enforced floor; oracle subset is ~111, headline ~31

# EXPLAINED caps and CONSTANT_S are calibrated in ABSOLUTE seconds at
# sf0.1 (the driver's gate SF). For runs at a different SF set
# GRAFT_CAP_SCALE (e.g. 10 for sf1): it multiplies every EXPLAINED cap
# and the constant bound so the waivers keep their sf0.1 meaning instead
# of silently re-flagging constant-dominated queries whose DATA term
# grew as designed. The default (1.0) leaves the driver-facing sf0.1
# gate untouched.
CAP_SCALE = float(os.environ.get("GRAFT_CAP_SCALE", "1.0"))

# Pure tripwires: absolute min-basis caps for queries whose DuckDB oracle
# sits permanently at the sub-50ms floor (audit harnesses whose oracle
# recomputes an integer contract in ~ms), so the ratio rules can NEVER
# flag them — without a cap a 100x regression would sail through on the
# floor waiver. Unlike EXPLAINED entries these waive NOTHING: they can
# only add flags. name -> (max Spark min-of-runs seconds, note).
ABS_CAPS = {
    "ann_ivf_recall": (6.0, "recall audit: brute top-k on a 25% sample + "
        "full IVF path; duck oracle is a ~1 ms integer contract, ratio "
        "rules blind by construction"),
    "ann_ivfpq_recall": (9.0, "recall audit: brute top-k on a 25% sample + "
        "full IVF-PQ path (train, encode, ADC, re-rank); min 2.6 s r13"),
}

# name -> (max Spark seconds before the waiver expires, justification).
# Caps are ~3x the measured warm sf0.1 time: generous enough for host
# contention, tight enough that a real regression (10x growth) re-flags.
# r13 on: both the 2x ratio and these caps are checked against the
# bench's min-of-runs map (estimator symmetry with the duck min-of-5).
EXPLAINED = {
    "dd_simhash_contains": (15.0, "invariant harness: Spark runs the full "
        "simhash pipeline PLUS the fingerprint join; the oracle computes "
        "only the fingerprint-pair contract"),
    "f4_nest_explode_roundtrip": (4.0, "roundtrip query: Spark builds the "
        "nested form (2 collect_list shuffles) then explodes it back; the "
        "oracle is the flat join the roundtrip must reproduce"),
    "tpch_q10": (4.0, "constant-dominated at this SF: 1.04 s @sf0.01 vs "
        "1.30 s @sf0.1 warm (10x data, +25% time)"),
    "tpch_q18": (4.0, "constant-dominated: 0.89 s @sf0.01 vs 1.23 s @sf0.1 warm"),
    "ta_bm25": (4.0, "constant-dominated 5-stage pipeline: 0.94 s @sf0.01 "
        "vs 1.24 s @sf0.1 warm"),
    # the next three sit at the DuckDB 50 ms floor boundary and flip to
    # flags only when host contention inflates the DuckDB sample; all are
    # measured constant-dominated (warm, 10x data):
    "tpch_q3": (5.0, "constant-dominated: 1.34 s @sf0.01 vs 1.52 s @sf0.1 warm"),
    "tpch_q5": (5.0, "constant-dominated: 1.25 s @sf0.01 vs 1.69 s @sf0.1 warm"),
    "ta_bigram_lm": (3.0, "constant-dominated: 0.63 s @sf0.01 vs 1.02 s @sf0.1 warm"),
    "ta_pmi_pairs": (2.5, "constant-dominated two-hash-agg + broadcast: "
        "0.72 s @sf0.01 vs 0.80 s @sf0.1 warm (10x data, +11%); output is "
        "vocabulary-shaped (900 vs 927 rows)"),
    "ta_tfidf_topk": (3.5, "constant-dominated tf/df aggs + per-doc top-k "
        "window: 0.87 s @sf0.01 vs 1.22 s @sf0.1 warm (10x data, +40%)"),
    "ta_label_prop": (6.0, "iteration constants dominate: 3 unrolled "
        "join+agg+window LPA rounds over the shared-chunk graph; 2.58 s "
        "@sf0.01 vs 2.22 s @sf0.1 warm (flat on 10x data) — same family "
        "as ta_pagerank's round constants"),
    "ta_quality_classifier": (2.5, "constant-dominated 4-stage train+score "
        "pipeline: 0.67 s @sf0.01 vs 0.83 s @sf0.1 warm (10x data, +24%)"),
    "dd_intra_repeat": (2.0, "constant-dominated explode+2-window+fold: "
        "0.52 s @sf0.01 vs 0.70 s @sf0.1 warm (+35%)"),
    "dd_tf_cosine": (3.0, "constant-dominated 5-stage inverted-index "
        "pipeline (tf agg, norms agg, token self-join, pair agg, 2 "
        "broadcast re-attaches): 2.06 s @sf0.01 vs 2.05 s @sf0.1 warm "
        "(10x data, +0%, loaded host)"),
    "dd_tf_cosine_prefix": (8.0, "constant-dominated 7-stage AllPairs/L2AP "
        "filter stack (tf agg, window bounds, candidate join, SortedDot "
        "verify): 1.72 s @sf0.01 vs 5.32 s @sf0.1 warm; the SCALE win is "
        "the point — sf1 warm 14.4 s vs the brute twin's 21.0 s, growth "
        "2.7x vs 9.8x for 10x data (BENCH_NOTES r10); oracle is the brute "
        "SQL by design (shared with dd_tf_cosine, proves losslessness)"),
    "ta_dsir_sample": (2.0, "constant-dominated 3-join/2-agg stack: "
        "0.56 s @sf0.01 vs 0.59 s @sf0.1 warm (+5%); sf1 grows 3.1x, "
        "sub-linear (BENCH_NOTES r7)"),
    "w15_funnel": (2.0, "constant-dominated as-of window + min_by fold: "
        "0.60 s @sf0.01, 0.81 s @sf0.1, 0.95 s @sf1 warm (100x data, "
        "+58% time)"),
    "w14_scd2_intervals": (2.0, "constant-dominated 2-window gaps-and-"
        "islands + fold: 0.66 s @sf0.01 vs 0.96 s @sf0.1 warm (+45%); "
        "sf1 bench 1.33 s, sub-linear"),
    "j13_bloom_semi": (3.0, "constant-dominated bloom-build + scalar-"
        "subquery prefilter + semi join: 0.81 s @sf0.01 vs 1.03 s @sf0.1 "
        "warm (+27%; r8 added a build-side COUNT pass that sizes the "
        "sketch — the r7 advisory fix); the bloom stage exists to SAVE "
        "shuffle at scale, its build is pure constant at toy SF"),
    "w12_dist_bucketed": (2.0, "audit gate: Spark computes BOTH the exact "
        "ntile(4) anchor and the percentile_approx buckets to measure "
        "agreement; the oracle recomputes the count contract in ~ms. "
        "0.62 s @sf0.01 vs 0.60 s @sf0.1 warm — pure constant"),
    "p11_variant_path": (2.5, "constant-dominated: 0.43 s @sf0.01 vs 0.69 s @sf0.1 warm"),
    # semantically lopsided audit harnesses (previously rode the 50 ms
    # floor waiver — explicit caps so a real regression re-flags):
    "ann_ivf_recall": (6.0, "recall audit: Spark runs brute-force top-k on "
        "a 25% sample PLUS the full IVF path; the oracle recomputes the "
        "integer pair-count contract in ~ms"),
    "ann_ivfpq_recall": (12.0, "recall audit: Spark runs brute-force top-k "
        "on a 25% sample PLUS the full IVF-PQ path (codebook training, "
        "encode, ADC, re-rank); the oracle recomputes the integer "
        "pair-count contract in ~ms. Measured 6.8 s warm @sf0.1"),
    "mm_image_decode": (5.0, "codec harness: Spark encodes AND decodes 500 "
        "PNGs through javax.imageio; the oracle recomputes dims/means "
        "arithmetically from doc_id"),
    "sk_kmv_intersect": (3.5, "audit gate: Spark builds BOTH the exact "
        "set algebra and the two KMV sketches (plus the theta-trim "
        "estimate); the oracle recomputes only the exact face. "
        "0.91 s @sf0.01 vs 1.14 s @sf0.1 warm (10x data, +25%)"),
    # tiny queries sitting 0.0-0.15 s over the CONSTANT_S bound under host
    # contention (flip to FLAG on a loaded host, pass on a quiet one —
    # waiver-boundary brittleness, not a perf problem; plans verified:
    # partial agg / pruned scan / window dedup / broadcast NLJ). Caps ~3x
    # the measured warm sf0.1 time:
    "a1_sum_groupby": (1.5, "constant-dominated: 0.42 s warm @sf0.1, "
        "partial-agg plan; excess over DuckDB is scheduling constant"),
    "s11_zorder_stats": (1.5, "constant-dominated: 0.50 s warm @sf0.1 "
        "(0.51 s @sf0.01), single scan + 8-term bitwise interleave "
        "projection + partial agg"),
    "p1_json_path": (2.0, "constant-dominated: 0.57 s warm @sf0.1, pruned "
        "single-column JSON scan"),
    "w1_latest_snapshot": (1.5, "constant-dominated: 0.48 s warm @sf0.1, "
        "single window-dedup shuffle"),
    "ann_topk_brute": (1.5, "constant-dominated: 0.50 s warm @sf0.1, "
        "broadcast NLJ + TakeOrdered; DuckDB sample sits at its floor"),
    "dd_chunk_neardup": (7.0, "2x-bar straddler under host noise: Spark "
        "1.91/2.09/2.42 s warm @sf0.1 across three same-tree invocations "
        "vs DuckDB 1.08-1.19 s -> ratio flickers 1.61-2.25x with zero "
        "code change; banded chunk-minhash plan unchanged since r7"),
    "tpch_q20": (2.5, "floor-straddling + constant-dominated: DuckDB "
        "min-of-5 flickers 0.040-0.058 s across whole invocations (the "
        "r11 (floor~) band's documented flicker case); Spark 0.82 s warm "
        "@sf0.1 is the chained-semi-join pipeline's scheduling constant"),
    "ta_domain_shift": (2.0, "floor-straddling: DuckDB 0.037-0.059 s "
        "across invocations; Spark 0.52 s warm @sf0.1 — two "
        "vocabulary-shaped hash aggs + a broadcast spine, pure constants"),
    "u5_except_all": (1.5, "floor-straddling: DuckDB 0.040-0.054 s across "
        "invocations; Spark 0.44 s warm @sf0.1 — one exceptAll shuffle, "
        "pure constants"),
    "ann_knn_classify": (2.5, "constant-dominated: 0.78 s @sf0.01 vs "
        "0.81 s @sf0.1 warm (10x data, +4%); rides ann_topk_brute's "
        "broadcast scorer plus a vote agg + argmax window over 50 queries"),
    "ann_margin_pairs": (4.0, "constant-dominated: 0.92 s @sf0.01 vs "
        "0.99 s @sf0.1 warm (10x data, +8%); TWO brute passes by "
        "definition (forward + backward neighborhoods) + two rank-ordered "
        "folds — the margin criterion's cost, not a plan defect"),
    "s12_snapshot_diff": (2.5, "constant-dominated: 0.44 s @sf0.01 vs "
        "0.73 s @sf0.1 warm (10x data, +66%); full-outer merge of two "
        "(key, fp) snapshot fingerprints — the shuffle moves 2 columns "
        "(PlanGuard-pinned), the excess is 3-stage scheduling constants"),
    "ta_phrase_search": (3.5, "constant-dominated: 0.71 s @sf0.01 vs "
        "1.10 s @sf0.1 warm (10x data, +55%); zero-exchange narrow trigram "
        "stream read twice (top-1 count + broadcast probe), one agg "
        "exchange total (PlanGuard-pinned)"),
    "w11_sessionize": (1.5, "constant-dominated: 0.49 s warm @sf0.1, "
        "single-exchange window+rollup plan; DuckDB sample (0.041 s) sits "
        "at the floor boundary and the Spark excess is the 3-stage "
        "scheduling constant"),
    "o6_grouped_topk": (1.5, "constant-dominated: 0.48 s warm @sf0.1, "
        "two-phase salted top-k (two window stages by design); DuckDB "
        "sample (0.034 s) sits at the floor boundary like w11"),
    "p10_latest_tuple": (1.5, "constant-dominated: 0.37-0.42 s warm "
        "@sf0.1, one groupBy+join; DuckDB sample straddles the 50 ms "
        "floor (0.033-0.053 s) so the excess flips the constant rule by "
        "~0.01 s under load [waiver added r5 from contended-host "
        "measurement, not a code change in r5]"),
    "tpch_q1": (1.5, "constant-dominated: 0.31-0.45 s warm @sf0.1, "
        "single partial-agg plan (plan-guarded); excess over DuckDB "
        "crosses the 0.35 s constant bound by <0.03 s under load "
        "[waiver added r5 from contended-host measurement, not a code "
        "change in r5]"),
    "ta_e2e_pipeline": (2.5, "constant-dominated 4-stage composition "
        "(gate, fp-dedup window, broadcast anti-join, split) over the "
        "5k-row documents table: 0.71 s warm @sf0.1 is ~4 stage "
        "constants; DuckDB runs the same contract in 0.12 s in-process"),
    "dd_chunk_dedup": (1.5, "constant-dominated 3-stage plan (explode, "
        "fp group, label join) over ~16k chunk rows: 0.44 s warm @sf0.1; "
        "DuckDB sample 0.07 s sits just over the floor so the ~0.37 s "
        "excess crosses the 0.35 s constant bound [waiver added r6 with "
        "the query itself]"),
    # round-6's late TPC-H wave, measured r7 (warm, 10x data sf0.01 ->
    # sf0.1): every one sublinear — the excess over DuckDB is the 5-8
    # broadcast-join/agg stage constants, not a data term. Plans verified:
    # dims broadcast, semi/anti joins, decorrelated subqueries
    # (PlanGuardSpec pins q9/q17/q21).
    "tpch_q2": (6.0, "constant-dominated: 1.31 s @sf0.01 vs 1.87 s @sf0.1 "
        "warm (+43% on 10x data); 8-stage min-cost-supplier plan, all "
        "dims broadcast"),
    "tpch_q7": (4.0, "constant-dominated: 0.70 s @sf0.01 vs 1.30 s @sf0.1 "
        "warm; volume-shipping double dim join, both sides broadcast"),
    "tpch_q8": (4.0, "constant-dominated: 0.79 s @sf0.01 vs 1.20 s @sf0.1 "
        "warm; market-share two-level agg over broadcast dims"),
    "tpch_q9": (3.0, "constant-dominated: 0.61 s @sf0.01 vs 0.90 s @sf0.1 "
        "warm; profit agg, dims broadcast (plan-guarded)"),
    "tpch_q12": (2.0, "constant-dominated: 0.32 s @sf0.01 vs 0.67 s "
        "@sf0.1 warm; single shipmode agg join"),
    "ta_vocab_topk": (2.0, "constant-dominated: 0.33 s @sf0.01 vs 0.54 s "
        "@sf0.1 warm; coverage curve is a k-row (k=31) broadcast "
        "self-join, bounded by k^2 pairs"),
    "tpch_q21": (4.5, "single-pass rewrite r7 (one lineitem exchange, "
        "plan-guarded): 0.62 s @sf0.01 vs 1.56 s @sf0.1 warm; remaining "
        "excess over DuckDB (0.24 s) is the semi-join + final-agg stage "
        "constants on a real but sublinear data term"),
    # two r6-era queries whose stable warm times on the driver host sit
    # just over the 0.35 s constant bound (passed on the quieter judge
    # host r6; driver r6 detail and r7 re-measure agree to the ms):
    "f2_combo_union": (1.5, "constant-dominated: 0.48 s @sf0.01 vs 0.49 s "
        "@sf0.1 warm (flat on 10x data); the query IS the 4-branch "
        "union idiom (one filtered events scan per combo, reference's "
        "Jinja loop), so its floor is 4 scan-stage constants"),
    # r10: five pre-existing queries whose DuckDB sample left the 50 ms
    # floor / whose Spark excess crossed the 0.35 s constant bound on the
    # contended driver host (all flat-to-sublinear on 10x data, measured
    # r10 warm QueryTime run2 at both SFs), plus the one new r10 query
    # that flagged (ta_calibration):
    "ta_rolling_fp_contains": (1.5, "invariant harness: Spark computes "
        "the rolling Rabin-Karp fingerprints PLUS the contains join; the "
        "oracle recomputes only the contains contract. 1.26 s @sf0.01 vs "
        "0.93 s @sf0.1 warm — flat on 10x data, pure stage constants"),
    "tpch_q15": (1.5, "constant-dominated: 1.09 s @sf0.01 vs 0.94 s "
        "@sf0.1 warm (flat on 10x data); top-revenue-supplier max-join "
        "over a shared quarter-revenue subplan"),
    "tpch_q16": (1.5, "constant-dominated: 0.57 s @sf0.01 vs 0.75 s "
        "@sf0.1 warm (+32% on 10x data); distinct-agg over part attrs "
        "with broadcast anti-join on excluded suppliers"),
    "tpch_q17": (2.0, "constant-dominated: 0.60 s @sf0.01 vs 0.64 s "
        "@sf0.1 warm (+7% on 10x data); per-part avg subquery + "
        "broadcast join (plan-guarded, no recompute per row)"),
    "ta_bpe_pairs": (1.5, "constant-dominated: 0.33 s @sf0.01 vs 0.49 s "
        "@sf0.1 warm (+48% on 10x data); adjacent-pair counts collapse "
        "to the ~82-row symbol-pair vocabulary immediately after the "
        "partial agg, so post-shuffle cost is vocabulary-, not "
        "corpus-sized"),
    "ta_calibration": (2.0, "constant-dominated: 0.45 s @sf0.01 vs "
        "0.60 s @sf0.1 warm (+33% on 10x data); classifier "
        "reliability-diagram decile groupBy, k-row output; sf1 bench "
        "2.50 s — sub-linear [waiver added r10 with the query itself]"),
    "j6_theta_residual": (2.0, "constant-dominated: 0.47 s @sf0.01 vs "
        "0.56 s @sf0.1 warm (+20% on 10x data); equi-join with OR "
        "residual, two exchanges + probe stage constants"),
    # nhl_* (r12): the Spark side runs the LIVE production model over the
    # bronze payload shape; the oracle re-derives values from the raw
    # tables by the algebraic shortcut (no nesting, no snapshot window) —
    # plus the usual multi-stage constants at toy SF. All measured warm,
    # constant-dominated on 10x data:
    "nhl_stg_games": (2.0, "live bronze nesting (collect_list payloads) + "
        "latest-snapshot window vs the oracle's direct orders projection; "
        "1.13 s @sf0.01 vs 0.70 s @sf0.1 warm (flat on 10x data)"),
    "nhl_dim_player": (2.0, "constant-dominated min_by hash agg over the "
        "materialized staging: 1.27 s @sf0.01 vs 0.84 s @sf0.1 warm (flat "
        "on 10x data)"),
    "nhl_team_shots_against_pos": (3.0, "constant-dominated agg + "
        "side-swap self-join + 3 windows: 1.70 s @sf0.01 vs 1.75 s "
        "@sf0.1 warm (flat on 10x data)"),
    "nhl_team_shot_locations": (2.0, "two grouping passes (offense + "
        "defense contexts) + union: 0.35 s @sf0.01 vs 0.91 s @sf0.1 warm "
        "(10x data, sub-linear)"),
    "nhl_crosswalk": (4.5, "the live 3-strategy cascade (2 anti-joins, 3 "
        "matcher joins, ambiguity window) over materialized name tables; "
        "constant-dominated at toy SF — 2.75 s @sf0.1 warm, and the name "
        "tables grow with vocabulary, not corpus"),
    "nhl_sog_props_v2": (6.0, "the live 8-stage v2 pipeline (best-line "
        "window, pivot, crosswalk + fuzzy fallback windows, roster + "
        "actuals joins): 3.61 s @sf0.1 warm vs the oracle's ~2.8 s "
        "re-derivation; stage constants dominate the 1.3x gap"),
    "ta_kn_trigram": (2.0, "constant-dominated 6-stage KN stack (2 hash "
        "aggs, 2 windows, join, broadcast V): 0.97 s @sf0.01 vs 0.76 s "
        "@sf0.1 warm (flat on 10x data; output is vocabulary-shaped)"),
}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        samples = []
        try:
            for _ in range(RUNS):
                t0 = time.monotonic()
                con.execute(oracle[name]).fetchall()
                samples.append(time.monotonic() - t0)
            times[name] = min(samples)
        except Exception as e:  # noqa: BLE001
            print(f"[duck] {name}: ERROR {e}")
    total = sum(times.values())
    print(json.dumps({"duck_total": round(total, 3), "runs": RUNS,
                      "queries": {k: round(v, 4) for k, v in times.items()}}))
    if len(sys.argv) > 3:
        bench = json.load(open(sys.argv[3]))
        spark = bench["queries"]
        # flag/cap logic runs on min-of-runs when Bench provides it (r13+):
        # the DuckDB side below is already min-of-RUNS because contention is
        # additive noise and the min estimates the uncontended time — using
        # the MEDIAN on the Spark side made the ratio asymmetric (contention
        # inflates only one side) and was the measured source of
        # waiver-boundary flicker: the same tree flipped queries across the
        # 2x bar and their absolute caps with zero code change (r12 gate
        # history, BENCH_NOTES r13). Medians still print alongside.
        smin = bench.get("queries_min", spark)
        flagged = []
        # a non-positive time means the query crashed every bench run (old
        # Bench emitted -1 for those; current Bench omits them) — never let
        # a negative ratio sail under the bar
        bad = sorted(k for k, v in spark.items() if v <= 0)
        for k in bad:
            print(f"[ratios] {k}: FLAG non-positive Spark time {spark[k]} "
                  f"(query failed every bench run)")
            flagged.append(k)
        comp = sorted(k for k in set(times) & set(spark) if spark[k] > 0)
        if len(comp) < MIN_COMPARABLE:
            print(f"[ratios] FLAG: only {len(comp)} comparable queries "
                  f"(< {MIN_COMPARABLE}) — the gate must be fed Bench's "
                  f"total_detail line, not the compact headline line")
            sys.exit(1)
        st = sum(spark[k] for k in comp)
        sm = sum(smin[k] for k in comp)
        dt = sum(times[k] for k in comp)
        print(f"[cmp] {len(comp)} comparable: spark median {st:.1f}s "
              f"(min {sm:.1f}s) duck {dt:.1f}s "
              f"ratio {st/dt:.2f}x (min-basis {sm/dt:.2f}x)")
        print(f"[ratios] {'query':<28} {'s_med':>8} {'s_min':>8} {'duck':>8} {'ratio':>7}")
        for k in sorted(comp, key=lambda k: -(smin[k] / max(times[k], 1e-9))):
            r = smin[k] / max(times[k], 1e-9)
            mark = ""
            # EXPLAINED absolute cap first, independent of every ratio
            # waiver: a cap breach re-flags even when the floor/constant
            # rule (or a slow DuckDB sample) would hide the regression
            if k in EXPLAINED and smin[k] > EXPLAINED[k][0] * CAP_SCALE:
                cap, why = EXPLAINED[k]
                mark = (f"  <-- FLAG: over its {cap * CAP_SCALE}s EXPLAINED cap "
                        f"(waiver stale: {why})")
                flagged.append(k)
            elif k in ABS_CAPS and smin[k] > ABS_CAPS[k][0] * CAP_SCALE:
                cap, why = ABS_CAPS[k]
                mark = (f"  <-- FLAG: over its {cap * CAP_SCALE}s tripwire cap "
                        f"({why})")
                flagged.append(k)
            elif r > RATIO_BAR:
                if k in EXPLAINED:
                    cap, why = EXPLAINED[k]
                    mark = f"  (explained, cap {cap * CAP_SCALE}s: {why})"
                elif times[k] < DUCK_FLOOR_S:
                    mark = "  (floor)"
                elif smin[k] - times[k] < CONSTANT_S * CAP_SCALE:
                    mark = "  (constant)"
                else:
                    mark = "  <-- FLAG >2x UNEXPLAINED"
                    flagged.append(k)
            print(f"[ratios] {k:<28} {spark[k]:>8.3f} {smin[k]:>8.3f} "
                  f"{times[k]:>8.3f} {r:>6.2f}x{mark}")
        if flagged:
            print(f"[ratios] {len(flagged)} FLAGGED over {RATIO_BAR}x: {', '.join(flagged)}")
            sys.exit(1)
        print(f"[ratios] clean: no unexplained query over {RATIO_BAR}x "
              f"(floor {DUCK_FLOOR_S}s, constant bound {CONSTANT_S * CAP_SCALE}s, "
              f"{len(EXPLAINED)} capped waivers, {len(ABS_CAPS)} tripwire caps, "
              f"cap scale {CAP_SCALE}x)")


if __name__ == "__main__":
    main()
