"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (no per-trial arrays, so a bounded tail
capture always contains it whole):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
and writes the FULL payload (with `trials`) to BENCH_LOCAL.json at the
repo root.

Headline set: one representative per operator family, excluding the
deliberately-quadratic brute-force baselines (their scale paths are
benched instead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g_etl_spark.queries import queries as load_queries
from g_etl_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",      # scan + wide agg
    "q03_region_revenue",       # 5-way snowflake join, broadcast dims
    "q06_ordered_distinct_lists",  # collect_set rollup
    "q21_grid_polygon_objects",  # grid polyfill broadcast join + distinct
    "q22_grid_stats",           # grid stats rollup (h3_stats analogue)
    "q42_token_frequencies",    # explode + agg
    "q40_text_stats",           # array lambdas per row
    "q52_minhash_near_dups",    # LSH dedup pipeline
    "q60_cosine_topk",          # vector scan top-k
    "q71_multimodal_decode",    # mapInPandas decode path
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # captured BEFORE any Spark work: a loaded host at this instant is
    # EXTERNAL contention (the bench hasn't run anything yet), which
    # arms the per-set load-gated retries below; once the bench is
    # running, its own 32-thread bursts push the 1-min loadavg past
    # any fixed gate, so mid-run load alone cannot distinguish self-
    # load from contention (measured: a quiet-host sf0.001 run reads
    # 4.0 by its own tail)
    load_at_start = os.getloadavg()[0]
    spark = get_spark("g_etl_spark_bench")
    qs = load_queries()

    # Warmup: first-scan metadata, codegen, and the Python worker pool
    # all pay one-time costs; the metric should reflect steady-state
    # query latency (the baseline DuckDB numbers are steady-state too).
    from g_etl_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()
    import pyspark.sql.functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100).select(_warm("id")).count()

    # --- host calibration (r12 verdict item #1) --------------------------
    # Byte-identical code read 8.955 s (r11 judge) vs 12.35 s (r12 judge)
    # purely from CPU clock pinning (2100 MHz that session), so the raw
    # headline alone cannot distinguish a real regression from host
    # state. Record (a) the governor-reported CPU MHz and (b) a measured
    # trivial-job floor: a PRE-ANALYZED, fixed-size, whole-stage-codegen
    # integer fold over range() — no I/O, no Python, no shuffle beyond
    # the final single-row agg — whose wall time is proportional to
    # effective clock + scheduler overhead and independent of sf.
    # headline_normalized = headline / floor is the host-comparable
    # series. (BASELINE.md's r4 decomposition measured the same class
    # of job at ~160 ms cold-analyzed / ~10 ms pre-analyzed at the
    # trivial size; this 1024M-id fold mixes ~40 ms compute with ~20 ms
    # scheduling — BOTH scale with host speed, which is what the
    # normalization wants; min-of-7 repeats within ~±8% on a quiet
    # host.)
    def _cpu_mhz() -> float | None:
        try:
            vals = [
                float(ln.split(":")[1])
                for ln in open("/proc/cpuinfo")
                if ln.startswith("cpu MHz")
            ]
            return round(sum(vals) / len(vals)) if vals else None
        except (OSError, ValueError, IndexError):
            return None

    cpu_mhz_start = _cpu_mhz()
    _floor_df = spark.range(0, 1_024_000_000, 1, 32).select(
        F.sum((F.col("id") * 2654435761) % 1000003).alias("s")
    )
    _floor_df._jdf.queryExecution().executedPlan()  # bake the plan
    # warm (JIT the codegen'd stage) AND pin correctness: the fold is
    # pure integer arithmetic with one exact answer — id*K stays under
    # 2^63 at this size (at >=8G ids it wraps and the 'floor' silently
    # measures garbage, observed while sizing this)
    _v = _floor_df.collect()[0][0]
    assert _v == 512001028978971, f"floor job computed {_v}"

    # INTERLEAVED floor probes (r13 verdict item #4): a single run-start
    # probe varied 26% across r13's runs and became the dominant noise
    # term in headline_normalized. The floor is now the MEDIAN of the
    # per-probe minima from probes taken at run start, after the
    # headline families, and after the extended families — so a
    # transiently slow (or fast) host window at any one point cannot
    # own the calibration. Per-probe trials land in BENCH_LOCAL.json
    # (`floor_probes`).
    floor_probes: list[list[float]] = []

    # I/O floor (r14 verdict follow-up): the CPU-codegen floor alone
    # could not explain r14's host drift (floor FASTER while the
    # headline got slower — the headline adds I/O + Python workers).
    # Second calibration series: a PRE-ANALYZED fixed parquet
    # scan-and-count of the smallest stable table (customer: one file,
    # one row group) — measures the storage+decode path the integer
    # fold never touches. Recorded per probe group alongside the CPU
    # floor; purely additive payload fields (io_floor_sec,
    # io_floor_probes), existing fields unchanged.
    # The probe aggregates a REAL numeric column (not groupBy().count(),
    # which prunes every column so the vectorized reader returns only
    # row-group counts — that measured file-open/footer/scheduling, not
    # decode; r15 payload showed io_floor ≈ cpu floor for exactly this
    # reason). sum(c_acctbal) forces column materialization and zstd
    # decompression through the storage path. Field name unchanged;
    # the level shift vs r15 is documented in OPTIMIZATION_r16.md.
    _io_floor_df = spark.read.parquet(f"{sf_dir}/customer.parquet").agg(
        F.sum("c_acctbal")
    )
    _io_floor_df._jdf.queryExecution().executedPlan()  # bake the plan
    _io_floor_df.collect()  # warm codegen; page cache state is the host's
    io_floor_probes: list[list[float]] = []

    def probe_floor(n: int = 5) -> None:
        per = []
        for _ in range(n):
            t0 = time.time()
            _floor_df.collect()
            per.append(round(time.time() - t0, 4))
        floor_probes.append(per)
        io_per = []
        for _ in range(n):
            t0 = time.time()
            _io_floor_df.collect()
            io_per.append(round(time.time() - t0, 4))
        io_floor_probes.append(io_per)
        print(
            f"# floor probe {len(floor_probes)}: min={min(per)}s {per}"
            f" | io min={min(io_per)}s {io_per}",
            file=sys.stderr,
        )

    probe_floor(7)  # first probe keeps the r13 trial count
    print(f"# calibration: cpu_mhz={cpu_mhz_start}", file=sys.stderr)

    timings: dict[str, float] = {}
    trials_log: dict[str, list[float]] = {}
    # host-load provenance (r8 verdict item: two rounds of verdicts
    # litigated contention drift from SCALE_NOTES prose — the 1-min
    # loadavg now lands IN the JSON, captured before every trial set)
    loads_pre: dict[str, float] = {"_run_start": round(load_at_start, 2)}
    # Load-gated retry (r9 verdict item #3): when the host was ALREADY
    # loaded before the bench did any work (external contention — the
    # r9 driver run read 3.4-9.1 throughout and inflated every number
    # 8-15%), every trial set whose own pre-load exceeds the gate is
    # re-run once after it finishes — the union-best is recorded, plus
    # the retry's own pre-load, so transient contention self-corrects
    # and persistent contention is FLAGGED in the JSON instead of
    # silently inherited. On a quiet-at-start host retries stay
    # DISARMED: mid-run loadavg is dominated by the bench's own
    # 32-thread bursts, which would fire the gate on every late set.
    LOAD_GATE = 2.0
    retry_armed = load_at_start > LOAD_GATE
    load_retries: dict[str, dict] = {}
    # Floor-gated retry (r15 verdict item #1): the load gate is BLIND
    # to hypervisor CPU steal — r15's degradation ran with near-zero
    # in-VM load while the calibration floor swung 25x on byte-
    # identical code, and every committed number inherited it. The
    # floor probes DID catch it but gated nothing. Now: a cheap
    # pre-analyzed floor collect (best of 2, ~30 ms quiet) runs
    # immediately before every trial set; if it exceeds FLOOR_GATE
    # (quiet-host floors on this hardware class read 0.019-0.038 s
    # across r13-r15; r15's steal windows read 0.094-0.70 s) the set
    # is re-run once after it finishes and the union-best recorded —
    # same self-correct-or-flag contract as the load gate, and the
    # per-set quick-floor series lands in the payload so the judge
    # can see WHICH sets ran degraded. Additions-only: base trial
    # counts, cache clearing, and the timed regions are unchanged
    # (the quick floor runs outside every timed window).
    FLOOR_GATE = 0.08
    floor_retries: dict[str, dict] = {}
    floor_pre: dict[str, float] = {}

    def quick_floor() -> float:
        best = None
        for _ in range(2):
            t0 = time.time()
            _floor_df.collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    def run_trial_set(run, n, clear_cache=True):
        best, per, out = None, [], None
        for _ in range(n):
            if clear_cache:
                # drop operator-internal persists (q52's signature
                # barrier) so every trial measures FRESH compute
                spark.catalog.clearCache()
            t0 = time.time()
            out = run()
            dt = time.time() - t0
            per.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        return best, per, out

    def measure(name, run, n):
        load0 = os.getloadavg()[0]
        loads_pre[name] = round(load0, 2)
        qf0 = quick_floor()
        floor_pre[name] = qf0
        best, per, out = run_trial_set(run, n)
        if retry_armed and load0 > LOAD_GATE:
            load1 = os.getloadavg()[0]
            best2, per2, out = run_trial_set(run, n)
            load_retries[name] = {
                "load_pre_retry": round(load1, 2),
                "still_loaded": load1 > LOAD_GATE,
            }
            per = per + per2
            best = min(best, best2)
        if qf0 > FLOOR_GATE:
            qf1 = quick_floor()
            best2, per2, out = run_trial_set(run, n)
            floor_retries[name] = {
                "floor_pre_retry": qf1,
                "still_degraded": qf1 > FLOOR_GATE,
            }
            per = per + per2
            best = min(best, best2)
        trials_log[name] = per
        return round(best, 3), out

    # Per-query trial counts: 3 is the protocol default; the LSH
    # pipeline gets 5 because its JIT tail converges only at trial
    # 3-4 (measured fresh-session series at sf0.1:
    # 9.2/6.4/5.5/5.1/5.4/5.1 s — best-of-3 can land on a
    # still-converging 6.5 s, which is exactly what BENCH_r03
    # recorded; the r2->r3 "regression" was this artifact, see
    # SCALE_NOTES.md).
    TRIALS = {"q52_minhash_near_dups": 5}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        # best-of-N: first executions pay one-time codegen/JIT per
        # query shape; steady-state latency is the comparable number
        # (the reference baseline is a warm repeated query too).
        # Per-trial times land in the JSON (`trials`) so measurement
        # spread is distinguishable from a real regression.
        best, rows = measure(
            name, lambda: fn(spark, sf_dir).collect(), TRIALS.get(name, 3)
        )
        timings[name] = best
        total += best
        print(
            f"# {name}: {len(rows)} rows in {best:.2f}s {trials_log[name]}",
            file=sys.stderr,
        )

    probe_floor()  # interleaved probe #2: after the headline families

    # Hot polygon query — the reference's published benchmark shape
    # (H3_POLYGON_ANALYSIS.md:318-321: prebuilt warehouse, repeated
    # 2x2 km polygon query, ~50 ms DuckDB): index materialized once
    # (cached), then the broadcast cell join + distinct measured warm.
    import pyspark.sql.functions as F

    from g_etl_spark.functions import grid as G
    from g_etl_spark.queries.grid import QUERY_POLY_RES, QUERY_RING, _points

    pts = _points(spark, sf_dir).select(
        "event_id",
        "event_type",
        G.cell(F.col("lat"), F.col("lng"), QUERY_POLY_RES).alias("cell_id"),
    )
    # right-size the hot-index layout: ~100k rows per cached partition
    # (32 near-empty partitions would pay 32 task launches per query —
    # measured 311ms -> 159ms at sf0.1; at real scale the partition
    # count follows data volume and queries prune by cell prefix)
    n_parts = max(1, pts.count() // 100_000)
    indexed = pts.coalesce(n_parts).cache()
    indexed.count()  # materialize
    cells = G.polyfill(QUERY_RING, QUERY_POLY_RES)

    def hot_df():
        # small cell set -> IN-set predicate (the engine's adaptive
        # choice in query.py): one codegen'd stage, no broadcast job
        return (
            indexed.filter(F.col("cell_id").isin(cells))
            .select("event_id", "event_type", "cell_id")
            .distinct()
        )

    # same load-gated-retry protocol as measure(), but WITHOUT the
    # per-trial clearCache — the hot-polygon paths measure a warm
    # cached index by design
    def measure_hot(name, run, n):
        load0 = os.getloadavg()[0]
        loads_pre[name] = round(load0, 2)
        qf0 = quick_floor()
        floor_pre[name] = qf0
        best, per, _ = run_trial_set(run, n, clear_cache=False)
        if retry_armed and load0 > LOAD_GATE:
            load1 = os.getloadavg()[0]
            load_retries[name] = {
                "load_pre_retry": round(load1, 2),
                "still_loaded": load1 > LOAD_GATE,
            }
            best2, per2, _ = run_trial_set(run, n, clear_cache=False)
            per = per + per2
            best = min(best, best2)
        if qf0 > FLOOR_GATE:
            qf1 = quick_floor()
            best2, per2, _ = run_trial_set(run, n, clear_cache=False)
            floor_retries[name] = {
                "floor_pre_retry": qf1,
                "still_degraded": qf1 > FLOOR_GATE,
            }
            per = per + per2
            best = min(best, best2)
        trials_log[name] = per
        return round(best, 3)

    # cold-plan path: DataFrame rebuilt per call — pays Python plan
    # construction + Catalyst analysis every time (~120 ms of the
    # total at sf0.1). This was THE hot_polygon_query number through
    # r3; kept for round-over-round continuity.
    timings["hot_polygon_cold_plan"] = measure_hot(
        "hot_polygon_cold_plan", lambda: hot_df().count(), 5
    )

    # served path (since r4): the query.PolygonServer semantics — the
    # analyzed plan is prepared ONCE under serving confs (AQE off, one
    # shuffle partition) and re-EXECUTED per call, which is what the
    # reference's warm ~50 ms benchmark measures (for DuckDB,
    # re-planning identical SQL is microseconds, so its warm number is
    # execution-only too). Every trial still runs the full job against
    # the index — no result caching.
    old_confs = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    prepared = hot_df()
    prepared._jdf.queryExecution().executedPlan()  # bake the plan
    for k, v in old_confs.items():
        spark.conf.set(k, v)
    n = prepared.count()  # warm the prepared path once
    best = measure_hot("hot_polygon_query", lambda: prepared.count(), 5)
    indexed.unpersist()
    timings["hot_polygon_query"] = best
    total += best
    print(f"# hot_polygon_query: {n} rows in {best:.3f}s", file=sys.stderr)

    # --- extended families (round-3/4 operators) ------------------------
    # Timed separately so the headline metric stays comparable across
    # rounds; best-of-3 fresh compute (r9 verdict item #3: 2 trials
    # could not separate load from regression for sub-2 s queries —
    # q97's driver reading swung 2× round-over-round), same protocol.
    extended: dict[str, float] = {}
    # q101 is the heaviest query in the suite and showed a +16% drift
    # in r4 on only 2 recorded trials — it gets the q52 treatment
    # (5 trials) so spread is distinguishable from regression.
    EXT_TRIALS = {"q101_copurchase_triangles": 5}
    for name in [
        # q52-family consumers of the shared MinHash signature helper
        # (r15 verdict item #6): the signature pipeline is the
        # engine's most-optimized path and q52 alone timed it —
        # regressions in the band/cluster/eval consumers were
        # invisible. Additions-only: new extended rows, every
        # existing row and field unchanged.
        "q56_near_dup_clusters",        # LSH candidates → CC clusters
        "q199_minhash_eval_pr",         # signature eval vs exact Jaccard
        "q264_lsh_calibration",         # band/row sweep calibration
        "q96_boilerplate_grams",   # gram fan-out + df threshold
        "q97_semantic_cluster_assign",  # broadcast-centroid argmax
        "q99_source_overlap_matrix",    # fingerprint self-join
        "q101_copurchase_triangles",    # wedge-close graph joins
        "q104_hopping_windows",         # window() slide Expand
        "q113_hll_distinct_sketch",     # HLL register agg (r4 headline)
        "q119_bloom_join_pruning",      # Bloom semi-join pruning (r4 headline)
        "q125_ewma_latest",             # 20-lag window, one exchange
        "q128_tfidf_doc_similarity",    # df-capped sparse dot product
        "q136_gram_matrix",             # Arrow GEMM mergeable moments
        "q146_funnel_3step",            # 3-window funnel, one exchange
        "q147_rolling_active_users",    # rolling DAU/WAU over users×days
        "q160_loghist_quantile_sketch", # mergeable quantile buckets (r5)
        "q170_grid_hotspot_clusters",   # grid rollup + dense-cell CC (r5)
        "q205_kcore_membership",        # iterative degree peeling (r6)
        "q212_repeated_span_coverage",  # gram df + island merge (r6)
        "q330_bigram_lm_perplexity",    # corpus LM train+score (r9)
        "q337_label_propagation_communities",  # 4-round LPA (r9)
    ]:
        fn = qs[name]
        best, rows = measure(
            name, lambda: fn(spark, sf_dir).collect(), EXT_TRIALS.get(name, 3)
        )
        extended[name] = best
        print(
            f"# {name}: {len(rows)} rows in {best:.2f}s (extended)", file=sys.stderr
        )

    probe_floor()  # interleaved probe #3: after the extended families
    import statistics

    floor_sec = round(statistics.median(min(p) for p in floor_probes), 4)
    io_floor_sec = round(statistics.median(min(p) for p in io_floor_probes), 4)
    print(
        f"# floor median-of-{len(floor_probes)}-probes: {floor_sec}s "
        f"(per-probe minima {[min(p) for p in floor_probes]}); "
        f"io_floor {io_floor_sec}s "
        f"(per-probe minima {[min(p) for p in io_floor_probes]})",
        file=sys.stderr,
    )

    # --- concurrent-queries run (FAIR scheduler) ------------------------
    # N queries submitted at once from threads: multi-tenant latency.
    # Wall should be far below the serial sum (jobs interleave on the
    # 32 slots); FAIR pools prevent head-of-line blocking.
    from concurrent.futures import ThreadPoolExecutor

    conc_names = [
        "q01_pricing_summary", "q03_region_revenue", "q06_ordered_distinct_lists",
        "q21_grid_polygon_objects", "q22_grid_stats", "q42_token_frequencies",
        "q40_text_stats", "q60_cosine_topk",
    ]

    def run_one(name):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        return len(qs[name](spark, sf_dir).collect())

    with ThreadPoolExecutor(max_workers=len(conc_names)) as ex:  # warm trial
        list(ex.map(run_one, conc_names))
    loads_pre["_concurrent_8q"] = round(os.getloadavg()[0], 2)
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=len(conc_names)) as ex:
        list(ex.map(run_one, conc_names))
    conc_wall = round(time.time() - t0, 3)
    serial_sum = round(sum(timings[n] for n in conc_names), 3)
    print(
        f"# concurrent {len(conc_names)}q wall {conc_wall}s vs serial sum {serial_sum}s",
        file=sys.stderr,
    )

    # --- folded scale probe --------------------------------------------
    # The same operator families at SPARK_GRAFT_SCALE_FACTOR x the
    # bench rows (default 25x ~ 2.5M events), id-shifted replication —
    # the "would the plan hold at 1000x?" evidence recorded per round.
    # scale_probe.py remains the full 100x standalone.
    scale: dict[str, float] = {}
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "25"))
    if factor > 0:
        from g_etl_spark.queries.grid import QUERY_POLY_RES, QUERY_RING

        e = load(spark, sf_dir, "events")
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        big = (
            e.crossJoin(reps)
            .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000)
            .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000)
            .drop("rep")
            .withColumns(
                {
                    "lat": F.lit(55.0) + ((F.col("event_id") * 7919) % 1000) * F.lit(0.01),
                    "lng": F.lit(11.0) + ((F.col("event_id") * 104729) % 1200) * F.lit(0.01),
                }
            )
        )
        scale["rows"] = e.count() * factor
        t0 = time.time()
        (
            big.select(G.cell(F.col("lat"), F.col("lng"), G.QUERY_RES).alias("cell_id"), "event_type")
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("event_type").alias("nt"))
            .count()
        )
        scale["grid_rollup_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        (
            big.groupBy(F.md5(F.concat_ws("|", "event_type", "props")).alias("h"))
            .agg(F.min("event_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
            .count()
        )
        scale["exact_dedup_sec"] = round(time.time() - t0, 2)
        big_idx = big.select(
            "event_id", G.cell(F.col("lat"), F.col("lng"), QUERY_POLY_RES).alias("cell_id")
        ).cache()
        big_idx.count()
        cells_s = G.polyfill(QUERY_RING, QUERY_POLY_RES)
        t0 = time.time()
        big_idx.filter(F.col("cell_id").isin(cells_s)).distinct().count()
        scale["hot_polygon_sec"] = round(time.time() - t0, 3)
        big_idx.unpersist()
        print(f"# scale probe at {factor}x: {scale}", file=sys.stderr)

    payload = {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                # protocol v2 (since r2): clearCache before EVERY trial
                # so each number is fresh compute (no operator-internal
                # persist hits), best of N trials with N recorded per
                # query by the `trials` arrays (3 default; 5 for the
                # LSH pipeline whose JIT tail converges at trial 3-4 —
                # see TRIALS above). Since r4: per-trial times under
                # `trials` so a headline delta can be attributed to
                # spread vs regression without re-running, and
                # hot_polygon_query measures the SERVED prepared-plan
                # path (the r3-comparable rebuilt-per-call number
                # continues under hot_polygon_cold_plan). r1 numbers
                # (warm-cache) NOT comparable.
                "protocol": "fresh-compute-v2-bestofN-trials-recorded",
                "trials": trials_log,
                "queries": timings,
                "extended": extended,
                "sf": sf,
                # contention-robust first-class series (r8 verdict
                # item #3): the per-query BESTs already compose the
                # headline, named explicitly here so the tracked
                # series is unambiguous; concurrent wall measures the
                # engine's own parallelism (external load shows up in
                # load_1min_pre, not in a mystery drift)
                "best_of_trials_total": round(total, 3),
                "load_1min_pre": loads_pre,
                # trial sets that started on a loaded host (>2.0
                # loadavg) were re-run once; union-best recorded.
                # still_loaded=true means the retry was loaded too —
                # treat that query's number as host-noise-suspect.
                "load_gate": LOAD_GATE,
                "load_retry_armed": retry_armed,
                "load_gated_retries": load_retries,
                # floor-gated retry (r15 verdict item #1): per-set
                # quick-floor (best-of-2 pre-analyzed integer fold,
                # run OUTSIDE the timed window) in floor_pre; any set
                # whose quick floor exceeded floor_gate was re-run
                # once, union-best recorded. floor_retry_fired names
                # the sets whose numbers self-corrected (or, if
                # still_degraded, remain host-noise-suspect) — this
                # gate sees hypervisor steal that the load gate is
                # blind to (r15: near-zero in-VM load, 25x floor).
                "floor_gate": FLOOR_GATE,
                "floor_pre": floor_pre,
                "floor_gated_retries": floor_retries,
                "floor_retry_fired": sorted(floor_retries),
                "load_1min_post_run": round(os.getloadavg()[0], 2),
                "concurrent_8q_wall_sec": conc_wall,
                "concurrent_8q_serial_sum_sec": serial_sum,
                "scale_probe": scale,
                # host calibration (r12 verdict item #1, floor protocol
                # r13 verdict item #4): cpu_mhz is the /proc/cpuinfo
                # mean at run start/end (clock pinning at 2100 MHz
                # inflated r12's wall ~35% on byte-identical code);
                # floor_sec is the MEDIAN over 3 interleaved probes
                # (start / post-headline / post-extended) of each
                # probe's best pre-analyzed fixed integer fold (1024M
                # ids, whole-stage codegen, no I/O);
                # headline_normalized = value / floor_sec is the
                # host-comparable round-over-round series.
                "cpu_mhz": cpu_mhz_start,
                "cpu_mhz_post": _cpu_mhz(),
                "floor_sec": floor_sec,
                "floor_protocol": "median-of-interleaved-probe-minima",
                "floor_probes": floor_probes,
                # I/O floor (additive since r15): pre-analyzed fixed
                # parquet scan-and-count, same interleaved-median
                # protocol — separates storage/decode host drift from
                # CPU-codegen host drift (r14 showed they diverge).
                "io_floor_sec": io_floor_sec,
                "io_floor_probes": io_floor_probes,
                "headline_normalized": round(total / floor_sec, 2)
                if floor_sec
                else None,
    }
    # Full payload (incl. the bulky per-trial arrays) goes to the repo
    # root so the judge always has the complete record; stdout gets ONE
    # compact final line WITHOUT `trials` so the driver's bounded tail
    # capture always contains a parseable summary (BENCH_r05's
    # `parsed: null` was the tail starting mid-trials-array).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(payload, f, separators=(",", ":"))
        f.write("\n")
    # The driver captures only the last ~2000 chars of stdout, so the
    # FINAL line must be a minimal summary: headline total, the 12
    # headline query bests, sf, run-start load, extended+trials live
    # in BENCH_LOCAL.json.  BENCH_r{9,10,11} carried `parsed: null`
    # because the previous compact form (~4.4k chars with `extended`
    # and per-query load maps) still overflowed the tail (r11 verdict
    # item #1).
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "queries": payload["queries"],
        "sf": payload["sf"],
        "protocol": payload["protocol"],
        "load_1min_pre": payload["load_1min_pre"].get("_run_start"),
        "concurrent_8q_wall_sec": payload["concurrent_8q_wall_sec"],
        "cpu_mhz": payload["cpu_mhz"],
        "floor_sec": payload["floor_sec"],
        "io_floor_sec": payload["io_floor_sec"],
        "headline_normalized": payload["headline_normalized"],
        "full_payload_in": "BENCH_LOCAL.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) >= 1500:
        # degrade, never die: a missing final line is exactly the
        # parsed:null failure this summary exists to prevent
        compact["queries"] = {}
        compact["truncated"] = "queries-map-dropped-over-1500-chars"
        line = json.dumps(compact, separators=(",", ":"))
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
