package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Materialize._
import graft.sources.Ingest

/** Scale-pattern operators (SURVEY.md §2 rows 41-44): the aggregation
  * shapes a 100 TB deployment leans on — hot-key-safe exact distincts,
  * grouping-sets cubes, exact holistic percentiles, and typed
  * semi-structured extraction.
  *
  * Like the rest of the engine these re-express reporting patterns the
  * reference serves from Postgres (aggregated dashboard feeds,
  * ref dags/ELT.py:286-321) in forms that survive a 1000-executor
  * cluster: every query here shuffles at most once on a key whose
  * per-partition load is bounded by construction.
  */
object ScaleOps {

  /** Hot-key-safe exact distinct aggregation. `event_type` has ~5
    * values over the whole corpus — the textbook skewed grouping key.
    * A direct `COUNT(DISTINCT user_id) GROUP BY event_type` funnels
    * every row of a hot type through the partitions owning its 5 keys;
    * this two-phase expansion shuffles first on the HIGH-cardinality
    * composite (event_type, user_id) — spreading each hot type across
    * every partition, with map-side partial aggregation condensing to
    * one row per (type, user) — then aggregates the (small) distinct
    * pairs per type. Exact for distinct-count and the algebraic
    * aggregates (decimal sums are associative), identical to the
    * one-phase SQL the oracle runs. SQL `COUNT(DISTINCT user_id)`
    * ignores NULLs, so the pair count must not tally the NULL-user
    * group (this testdata has none, but the operator must not depend
    * on that — ADVICE r6).
    */
  def qSkewAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Ingest.events(s, dir)
    val perUser = e
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("v"))
    perUser
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("user_id").isNotNull, lit(1L)).otherwise(lit(0L))).as("n_users"),
        sum(col("n")).as("n_events"),
        sum(col("v")).cast("double").as("total_value"))
  }

  val qSkewAggSql: String =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** CUBE over (order year, priority): all four grouping sets in one
    * pass. Catalyst's Expand produces the 4× row multiplication BEFORE
    * the partial aggregate, so the shuffle still carries only
    * (grouping-key, partial-state) rows — grouping sets never re-scan
    * the fact. Subtotal levels are marked via `grouping()` — NOT a
    * `coalesce` sentinel, which would conflate a real NULL dimension
    * value with the subtotal rows (this data has no NULL priorities,
    * but the operator shouldn't silently depend on that).
    */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    val ord = Ingest.table(s, dir, "orders")
    ord
      .select(
        year(col("o_orderdate")).cast("int").as("y"),
        col("o_orderpriority").as("p"),
        col("o_totalprice"))
      .cube(col("y"), col("p"))
      .agg(
        grouping(col("y")).as("gy"),
        grouping(col("p")).as("gp"),
        count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("total_price"))
      .select(
        when(col("gy") === 1, lit(-1)).otherwise(col("y")).as("year_g"),
        when(col("gp") === 1, lit("ALL")).otherwise(col("p")).as("priority_g"),
        col("n_orders"), col("total_price"))
  }

  val qCubeSql: String =
    """SELECT
      |  CASE WHEN GROUPING(CAST(year(o_orderdate) AS INT)) = 1 THEN -1
      |       ELSE CAST(year(o_orderdate) AS INT) END AS year_g,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
      |       ELSE o_orderpriority END AS priority_g,
      |  COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (CAST(year(o_orderdate) AS INT), o_orderpriority)
      |ORDER BY year_g, priority_g""".stripMargin

  /** Exact interpolated percentiles per group (holistic aggregate).
    * Spark's `percentile` partials are value→count maps merged
    * map-side, so memory scales with DISTINCT values per group (50
    * here), not rows — exact percentiles are affordable whenever the
    * value domain is bounded. For unbounded domains the scale path is
    * `approx_percentile` (KLL-bounded state); ScaleOpsSpec pins its
    * error against these exact answers. Bit-exact oracle parity holds
    * because l_quantity is integer-valued and the probe fractions are
    * quarters: every interpolation `(1-g)·a + g·b` is exact in binary
    * FP in both engines.
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = Ingest.table(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        percentile(col("l_quantity"), lit(0.25)).as("q25"),
        percentile(col("l_quantity"), lit(0.50)).as("q50"),
        percentile(col("l_quantity"), lit(0.75)).as("q75"))
  }

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.50) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Statistics battery per group: mean, variance, stddev, and the
    * quantity↔price correlation — WITHOUT the engines' stddev/corr
    * builtins, whose streaming accumulations (Welford et al.) differ
    * across engines in final ulps and would never hash-match. Instead:
    * all five raw moments are EXACT decimal sums (associative — safe
    * under any partial-aggregation split), and the derived statistics
    * are computed from them with an identical IEEE expression tree in
    * both engines — deterministic down to the bit, at any partition
    * count. One partial-agg shuffle carrying 6 numbers per group.
    */
  def qStatsMoments(s: SparkSession, dir: String): DataFrame = {
    val li = Ingest.table(s, dir, "lineitem")
    val qd = qty(col("l_quantity"))
    val pd = money(col("l_extendedprice"))
    val g = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(qd).as("sq"), sum(pd).as("sp"),
      sum(qd * qd).as("sqq"), sum(pd * pd).as("spp"), sum(qd * pd).as("sqp"))
    val nD = col("n").cast("double")
    val (sqD, spD) = (col("sq").cast("double"), col("sp").cast("double"))
    val (sqqD, sppD, sqpD) =
      (col("sqq").cast("double"), col("spp").cast("double"), col("sqp").cast("double"))
    val varQty = (sqqD - sqD * sqD / nD) / (nD - 1.0)
    g.select(
      col("l_returnflag"), col("n"),
      (sqD / nD).as("mean_qty"),
      varQty.as("var_qty"),
      sqrt(varQty).as("std_qty"),
      ((nD * sqpD - sqD * spD) /
        sqrt((nD * sqqD - sqD * sqD) * (nD * sppD - spD * spD))).as("corr_qty_price"))
  }

  // DECIMAL→DOUBLE parity note (r12): DuckDB casts decimal to double
  // as (double)unscaled / (double)10^scale — TWO roundings, so a sum
  // past 2^53 (spp here) can land 1 ULP off the correctly-rounded
  // conversion the JVM's BigDecimal.doubleValue produces (observed at
  // sf0.001 after the r11 data regen). VARCHAR-mediated casts take
  // DuckDB's correctly-rounded string→double path instead, matching
  // Spark bit for bit at every scale.
  val qStatsMomentsSql: String =
    """WITH g AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(CAST(l_quantity AS DECIMAL(8,2))) AS sq,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
      |    SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS sqq,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS spp,
      |    SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sqp
      |  FROM lineitem GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nD,
      |    CAST(CAST(sq AS VARCHAR) AS DOUBLE) AS sqD,
      |    CAST(CAST(sp AS VARCHAR) AS DOUBLE) AS spD,
      |    CAST(CAST(sqq AS VARCHAR) AS DOUBLE) AS sqqD,
      |    CAST(CAST(spp AS VARCHAR) AS DOUBLE) AS sppD,
      |    CAST(CAST(sqp AS VARCHAR) AS DOUBLE) AS sqpD
      |  FROM g)
      |SELECT l_returnflag, n,
      |  sqD / nD AS mean_qty,
      |  (sqqD - sqD * sqD / nD) / (nD - 1.0) AS var_qty,
      |  sqrt((sqqD - sqD * sqD / nD) / (nD - 1.0)) AS std_qty,
      |  (nD * sqpD - sqD * spD)
      |    / sqrt((nD * sqqD - sqD * sqD) * (nD * sppD - spD * spD)) AS corr_qty_price
      |FROM d
      |ORDER BY l_returnflag""".stripMargin

  /** Typed semi-structured extraction: parse the JSON `props` column
    * ONCE with an explicit schema (`from_json` → struct), then filter
    * and aggregate on the typed field. One parse per row regardless of
    * how many fields downstream expressions touch — vs
    * `get_json_object`, which re-parses the document per path. The
    * filter on the parsed value cannot push to parquet (opaque string
    * column), but the plan stays map-only into a single partial
    * aggregate shuffle on event_type.
    */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    val e = Ingest.events(s, dir)
    e.select(
        col("event_type"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String]).getField("k").as("k"))
      .filter(col("k") >= 50L)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hi"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
  }

  val qJsonExtractSql: String =
    """WITH x AS (
      |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type,
      |  COUNT(*) AS n_hi,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MAX(k) AS max_k,
      |  CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
      |FROM x
      |WHERE k >= 50
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Per-group top-k via the custom bounded-heap aggregate
    * ([[graft.functions.TopKPairs]]) — the SCALE-PATH TWIN of
    * `q_window_rank`, same result by construction (same base, same
    * (revenue DESC, partkey ASC) order, same k=3). The window
    * formulation shuffles every (brand, part) row and sorts whole
    * brand partitions before it can rank; the aggregate ships at most
    * k pairs per (brand, map partition) and never sorts more than k
    * survivors — at 100 TB that is the difference between a
    * full-table exchange and a k·|brands| one. The oracle runs the
    * window SQL: identical output is the equivalence proof.
    */
  def qGroupTopk(s: SparkSession, dir: String): DataFrame = {
    val li = Ingest.table(s, dir, "lineitem")
    val pt = Ingest.table(s, dir, "part")
    val rev = li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1).cast("decimal(4,2)") - rate(col("l_discount"))))
        .cast("double").as("revenue"))
    rev
      .groupBy(col("p_brand"))
      .agg(graft.functions.VectorFunctions
        .topkPairs(struct(col("revenue"), col("p_partkey")), 3).as("top"))
      .select(col("p_brand").as("brand"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("brand"),
        col("t.id").as("partkey"),
        col("t.ord").as("revenue"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Oracle = the WINDOW formulation: proving the heap aggregate
    * reproduces rank semantics exactly is the point of this row.
    */
  val qGroupTopkSql: String =
    """WITH rev AS (
      |  SELECT p_brand AS brand, p_partkey AS partkey,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand, p_partkey)
      |SELECT brand, partkey, revenue, rk FROM (
      |  SELECT brand, partkey, revenue,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY brand ORDER BY revenue DESC, partkey) AS BIGINT) AS rk
      |  FROM rev) r
      |WHERE rk <= 3
      |ORDER BY brand, rk, partkey""".stripMargin

  /** Approximate distinct counting (HyperLogLog++), oracle-gated: the
    * row emits the EXACT per-type distinct (two-phase, as in
    * [[qSkewAgg]]) plus a boolean asserting the HLL estimate landed
    * within 5% of it; the oracle computes the exact count and claims
    * TRUE. A silent HLL regression (bad rsd, broken merge) flips the
    * boolean and fails the hash gate — this is how an engine keeps a
    * non-deterministic-looking sketch under a deterministic test.
    *
    * Shape at scale: the HLL branch shuffles constant-size sketch
    * state per (type, map partition) — the whole point of the sketch:
    * at 10^9 distinct users the exact branch's expanded shuffle costs
    * ~|distinct pairs| rows while HLL stays at ~1.5 KB per partial.
    * rsd=0.01 gives ≥5σ headroom on the 5% gate.
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val e = Ingest.events(s, dir)
    val exact = e.groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_exact_users"))
    val hll = e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("n_hll"))
    exact.join(hll, Seq("event_type"))
      .select(
        col("event_type"), col("n_exact_users"),
        (abs(col("n_hll") - col("n_exact_users")).cast("double")
          <= col("n_exact_users").cast("double") * 0.05).as("hll_within_5pct"))
  }

  val qApproxDistinctSql: String =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS n_exact_users,
      |  TRUE AS hll_within_5pct
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Approximate group percentiles, oracle-gated by a RANK check —
    * the sketch companion to `q_percentiles` the same way
    * `q_approx_distinct` companions the exact distinct. The exact
    * holistic percentile ships every value to its group's reducer; the
    * GK-style sketch behind `percentile_approx` (Greenwald-Khanna via
    * ApproximatePercentile) keeps a bounded mergeable summary per
    * (group, map partition) — at 10^9 rows per group the shuffle
    * carries KBs instead of the column.
    *
    * The gate mirrors the sketch's actual guarantee: rank error, not
    * value error (value tolerance is data-distribution-dependent; rank
    * tolerance is the published bound). accuracy=1000 → ε = 1/1000 of
    * rank; the flag asserts |rank(p50_sketch)/n − 0.5| ≤ 0.01, 10×
    * headroom plus discreteness. The oracle can't replay the sketch
    * (engine-internal), so it replays the gate: n_rows exact, flag
    * expected TRUE.
    *
    * Shape at scale: two scans of the value column (sketch pass +
    * rank-audit pass) joined on the 3-row group key — the audit is
    * broadcast back, so no data-sized shuffle beyond the two grouped
    * partial aggregates. A production run would drop the audit branch;
    * it exists to keep the sketch honest under the driver's gate.
    */
  def qApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = Ingest.table(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val sk = li.groupBy(col("l_returnflag")).agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_sketch"),
      count(lit(1)).as("n_rows"))
    li.join(broadcast(sk), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n_rows")).as("n_rows"),
        sum(when(col("l_extendedprice") <= col("p50_sketch"), 1L).otherwise(0L))
          .as("n_le_sketch"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(col("n_le_sketch").cast("double") / col("n_rows").cast("double") - lit(0.5))
          <= lit(0.01)).as("sketch_rank_ok"))
  }

  val qApproxPercentilesSql: String =
    """SELECT l_returnflag,
      |  COUNT(*) AS n_rows,
      |  TRUE AS sketch_rank_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Z-order (Morton) data-layout clustering: interleave the low 16
    * bits of `l_partkey` and `l_suppkey` into one locality-preserving
    * sort key, bucket the curve into 256 ranges, and report each
    * bucket's row count and per-column min/max extents. This is the
    * planning half of `OPTIMIZE ... ZORDER BY` (Delta/Iceberg table
    * maintenance): rows sorted by `z` land in files whose min/max
    * footer ranges are narrow in BOTH key columns at once, so point
    * and range predicates on EITHER column prune most files — a
    * single-column sort gives pruning on that column only. The
    * extents this query emits are exactly the skipping statistics a
    * rewriter would publish.
    *
    * The interleave is pure integer bit-arithmetic (32 shift-mask-or
    * terms generated from one Scala loop into both engines' SQL —
    * no FP, no hashing), and the whole query is one partial-aggregated
    * shuffle on the 256-value bucket key.
    */
  def qZorderLayout(s: SparkSession, dir: String): DataFrame =
    Ingest.table(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr(zorderExpr("l_partkey", "l_suppkey")).as("z"))
      .groupBy(expr("z DIV 262144").as("z_bucket")) // 2^18-wide curve ranges
      .agg(
        count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))

  /** Σ_{i<16} interleaved shift-mask terms: part bit i → z bit 2i+1,
    * supp bit i → z bit 2i. Valid SQL in Spark AND DuckDB (`&`, `|`
    * need no dialect translation; `>>`/`<<` shift BIGINT in both).
    * Shared with the write path ([[Ingest.zorderWrite]] clusters files
    * on the same key this statistic plans for). */
  private[graft] def zorderExpr(a: String, b: String): String =
    Ingest.zorderKeyExpr(Seq(a, b))

  val qZorderLayoutSql: String =
    s"""WITH z AS (
       |  SELECT l_partkey, l_suppkey,
       |    ${zorderExpr("l_partkey", "l_suppkey")} AS z
       |  FROM lineitem)
       |SELECT z // 262144 AS z_bucket, COUNT(*) AS n_rows,
       |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
       |FROM z GROUP BY z // 262144
       |ORDER BY z_bucket""".stripMargin

  /** Winsorized (IQR-fenced) robust aggregation per group: clamp
    * quantities to [q25 − 1.5·IQR, q75 + 1.5·IQR] and report the
    * clamp counts plus raw-vs-winsorized means — the standard
    * outlier-tolerant mean a data-cleaning pass applies before
    * training-statistics are trusted ([[qMadOutlier]]'s
    * median/MAD fences are the heavier sibling; IQR fences reuse the
    * cheap sort-free percentile aggregate).
    *
    * Determinism (SURVEY §4): quantile probes are QUARTER fractions
    * over the integer-valued quantity domain, so the interpolated
    * q25/q75 are exact binary FP in both engines; the fences add one
    * multiply by 1.5 (exact — one extra mantissa bit) and the clamped
    * values are exact eighths, so the DECIMAL(12,3) sums are exact
    * and the means are ONE identical IEEE division per engine.
    *
    * Shape at scale: two passes over the fact — the percentile
    * aggregate condenses to |groups| rows, which BROADCAST back onto
    * the second scan (AQE); each pass partial-aggregates into a
    * |groups|-sized key space. No window, no sort.
    */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val li = Ingest.table(s, dir, "lineitem")
    val fences = li.groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("q25"),
        percentile(col("l_quantity"), lit(0.75)).as("q75"))
      .select(col("l_returnflag"),
        (col("q25") - (col("q75") - col("q25")) * 1.5).as("lo"),
        (col("q75") + (col("q75") - col("q25")) * 1.5).as("hi"))
    li.select(col("l_returnflag"), col("l_quantity"))
      .join(broadcast(fences), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") < col("lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(col("l_quantity") > col("hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        min(col("lo")).as("fence_lo"),
        max(col("hi")).as("fence_hi"),
        (sum(col("l_quantity").cast("decimal(12,3)")).cast("double") / count(lit(1)))
          .as("mean_raw"),
        (sum(least(greatest(col("l_quantity"), col("lo")), col("hi"))
          .cast("decimal(12,3)")).cast("double") / count(lit(1)))
          .as("mean_winsor"))
  }

  val qWinsorizeSql: String =
    """WITH f AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_quantity, 0.25) AS q25,
      |    quantile_cont(l_quantity, 0.75) AS q75
      |  FROM lineitem GROUP BY l_returnflag),
      |b AS (
      |  SELECT l.l_returnflag, l.l_quantity,
      |    f.q25 - (f.q75 - f.q25) * 1.5 AS lo,
      |    f.q75 + (f.q75 - f.q25) * 1.5 AS hi
      |  FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag)
      |SELECT l_returnflag, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN l_quantity < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |  CAST(SUM(CASE WHEN l_quantity > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
      |  MIN(lo) AS fence_lo, MAX(hi) AS fence_hi,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,3))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean_raw,
      |  CAST(CAST(SUM(CAST(LEAST(GREATEST(l_quantity, lo), hi) AS DECIMAL(12,3))) AS VARCHAR) AS DOUBLE)
      |    / COUNT(*) AS mean_winsor
      |FROM b GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Key-skew profiler: the per-key row-count distribution of
    * (event_type → user_id) — keys per type, max/median/p75 rows per
    * key, and a fixed-point skew factor (max·keys·100 DIV rows =
    * hottest key vs mean, ×100). This is the diagnostic that DECIDES
    * the engine's own skew machinery: whether a key needs salting,
    * what hot-bucket caps cost ([[graft.operators.Dedup]]), and when
    * AQE skew splits will trigger. Run it before committing any
    * partitioning scheme at 100 TB.
    *
    * Shape at scale: the same two-phase expansion as [[qSkewAgg]] —
    * first shuffle on the high-cardinality (type, user) composite
    * (immune to the very skew it measures), then a |types|-sized
    * rollup whose holistic percentile state is bounded by distinct
    * per-key counts, not rows. All outputs integer or quarter-fraction
    * percentiles over integer counts — exact in both engines.
    */
  def qSkewReport(s: SparkSession, dir: String): DataFrame =
    Ingest.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_per_key"),
        percentile(col("n"), lit(0.5)).as("p50_per_key"),
        percentile(col("n"), lit(0.75)).as("p75_per_key"))
      .withColumn("skew_x100",
        expr("(max_per_key * n_keys * 100) DIV n_rows"))

  val qSkewReportSql: String =
    """WITH c AS (
      |  SELECT event_type, user_id, COUNT(*) AS n
      |  FROM events GROUP BY event_type, user_id)
      |SELECT event_type, COUNT(*) AS n_keys,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  MAX(n) AS max_per_key,
      |  quantile_cont(n, 0.5) AS p50_per_key,
      |  quantile_cont(n, 0.75) AS p75_per_key,
      |  (MAX(n) * COUNT(*) * 100) // CAST(SUM(n) AS BIGINT) AS skew_x100
      |FROM c GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Join fan-out audit: the multiplicity histogram of the engine's
    * hottest FK join (orders→lineitem) — how many orders carry 0, 1,
    * …, n line items. This is the statistic that PREDICTS join output
    * size (Σ fanout = join cardinality), flags explosion risk before a
    * plan runs it, and justifies broadcast-vs-shuffle and skew-salt
    * choices; the FK sibling of [[qSkewReport]] (which profiles
    * grouping keys). Orders with no line items surface as fanout 0 —
    * the referential tail [[graft.operators.Audit]]'s FK check counts
    * from the other side.
    *
    * Shape at scale: one partial-aggregated shuffle on the FK, one
    * orderkey-co-partitioned join against orders (AQE picks the
    * strategy), and a fanout-domain-sized rollup.
    */
  def qFanoutAudit(s: SparkSession, dir: String): DataFrame = {
    val fan = Ingest.table(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("fan"))
    Ingest.table(s, dir, "orders").select(col("o_orderkey"))
      .join(fan, col("o_orderkey") === col("l_orderkey"), "left")
      .select(coalesce(col("fan"), lit(0L)).as("fanout"))
      .groupBy(col("fanout"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val qFanoutAuditSql: String =
    """WITH f AS (
      |  SELECT l_orderkey, COUNT(*) AS fan FROM lineitem GROUP BY 1),
      |o AS (
      |  SELECT CAST(COALESCE(f.fan, 0) AS BIGINT) AS fanout
      |  FROM orders LEFT JOIN f ON o_orderkey = l_orderkey)
      |SELECT fanout, COUNT(*) AS n_orders
      |FROM o GROUP BY fanout
      |ORDER BY fanout""".stripMargin

  /** Explicit GROUPING SETS — the family member ROLLUP ([[qCube]]'s
    * sibling in Relational) and CUBE can't express: just the two
    * one-dimension marginals plus the grand total, WITHOUT the (y, p)
    * cross cells. The "independent marginals in one pass" report shape
    * (each dashboard filter's totals side by side). Same machinery as
    * CUBE: ONE Expand (×3 here) before the partial aggregate, one
    * shuffle of (grouping-key, partial-state) rows; same `grouping()`
    * markers (a coalesce sentinel would conflate real NULLs with
    * subtotals).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Ingest.table(s, dir, "orders")
      .select(
        year(col("o_orderdate")).cast("int").as("y"),
        col("o_orderpriority").as("p"),
        col("o_totalprice"))
      .groupingSets(Seq(Seq(col("y")), Seq(col("p")), Seq()), col("y"), col("p"))
      .agg(
        grouping(col("y")).as("gy"),
        grouping(col("p")).as("gp"),
        count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("total_price"))
      .select(
        when(col("gy") === 1, lit(-1)).otherwise(col("y")).as("year_g"),
        when(col("gp") === 1, lit("ALL")).otherwise(col("p")).as("priority_g"),
        col("n_orders"), col("total_price"))

  val qGroupingSetsSql: String =
    """SELECT
      |  CASE WHEN GROUPING(CAST(year(o_orderdate) AS INT)) = 1 THEN -1
      |       ELSE CAST(year(o_orderdate) AS INT) END AS year_g,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
      |       ELSE o_orderpriority END AS priority_g,
      |  COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((CAST(year(o_orderdate) AS INT)), (o_orderpriority), ())
      |ORDER BY year_g, priority_g""".stripMargin

  /** Re-aggregatable distinct counting: per-day HLL sketches of the
    * user population, UNIONED up to the per-type total — the
    * pre-aggregation contract every 100 TB dashboard depends on
    * (daily sketch tables roll up to any period WITHOUT rescanning
    * raw events; exact distincts cannot merge). Like
    * [[qApproxDistinct]], the non-deterministic-looking estimate is
    * held under a deterministic oracle: the row carries the exact
    * two-phase distinct and a boolean asserting the sketch-union
    * estimate landed within 5% (lgConfigK=14 → σ ≈ 0.8%, ≥6σ
    * headroom); the oracle computes the exact side and claims TRUE.
    *
    * Shape at scale: the sketch branch shuffles once into (type, day)
    * partials (constant-size state per key), then the union aggregate
    * runs on the DAY-BOUNDED sketch table — the second level never
    * touches raw data. The exact branch is the audit, not the
    * production path.
    */
  def qHllUnion(s: SparkSession, dir: String): DataFrame = {
    val e = Ingest.events(s, dir)
      .select(col("event_type"), expr("ts_ms DIV 86400000").as("day"), col("user_id"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val unioned = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = e.select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_exact_users"))
    exact.join(unioned, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_exact_users"),
        (abs(col("est") - col("n_exact_users")).cast("double")
          <= col("n_exact_users").cast("double") * 0.05).as("union_within_5pct"))
  }

  val qHllUnionSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS day, user_id FROM events)
      |SELECT event_type,
      |  COUNT(DISTINCT day) AS n_days,
      |  COUNT(DISTINCT user_id) AS n_exact_users,
      |  TRUE AS union_within_5pct
      |FROM e GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Trailing-7-day distinct reach per (event_type, day) — the sliding
    * sibling of [[qHllUnion]], and the op that makes the sketch-table
    * contract pay off: each DAILY sketch is fanned out to the ≤7
    * target days it serves (map-only ×7 on the day-bounded sketch
    * table) and merged per target, so the trailing window NEVER
    * re-scans raw events and never recounts — the naive per-day
    * COUNT(DISTINCT trailing 7d) re-touches every event 7×. Targets
    * are kept only for days that themselves have events (the join back
    * to the sketch table's key set).
    *
    * Oracle contract as [[qHllUnion]]: the row carries the exact
    * trailing distinct and a boolean asserting the merged estimate
    * landed within 5% (lgConfigK=14 → σ ≈ 0.8%); the exact branch here
    * is the audit, not the production path — and it is CONFIG-GATED
    * (VERDICT r9 #8): `spark.graft.reach.exact` defaults true (oracle
    * runs audit the sketch), false drops the exact distinct entirely
    * and serves `(event_type, day, est)` from the sketch table alone.
    * The production plan touches raw events exactly ONCE (the daily
    * sketch build inside the eager materialization); the ×7 fan-out
    * and merge run on the day-bounded sketch table — PlanSpec pins
    * that shape (zero events scans in the served plan, vs the audit
    * mode's one extra scan for the exact branch).
    */
  val ReachExactKey = "spark.graft.reach.exact"

  def qSlidingReach(s: SparkSession, dir: String): DataFrame = {
    val audit = s.conf.getOption(ReachExactKey).forall(_.trim.equalsIgnoreCase("true"))
    val e = Ingest.events(s, dir)
      .select(col("event_type"), expr("ts_ms DIV 86400000").as("day"), col("user_id"))
    // day×type-bounded sketch table; consumed by the fan-out AND the
    // present-day filter — checkpointed once (shared subtrees re-derive)
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .materialized
    val est = daily
      .select(col("event_type"), col("sk"),
        explode(expr("sequence(day, day + 6)")).as("day_t"))
      .groupBy(col("event_type"), col("day_t"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .join(daily.select(col("event_type"), col("day").as("day_t")),
        Seq("event_type", "day_t"))
    if (!audit)
      return est.select(col("event_type"), col("day_t").as("day"), col("est"))
    val exact = e
      .select(col("event_type"), col("user_id"),
        explode(expr("sequence(day, day + 6)")).as("day_t"))
      .distinct()
      .groupBy(col("event_type"), col("day_t"))
      .agg(count(lit(1)).as("n_exact_users"))
    est.join(exact, Seq("event_type", "day_t"))
      .select(col("event_type"), col("day_t").as("day"), col("n_exact_users"),
        (abs(col("est") - col("n_exact_users")).cast("double")
          <= col("n_exact_users").cast("double") * 0.05).as("reach_within_5pct"))
  }

  val qSlidingReachSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_ms(ts) // 86400000 AS day, user_id FROM events),
      |present AS (SELECT DISTINCT event_type, day FROM e),
      |x AS (
      |  SELECT DISTINCT e.event_type, e.user_id, e.day + o.ofs AS day_t
      |  FROM e CROSS JOIN (SELECT unnest(range(0, 7)) AS ofs) o),
      |cnt AS (
      |  SELECT event_type, day_t, COUNT(*) AS n_exact_users
      |  FROM x GROUP BY event_type, day_t)
      |SELECT c.event_type, c.day_t AS day, c.n_exact_users,
      |  TRUE AS reach_within_5pct
      |FROM cnt c JOIN present p
      |  ON c.event_type = p.event_type AND c.day_t = p.day
      |ORDER BY 1, 2""".stripMargin

  /** Bloom-filter parameters for [[qBloomJoin]]. m is deliberately
    * small at test SF so the false-positive audit measures a non-zero
    * rate at BOTH oracle scales (sf0.01 load ≈ 0.06 → fp ~10⁻⁴;
    * sf0.1 load ≈ 0.5 → fp ~6%); a production deployment sizes m to
    * the build-side cardinality (bits-per-key × n), still driver-tiny
    * at 10⁹ keys × 10 bits = ~1.2 GB worst case, or per-partition
    * OR-merged if that ever mattered.
    */
  val BloomM = 8192
  val BloomK = 3
  val BloomSeed = 0xB100FL

  /** Bloom-filter semi-join reduction with a false-positive audit —
    * the explicit, auditable version of the runtime filter every
    * 100 TB join optimizer wants: build a k-hash m-bit filter over the
    * keys of a selective build side (customers with negative account
    * balance), probe the big fact side (orders) with a map-only
    * codegen membership expression, and score the filter against the
    * exact semi-join.
    *
    * Shape at scale: the build side collapses to AT MOST m distinct
    * bit positions (explode + partial-agg distinct — the collect is
    * bounded by config, never by data), the packed bitmap ships inside
    * the [[graft.functions.BloomContains]] expression (the NearestCell
    * codebook pattern — no join, no shuffle, no broadcast exchange on
    * the probe side), and the ONLY shuffle is the final 5-group
    * aggregate. The exact left join against the build keys is the
    * AUDIT branch: production keeps the bloom_pass column alone as the
    * shuffle-avoiding pre-filter and lets the residual exact join run
    * on the ~fp_ppm survivors. Spark's own InjectRuntimeFilter does
    * this invisibly and unauditedly; this operator MEASURES what that
    * filter would save (n_pass vs n_probe) and what it costs
    * (n_false_pos) — and its splitmix64 bit layout is deterministic,
    * so the DuckDB oracle hash-checks the exact false-positive SET,
    * not just counts.
    */
  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{BloomContains, BloomHashing, BloomPositions}
    import org.apache.spark.sql.GraftBridge
    val salts = BloomHashing.salts(BloomK, BloomSeed).toSeq
    val build = Ingest.table(s, dir, "customer")
      .filter(col("c_acctbal") < 0.0)
      .select(col("c_custkey").as("bk"))
      .materialized // consumed twice: filter build + audit join
    val posArr = GraftBridge.column(
      BloomPositions(GraftBridge.expression(col("bk")), salts, BloomM))
    // ≤ m rows however large the build side — a config-bounded model,
    // like the IVF codebook collect
    val bits = build.select(explode(posArr).as("p")).distinct()
      .collect().map(_.getInt(0))
    val words = BloomHashing.pack(BloomM, bits).toSeq
    val passCol = GraftBridge.column(
      BloomContains(GraftBridge.expression(col("o_custkey")), salts, BloomM, words))
    val flagged = Ingest.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority"))
      .withColumn("bloom_pass", passCol)
      .join(build, col("o_custkey") === col("bk"), "left")
    flagged.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_probe"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("bk").isNotNull, 1L).otherwise(0L)).as("n_member"),
        sum(when(col("bloom_pass") && col("bk").isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
      .withColumn("fp_ppm",
        when(col("n_probe") === col("n_member"), 0L)
          .otherwise(expr("n_false_pos * 1000000 DIV (n_probe - n_member)")))
  }

  /** DuckDB mirror: the identical splitmix64 positions in HUGEINT
    * (OracleEmul.mix — same constants as BloomHashing.mix), the bit
    * set as a DISTINCT position CTE, membership as "all k probe
    * positions join the set" (duplicate positions within one key's k
    * slots each match independently, so HAVING count = k is exact).
    */
  val qBloomJoinSql: String = {
    val salts = graft.functions.BloomHashing.salts(BloomK, BloomSeed)
    def posList(key: String): String =
      salts.map { salt =>
        val u = java.lang.Long.toUnsignedString(salt)
        "CAST(" + OracleEmul.floorMod(
          OracleEmul.mix(s"xor($key::HUGEINT, ${u}::HUGEINT)"),
          "bmv", s"$BloomM::HUGEINT") + " AS INTEGER)"
      }.mkString("[", ",\n      ", "]")
    s"""WITH build AS (
       |  SELECT c_custkey AS bk FROM customer WHERE c_acctbal < 0.0),
       |bits AS (
       |  SELECT DISTINCT unnest(${posList("bk")}) AS p FROM build),
       |probe AS (
       |  SELECT o_orderkey, unnest(${posList("o_custkey")}) AS p FROM orders),
       |hit AS (
       |  SELECT o_orderkey FROM probe JOIN bits USING (p)
       |  GROUP BY o_orderkey HAVING count(*) = $BloomK),
       |flag AS (
       |  SELECT o.o_orderpriority,
       |    h.o_orderkey IS NOT NULL AS bloom_pass,
       |    b.bk IS NOT NULL AS is_member
       |  FROM orders o
       |  LEFT JOIN hit h ON o.o_orderkey = h.o_orderkey
       |  LEFT JOIN build b ON o.o_custkey = b.bk),
       |agg AS (
       |  SELECT o_orderpriority,
       |    count(*) AS n_probe,
       |    CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |    CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
       |    CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_false_pos
       |  FROM flag GROUP BY o_orderpriority)
       |SELECT o_orderpriority, n_probe, n_pass, n_member, n_false_pos,
       |  CASE WHEN n_probe = n_member THEN 0
       |       ELSE n_false_pos * 1000000 // (n_probe - n_member) END AS fp_ppm
       |FROM agg
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** Count-Min Sketch geometry for [[qCmsAudit]]: width sized near the
    * test-SF user cardinality so counter collisions — the thing the
    * audit measures — actually occur at oracle scales.
    */
  val CmsM = 2048
  val CmsK = 3
  val CmsSeed = 0xC0DE5EEDL

  /** Count-Min Sketch frequency estimation with an exact-error audit —
    * the point-query sketch beside [[qApproxDistinct]]'s cardinality
    * HLL: estimate per-user event counts from a k×m counter grid and
    * score the top-20 heavy hitters against their exact counts
    * (overestimate_ppm; CMS can only overestimate, pinned in spec).
    *
    * Fully distributed, no driver model: the corpus collapses to
    * per-user counts first (one partial-agged shuffle on user_id),
    * positions fan out k-fold over that USER-sized table (the
    * [[graft.functions.BloomPositions]] splitmix kernel — same
    * bit-exact HUGEINT oracle device), and the counter grid is a
    * (row, position)-keyed aggregate bounded by k·m regardless of
    * data size. The probe is a broadcast join of the 20 hitters'
    * positions against that grid + a min-fold per user. Merging two
    * grids is elementwise add — the sketch is distributive, the same
    * contract [[qHllUnion]] pins for HLL.
    */
  def qCmsAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{BloomHashing, BloomPositions}
    import org.apache.spark.sql.GraftBridge
    val salts = BloomHashing.salts(CmsK, CmsSeed).toSeq
    def positions(key: org.apache.spark.sql.Column) =
      GraftBridge.column(BloomPositions(GraftBridge.expression(key), salts, CmsM))
    val perUser = Ingest.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .materialized // consumed by the grid build AND the top-20 probe
    val grid = perUser
      .select(col("n"), posexplode(positions(col("user_id"))).as(Seq("j", "p")))
      .groupBy(col("j"), col("p")).agg(sum(col("n")).as("c"))
    val top = perUser
      .orderBy(col("n").desc, col("user_id")).limit(20)
    val est = top
      .select(col("user_id"), col("n").as("n_exact"),
        posexplode(positions(col("user_id"))).as(Seq("j", "p")))
      .join(grid, Seq("j", "p"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
    est.select(col("user_id"), col("n_exact"), col("n_est"),
      expr("(n_est - n_exact) * 1000000 DIV n_exact").as("over_ppm"))
  }

  /** DuckDB mirror: identical splitmix positions (OracleEmul), the
    * grid as a (j, p) GROUP BY, parallel unnest zipping position and
    * row index. j is 1-based here and 0-based in Spark — it never
    * leaves the plan; only (j, p) key CONSISTENCY within each engine
    * matters.
    */
  val qCmsAuditSql: String = {
    val salts = graft.functions.BloomHashing.salts(CmsK, CmsSeed)
    def posList(key: String): String =
      salts.map { salt =>
        val u = java.lang.Long.toUnsignedString(salt)
        "CAST(" + OracleEmul.floorMod(
          OracleEmul.mix(s"xor($key::HUGEINT, ${u}::HUGEINT)"),
          "cmv", s"$CmsM::HUGEINT") + " AS INTEGER)"
      }.mkString("[", ",\n      ", "]")
    val js = (1 to CmsK).mkString("[", ",", "]")
    s"""WITH uc AS (
       |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
       |up AS (
       |  SELECT user_id, n, unnest($js) AS j, unnest(${posList("user_id")}) AS p
       |  FROM uc),
       |grid AS (
       |  SELECT j, p, CAST(SUM(n) AS BIGINT) AS c FROM up GROUP BY j, p),
       |top AS (
       |  SELECT user_id, n FROM uc ORDER BY n DESC, user_id LIMIT 20),
       |tp AS (
       |  SELECT user_id, n AS n_exact, unnest($js) AS j, unnest(${posList("user_id")}) AS p
       |  FROM top),
       |est AS (
       |  SELECT tp.user_id, tp.n_exact, MIN(g.c) AS n_est
       |  FROM tp JOIN grid g ON tp.j = g.j AND tp.p = g.p
       |  GROUP BY tp.user_id, tp.n_exact)
       |SELECT user_id, n_exact, n_est,
       |  (n_est - n_exact) * 1000000 // n_exact AS over_ppm
       |FROM est
       |ORDER BY user_id""".stripMargin
  }

  /** Sketch-based JOIN CARDINALITY estimation — the optimizer
    * statistic a 100 TB planner needs before committing to a join
    * strategy, computed WITHOUT running the join: the Count-Min inner
    * product Σ_p gridA[j][p]·gridB[j][p], minimized over the k rows,
    * upper-bounds |A ⋈ B| = Σ_key n_A·n_B (AMS/CMS estimate — counts
    * are non-negative, so collisions only ADD; one-sided like
    * [[qCmsAudit]], spec-pinned). The audit joins the estimate with
    * the exact size and reports over_ppm.
    *
    * Shape at scale: each side collapses to its per-key count table
    * (one partial-agged shuffle each), grids are k·m-bounded
    * aggregates, and the estimate itself is a k·m-sized equi-join —
    * the ESTIMATE never touches corpus-sized data again. The exact
    * branch (key-count join) is the audit gate, same contract as
    * q_bloom_join's exact side.
    */
  def qJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{BloomHashing, BloomPositions}
    import org.apache.spark.sql.GraftBridge
    val salts = BloomHashing.salts(CmsK, CmsSeed).toSeq
    def grid(counts: DataFrame, key: String, out: String): DataFrame = {
      val pos = GraftBridge.column(
        BloomPositions(GraftBridge.expression(col(key)), salts, CmsM))
      counts
        .select(col(key), col("n"), posexplode(pos).as(Seq("j", "p")))
        .groupBy(col("j"), col("p")).agg(sum(col("n")).as(out))
    }
    // per-key count tables materialized ONCE: the grid build and the
    // exact audit branch both consume them (unmaterialized, each side
    // re-scanned its corpus per consumer — scan-audit finding)
    val ue = Ingest.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).materialized
    val uo = Ingest.table(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n")).materialized
    val est = grid(ue, "user_id", "ce")
      .join(grid(uo, "o_custkey", "co"), Seq("j", "p"))
      .groupBy(col("j")).agg(sum(expr("ce * co")).as("rowEst"))
      .agg(min(col("rowEst")).as("n_est"))
    val exact = ue.select(col("user_id"), col("n").as("ne"))
      .join(uo.select(col("o_custkey"), col("n").as("no")),
        col("user_id") === col("o_custkey"))
      .agg(coalesce(sum(expr("ne * no")), lit(0L)).as("n_exact"))
    exact.crossJoin(est) // two 1-row sides
      .select(col("n_exact"), col("n_est"),
        expr("CASE WHEN n_exact = 0 THEN 0" +
          " ELSE (n_est - n_exact) * 1000000 DIV n_exact END").as("over_ppm"))
  }

  val qJoinEstimateSql: String = {
    val salts = graft.functions.BloomHashing.salts(CmsK, CmsSeed)
    def posList(key: String, v: String): String =
      salts.map { salt =>
        val u = java.lang.Long.toUnsignedString(salt)
        "CAST(" + OracleEmul.floorMod(
          OracleEmul.mix(s"xor($key::HUGEINT, ${u}::HUGEINT)"),
          v, s"$CmsM::HUGEINT") + " AS INTEGER)"
      }.mkString("[", ",\n      ", "]")
    val js = (1 to CmsK).mkString("[", ",", "]")
    s"""WITH ue AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
       |uo AS (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1),
       |ge AS (
       |  SELECT j, p, CAST(SUM(n) AS BIGINT) AS ce FROM (
       |    SELECT n, unnest($js) AS j, unnest(${posList("k", "jev")}) AS p FROM ue)
       |  GROUP BY j, p),
       |go AS (
       |  SELECT j, p, CAST(SUM(n) AS BIGINT) AS co FROM (
       |    SELECT n, unnest($js) AS j, unnest(${posList("k", "jov")}) AS p FROM uo)
       |  GROUP BY j, p),
       |est AS (
       |  SELECT MIN(rowEst) AS n_est FROM (
       |    SELECT ge.j, CAST(SUM(ce * co) AS BIGINT) AS rowEst
       |    FROM ge JOIN go ON ge.j = go.j AND ge.p = go.p
       |    GROUP BY ge.j)),
       |ex AS (
       |  SELECT CAST(coalesce(SUM(ue.n * uo.n), 0) AS BIGINT) AS n_exact
       |  FROM ue JOIN uo ON ue.k = uo.k)
       |SELECT n_exact, n_est,
       |  CASE WHEN n_exact = 0 THEN 0
       |       ELSE (n_est - n_exact) * 1000000 // n_exact END AS over_ppm
       |FROM ex CROSS JOIN est""".stripMargin
  }

  // KMV sketch size: relative sd of the distinct estimate is
  // ~1/sqrt(K-2) ≈ 6% at 256 — the sketch is 2 KB per key.
  private val KmvK = 256

  /** KMV (K-Minimum-Values) sketch INTERSECTION with exact-error audit
    * — the set operation [[qHllUnion]]'s sketches cannot do: HLL
    * merges are union-only, so "how many users do types A and B
    * share" from summaries needs a sketch whose values can be
    * compared, and KMV (Beyer et al. 2007, "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations") is the
    * classic answer. Per event type, the sketch is the [[KmvK]]
    * smallest `splitmix64(user_id) >>> 1` values over distinct users —
    * fully DETERMINISTIC (no seeded RNG, the `q_sample_uniform`/
    * `Ann.split` device), so unlike a randomized sketch the estimate
    * itself is hash-checkable: the oracle replays the sketch bit-for-
    * bit. For each type pair the union sketch is the K smallest of the
    * merged value sets (`v_k` its K-th value), est_union =
    * floor((K−1)·2⁶³ / v_k) — one long→double cast and one IEEE
    * division per pair, both single-rounding-identical across engines
    * (the SortedJaccard rule) — and est_inter scales est_union by the
    * fraction of union-sketch values present in BOTH sketches. When
    * the merged value set has fewer than K values the sketches ARE the
    * sets and the row reports exact counts (the small-pair fast path,
    * same CASE in both engines). `err_bp` audits the estimate against
    * the exact pair overlap ([[graft.operators.Analytics]]
    * `q_user_overlap`'s join), the [[qCmsAudit]]/[[qJoinEstimate]]
    * posture: the sketch is the production path, the exact branch the
    * audit.
    *
    * Shape at scale: one distinct shuffle on (type, user) + a per-type
    * rank cut builds ALL sketches in one pass — 2 KB per type — and
    * every pairwise intersection is answered from sketches alone
    * (type-count-bounded, no data contact); the exact audit branch is
    * the only pair-sized work and a deployment drops it. At 100 TB:
    * sketch once, answer any audience-overlap question from KBs.
    */
  def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.expressions.Window
    val ut = Ingest.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .materialized // feeds the sketch build AND the exact audit join
    val mixed = GraftBridge.column(graft.functions.SplitMix64(
      GraftBridge.expression(col("user_id"))))
    val sk = ut
      .withColumn("u63", shiftrightunsigned(mixed, 1))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("u63"), col("user_id"))))
      .filter(col("rk") <= KmvK)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("u63"))).as("sk"))
    val exact = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    exact
      .join(sk.select(col("event_type").as("type_a"), col("sk").as("sk_a")), "type_a")
      .join(sk.select(col("event_type").as("type_b"), col("sk").as("sk_b")), "type_b")
      .withColumn("merged", expr(s"slice(array_sort(array_distinct(concat(sk_a, sk_b))), 1, $KmvK)"))
      .withColumn("n_shared", expr("CAST(size(array_intersect(merged, array_intersect(sk_a, sk_b))) AS BIGINT)"))
      .withColumn("est_union",
        // (K−1)·2⁶³ computed in DOUBLE: the long constant rounds to
        // exactly 2⁶³ and the product is exact — a Long multiply
        // would overflow before the cast
        expr(s"""CASE WHEN size(merged) < $KmvK THEN CAST(size(merged) AS BIGINT)
                 ELSE CAST(floor(CAST(${KmvK - 1} AS DOUBLE) * CAST(9223372036854775807 AS DOUBLE)
                      / CAST(element_at(merged, $KmvK) AS DOUBLE)) AS BIGINT) END"""))
      .withColumn("est_inter",
        expr(s"CASE WHEN size(merged) < $KmvK THEN n_shared ELSE (n_shared * est_union) DIV $KmvK END"))
      .select(col("type_a"), col("type_b"), col("n_both"), col("est_inter"),
        expr("CASE WHEN n_both = 0 THEN 0 ELSE ((est_inter - n_both) * 10000) DIV n_both END")
          .as("err_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Oracle: the identical deterministic sketch in HUGEINT splitmix
    * ([[OracleEmul.mix]], `>>> 1` = `// 2` unsigned), list ops for the
    * merge, the same single-rounding double division. */
  val qKmvOverlapSql: String =
    s"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
       |m AS (SELECT event_type, user_id,
       |  CAST(${OracleEmul.mix("user_id::HUGEINT")} // 2 AS BIGINT) AS u63 FROM ut),
       |r AS (SELECT event_type, u63,
       |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u63, user_id) AS rk FROM m),
       |sk AS MATERIALIZED (SELECT event_type, list_sort(list(u63)) AS sk
       |  FROM r WHERE rk <= $KmvK GROUP BY event_type),
       |ex AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
       |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT type_a, type_b, n_both,
       |    list_sort(list_distinct(sa.sk || sb.sk))[1:$KmvK] AS merged,
       |    sa.sk AS sk_a, sb.sk AS sk_b
       |  FROM ex JOIN sk sa ON ex.type_a = sa.event_type
       |  JOIN sk sb ON ex.type_b = sb.event_type),
       |e AS (
       |  SELECT type_a, type_b, n_both,
       |    CAST(len(list_intersect(merged, list_intersect(sk_a, sk_b))) AS BIGINT) AS n_shared,
       |    CASE WHEN len(merged) < $KmvK THEN CAST(len(merged) AS BIGINT)
       |         ELSE CAST(floor(CAST(${KmvK - 1} AS DOUBLE) * CAST(9223372036854775807 AS DOUBLE)
       |              / CAST(merged[$KmvK] AS DOUBLE)) AS BIGINT) END AS est_union,
       |    len(merged) AS n_merged
       |  FROM j),
       |f AS (
       |  SELECT type_a, type_b, n_both,
       |    CASE WHEN n_merged < $KmvK THEN n_shared
       |         ELSE (n_shared * est_union) // $KmvK END AS est_inter
       |  FROM e)
       |SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
       |  CAST(est_inter AS BIGINT) AS est_inter,
       |  CAST(CASE WHEN n_both = 0 THEN 0
       |       ELSE ((est_inter - n_both) * 10000) // n_both END AS BIGINT) AS err_bp
       |FROM f
       |ORDER BY type_a, type_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kmv_overlap"     -> qKmvOverlap _,
    "q_join_estimate"   -> qJoinEstimate _,
    "q_cms_audit"       -> qCmsAudit _,
    "q_bloom_join"      -> qBloomJoin _,
    "q_grouping_sets"   -> qGroupingSets _,
    "q_sliding_reach"   -> qSlidingReach _,
    "q_hll_union"       -> qHllUnion _,
    "q_skew_report"     -> qSkewReport _,
    "q_fanout_audit"    -> qFanoutAudit _,
    "q_winsorize"       -> qWinsorize _,
    "q_zorder_layout" -> qZorderLayout _,
    "q_approx_percentiles" -> qApproxPercentiles _,
    "q_approx_distinct" -> qApproxDistinct _,
    "q_group_topk"   -> qGroupTopk _,
    "q_stats_moments" -> qStatsMoments _,
    "q_skew_agg"     -> qSkewAgg _,
    "q_cube"         -> qCube _,
    "q_percentiles"  -> qPercentiles _,
    "q_json_extract" -> qJsonExtract _
  )

  val oracle: Map[String, String] = Map(
    "q_kmv_overlap"     -> qKmvOverlapSql,
    "q_join_estimate"   -> qJoinEstimateSql,
    "q_cms_audit"       -> qCmsAuditSql,
    "q_bloom_join"      -> qBloomJoinSql,
    "q_grouping_sets"   -> qGroupingSetsSql,
    "q_hll_union"       -> qHllUnionSql,
    "q_sliding_reach"   -> qSlidingReachSql,
    "q_skew_report"     -> qSkewReportSql,
    "q_fanout_audit"    -> qFanoutAuditSql,
    "q_winsorize"       -> qWinsorizeSql,
    "q_zorder_layout" -> qZorderLayoutSql,
    "q_approx_percentiles" -> qApproxPercentilesSql,
    "q_approx_distinct" -> qApproxDistinctSql,
    "q_group_topk"   -> qGroupTopkSql,
    "q_stats_moments" -> qStatsMomentsSql,
    "q_skew_agg"     -> qSkewAggSql,
    "q_cube"         -> qCubeSql,
    "q_percentiles"  -> qPercentilesSql,
    "q_json_extract" -> qJsonExtractSql
  )
}
