package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic relational operators the built-in API spells awkwardly at scale:
 * point-in-interval (range) joins and per-group top-k.
 *
 * Range joins are the classic Spark trap: `a.join(b, a.ts between b.lo and
 * b.hi)` has no equi-key, so Catalyst falls back to
 * BroadcastNestedLoopJoin — O(|points|·|ranges|) comparisons, a
 * full-cartesian shuffle when neither side broadcasts. Both spellings here
 * keep an equi-key in the join so the planner picks a hash/merge join:
 *
 *  - [[rangeJoinBinned]]: replicate each interval into the fixed-width
 *    bins it spans, equi-join points on bin, post-filter exact
 *    containment. Handles OVERLAPPING intervals; shuffle is on the bin
 *    key, replication factor = interval length / bin width. The 100 TB
 *    path.
 *  - [[rangeLookupAsOf]]: for a SMALL interval table (calendar periods,
 *    rate tables), an as-of join on interval start (broadcast
 *    binary-search, zero shuffle of the points side) + end-bound filter.
 *    Exact for non-overlapping intervals.
 */
object Relational {

  /**
   * Binned range join of `points` (long column `ptCol`) into `ranges`
   * (long columns `startCol`..`endCol`, inclusive). Works for overlapping
   * intervals; every (point, containing-interval) pair is emitted exactly
   * once (a point and any covering interval share at least one bin, and
   * the containment filter runs on the deduped bin pair — each interval
   * lands in a given bin at most once).
   *
   * `div` (truncating integer division) is monotonic, so bin(pt) always
   * lies within [bin(start), bin(end)] — no float division of epoch-scale
   * longs (exactness trap) and negative values stay correct.
   *
   * Pick `binWidth` ≈ the typical interval length: replication factor is
   * ceil(len/binWidth)+1 while point-side bin cardinality stays high
   * enough to spread the shuffle.
   */
  def rangeJoinBinned(points: DataFrame, ranges: DataFrame, ptCol: String,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(ranges.columns.toSet)
    require(overlap.isEmpty, s"column collision between sides: $overlap")
    val bin = "__range_bin"
    val p = points.withColumn(bin, expr(s"`$ptCol` div ${binWidth}L"))
    val r = ranges.withColumn(bin,
      explode(expr(s"sequence(`$startCol` div ${binWidth}L, `$endCol` div ${binWidth}L)")))
    p.join(r, Seq(bin))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop(bin)
  }

  /**
   * INTERVAL-OVERLAP join, binned: pairs `(a, b)` with
   * `a.start <= b.end AND b.start <= a.end` (inclusive overlap) — the
   * interval×interval generalization of [[rangeJoinBinned]]'s
   * point-in-interval, and the classic sessions×outages /
   * genomics-style overlap query a naive planner turns into a
   * cartesian product.
   *
   * Scale shape: each interval explodes to the bins it covers, the
   * sides meet in ONE equi-join on the bin key, the true-overlap
   * predicate filters bin-mates that don't actually overlap, and the
   * canonical-bin filter `bin == max(a.start, b.start) div width`
   * keeps each overlapping pair EXACTLY ONCE (two overlapping
   * intervals always share the later start's bin — no distinct
   * shuffle). `keys` (series columns named identically on both sides,
   * e.g. user id) join alongside the bin, so the shuffle spreads by
   * (key, bin) and a hot time-bin doesn't funnel every series into one
   * reducer. Replication factor is interval length / binWidth: size
   * the width near the typical interval length. Long intervals fan out
   * linearly — cap or split outliers upstream; residual skew falls to
   * AQE like any equi-join.
   */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      startL: String, endL: String, startR: String, endR: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collision =
      left.columns.toSet.intersect(right.columns.toSet) -- keys.toSet
    require(collision.isEmpty, s"column collision between sides: $collision")
    val bin = "__ovl_bin"
    def binned(df: DataFrame, s: String, e: String) = df.withColumn(bin,
      explode(expr(s"sequence(`$s` div ${binWidth}L, `$e` div ${binWidth}L)")))
    binned(left, startL, endL)
      .join(binned(right, startR, endR), bin +: keys)
      .filter(col(startL) <= col(endR) && col(startR) <= col(endL))
      .filter(col(bin) === expr(
        s"greatest(`$startL`, `$startR`) div ${binWidth}L"))
      .drop(bin)
  }

  /**
   * Broadcast interval lookup via as-of join: match each point to the
   * interval with the greatest `startCol` ≤ point, keep it only when the
   * point is also ≤ its `endCol`. Inner-join semantics (unmatched points
   * drop). EXACT only when intervals don't overlap (at most one interval
   * can contain the point among those starting before it — the as-of
   * winner). The interval table is collected + broadcast
   * ([[graft.risk.AsOfJoin.asofJoinBroadcast]]), so the big points side
   * never shuffles.
   */
  def rangeLookupAsOf(points: DataFrame, ranges: DataFrame, ptCol: String,
      startCol: String, endCol: String,
      rangePrefix: String = "range_"): DataFrame = {
    val r = ranges.withColumnRenamed(startCol, ptCol)
    val joined = graft.risk.AsOfJoin.asofJoinBroadcast(points, r, ptCol,
      rightPrefix = rangePrefix)
    joined.filter(col(rangePrefix + endCol).isNotNull &&
      col(ptCol) <= col(rangePrefix + endCol))
  }

  /**
   * Bloom-prefiltered equi join: build a Bloom filter over the (smaller)
   * right side's keys, broadcast it, drop left rows that cannot match
   * BEFORE the join shuffle, then run the exact join. Row-identical to
   * `left.join(right, Seq(key))` — false positives are removed by the
   * exact join, false negatives don't exist — but the big side's shuffle
   * carries only ~selectivity + fpp of its rows. The standard trick when
   * the right side is too big to broadcast yet joins selectively
   * (Spark's own runtime bloom InjectRuntimeFilter does this for SMJ
   * under AQE; this is the explicit, always-on spelling).
   */
  def bloomPrefilterJoin(left: DataFrame, right: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    val spark = left.sparkSession
    // one pass over the small side to size + fill the filter
    val rightM = right.localCheckpoint()
    val n = math.max(rightM.count(), 1L)
    val bf = rightM.stat.bloomFilter(key, n, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    import org.apache.spark.sql.types.{LongType, IntegerType, StringType}
    val might = (left.schema(key).dataType match {
      case LongType | IntegerType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
      case dt => throw new IllegalArgumentException(
        s"bloom prefilter supports long/int/string keys, got $dt")
    }).withName("bloomMightContain")
    left.filter(might(col(key))).join(rightM, Seq(key))
  }

  /**
   * Skew-safe equi join: spread each hot left key over `saltFactor`
   * shuffle partitions by salting, replicating the (smaller) right side
   * `saltFactor`× to compensate. Result is row-identical to
   * `left.join(right, keys, joinType)` — each (left row, right row) pair
   * meets in exactly one salted partition — but the hottest key's rows
   * now land on `saltFactor` reducers instead of one.
   *
   * AQE's skew-join handles this automatically for sort-merge joins; this
   * is the explicit spelling for when the skew is known ahead of time or
   * AQE is unavailable (e.g. inside a cached/bucketed stage). Supports
   * `inner` and `left` joins (right/full would need the salt on the other
   * side).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    require(Set("inner", "left", "leftouter", "left_outer").contains(joinType),
      s"salt lives on the left side; joinType $joinType unsupported")
    val salt = "__join_salt"
    // correctness never depends on WHICH salt a row gets, only that the
    // right side covers all of them — so spread by ROW POSITION, not row
    // content: a content hash would send fully-identical hot rows (the
    // canonical skew input) to one salt and defeat the whole point
    val l = left.withColumn(salt,
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn(salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ salt, joinType).drop(salt)
  }

  /**
   * Measured salt factor for [[saltedJoin]] — [[skewReport]] composed
   * into the sizing decision instead of a caller-guessed constant: one
   * bounded counting pass finds the hottest key's exact ppm share, and
   * the factor is how many reducers that share must spread over to sit
   * at `targetSharePpm` per reducer (default: one partition's fair
   * share, 10⁶/defaultParallelism). A table whose hottest key is
   * already below target returns 1 — no salting, no replication.
   * Clamped to `maxSalt` (right-side replication is `maxSalt`×).
   */
  def autoSaltFactor(left: DataFrame, keys: Seq[String],
      targetSharePpm: Long = 0L, maxSalt: Int = 64): Int = {
    val target =
      if (targetSharePpm > 0) targetSharePpm
      else math.max(1L,
        1000000L / left.sparkSession.sparkContext.defaultParallelism)
    // bounded collect: the single hottest key's share (skewReport's
    // aggregation map-combines, so it does not suffer the skew it measures)
    val top = skewReport(left, struct(keys.map(col): _*), topK = 1)
      .select(col("share_ppm")).collect()
    val share = if (top.isEmpty) 0L else top(0).getLong(0)
    math.min(maxSalt.toLong,
      math.max(1L, (share + target - 1) / target)).toInt
  }

  /** [[saltedJoin]] with the salt factor DERIVED from the measured key
   * skew ([[autoSaltFactor]]); factor 1 (no hot key) degenerates to the
   * plain equi join — no salt column, no right-side replication. */
  def saltedJoinAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
      joinType: String = "inner", targetSharePpm: Long = 0L,
      maxSalt: Int = 64): DataFrame = {
    val factor = autoSaltFactor(left, keys, targetSharePpm, maxSalt)
    if (factor <= 1) left.join(right, keys, joinType)
    else saltedJoin(left, right, keys, factor, joinType)
  }

  /**
   * Top `k` rows per group, ranked by `order` (pass explicit tie-breakers
   * for deterministic output). One shuffle on the group key; each group
   * sorts (and spills) locally — the idiomatic scalable spelling. The
   * rank survives as `rankCol`.
   */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int, rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /**
   * Distributed EXCLUSIVE prefix sum over a global order — the two-pass
   * partition-offset algorithm, NOT a global window (an unpartitioned
   * `sum over (order by …)` collapses the whole table into one task —
   * the SURVEY §4 pitfall the chunked risk windows also avoid, but a
   * prefix sum has unbounded look-back so chunk-overlap does not apply):
   *
   *   1. range-partition by `orderCol`, local exclusive running sum per
   *      partition (window keyed by the partition id — parallel);
   *   2. per-partition totals (one tiny aggregation) cumulate on the
   *      driver — numPartitions longs, KBs at any data size — and join
   *      back as each partition's starting offset.
   *
   * `orderCol` must be a globally unique NUMERIC key (ties would make
   * "preceding" ill-defined in any engine; the range buckets are
   * computed arithmetically from its min/max so two jobs over the same
   * data always agree — `repartitionByRange`'s sampled boundaries would
   * not). Exact: integer arithmetic throughout for long/int `valueCol`;
   * skewed key distributions skew the buckets (uniform ids are the
   * intended input — densify first if needed).
   */
  /**
   * JOIN-KEY skew report — the diagnostic run before sizing a big join
   * or choosing [[saltedJoin]]'s salt factor: the `topK` heaviest keys
   * with exact row counts and integer parts-per-million share
   * (`cnt · 1e6 div total` — floor division on longs, bit-identical
   * across engines/partitionings), plus each key's cumulative share so
   * "the top 3 keys are 40% of the table" reads straight off the
   * output. A key above ~`1e6/numPartitions` ppm is a straggler
   * candidate; one above a few percent wants salting or an AQE skew
   * split.
   *
   * Scale shape: one map-side-combinable count aggregation (hot keys
   * combine before the shuffle — the aggregation does not itself
   * suffer the skew it measures), the 1-row total cross-joined back
   * (broadcast), a TakeOrdered top-K heap, and the tiny K-row window
   * for the cumulative column. Nothing corpus-sized crosses the wire.
   */
  def skewReport(df: DataFrame, keyCol: Column, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.crossJoin(total)
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
    top.withColumn("cum_ppm",
      sum(col("share_ppm")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("key"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .cast("long"))
  }

  /**
   * EXACT k-th smallest (1-based) of an integer column — distributed
   * SELECTION via driver-coordinated binary search on the VALUE range:
   * `O(log range)` map-combinable `count(v ≤ mid)` passes instead of a
   * global sort (whose final merge is one task) or a `percentile`
   * window. Invariant: the answer is the smallest `v₀` with
   * `count(v ≤ v₀) ≥ k` — exact under ties, matching SQL
   * `ORDER BY v LIMIT 1 OFFSET k−1`. The (narrow) value column is
   * cached once, so the ~40 worst-case probe jobs scan one cached
   * long column, not the source table. Exact-median/p-k at 100 TB where
   * `histogramQuantile`'s bin error is not acceptable.
   */
  def exactKth(df: DataFrame, value: Column, k: Long,
      buckets: Int = 4096): Long = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val v = df.select(value.cast("long").as("v")).filter(col("v").isNotNull)
      .cache()
    try {
      val row = v.agg(min(col("v")), max(col("v")), count(lit(1))).head()
      val n = row.getLong(2)
      require(k >= 1 && k <= n, s"k must be in [1, $n], got $k")
      var lo = row.getLong(0)
      var hi = row.getLong(1)
      var kk = k // rank of the answer within the current [lo, hi] window
      // multi-way narrowing: each pass histograms the window into
      // `buckets` cells in ONE map-combinable aggregation (≤ `buckets`
      // rows to the driver) and descends into the cell holding rank kk —
      // log_buckets(range) passes (a 2⁶³ range is ≤ 6 with 4096 cells)
      // vs ~63 for a binary search, and at scale each pass is one scan
      // of the cached long column
      while (hi - lo >= buckets.toLong) {
        val width = Math.floorDiv(hi - lo, buckets.toLong) + 1
        val hist = v.filter(col("v").between(lo, hi))
          .groupBy(expr(s"(v - ${lo}L) div ${width}L").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        var cum = 0L
        val (b, before) = hist.collectFirst {
          case (bi, c) if { cum += c; cum >= kk } => (bi, cum - c)
        }.get
        kk -= before
        hi = math.min(hi, lo + (b + 1) * width - 1)
        lo = lo + b * width
      }
      // final window is < `buckets` distinct values: one exact per-value
      // count resolves the rank
      val tail = v.filter(col("v").between(lo, hi))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .sortBy(_._1)
      var cum = 0L
      tail.collectFirst {
        case (value0, c) if { cum += c; cum >= kk } => value0
      }.get
    } finally { v.unpersist(); () }
  }

  /**
   * Per-GROUP exact (lower) median over a BOUNDED-DOMAIN integer column
   * — the group-wise companion of [[exactKth]] where a driver loop per
   * group would not scale: one (group, value) count aggregation
   * (map-combinable; |groups|·|domain| cells max), then a per-group
   * cumulative walk over DISTINCT VALUES picks the smallest v with
   * `cum ≥ (n+1) div 2`. Matches SQL sort-offset median semantics
   * exactly, ties included. The window sorts value cells, not rows —
   * a 10⁹-row group with a 100-value domain costs 100 window rows.
   */
  def groupedExactMedian(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val keys = groupCols.map(col)
    val counts = df
      .groupBy(keys :+ value.cast("long").as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(keys: _*)
    counts
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(col("cum") >= expr("(n + 1) div 2") &&
        col("cum") - col("c") < expr("(n + 1) div 2"))
      .select(keys :+ col("v").as("median") :+ col("n").as("n_rows"): _*)
  }

  /**
   * SCD TYPE-2 history build: collapse a change log `(key, order,
   * attrs…)` into versioned rows with `[valid_from, valid_to)` intervals
   * — the dimension-table twin of `Warehouse.mergeUpsert` (which keeps
   * only the latest version, SCD-1). Consecutive log rows whose tracked
   * attributes are unchanged are dropped (no-op updates don't open a new
   * version); each surviving row is valid from its own `orderCol` until
   * the NEXT change of the same key (`valid_to` null = current,
   * `is_current` true).
   *
   * Change detection compares an attribute fingerprint via `lag` —
   * null-safe through a `\u0000` sentinel (null ≠ any value, null = null
   * — SQL `IS DISTINCT FROM` semantics). `orderCol` must be unique per
   * key (a change log with two states at the same instant has no
   * well-defined history — same contract every SCD2 builder imposes).
   *
   * Scale shape: ONE shuffle on the key; both windows (lag fingerprint,
   * lead valid_to) sort per key-partition and spill locally — no global
   * window, no self-join, no collect. 100 TB of change log with a sane
   * key cardinality parallelizes on the key hash.
   */
  def scd2(log: DataFrame, keyCols: Seq[String], orderCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs at least one key column and one tracked attribute")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val fpr = concat_ws("\u0001",
      attrCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    log
      .withColumn("__fpr", fpr)
      .withColumn("__prev", lag(col("__fpr"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("__fpr"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__fpr", "__prev")
  }

  /**
   * INCREMENTAL [[scd2]] maintenance — apply a LATER batch of change-log
   * rows to an existing history without re-reading the closed past: the
   * closed versions pass through untouched; each key's CURRENT row
   * re-enters the builder as a pseudo log row at its own `valid_from`
   * alongside the new changes, and [[scd2]] over that union re-derives
   * the key's open tail (closing the current row if the first real
   * change differs, dropping no-op changes against it exactly like the
   * batch builder). **Provably equal to `scd2(fullLog)`** whenever every
   * change is strictly later than its key's current `valid_from` — the
   * append-only contract of a CDC feed; LATE data violates it and needs
   * the batch rebuild (same restriction every incremental SCD2 merge
   * imposes).
   *
   * Work is sized by |changes| + |live keys|, not |history| — the point
   * at a 100 TB dimension: the closed past is never shuffled, only
   * unioned into the output. Output schema is normalized to
   * `keys ++ orderCol ++ attrs ++ (valid_from, valid_to, is_current)`;
   * passthrough columns beyond the tracked set don't survive (they
   * couldn't be maintained incrementally anyway).
   */
  def scd2Apply(history: DataFrame, changes: DataFrame,
      keyCols: Seq[String], orderCol: String,
      attrCols: Seq[String]): DataFrame = {
    val core = (keyCols :+ orderCol) ++ attrCols
    val outCols =
      (core ++ Seq("valid_from", "valid_to", "is_current")).map(col)
    val closed = history.filter(!col("is_current")).select(outCols: _*)
    val relog = history.filter(col("is_current"))
      .select(core.map(col): _*)
    val updated = scd2(
      relog.unionByName(changes.select(core.map(col): _*)),
      keyCols, orderCol, attrCols)
    closed.unionByName(updated.select(outCols: _*))
  }

  /**
   * Join-size PRE-FLIGHT: the exact output cardinality and per-key mass
   * of `left ⋈ right` on an equi-key, computed WITHOUT running the join
   * — two map-combinable per-key count aggregations, one join of the
   * (already tiny) count tables, one 1-row total, a TakeOrdered top-K.
   * The ops gate before a 100 TB join: |A ⋈ B| = Σ_k cl(k)·cr(k), so a
   * key whose count product dominates `share_ppm` is the skew/blow-up
   * culprit to salt ([[saltedJoinAuto]]), filter, or pre-aggregate —
   * found at per-key-count cost instead of by OOMing the real join.
   *
   * NULL keys are excluded (SQL equi-joins never match them). Exact in
   * longs for per-key products and totals up to 2^63; `share_ppm` is
   * exact integer ppm while total_pairs ≤ 9.2e12 (beyond that the ppm
   * numerator saturates long arithmetic — at that size the total alone
   * already answers the go/no-go question).
   */
  def joinSizePreflight(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val lc = left.select(leftKey.as("key")).where(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.select(rightKey.as("key")).where(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_right"))
    val prod = lc.join(rc, "key")
      .withColumn("pairs", col("n_left") * col("n_right"))
    // 1-row aggregate cross join (the bounded-literal boundary, as in
    // the other report queries) — keeps the whole report one lazy plan
    val tot = prod.agg(coalesce(sum(col("pairs")), lit(0L)).as("total_pairs"))
    prod.crossJoin(tot)
      .withColumn("share_ppm",
        expr("pairs * 1000000 div greatest(total_pairs, 1)"))
      .orderBy(col("pairs").desc, col("key"))
      .limit(topK)
  }

  /**
   * One-pass table PROFILE — the ANALYZE/data-quality surface: per
   * column `n_nulls`, `n_distinct`, `min`/`max` (as strings, so one
   * long-format report covers heterogeneous schemas). One aggregation
   * over the data: Spark plans the multi-column distinct via Expand
   * (one scan, ×|cols| row fan-out before the partial agg — the honest
   * cost of EXACT ndv; pass `exactDistinct = false` to profile with
   * `approx_count_distinct` instead, no Expand, ±2% ndv, the 100 TB
   * default). The wide 1-row aggregate is unpivoted driver-free via
   * `stack`.
   */
  def profileTable(df: DataFrame, exactDistinct: Boolean = true): DataFrame = {
    val cols = df.schema.fields.map(_.name).toSeq
    require(cols.nonEmpty, "cannot profile a zero-column frame")
    // names are spliced into the stack() SQL below — refuse the two
    // characters that could break out of the quoting
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      s"column names with backticks/quotes unsupported: ${cols.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      val q = col(c)
      Seq(count(lit(1)).minus(count(q)).cast("long").as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(q)
         else approx_count_distinct(q)).cast("long").as(s"__nd_$c"),
        min(q).cast("string").as(s"__mn_$c"),
        max(q).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_value, max_value)"))
  }

  /**
   * EXACT global 1-based rank under a TOTAL order — the scalable
   * spelling of `row_number() OVER (ORDER BY …)`: an unpartitioned
   * rank window collapses to ONE task holding the whole table; this
   * runs range-partitioned (each partition ranks locally, in parallel)
   * plus a bounded per-partition count collect (one row per shuffle
   * partition — metadata, never data) whose prefix sums become
   * broadcast offsets. Exactness needs the order to be TOTAL (include
   * a tiebreaker id in `sortCols`); with a total order the result is
   * invariant to input partitioning (spec-pinned) because range
   * partitions are disjoint and ascending by construction.
   */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "rk"): DataFrame = {
    require(sortCols.nonEmpty, "globalRank needs at least one sort column")
    val pid = "__rank_pid"
    // lineage truncated once: the counts job and the output both read
    // the range-shuffled frame (same discipline as prefixSum)
    val src = df.repartitionByRange(sortCols: _*)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint(false)
    val counts = src.groupBy(col(pid)).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) =>
      (p, acc + c) }
      .sliding(2).collect { case Array((_, acc), (p, _)) => (p, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    if (offsets.isEmpty) return src.withColumn(outCol, lit(0L)).drop(pid)
    val offDf = broadcast(offsets.toDF(pid, "__off"))
    src.withColumn("__local",
        row_number().over(Window.partitionBy(col(pid))
          .orderBy(sortCols: _*)).cast("long"))
      .join(offDf, Seq(pid))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop(pid, "__local", "__off")
  }

  def prefixSum(df: DataFrame, orderCol: String, valueCol: Column,
      outCol: String): DataFrame = {
    val pid = "__prefix_pid"
    // truncate lineage once: the bounds job, the totals job, and the
    // final output all read this — without it the caller's upstream
    // (e.g. tokenization) re-executes per job
    val src = df.localCheckpoint(false)
    val bounds = src.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).collect().head
    if (bounds.isNullAt(0)) return src.withColumn(outCol, lit(0L))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val nParts = src.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val width = math.max(1L, (hi - lo) / nParts + 1L)
    // integer `div`, not `/`: float division would lose exactness for
    // keys beyond 2^53
    val bucket = expr(
      s"CAST((CAST(`$orderCol` AS BIGINT) - ${lo}L) div ${width}L AS INT)")
    val bucketed = src.withColumn(pid, bucket)
    val local = bucketed
      .withColumn(outCol,
        coalesce(sum(valueCol).over(Window.partitionBy(col(pid))
          .orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    // per-bucket totals need no running sum — aggregate the bucketed
    // frame directly rather than the windowed one
    val totals = bucketed.groupBy(col(pid)).agg(sum(valueCol).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) => (p, acc + t) }
      .sliding(2).collect { case Array((_, acc), (p, _)) => (p, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toDF(pid, "__off"))
    local.join(offDf, Seq(pid))
      .withColumn(outCol, col(outCol) + col("__off"))
      .drop(pid, "__off")
  }
}
