package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling for training-data pipelines.
 *
 * `df.sample(fraction)` is seed-dependent and partition-layout-dependent —
 * rerun the job with different parallelism and you get a different corpus.
 * These operators key every decision off the MD5-prefix hash of a stable
 * id ([[TextFunctions.hash60]]), so the same row makes the same decision
 * on any cluster, any partitioning, any engine (a DuckDB/Trino twin
 * reproduces the exact sample). That stability is what makes train/test
 * splits auditable and incremental re-runs append-consistent at 100 TB.
 *
 * All decisions are narrow codegen'd expressions on the scan — filters
 * push down ahead of any shuffle.
 */
object Sampling {

  /** In [0, den) slot of the key's hash — the shared primitive. A second
   * `salt` string decorrelates independent samples over the same keys. */
  def hashSlot(key: Column, den: Int, salt: String = ""): Column =
    pmod(TextFunctions.hash60(concat(key.cast("string"), lit(salt))), lit(den))

  /** Keep rows whose key hashes into `num`/`den` of the slot space.
   * Deterministic: the same key always lands in or out. */
  def hashSample(df: DataFrame, key: Column, num: Int, den: Int = 10000,
      salt: String = ""): DataFrame = {
    require(num >= 0 && num <= den, s"need 0 <= num <= den, got $num/$den")
    df.filter(hashSlot(key, den, salt) < num)
  }

  /**
   * Per-group sampling rates — corpus mixture weighting ("keep 80% of
   * wiki, 20% of web"). Each row keeps with its group's rate,
   * hash-deterministic per key; groups absent from `rates` use
   * `defaultRate`. The when-chain is order-independent (group values are
   * mutually exclusive), so map iteration order cannot change results.
   */
  def mixtureSample(df: DataFrame, groupCol: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = ""): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0 && r <= 1, s"rates must be in [0,1], got $r"))
    val den = 10000
    // thresholds rounded in Scala (same convention as hashSplit) and
    // planted as integer literals — a float `rate*den` cast would
    // TRUNCATE, so 0.29 ⇒ 2899.99… ⇒ 2899 and drift from a SQL twin's
    // rounded CAST; integer literals leave nothing engine-dependent
    val thr = rates.foldLeft(lit(math.round(defaultRate * den).toInt)) {
      case (acc, (g, r)) =>
        when(groupCol === lit(g), lit(math.round(r * den).toInt)).otherwise(acc)
    }
    df.filter(hashSlot(key, den, salt) < thr)
  }

  /**
   * LEAKAGE-SAFE train/eval split: hash on the NEAR-DUP CLUSTER id, not
   * the document id, so a document and its near-duplicates can never
   * straddle the split boundary — the standard eval-contamination bug a
   * plain [[hashSplit]] has on any corpus with near-dups (the test set
   * "generalization" is then just memorized training paraphrases).
   * `pairs` is any near-dup pair table (MinHash [[Dedup.minhashNearDups]],
   * SimHash, SemDeDup…); unpaired documents fall back to their own id as
   * the split key. Output: the input columns + `cluster` (null when
   * unpaired) + `split`.
   *
   * Scale shape: [[Dedup.connectedComponents]] over the PAIRS (sized by
   * duplicates, not the corpus), one left join back on the id key, then
   * the same map-only hash-slot split as [[hashSplit]]. Determinism is
   * inherited from both parts: cluster labels are min-ids (order-free)
   * and the slot hash is content-addressed.
   */
  def clusterSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("split",
        hashSplit(coalesce(col("cluster"), col(idCol)), fractions, salt))
  }

  /**
   * Label each row with a split name by cumulative hash-slot ranges, e.g.
   * `fractions = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)`.
   * Fractions are scaled to 10000 slots (0.01% granularity); any slot
   * remainder from rounding goes to the LAST split. Row-stable: a doc
   * keeps its split across reruns and incremental loads.
   */
  def hashSplit(key: Column, fractions: Seq[(String, Double)],
      salt: String = ""): Column = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val den = 10000
    val slot = hashSlot(key, den, salt)
    val bounds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * den).toInt)
    fractions.init.zip(bounds.init).reverse
      .foldLeft(lit(fractions.last._1): Column) { case (acc, ((name, _), hi)) =>
        when(slot < hi, name).otherwise(acc)
      }
  }

  /**
   * EXACT-SIZE weighted sampling WITHOUT replacement (Efraimidis &
   * Spirakis 2006, algorithm A-ES in log form): each row draws the
   * deterministic hash-uniform `u ∈ (0, 1)` from its key and ranks by
   * `sk = ln(u) / w`; the `k` LARGEST sk are a weighted
   * without-replacement sample — each row's inclusion probability
   * proportional to its weight among the remaining rows. Complements
   * the Bernoulli samplers here ([[hashSample]] uniform, `q61`'s
   * quality-weighted keep) when a FIXED output size is required
   * (e.g. "exactly 1M quality-weighted docs for an eval set").
   *
   * Deterministic and partition-independent like every sampler in this
   * module — same rows, same k, same salt ⇒ the same sample on any
   * cluster. Scale shape: one narrow projection + `orderBy.limit(k)`.
   * For `k` up to `spark.sql.execution.topKSortFallbackThreshold`
   * (default 10000) that plans as `TakeOrdered` — each partition keeps
   * its local top-k, the driver merges k-sized heaps, no full sort and
   * no data shuffle. ABOVE the threshold Spark falls back to a full
   * Sort + GlobalLimit; for a large-k sample (the 1M-doc eval set)
   * raise the threshold explicitly — the heap-merge stays cheap, and
   * the limit's k rows land in one place either way. Rows with
   * weight ≤ 0 are excluded (A-ES requires positive weights).
   */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // hash60 ∈ [0, 2^60) -> u ∈ (0, 1]; never 0, so ln(u) is finite
    val u = (TextFunctions.hash60(concat(key.cast("string"), lit(salt)))
      .cast("double") + lit(1.0)) / lit(1152921504606846977.0)
    df.filter(weight > 0)
      .withColumn("__sk", log(u) / weight.cast("double"))
      .orderBy(col("__sk").desc, key)
      .limit(k)
      .drop("__sk")
  }

  /**
   * STRATIFIED [[weightedSample]]: an independent exact-size weighted
   * without-replacement sample of `k` rows PER GROUP — the
   * mixture-construction shape ("the best 1M docs per domain by quality
   * weight"), where a global top-k would let one dominant stratum crowd
   * out the rest. Same deterministic A-ES keys; ranking becomes one
   * shuffle on the group key ([[Relational.topKPerGroup]]). Groups with
   * fewer than `k` positive-weight rows keep what they have.
   */
  def weightedSampleByGroup(df: DataFrame, groupCols: Seq[String],
      key: Column, weight: Column, k: Int,
      salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (TextFunctions.hash60(concat(key.cast("string"), lit(salt)))
      .cast("double") + lit(1.0)) / lit(1152921504606846977.0)
    Relational.topKPerGroup(
        df.filter(weight > 0)
          .withColumn("__sk", log(u) / weight.cast("double")),
        groupCols, Seq(col("__sk").desc, key), k)
      .drop("__sk", "rank")
  }

  /**
   * MIXTURE PLAN — the budgeting step before [[mixtureSample]]: given a
   * target token budget and per-source mixture weights (the
   * Pile/DCLM-style recipe table), report per source what the recipe
   * NEEDS (`floor(weight · budget)` tokens, parts-per-million weights
   * so the arithmetic stays exact longs), what the corpus HAS, the
   * feasible take (`min(need, avail)`), the shortfall, and the implied
   * per-source sampling rate in ppm (`take · 1e6 div avail` — feed the
   * rates, `/1e6`, to [[mixtureSample]]). A source under-supplied for
   * its weight shows a positive `shortfall_tokens` — the signal to
   * re-weight or up-sample (epoch) that source rather than silently
   * shifting the mixture.
   *
   * One map-side-combinable aggregation over the corpus (per-source
   * token sums) + a broadcast of the |sources|-row weight table; exact
   * integer arithmetic end to end. Sources absent from `weightsPpm` get
   * weight 0 (need 0, rate 0); weights need not sum to 1e6 — the plan
   * reports against whatever recipe is given.
   */
  def mixturePlan(docs: DataFrame, sourceCol: Column, tokensCol: Column,
      weightsPpm: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    weightsPpm.values.foreach(w =>
      require(w >= 0, s"weights must be >= 0 ppm, got $w"))
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weightsPpm.toSeq.toDF("source", "weight_ppm")
    docs
      .select(sourceCol.as("source"), tokensCol.cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("avail_tokens"))
      .join(broadcast(w), Seq("source"), "left")
      .select(col("source"),
        coalesce(col("weight_ppm"), lit(0L)).as("weight_ppm"),
        col("avail_tokens"))
      // floor(w·B/1e6) without the w·B overflow a 100 TB-token budget
      // would hit: with B = q·1e6 + r, it equals w·q + floor(w·r/1e6)
      // exactly (w·q ≤ B stays in range, w·r < 1e12)
      .withColumn("need_tokens",
        expr(s"weight_ppm * ${budgetTokens / 1000000}L + " +
          s"(weight_ppm * ${budgetTokens % 1000000}L) div 1000000"))
      .withColumn("take_tokens", least(col("need_tokens"), col("avail_tokens")))
      .withColumn("shortfall_tokens", col("need_tokens") - col("take_tokens"))
      .withColumn("rate_ppm",
        when(col("avail_tokens") > 0,
          expr("take_tokens * 1000000 div avail_tokens")).otherwise(lit(0L)))
      // how many passes over the source the recipe implies: 1 when it
      // fits, ceil(need/avail) when under-supplied (the up-sample/epoch
      // factor real recipes apply instead of silently shifting the mix)
      .withColumn("epochs",
        when(col("avail_tokens") > 0,
          expr("(need_tokens + avail_tokens - 1) div avail_tokens"))
          .otherwise(lit(0L)))
  }

  /**
   * Materialize a mixture RECIPE over the corpus — the EXECUTOR half of
   * [[mixturePlan]]: per-source sampling rates in integer ppm, where a
   * rate ABOVE 1e6 UP-SAMPLES (the "epochs per source" every real
   * pretraining recipe applies to small high-quality sources — 3e6 ppm
   * ≈ three passes over wiki — instead of silently shifting the mix).
   * Each row emits `rate div 1e6` whole copies, plus one more when its
   * deterministic hash slot falls under `rate mod 1e6` — so expected
   * token mass per source is exactly `rate · tokens / 1e6`, the
   * fractional part is content-addressed (same doc, same salt ⇒ same
   * decision on any cluster, any partitioning), and down-sampling
   * (rate < 1e6) degenerates to [[mixtureSample]]'s Bernoulli keep at
   * ppm instead of 1e4 slot granularity.
   *
   * Copies carry an `epoch` column (0-based) so downstream shuffles and
   * pack/shard stages can salt on it — duplicated rows must not
   * re-collide into one partition. Map-only: the when-chain is
   * order-independent (sources mutually exclusive), the fan-out is
   * `explode(sequence(...))` — no join, no shuffle, no UDF.
   */
  def materializeRates(docs: DataFrame, sourceCol: Column, key: Column,
      ratesPpm: Map[String, Long], defaultPpm: Long = 1000000L,
      salt: String = ""): DataFrame = {
    (ratesPpm.values ++ Seq(defaultPpm)).foreach(r =>
      require(r >= 0, s"rates must be >= 0 ppm, got $r"))
    val thr = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (g, r)) =>
      when(sourceCol === lit(g), lit(r)).otherwise(acc)
    }
    val extra = when(hashSlot(key, 1000000, salt) < thr % 1000000L, 1L)
      .otherwise(0L)
    // integer `div`, not `/`: keeps whole-copy counts exact for any rate
    val copies = call_function("div", thr, lit(1000000L)) + extra
    docs.withColumn("__copies", copies)
      .filter(col("__copies") > 0L)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /**
   * BUDGET-CONSTRAINED selection: per group, walk rows in `order`
   * (quality desc, id asc — the caller makes it a total order) and keep
   * while the EXCLUSIVE running token sum is under `budgetTokens`, so
   * the straddling document is kept and every group lands in
   * [budget, budget + max doc) tokens — "the best N-token slice of each
   * source", the curation step between scoring and tokenization.
   *
   * Exact spelling: one window per group (a per-group SORT — the honest
   * cost; the selection is order-sensitive so some order must
   * materialize). At corpus scale where a full per-group sort is too
   * much, the two-pass scale path is [[Sketches.ecdfNormalizeByGroup]]
   * on the order column to find each group's score THRESHOLD at the
   * budgeted token mass, then a map-only filter — within one histogram
   * bin of this exact result.
   */
  def selectToBudget(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], tokensCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(order.nonEmpty, "selectToBudget needs a total order (quality desc, id)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__pre", coalesce(sum(tokensCol.cast("long")).over(w), lit(0L)))
      .filter(col("__pre") < budgetTokens)
      .drop("__pre")
  }

  /**
   * PROPORTIONAL QUOTA ALLOCATION — the largest-remainder (Hamilton)
   * method: split `k` sample slots across groups in proportion to their
   * sizes with EXACT integer arithmetic — `floor(k·n_g / N)` per group,
   * then the `k − Σfloor` leftover slots go to the largest remainders
   * (`k·n_g mod N` desc, group asc — deterministic). Σ quota == k
   * whenever N > 0 and k ≤ … always (Hamilton is exact by
   * construction); quotas are NOT capped at group sizes — cap (and
   * redistribute) upstream if a group can run dry, or let the sampler
   * keep what exists ([[weightedSampleAllocated]] semantics).
   *
   * `temperatureHalf = true` scales sizes to `floor(sqrt(n))` first —
   * the α = 0.5 mixture flattening (small sources get relatively more
   * slots; the multilingual-sampling standard). `floor ∘ sqrt` of a
   * long < 2⁵² is deterministic across engines (IEEE sqrt is correctly
   * rounded; a non-square n can never round up to an exact integer).
   *
   * Shape: the input is the per-GROUP size table (already tiny); one
   * 1-row total, one |groups|-row window. Overflow bound: `k·n` must
   * fit a long — k ≤ 10⁹ with 10⁹-row groups is fine.
   */
  def proportionalAllocation(sizes: DataFrame, groupCols: Seq[String],
      k: Long, temperatureHalf: Boolean = false): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val scaled =
      if (temperatureHalf) floor(sqrt(col("n").cast("double"))).cast("long")
      else col("n").cast("long")
    val base = sizes
      .select(groupCols.map(col) :+ col("n").cast("long").as("n"): _*)
      .withColumn("scaled", scaled)
    val tot = base.agg(sum(col("scaled")).as("__t"))
    val withQ = base.crossJoin(broadcast(tot))
      // `when` guard, not coalesce: under ANSI a div-by-zero throws
      // before null-coalescing could catch it (all-empty input -> __t=0)
      .withColumn("__q",
        when(col("__t") > 0, expr(s"(${k}L * scaled) div __t"))
          .otherwise(lit(0L)))
      .withColumn("__r",
        when(col("__t") > 0, expr(s"(${k}L * scaled) % __t"))
          .otherwise(lit(0L)))
    val sumQ = withQ.agg(sum(col("__q")).as("__sq"))
    val wnd = org.apache.spark.sql.expressions.Window
      .orderBy(col("__r").desc +: groupCols.map(col(_).asc): _*)
    withQ.crossJoin(broadcast(sumQ))
      .withColumn("__rank", row_number().over(wnd).cast("long"))
      // `scaled > 0` gate: when the scaled total is 0 every floor quota
      // is 0 via the coalesce and the largest-remainder rule would hand
      // +1 slots to the first k groups alphabetically — nonzero quotas
      // for empty groups. When the total is > 0 the gate is a no-op:
      // leftover slots = Σ fractional parts ≤ #(groups with __r > 0),
      // so bumps never reach a zero-remainder (hence zero-scaled) group.
      .withColumn("quota",
        col("__q") + when(
          col("__rank") <= lit(k) - col("__sq") && col("scaled") > 0, 1L)
          .otherwise(0L))
      .select(groupCols.map(col) ++
        Seq(col("n"), col("scaled"), col("quota")): _*)
  }

  /**
   * A-ES weighted sampling with PER-GROUP QUOTAS (the
   * [[proportionalAllocation]] companion): rank each group's rows by the
   * content-addressed A-ES key ([[weightedSampleByGroup]]'s exact
   * spelling), broadcast-join the tiny quota table, keep `rank ≤ quota`.
   * Groups with fewer positive-weight rows than quota keep what they
   * have. One keyed shuffle for the rank window; deterministic and
   * engine-mirrorable end to end.
   */
  def weightedSampleAllocated(df: DataFrame, groupCols: Seq[String],
      key: Column, weight: Column, quotas: DataFrame,
      salt: String = "wsample"): DataFrame = {
    val u = (TextFunctions.hash60(concat(key.cast("string"), lit(salt)))
      .cast("double") + lit(1.0)) / lit(1152921504606846977.0)
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__sk").desc, key)
    df.filter(weight > 0)
      .withColumn("__sk", log(u) / weight.cast("double"))
      .withColumn("__rn", row_number().over(wnd).cast("long"))
      .join(broadcast(quotas.select(
        (groupCols.map(col) :+ col("quota")): _*)), groupCols)
      .filter(col("__rn") <= col("quota"))
      .drop("__sk", "__rn", "quota")
  }
}
