package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set curation operators (extension beyond the reference —
  * SURVEY §7.4): deterministic subsampling, per-group balancing and
  * distribution profiling. These are the selection passes that run
  * AFTER cleaning/dedup ([[CorpusPipeline]]) to shape what actually
  * enters a training mix.
  *
  * Scale posture: sampling is a per-row predicate (no shuffle, no
  * RNG state — rides the scan); balancing shuffles once on the group
  * key with per-group state bounded by the cap k; the histogram is a
  * partial+final aggregate on a bounded bin space.
  */
object Curation {

  /** Deterministic hash sample: keep a row iff the first two hex
    * digits of md5(key) fall below `hexBound`. Unlike `rand()`-based
    * sampling this is (a) reproducible across runs, engines and
    * cluster layouts, (b) stable under re-partitioning, and (c)
    * consistent — the same key set is chosen when the corpus is
    * re-read or incrementally extended, which is what makes held-out
    * splits and A/B corpus diffs possible at 100 TB. The rate is
    * hexBound/256 (two hex digits), e.g. "1a" → 26/256 ≈ 10.2%.
    * md5 is the engine-portable choice (same lowercase hex text in
    * Spark, DuckDB, Postgres), and the reference already leans on it
    * for fingerprints ([[TextAnalysis.fingerprint]]).
    */
  /** First `digits` lowercase hex chars of md5(key) — the ONE
    * engine-portable slot every hash-routing operator here uses
    * (sampling, mixing, splits, pack shards). Fixed width means
    * lexicographic compare equals integer compare. */
  private[ext] def md5Hex(key: Column, digits: Int): Column =
    substring(md5(key.cast("string")), 1, digits)

  /** The 16-bit integer form of [[md5Hex]] (4 hex digits → 0..65535),
    * for rate arithmetic rather than string-bound compares. */
  private[ext] def slot16(key: Column): Column =
    conv(md5Hex(key, 4), 16, 10).cast("long")

  def deterministicSample(df: DataFrame, keyCol: String,
                          hexBound: String = "1a"): DataFrame = {
    require(hexBound.matches("[0-9a-f]{2}"),
      s"hexBound must be two lowercase hex digits, got '$hexBound'")
    df.filter(md5Hex(col(keyCol), 2) < hexBound)
  }

  /** Per-group cap: the top k rows of each group under `order`
    * (callers append a unique id to make the order total — otherwise
    * rank at the cut boundary is nondeterministic). The standard
    * class-balancing pass: cap every language/source/domain at k
    * best-quality documents so one crawl domain cannot dominate the
    * mix. One shuffle keyed on the group column; window state is one
    * counter per group. Emits `rank` (1-based position within the
    * group). */
  def balancedTopK(df: DataFrame, groupCol: String, k: Int,
                   order: Column*): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Global top-k under a per-domain quota: the k best rows by
    * (`scoreCol` desc, `idCol` asc) with at most `m` rows from any
    * one `domCol` value — the selection pass that keeps a dominant
    * crawl domain from filling a score-ordered training slice.
    * Equivalent to (and oracled as) "within-domain rank ≤ m, then
    * global top-k", but runs as ONE bounded aggregation
    * ([[graft.ops.QuotaTopKAgg]]): each input partition forwards at
    * most k quota-valid rows map-side, so neither window's full-data
    * shuffle ever happens — the same posture as [[graft.ops.TopKAgg]]
    * vs `row_number()`, with the quota folded into the buffer rather
    * than bolted on as a second window. Ids must be unique (they are
    * the tie-break that makes selection total). Emits
    * (rank, idCol, domCol, scoreCol), rank 1-based in selection
    * order. */
  def domainQuotaTopK(df: DataFrame, k: Int, m: Int,
                      scoreCol: String, idCol: String,
                      domCol: String): DataFrame = {
    val agg = graft.ops.TopKAgg.quotaTopK(k, m)
    df.agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long"),
        col(domCol)).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__row")))
      .select((col("__pos") + 1).as("rank"),
        col("__row.id").as(idCol), col("__row.dom").as(domCol),
        col("__row.score").as(scoreCol))
      .orderBy("rank")
  }

  /** Weighted dataset mix: per-class deterministic sampling rates —
    * the knob that turns a raw crawl into a recipe ("20% of src0,
    * 90% of wikipedia, 5% of everything else"). Same md5-threshold
    * mechanism as [[deterministicSample]] but at 16-bit granularity
    * (first four hex digits, rate resolution 1/65536) and with the
    * bound chosen per class: keep a row iff
    * `int(md5(key)[0:4], 16) < floor(rate(class) * 65536)`.
    *
    * The rate lookup is a literal when-chain (codegen'd, rides the
    * scan — no join, no shuffle); the weight table is config-small by
    * contract. Determinism gives the mix the same three properties as
    * the sampler: reproducible, layout-independent, and stable under
    * incremental corpus growth — re-running the mix on an extended
    * corpus keeps every previously selected row.
    */
  def weightedMix(df: DataFrame, classCol: String,
                  weights: Map[String, Double],
                  defaultRate: Double = 0.0,
                  keyCol: String = "doc_id"): DataFrame = {
    (weights.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rate = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (cls, r)) => when(col(classCol) === cls, lit(r)).otherwise(acc)
    }
    df.filter(slot16(col(keyCol)) < floor(rate * 65536.0).cast("long"))
  }

  /** Temperature-based class resampling: sample class c at
    * rate(c) ∝ p(c)^(α−1), normalized so the rarest class keeps 100%
    * of its rows — the standard way a multilingual / multi-source
    * training mix is flattened toward balance (α = 1 keeps the
    * natural distribution, α → 0 approaches uniform over classes).
    * Unlike [[weightedMix]] the rates are DERIVED from the corpus
    * itself: one class-keyed count aggregate (bounded by the class
    * domain) computes p(c) = n(c)/N, the per-class keep rate
    * p(c)^(α−1) / max_k p(k)^(α−1) broadcasts back, and the row
    * filter is the same deterministic 16-bit md5 slot as the other
    * samplers — reproducible, layout-independent, stable under
    * corpus growth (modulo the rates themselves shifting as counts
    * change; pin rates via [[weightedMix]] when that matters).
    * Every FP step (divide, power, divide, floor·65536) is
    * IEEE-deterministic, so an oracle replays the chain bit-exactly.
    */
  def temperatureMix(df: DataFrame, classCol: String, alpha: Double,
                     keyCol: String = "doc_id"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val weighted = counts.withColumn("__w",
      pow(col("__n").cast("double"), lit(alpha - 1.0)))
    val rates = weighted
      .crossJoin(broadcast(weighted.agg(max(col("__w")).as("__wmax"))))
      // p(c)^(α−1) / max p^(α−1) — the n/N divisions cancel, so the
      // rate computes from raw counts and stays in (0, 1]
      .select(col(classCol).as("__cls"),
        (col("__w") / col("__wmax")).as("__rate"))
    df.join(broadcast(rates), col(classCol) <=> col("__cls"), "left")
      .filter(slot16(col(keyCol)) <
        floor(col("__rate") * 65536.0).cast("long"))
      .drop("__cls", "__rate")
  }

  /** Key-skew profile: the distribution of per-key row counts that
    * decides whether a join/agg on `keyCol` needs salting
    * ([[graft.ops.Ops]]' salted variants) or AQE skew handling.
    * Two partial+final aggregates (rows → per-key counts → one
    * summary row): n_keys, total rows, max/avg per-key count, the
    * count of "heavy" keys above `heavyThreshold`, and top_share =
    * max_n / total — when top_share ≈ 1/parallelism or more, one
    * task owns the stage's tail and the key needs salting. Output is
    * one bounded row; nothing about this profile grows with data
    * size. */
  def skewProfile(df: DataFrame, keyCol: String,
                  heavyThreshold: Long): DataFrame = {
    val perKey = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_n"),
      graft.ops.Ops.roundDet(
        sum(col("n")).cast("double") / count(lit(1)), 4).as("avg_n"),
      sum(when(col("n") > heavyThreshold, 1L).otherwise(0L)).as("n_heavy"),
      graft.ops.Ops.roundDet(
        max(col("n")).cast("double") / sum(col("n")), 6).as("top_share"))
  }

  /** Fixed-width histogram of an integer metric: bin = value rounded
    * down to a multiple of `width`. Partial+final aggregate over at
    * most (max/width) bins — the distribution-profiling pass (token
    * budget per document, chars per document) that sizes a training
    * mix before sampling it. */
  def histogram(df: DataFrame, metric: Column, width: Int): DataFrame = {
    require(width > 0, s"histogram width must be positive, got $width")
    val v = metric.cast("long")
    df.select((v - pmod(v, lit(width.toLong))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Deterministic train/val/test assignment: the row's 16-bit md5
    * slot (same mechanism as [[weightedMix]]) is cut at the
    * cumulative fraction boundaries, so every row lands in exactly
    * one split, the split is reproducible across engines/layouts/
    * runs, and — critically for held-out integrity at 100 TB — a row
    * KEEPS its split when the corpus is re-read or extended: new data
    * can never migrate old rows between train and test.
    *
    * `fracs` are (name, fraction) in cut order, summing to ≤ 1; any
    * remainder falls to `rest`. Comparison is on the 4-hex-digit md5
    * prefix as a STRING (fixed width, lowercase — lexicographic order
    * equals numeric order), which keeps the oracle SQL a verbatim
    * twin. Adds a `split` column; no shuffle — the assignment rides
    * the scan. */
  def splitAssign(df: DataFrame, keyCol: String,
                  fracs: Seq[(String, Double)],
                  rest: String = "test"): DataFrame = {
    require(fracs.nonEmpty && fracs.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions must be non-empty and sum to <= 1, got $fracs")
    val bounds = fracs.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // a cumulative fraction reaching 1.0 must capture EVERY slot
    // including "ffff", so its bound sorts after all hex strings —
    // clamping to "ffff" would silently leak the top slot to `rest`
    val hexBounds = bounds.map { b =>
      val v = math.floor(b * 65536.0).toLong
      if (v >= 65536L) "g" else f"$v%04x"
    }
    val slot = md5Hex(col(keyCol), 4)
    val assign = fracs.zip(hexBounds).reverse
      .foldLeft(lit(rest)) { case (acc, ((name, _), bound)) =>
        when(slot < bound, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** Per-group winsorization (outlier clipping): clamp `valCol` into
    * the group's [pLo, pHi] percentile band — the numeric-feature
    * guard that keeps one pathological row (a 10 GB "document", a
    * fat-finger price) from dragging a group mean or blowing a
    * histogram's range before sampling/mixing decisions are made on
    * those statistics.
    *
    * Two passes, join-free on the big side: pass 1 reduces the input
    * to ONE (lo, hi) row per group — exact interpolated `percentile`
    * when `exact` (the oracle-comparable form; Spark `percentile` and
    * DuckDB `quantile_cont` share the lower+(upper-lower)*frac
    * interpolation, proven hash-equal by a13), else
    * `approx_percentile` (Greenwald-Khanna sketch, bounded memory per
    * group) — the 100 TB route, since the exact form buffers every
    * group value in the aggregation state. Pass 2 broadcast-joins the
    * group-count-sized bounds table back — NULL-SAFE on the group key
    * (a NULL group is a group, the same stance the k-anonymity check
    * takes; a plain equi-join would silently DROP every NULL-group
    * row) — and clips with least/greatest, riding the scan. The clip
    * adds no FP noise: every output is either the original double or
    * a bound verbatim, never arithmetic over them. NULL values stay
    * NULL — least/greatest SKIP nulls, so the naive clip would turn a
    * missing measurement into a concrete pLo bound — and an all-NULL
    * group has NULL bounds, which pass values through by the same
    * null-skipping semantics. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double, pHi: Double, exact: Boolean = true): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val v = col(valCol)
    val (lo, hi) =
      if (exact) (percentile(v, lit(pLo)), percentile(v, lit(pHi)))
      else (approx_percentile(v, lit(pLo), lit(10000)),
            approx_percentile(v, lit(pHi), lit(10000)))
    // group on the caller's column, rename after: the aggregation
    // exchange stays keyed on it (PlanSpec locks this) and the rename
    // keeps the null-safe join condition unambiguous
    val bounds = df.groupBy(col(groupCol)).agg(lo.as("__lo"), hi.as("__hi"))
      .withColumnRenamed(groupCol, "__g")
    df.join(broadcast(bounds), col(groupCol) <=> col("__g"), "left")
      .withColumn(valCol,
        when(v.isNull, v)
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__g", "__lo", "__hi")
  }

  /** Deterministic epoch shuffle: order the dataset by
    * `md5(key ":" epoch)` — a reproducible pseudorandom permutation
    * per training epoch, with no RNG state to coordinate across
    * executors. Spark executes the sort as a range-partitioned
    * exchange (sampled split points, every partition sorts locally),
    * so unlike a `row_number()` position column there is no global
    * single-partition window anywhere — the permutation scales like
    * any other sort. Ties are impossible (md5 of distinct keys), but
    * `key` is appended to the ordering anyway so duplicate keys stay
    * deterministic. */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int): DataFrame = {
    val k = md5(concat_ws(":", col(keyCol).cast("string"), lit(epoch)))
    df.withColumn("shuffle_key", k).orderBy(col("shuffle_key"), col(keyCol))
  }

  /** Elementwise MEDIAN centroid per group over an embedding column —
    * the deterministic centroid for semantic pruning. A mean over a
    * shuffle is FP-order-dependent (see
    * [[graft.ext.Similarity.kmeansCentroids]], which accepts that
    * because it only feeds recall counts); the exact interpolated
    * median of each coordinate is a pure function of the value
    * multiset, so the whole pruning chain downstream stays
    * DuckDB-oracle-able bit for bit (the e9 winsorize parity). The
    * shuffle is keyed on bounded (group, dim) — never corpus-sized —
    * and the centroid table is ≤ |groups| rows, a broadcast asset. */
  def medianCentroids(embs: DataFrame, groupCol: String = "label",
                      vecCol: String = "embedding"): DataFrame =
    embs.select(col(groupCol).as("grp"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(percentile(col("x"), lit(0.5)).as("m"))
      .groupBy("grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cvec"))

  /** Semantic outlier pruning (the SemDeDup/prototype-pruning family
    * member that removes the far tail): rank every vector by cosine
    * to its group's [[medianCentroids]] centroid, ascending — the
    * least-typical first — and flag the bottom `fraction` per group.
    * Returns the flagged rows (idCol, groupCol, cosine, rank, n_grp)
    * — the review-queue shape, like [[Decontaminate.semanticFlagged]].
    *
    * SHARP EDGE — small groups always flag: the cut is
    * `rank <= ceil(n_grp * fraction)`, and ceil of any positive value
    * is ≥ 1, so EVERY group flags at least one row — a singleton
    * group flags its only member (which is also its own centroid,
    * cosine 1.0). That is the intended review-queue semantics ("show
    * me the least-typical member of every group, however small"), not
    * a keep/drop decision: a caller pruning by these flags should
    * first filter groups below a minimum size (e.g.
    * `n_grp >= ceil(1/fraction)`, below which the quota rounds up
    * from zero) or treat tiny groups as un-prunable. e14's oracle
    * pins the ceil contract exactly as written here.
    *
    * Plan: one bounded (group, dim) shuffle for the centroid, one
    * broadcast join to attach it, cosine in the scan-stage
    * projection (fused codegen), one group-keyed rank window. The
    * embedding column never shuffles. */
  def semanticOutliers(embs: DataFrame, fraction: Double,
                       groupCol: String = "label",
                       vecCol: String = "embedding",
                       idCol: String = "vec_id"): DataFrame = {
    require(0.0 < fraction && fraction <= 1.0, s"bad fraction $fraction")
    val cents = medianCentroids(embs, groupCol, vecCol)
    val sizes = embs.groupBy(col(groupCol).as("__sg"))
      .agg(count(lit(1)).as("n_grp"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cosine").asc, col(idCol).asc)
    embs.select(col(idCol), col(groupCol),
        col(vecCol).cast("array<double>").as("__v"))
      .join(broadcast(cents), col(groupCol) <=> col("grp"))
      .withColumn("cosine", graft.ops.Ops.roundDet(
        Similarity.cosine(col("__v"), col("cvec")), 4))
      .join(broadcast(sizes), col(groupCol) <=> col("__sg"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= ceil(col("n_grp") * fraction))
      .select(col(idCol), col(groupCol), col("cosine"),
        col("rank").cast("long").as("rank"), col("n_grp"))
  }
}
