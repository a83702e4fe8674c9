package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: per-column statistics in long format — the `ANALYZE
  * TABLE`-style pass a lake engine runs before planning a large job (null
  * rates for quality gates, distinct counts for join-strategy and
  * dictionary decisions, min/max for partition-pruning sanity).
  *
  * Scale shape: one COLUMN-PRUNED scan per column, each a two-level
  * aggregation — groupBy(value) first (map-side partials collapse
  * duplicates before the shuffle, so the exchange carries distinct values,
  * not rows), then a single-group rollup of the value histogram. On a
  * columnar store N pruned scans read exactly the N columns once in total.
  * The tempting alternative — every column's exact COUNT(DISTINCT) in ONE
  * aggregate — plans as an Expand that multiplies every row by N+1 before
  * shuffling; measured at sf0.1 it was 6.9 s vs ~1 s for this shape, and
  * the gap widens with row count. Numeric min/max are canonicalized
  * through DECIMAL(27,6) so the stringified profile is bit-stable across
  * engines.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.map { c =>
      val isNumeric = df.schema(c).dataType match {
        case _: NumericType => true
        case _              => false
      }
      def asStr(v: org.apache.spark.sql.Column) =
        if (isNumeric) v.cast("decimal(27,6)").cast("string") else v.cast("string")
      df.select(col(c).as("val"))
        .groupBy("val").agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
          min(col("val")).as("mn"), max(col("val")).as("mx"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), asStr(col("mn")).as("min_value"), asStr(col("mx")).as("max_value"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity generalization ladder: for each candidate bucket width over
    * the numeric quasi-identifier, the equivalence-class census under
    * (categorical QIs, floor(value/width)) — how many classes exist, how many
    * fall below k, and how many ROWS sit in those re-identifiable classes.
    * This is the audit a training-data release runs before publishing
    * user-derived records: the smallest width whose risky_rows hits zero is
    * the minimal generalization that k-anonymizes the cut.
    *
    * Shape: widths are a literal ladder, exploded per row (|widths| ~ 3-5,
    * a constant fan-out, NOT a join), then ONE hash aggregation keyed by
    * (width, QIs, bucket) with map-side partials, then a |classes|-sized
    * rollup per width — two shuffles total regardless of ladder length, and
    * the second input is the class census, not rows. Buckets are computed on
    * exact integer cents so floor() sees the same IEEE quotient in any
    * engine; counts are exact integers — bitwise. */
  def kAnonymityLadder(rows: DataFrame, qiCols: Seq[String], valueCol: String,
      widths: Seq[Int], k: Int): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "widths must be positive")
    require(k >= 2, "k < 2 makes every class safe by definition")
    val cents = round(col(valueCol) * 100).cast("long")
    val classes = rows
      .withColumn("width", explode(array(widths.map(lit(_)): _*)))
      .withColumn("bucket", floor(cents / (col("width") * lit(100.0))).cast("long"))
      .groupBy((col("width") +: qiCols.map(col)) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy("width")
      .agg(
        count(lit(1)).as("classes"),
        coalesce(sum(when(col("class_size") < k, 1L)), lit(0L)).as("risky_classes"),
        coalesce(sum(when(col("class_size") < k, col("class_size"))), lit(0L))
          .as("risky_rows"))
      .withColumn("meets_k", when(col("risky_classes") === 0, 1).otherwise(0))
  }

  /** Benford first-digit conformance audit per group — the classic
    * fabricated-data / broken-generator detector for monetary columns: the
    * leading significant digit of naturally occurring amounts follows
    * `P(d) = log10(1 + 1/d)`; a synthesized or truncated feed deviates and
    * the per-group chi-square statistic flags it. Emits the full digit
    * table (observed, expected, per-digit chi term) plus the group's chi2,
    * so the audit shows WHICH digits carry the deviation.
    *
    * Shape: digit extraction is string-on-exact-cents (integer→string is
    * exact in every engine — no float log10 on the data path), then ONE
    * hash aggregation keyed by (group, digit) and a 9-row-per-group
    * grid completion via a literal digit ladder — the second pass is over
    * the 9·|groups| census, not rows. Determinism: expected probabilities
    * are 6dp literals; expected counts are exact integer·DECIMAL products;
    * each chi term is DECIMAL-cast after two IEEE ops on exact inputs and
    * the group chi2 is a DECIMAL sum — bitwise.
    *
    * The leading digit comes from |cents|, so negative amounts test like
    * their magnitudes instead of evading the grid as '-'; zero-cent rows
    * have no leading digit and are counted OUT LOUD in `excluded` — an
    * audit that silently drops rows is itself the kind of blind spot it
    * exists to catch (a fabricated feed of zeros would otherwise sail
    * through untested). */
  def benfordAudit(rows: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 6)
    // round(log10(1 + 1/d), 6) for d = 1..9, inlined as literals so both
    // engines see constants, not a libm call on the data path
    val benford = Seq(0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
      0.066947, 0.057992, 0.051153, 0.045757)
    val digits = rows
      .select(col(groupCol).as("grp"),
        abs(round(col(valueCol) * 100).cast("long")).as("cents"))
      .withColumn("digit",
        when(col("cents") === 0L, lit(null))
          .otherwise(substring(col("cents").cast("string"), 1, 1).cast("int")))
    val obs = digits.filter(col("digit").isNotNull)
      .groupBy("grp", "digit").agg(count(lit(1)).as("obs"))
    // every group keeps its row in the report even if all-zero, and the
    // zero-cent drop count rides along so the audit shows what it skipped
    val excluded = digits.groupBy("grp")
      .agg(sum(when(col("digit").isNull, 1L).otherwise(0L)).as("excluded"))
    val grid = excluded.select("grp")
      .crossJoin(spark(excluded).range(1, 10).select(col("id").cast("int").as("digit")))
    // DECIMAL(8,6), not (27,6): the p·n product must stay inside the 38-digit
    // decimal cap on every engine (8 + 18 + 1 = 27 digits)
    val pExpr = benford.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (p, i)) =>
      when(col("digit") === i + 1, lit(p)).otherwise(acc)
    }.cast(org.apache.spark.sql.types.DecimalType(8, 6))
    val filled = grid
      .join(obs, Seq("grp", "digit"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("n", sum(col("obs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")))
      .withColumn("exp_cnt", (pExpr * col("n")).cast(dec))
      // n = 0 (a group whose every row was excluded as zero-cent) has
      // nothing to test: chi terms pin to 0 instead of dividing 0/0
      .withColumn("chi_term", when(col("n") === 0L, lit(0.0).cast(dec))
        .otherwise(round(
          (col("obs").cast("double") - col("exp_cnt").cast("double"))
            * (col("obs").cast("double") - col("exp_cnt").cast("double"))
            / col("exp_cnt").cast("double"), 6).cast(dec)))
    filled
      .withColumn("chi2", sum(col("chi_term")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")).cast("double"))
      .join(excluded, Seq("grp"))
      .select(col("grp"), col("digit"), col("obs"),
        col("exp_cnt").cast("double").as("exp_cnt"),
        col("chi_term").cast("double").as("chi_term"), col("chi2"),
        col("excluded"))
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Winsorization audit: per group, the exact `loPct`/`hiPct` percentile
    * clip thresholds of a monetary column and what clipping there would do —
    * how many rows clip on each side and how much total mass moves. The
    * outlier-clamping design pass of an ETL feed: run the audit, eyeball the
    * moved mass, then apply the clip (or don't) as a plain `least/greatest`.
    *
    * Shape: everything runs on the VALUE CENSUS in exact cents (groupBy
    * value first — the x82/q48 domain-bounded trick), so the windowed
    * inverse-CDF sweep and the threshold probe see |distinct values| rows,
    * never the corpus; thresholds come back as a broadcast |groups|-row
    * table. The percentile definition is pure integer arithmetic
    * (`100·cum ≥ pct·n` — lowest value whose cumulative count reaches the
    * cut), and every output is an exact integer — bitwise by construction. */
  def winsorizeAudit(rows: DataFrame, valueCol: String, groupCol: String,
      loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(0 < loPct && loPct < hiPct && hiPct < 100, "need 0 < lo < hi < 100")
    val census = rows
      .select(col(groupCol).as("grp"),
        round(col(valueCol) * 100).cast("long").as("cents"))
      .groupBy("grp", "cents").agg(count(lit(1)).as("c"))
      .localCheckpoint() // one corpus pass feeds the sweep and the probe
    val n = census.groupBy("grp").agg(sum(col("c")).as("n"))
    val cum = census.join(broadcast(n), "grp")
      .withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp").orderBy("cents")))
    val thr = cum.groupBy("grp", "n")
      .agg(min(when(col("cum") * 100 >= col("n") * loPct, col("cents"))).as("lo"),
        min(when(col("cum") * 100 >= col("n") * hiPct, col("cents"))).as("hi"))
    census.join(broadcast(thr), "grp")
      .groupBy("grp", "n", "lo", "hi")
      .agg(
        coalesce(sum(when(col("cents") < col("lo"), col("c"))), lit(0L))
          .as("clipped_lo"),
        coalesce(sum(when(col("cents") > col("hi"), col("c"))), lit(0L))
          .as("clipped_hi"),
        (coalesce(sum(when(col("cents") < col("lo"),
            (col("lo") - col("cents")) * col("c"))), lit(0L))
          + coalesce(sum(when(col("cents") > col("hi"),
            (col("cents") - col("hi")) * col("c"))), lit(0L))).as("moved_cents"))
      .select(col("grp"), col("n"), col("lo").as("lo_cents"),
        col("hi").as("hi_cents"), col("clipped_lo"), col("clipped_hi"),
        col("moved_cents"))
  }

  /** Kaplan–Meier user-survival curve from an activity log: each user's
    * observed lifetime runs from first to last active day; a user counts as
    * churned (the "event") when their last activity is at least
    * `churnGapDays` before the observation end, else they are censored at
    * the end of observation — the textbook right-censored estimator, driven
    * entirely by the activity log (no labels needed).
    *
    * Shape: ONE user-keyed aggregation (min/max day) is the only
    * corpus-sized shuffle; everything after runs on the |distinct
    * lifetimes|-row census (bounded by the history span in days), where the
    * at-risk rollup and the survival product are windows over that tiny
    * table. The product is kept as a DECIMAL sum of 6dp-rounded ln terms
    * (the x94 discipline): each term is one IEEE division + one ln, rounded
    * before the order-free DECIMAL accumulation — bitwise across engines. */
  def survivalCurve(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", churnGapDays: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("t")
    val users = events
      .select(col(userCol).as("u"),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date")).as("d"))
      .groupBy("u").agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
    val horizon = users.agg(max(col("ld")).as("m"), count(lit(1)).as("total"))
    val census = users.crossJoin(broadcast(horizon))
      .select(col("total"),
        (col("ld") <= col("m") - churnGapDays).as("is_churn"),
        when(col("ld") <= col("m") - churnGapDays, col("ld") - col("fd"))
          .otherwise(col("m") - col("fd")).as("t"))
      .groupBy("t", "total")
      .agg(coalesce(sum(when(col("is_churn"), 1L)), lit(0L)).as("churned"),
        coalesce(sum(when(!col("is_churn"), 1L)), lit(0L)).as("censored"))
    census
      .withColumn("at_risk", col("total") - coalesce(
        sum(col("churned") + col("censored")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      // a time with zero at-risk survivors after its deaths contributes no
      // defined ln term (S hits 0); keep the sum at its last finite value
      .withColumn("term", when(col("churned") > 0 && col("at_risk") > col("churned"),
        round(log((col("at_risk") - col("churned")).cast("double")
          / col("at_risk").cast("double")), 6)).otherwise(lit(0.0)))
      .withColumn("log_surv", sum(col("term").cast("decimal(27,6)")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .cast("double"))
      .select(col("t").cast("long").as("t"), col("at_risk"), col("churned"),
        col("censored"), col("log_surv"))
  }

  /** Inter-arrival burstiness per event type: gaps between consecutive
    * events of the same (user, type) stream, aggregated to the
    * Goh–Barabási burstiness coefficient B = (σ−μ)/(σ+μ) per type
    * (−1 = metronome, 0 = Poisson, →1 = heavy bursts) — the traffic-shape
    * profile that decides batch sizing and rate limits.
    *
    * Shape: the lag runs in a (user, type)-keyed window — millions of small
    * partitions, never a type-wide sort, so a hot event type cannot
    * concentrate a partition. Gaps are exact integer seconds (µs div 10⁶);
    * the rollup keeps exact BIGINT Σx and DECIMAL(38,0) Σx² — order-free —
    * and B is computed from those exact sums in one final 6dp-rounded
    * step. */
  def burstiness(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol, typeCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(typeCol).as("event_type"), col(userCol), col(idCol), col(tsCol),
        unix_micros(col(tsCol).cast("timestamp")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .withColumn("gap_s", expr("gap_us div 1000000L"))
      .filter(col("gap_s").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sum_gap_s"),
        sum((col("gap_s") * col("gap_s")).cast("decimal(38,0)")).as("sum_gap_sq"))
      .withColumn("mean_x_n", col("sum_gap_s").cast("double"))
      .withColumn("sd_x_n", sqrt((col("sum_gap_sq").cast("double") * col("n_gaps")
        - col("sum_gap_s").cast("double") * col("sum_gap_s").cast("double"))))
      .select(col("event_type"), col("n_gaps"), col("sum_gap_s"),
        col("sum_gap_sq").cast("double").as("sum_gap_sq"),
        when(col("sd_x_n") + col("mean_x_n") === 0.0, lit(0.0))
          .otherwise(round((col("sd_x_n") - col("mean_x_n"))
            / (col("sd_x_n") + col("mean_x_n")), 6)).as("burstiness"))
  }

  /** Hill tail-index estimator over a positive integer column — the
    * heavy-tail diagnostic (α ≈ how fast the tail decays; α ≤ 2 means
    * infinite variance, the regime where mean-based capacity planning and
    * uniform sharding break). H = (1/k)·Σ ln(x_i / x_(k)) over the k
    * largest values, α = 1/H.
    *
    * Scale shape: the ONLY corpus-wide stage is the top-k cut, which plans
    * as TakeOrderedAndProject (per-partition heaps of k, never a global
    * sort); the estimator itself runs on k rows. Determinism: the top-k
    * VALUE MULTISET is order-free (ties at the boundary carry equal
    * values), ln terms are 6dp-rounded into a DECIMAL sum (x94
    * discipline), and H/α are each one final rounded double step. */
  def hillTail(rows: DataFrame, valueCol: String, k: Int = 500): DataFrame = {
    require(k >= 2, s"the Hill estimator needs at least two order statistics: $k")
    val top = rows.select(col(valueCol).cast("long").as("x"))
      .filter(col("x") > 0) // ln demands positivity; zero-length rows carry no tail info
      .orderBy(col("x").desc).limit(k)
    top
      .agg(count(lit(1)).as("k"), min(col("x")).as("x_k"),
        sum(round(log(col("x").cast("double")), 6).cast("decimal(27,6)")).as("slnx"))
      .withColumn("kd", col("k").cast("double"))
      .withColumn("hraw", (col("slnx").cast("double")
        - col("kd") * round(log(col("x_k").cast("double")), 6)) / col("kd"))
      .select(col("k"), col("x_k"), round(col("hraw"), 6).as("hill_h"),
        when(col("hraw") === 0.0, lit(0.0))
          .otherwise(round(lit(1.0) / col("hraw"), 6)).as("tail_alpha"))
  }

  /** Chi-square test of independence between two categorical columns — the
    * "is my corpus mix confounded" audit (e.g. language × source: a large
    * χ² / Cramér's V means language balance cannot be tuned by sampling
    * sources independently). Returns the statistic, degrees of freedom and
    * Cramér's V in one row.
    *
    * Scale shape: ONE (a, b)-keyed counting aggregation is the only
    * corpus-sized stage; marginals and the term table live on the
    * |A|·|B| contingency census, with marginals broadcast back onto it.
    * Determinism: O/R/C/N are exact BIGINTs; each cell's (O−E)²/E is
    * evaluated in a fixed IEEE order, rounded at 12dp and summed as
    * DECIMAL(38,12) — order-free — so χ² and V are each one final rounded
    * step from an exact sum. */
  def chiSquareIndependence(rows: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = rows.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // census: feeds marginals and the term scan
    val ra = o.groupBy("a").agg(sum(col("o")).as("ra"))
    val cb = o.groupBy("b").agg(sum(col("o")).as("cb"))
    val nt = o.agg(sum(col("o")).as("n"))
    // densify: an UNOBSERVED (a,b) cell still contributes (0−E)²/E = E —
    // dropping zero cells silently understates χ² (a perfectly dependent
    // 2x2 would read N/2 instead of N)
    val full = ra.select("a").crossJoin(broadcast(cb.select("b")))
      .join(o, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("o"), lit(0L)).as("o"))
    val od = col("o").cast("double")
    val e = col("ra").cast("double") * col("cb").cast("double") / col("n").cast("double")
    full.join(broadcast(ra), "a").join(broadcast(cb), "b").crossJoin(broadcast(nt))
      .select(col("n"), col("a"), col("b"),
        round((od - e) * (od - e) / e, 12).cast("decimal(38,12)").as("term"))
      .agg(max(col("n")).as("n_rows"),
        countDistinct(col("a")).as("n_a"), countDistinct(col("b")).as("n_b"),
        sum(col("term")).as("chi2d"))
      .select(col("n_rows"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        round(col("chi2d").cast("double"), 6).as("chi2"),
        round(sqrt(col("chi2d").cast("double")
          / (col("n_rows").cast("double")
             * least(col("n_a") - 1, col("n_b") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** CUSUM sweep over a (event_type, day, cnt) daily census: one-sided
    * positive and negative cumulative-sum statistics against each type's
    * own mean, reported as the peak excursion and the day it peaks (the
    * change-point estimate) per direction. Deviations are scaled by n_days
    * (d = n·x − Σx) so everything stays exact BIGINT — no division, no
    * floats anywhere. The recursions S⁺_t = max(0, S⁺_{t−1}+d_t) /
    * S⁻_t = max(0, S⁻_{t−1}−d_t) are rewritten as prefix identities
    * (S⁺_t = P_t − min(0, min_{j≤t} P_j), mirrored for S⁻), so the whole
    * sweep is two running windows plus an argmax — no iterative loop.
    *
    * Shape: the input census is |types|·|days| rows (domain-bounded — at
    * 100 TB it is still thousands of rows); the per-type windows and the
    * struct-argmax rollup never touch anything corpus-sized. */
  def cusumSweep(byDay: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("event_type").orderBy("day")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val tot = byDay.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("total"))
    byDay.join(broadcast(tot), "event_type")
      .withColumn("dev", col("cnt") * col("n_days") - col("total"))
      .withColumn("p", sum(col("dev")).over(w))
      .withColumn("pos", col("p") - least(lit(0L), min(col("p")).over(w)))
      .withColumn("neg", greatest(lit(0L), max(col("p")).over(w)) - col("p"))
      .groupBy("event_type")
      .agg(max(col("n_days")).as("n_days"), max(col("total")).as("total_events"),
        max(struct(col("pos"), (-col("day")).as("nd"))).as("mp"),
        max(struct(col("neg"), (-col("day")).as("nd"))).as("mn"))
      .select(col("event_type"), col("n_days"), col("total_events"),
        col("mp.pos").as("peak_pos"), (-col("mp.nd")).as("peak_pos_day"),
        col("mn.neg").as("peak_neg"), (-col("mn.nd")).as("peak_neg_day"))
  }

  /** CUSUM change-point detection on each event type's daily volume — the
    * standard "did traffic shift, and when" audit. One corpus-sized
    * (type, day) counting aggregation builds the census; `cusumSweep` does
    * the rest on the domain-bounded table. */
  def cusumChangePoint(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    cusumSweep(events
      .select(col(typeCol).as("event_type"),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt")))

  /** Daily-volume autocorrelation function per event type, lags 1..maxLag —
    * the seasonality detector (a weekly cycle shows as an ACF spike at 7).
    * The series is the ZERO-FILLED day census (gaps are real zeros, not
    * missing observations), densified per type via sequence(min, max).
    *
    * Exactness: lagged pairs come from an equi-join of the census against
    * itself at day−k (identical on the oracle side — no engine-specific lag
    * semantics), carriers are exact BIGINT Σx/Σy and DECIMAL(38,0)
    * Σx²/Σy²/Σxy, and Pearson r per (type, lag) is ONE final rounded
    * double expression from those exact sums — bitwise across engines.
    *
    * Shape: census-sized everything (|types|·|days| rows, ×maxLag for the
    * pair table); the only corpus-sized work is the day-count aggregation. */
  def autocorrelation(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive: $maxLag")
    val census = events
      .select(col(typeCol).as("event_type"),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val span = census.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val dense = span
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(census, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .localCheckpoint() // probed twice (current + lagged side) per lag
    val ks = dense.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))
    val prev = dense.select(col("event_type"), col("day").as("pday"), col("cnt").as("y"))
    dense.crossJoin(broadcast(ks))
      .select(col("event_type"), col("lag"), col("cnt").as("x"),
        (col("day") - col("lag")).as("pday"))
      .join(prev, Seq("event_type", "pday"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .withColumn("covn", col("sxy").cast("double") * col("n_pairs")
        - col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("vx", col("sxx").cast("double") * col("n_pairs")
        - col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("vy", col("syy").cast("double") * col("n_pairs")
        - col("sy").cast("double") * col("sy").cast("double"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        when(col("vx") * col("vy") <= 0.0, lit(0.0))
          .otherwise(round(col("covn") / sqrt(col("vx") * col("vy")), 6)).as("acf"))
  }
}
