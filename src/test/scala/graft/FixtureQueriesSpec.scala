package graft

import graft.queries.FixtureQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class FixtureQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every declared query has an oracle and runs non-empty on sf0.001") {
    // q10 is legitimately empty at sf0.001 (all 15 users first appear Jan 1;
    // the register day with new users only exists from sf0.01 up).
    val mayBeEmpty = Set("q10_new_register")
    FixtureQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(FixtureQueries.oracleSql.contains(name), s"$name lacks an oracle")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q1 conditional sums: totals reconcile against a straight filter-sum") {
    val q1 = FixtureQueries.q1TransSummary(spark, sf)
    val total = q1.agg(sum("in_amount")).head.getDouble(0)
    val direct = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-01") && col("ts") < lit("2024-01-31"))
      .filter(col("event_type") === "purchase")
      .agg(sum("value")).head.getDouble(0)
    assert(math.abs(total - direct) < 1e-6)
  }

  test("q4 rollup identity: day->month re-agg equals direct month agg") {
    val rolled = FixtureQueries.q4RollupMonth(spark, sf)
    val direct = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-01") && col("ts") < lit("2024-01-31"))
      .groupBy(col("user_id"), date_format(col("ts"), "yyyyMM").cast("int").as("summary_month"))
      .agg(
        sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("in_amount"),
        count(when(col("event_type") === "purchase", lit(1))).as("in_count"))
      .select("user_id", "summary_month", "in_amount", "in_count")
    val joined = rolled.alias("r").join(direct.alias("d"), Seq("user_id", "summary_month"))
      .filter(abs(col("r.in_amount") - col("d.in_amount")) > lit(1e-6) ||
        col("r.in_count") =!= col("d.in_count"))
    assert(joined.isEmpty, "rollup diverged from direct aggregation")
    assert(rolled.count() === direct.count())
  }

  test("q14 generates exactly 288 five-minute slices covering all day-1 events") {
    val df = FixtureQueries.q14Slices(spark, sf).cache()
    assert(df.count() === 288)
    val total = df.agg(sum("event_count")).head.getLong(0)
    val direct = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-01") && col("ts") < lit("2024-01-02")).count()
    assert(total === direct)
    df.unpersist()
  }

  test("q7 mask ordering: low-volume users are never risky regardless of ratio") {
    val bad = FixtureQueries.q7Risky(spark, sf)
      .filter(col("b_count") < 10 && col("is_risky") === 1)
    assert(bad.isEmpty)
  }

  test("q8 ledger merge keeps exactly the union of old and new keys") {
    val merged = FixtureQueries.q8LedgerMerge(spark, sf)
    assert(merged.select("user_id").distinct().count() === merged.count(),
      "ledger has duplicate keys")
  }

  test("q9 ranking is dense per event_type starting at 1") {
    val r = FixtureQueries.q9Ranking(spark, sf)
    val perBoard = r.groupBy("event_type")
      .agg(min("rank_no").as("mn"), max("rank_no").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(perBoard.isEmpty, "rank numbers are not dense 1..n per board")
  }

  test("q13 watermark is deterministic under ts ties") {
    val a = FixtureQueries.q13Watermark(spark, sf).orderBy("user_id").collect()
    val b = FixtureQueries.q13Watermark(spark, sf).orderBy("user_id").collect()
    assert(a.sameElements(b))
  }

  test("money aggregates are bit-identical under different partitionings") {
    // The decimal-exact design promise: the same query returns the SAME BITS
    // regardless of shuffle width / merge order. Float sums would fail this.
    val probes = Seq("q1_trans_summary", "q2_player_summary", "q5_dim_enrich",
      "q6_wma", "q19_sessions")
    def runAll(parts: String): Map[String, Array[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try probes.map { name =>
        val df = SparkEntry.queries(name)(spark, sf)
        name -> df.collect().map(_.toString).sorted
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val narrow = runAll("2")
    val wide = runAll("17")
    probes.foreach { name =>
      assert(narrow(name).sameElements(wide(name)),
        s"$name changed bits when shuffle partitions changed")
    }
  }

  test("approx_count_distinct sketch lands within 5% of q23's exact counts") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("q23_distinct")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("summary_date")) ->
        r.getAs[Long]("n_users")).toMap
    val approx = graft.Tables.eventsInWindow(spark, sf,
        "2024-01-01 00:00:00", "2024-01-31 00:00:00")
      .groupBy(col("event_type"), graft.ops.Cols.yyyymmdd(col("ts")).as("summary_date"))
      .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("summary_date")) ->
        r.getAs[Long]("n_users_approx")).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"group $k: approx ${approx(k)} vs exact $n")
    }
  }

  test("q45 equi-depth: 16 buckets, sizes within 1, value ranges strictly ordered") {
    val rows = FixtureQueries.queries("q45_equidepth")(spark, sf)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents")))
    assert(rows.map(_._1).toSeq == (0L until 16L).toSeq)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"equi-depth sizes skewed: ${sizes.toSeq}")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"bucket ranges overlap: $a vs $b")
      case _ =>
    }
    assert(rows.forall(r => r._3 <= r._4))
  }

  test("q46 integrity: clean fixture has zero orphans; a planted orphan is counted") {
    val clean = FixtureQueries.queries("q46_integrity")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"))).toMap
    assert(clean.size == 5 && clean.values.forall(_._2 == 0L),
      s"fixture must be referentially clean: $clean")
    // planted orphan: an order key no lineitem parent table contains
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, sf)
    val orphan = li.limit(1).withColumn("l_orderkey", lit(-999L))
    val audited = li.unionByName(orphan)
      .select(col("l_orderkey").as("k"))
      .join(graft.Tables.orders(spark, sf).select(col("o_orderkey").as("k")),
        Seq("k"), "left_anti").count()
    assert(audited == 1L, s"planted orphan must surface, got $audited")
  }

  test("q47 co-purchase: pairs normalized a<b, cosine in (0,1], co bounded by min degree") {
    val out = FixtureQueries.queries("q47_copurchase")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 100)
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val cos = r.getAs[Double]("cosine")
      assert(a < b, s"pair not normalized: $a,$b")
      assert(cos > 0.0 && cos <= 1.0, s"cosine out of range: $cos")
    }
    // descending by co with id tiebreaks (the deterministic top-k cut)
    val keys = out.map(r => (-r.getAs[Long]("co"), r.getAs[Long]("part_a"), r.getAs[Long]("part_b")))
    assert(keys.sameElements(keys.sorted), "output not in (co desc, ids) order")
  }

  test("q48 MAD: planted far outlier is counted, median/MAD match a driver-side replay") {
    val out = FixtureQueries.queries("q48_mad_outliers")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    // replay one type's median/MAD in plain Scala from the raw rows
    val cents = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select((col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val med = cents((cents.length - 1) / 2)
    val devs = cents.map(c => math.abs(c - med)).sorted
    val mad = devs((devs.length - 1) / 2)
    val row = out("click")
    assert(row.getAs[Long]("median_cents") === med)
    assert(row.getAs[Long]("mad_cents") === mad)
    assert(row.getAs[Long]("n_outliers") === devs.count(_ > 3 * mad))
  }

  test("q50 SCD2: one open interval per user, intervals chain, events conserved") {
    val out = FixtureQueries.queries("q50_scd2")(spark, sf).cache()
    val users = out.select("user_id").distinct().count()
    assert(out.filter(col("is_current") === 1).count() === users,
      "exactly one open (is_current) interval per user")
    assert(out.filter(col("is_current") === 0 && col("valid_to").isNull).isEmpty,
      "every closed interval must carry a valid_to")
    // intervals chain: valid_to of segment k == valid_from of segment k+1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("seg")
    val broken = out.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(broken.isEmpty, "validity intervals must chain without gaps")
    // row conservation: segment n_events sum to the raw event count
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total === graft.Tables.events(spark, sf).count(), "events conserved")
  }

  test("q53 attribution: last-touch within lookback else direct, full driver replay bitwise") {
    import spark.implicits._
    val out = FixtureQueries.queries("q53_attribution")(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // driver replay: per-user history walk under the same (ts, event_id) order
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, java.time.LocalDateTime, Long, String, Double)].collect()
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val attributed = ev.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r =>
        (r._2.toEpochSecond(java.time.ZoneOffset.UTC), r._2.getNano, r._1))
      var touch: Option[(java.time.LocalDateTime, String)] = None
      sorted.flatMap { case (_, ts, _, tpe, value) =>
        val channel = touch match {
          case Some((tts, ch)) if !tts.isBefore(ts.minusDays(3)) => ch
          case _ => "direct"
        }
        val emit = if (tpe == "purchase") Some((channel, value)) else None
        if (tpe == "click" || tpe == "view") touch = Some((ts, tpe))
        emit
      }
    }
    val expect = attributed.groupBy(_._1).map { case (ch, ps) =>
      val cents = ps.map(p => BigDecimal(p._2 * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      ch -> ((ch, ps.size.toLong, r(cents.toDouble / 100.0, 2)))
    }
    assert(out == expect, s"driver replay must match bitwise:\n$out\nvs\n$expect")
    assert(out.values.map(_._2).sum ==
      ev.count(_._4 == "purchase"), "every purchase attributed exactly once")
  }

  test("q54 streaks: island segmentation matches a driver replay; identities hold") {
    import spark.implicits._
    val out = FixtureQueries.queries("q54_streaks")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val days = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .as[(Long, java.time.LocalDate)].collect()
    val expect = days.groupBy(_._1).map { case (u, rows) =>
      val ds = rows.map(_._2.toEpochDay).sorted
      // split sorted days into consecutive runs
      val runs = ds.foldLeft(List.empty[(Long, Long)]) { // (runStartDay, len)
        case ((start, len) :: rest, d) if d == start + len => (start, len + 1) :: rest
        case (acc, d) => (d, 1L) :: acc
      }
      val lens = runs.map(_._2)
      u -> ((u, lens.size.toLong, lens.max, lens.sum))
    }
    assert(out == expect, "driver replay must match bitwise")
    // identities: active_days = distinct days; islands <= active_days
    assert(out.values.forall(r => r._2 <= r._4 && r._3 <= r._4),
      "islands and longest streak bounded by active days")
  }

  test("q51 association rules: confidence/lift identities hold against a driver replay") {
    val out = FixtureQueries.queries("q51_assoc_rules")(spark, sf).cache()
    assert(out.count() > 0, "fixture must yield at least one rule")
    // pairs normalized and support ordered under the declared total order
    assert(out.filter(col("part_a") >= col("part_b")).isEmpty, "pairs are a<b")
    // replay one rule's arithmetic from the raw baskets
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct().cache()
    val baskets = li.select("ok").distinct().count()
    val r = out.orderBy(col("support").desc, col("part_a"), col("part_b")).first()
    val (pa, pb) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
    val na = li.filter(col("pk") === pa).count()
    val nb = li.filter(col("pk") === pb).count()
    val co = li.filter(col("pk") === pa).select("ok")
      .intersect(li.filter(col("pk") === pb).select("ok")).count()
    assert(r.getAs[Long]("support") === co)
    assert(r.getAs[Double]("conf_ab") ===
      BigDecimal(co.toDouble / na.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("lift") ===
      BigDecimal((co * baskets).toDouble / (na * nb).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q56 rolling actives: trailing-7d distinct matches a driver replay") {
    import spark.implicits._
    val out = FixtureQueries.queries("q56_rolling_actives")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val census = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .as[(Long, java.time.LocalDate)].collect()
      .map(r => (r._1, r._2.toEpochDay))
    val d1 = census.map(_._2).max
    val expect = census.flatMap { case (u, d) =>
      (0L to 6L).map(o => (u, d + o)).filter(_._2 <= d1)
    }.distinct.groupBy(_._2).map { case (day, rows) =>
      val dau = census.count(_._2 == day).toLong
      val wau = rows.length.toLong
      day -> ((day, dau, wau,
        BigDecimal(dau.toDouble / wau.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(out == expect, s"rolling-actives replay:\n$out\nvs\n$expect")
    // identities: a day's actives are inside its trailing window
    assert(out.values.forall(r => r._2 <= r._3), "DAU must be <= WAU")
  }

  test("q57 Wilson CI: interval brackets the MLE and replays bitwise") {
    import spark.implicits._
    val out = FixtureQueries.queries("q57_wilson_ci")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        (col("event_type") === "purchase").as("pur"))
      .as[(Long, java.time.LocalDate, Boolean)].collect()
    val perUser = users.map(r => ((r._2.toEpochDay % 7, r._1), r._3))
      .groupBy(_._1).toSeq.map { case (k, rs) => (k._1, rs.exists(_._2)) }
    val byDow = perUser.groupBy(_._1).map { case (dow, rs) =>
      val n = rs.size.toLong; val k = rs.count(_._2).toLong
      val z = 1.96; val nd = n.toDouble
      val p = k.toDouble / nd
      val den = 1.0 + (z * z) / nd
      val ctr = (p + (z * z) / (2.0 * nd)) / den
      val hw = (z * math.sqrt(p * (1.0 - p) / nd + (z * z) / (4.0 * nd * nd))) / den
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      dow -> ((dow, n, k, r6(p), r6(ctr - hw), r6(ctr + hw)))
    }
    assert(out == byDow, s"Wilson replay:\n$out\nvs\n$byDow")
    out.values.foreach { r =>
      assert(r._5 <= r._4 && r._4 <= r._6, s"interval must bracket p_hat: $r")
      assert(r._5 >= 0.0 && r._6 <= 1.0, s"Wilson stays inside [0,1]: $r")
    }
  }

  test("q58 PIT join: as-of attribution equals a driver interval-containment replay") {
    import spark.implicits._
    val out = FixtureQueries.queries("q58_pit_join")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def band(v: Double): Long =
      java.lang.Long.toBinaryString(
        (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong
      ).length.toLong
    // driver SCD2: segment each user's (ts, event_id)-ordered band series
    val rows = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (valid_from_us, band)
      var prev = Long.MinValue
      sorted.foreach { e =>
        val b = band(e._5)
        if (b != prev) { segs += ((e._2, b)); prev = b }
      }
      // attribute each purchase to the latest segment at-or-before its ts;
      // ties on valid_from -> the later segment (interval containment)
      sorted.filter(_._4 == "purchase").map { e =>
        val seg = segs.zipWithIndex.filter(_._1._1 <= e._2).maxBy(_._2)._1
        (seg._2, u, cents(e._5))
      }
    }
    val expect = rows.groupBy(_._1).map { case (b, rs) =>
      b -> ((b, rs.size.toLong, rs.map(_._2).distinct.size.toLong,
        BigDecimal(rs.map(_._3).sum.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(out == expect, s"PIT replay:\n$out\nvs\n$expect")
    // conservation: every purchase lands in exactly one band
    val total = ev.count(_._4 == "purchase").toLong
    assert(out.values.map(_._2).sum == total, "attribution must partition purchases")
  }

  test("q59 conversion lag: percentiles and mean match a driver replay") {
    import spark.implicits._
    val out = FixtureQueries.queries("q59_conversion_lag")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].head()
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, String, Long)].collect()
    val lags = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None else {
        val v0 = views.min
        val ps = rows.filter(r => r._2 == "purchase" && r._3 >= v0).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - v0) / 1000000L)
      }
    }.sorted
    val n = lags.size.toLong
    def pct(q: Int): Long = lags(lags.indices.find(i => (i + 1).toLong * 100 >= n * q).get)
    val mean = BigDecimal(lags.sum.toDouble / n.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == ((n, pct(50), pct(90), pct(99), mean)),
      s"conversion-lag replay: $out vs ${(n, pct(50), pct(90), pct(99), mean)}")
    assert(out._2 <= out._3 && out._3 <= out._4, "percentiles must be monotone")
  }

  test("q60 ship delay: per-priority percentiles match a driver replay") {
    import spark.implicits._
    val out = FixtureQueries.queries("q60_ship_delay")(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate").cast("date"))
      .as[(Long, java.sql.Date)].collect()
    val ord = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate").cast("date"), col("o_orderpriority"))
      .as[(Long, java.sql.Date, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val delays = li.map { case (ok, sd) =>
      val (od, pr) = ord(ok)
      (pr, sd.toLocalDate.toEpochDay - od.toLocalDate.toEpochDay)
    }
    val expect = delays.groupBy(_._1).map { case (pr, rows) =>
      val ds = rows.map(_._2).sorted
      val n = ds.length.toLong
      def pct(q: Int): Long = ds(ds.indices.find(i => (i + 1).toLong * 100 >= n * q).get)
      val mean = BigDecimal(ds.sum.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      pr -> ((pr, n, pct(50), pct(90), pct(99), mean))
    }
    assert(out == expect, s"ship-delay replay:\n$out\nvs\n$expect")
    assert(out.values.forall(r => r._3 <= r._4 && r._4 <= r._5),
      "percentiles must be monotone")
  }

  test("q55 RFM: full segment table matches a driver inverse-CDF replay") {
    import spark.implicits._
    val out = FixtureQueries.queries("q55_rfm")(spark, sf)
      .as[(Int, Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5)).toMap
    val p = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .as[(Long, java.time.LocalDate, Double)].collect()
    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val mx = p.map(_._2.toEpochDay).max
    val users = p.groupBy(_._1).map { case (u, rows) =>
      (u, mx - rows.map(_._2.toEpochDay).max, rows.size.toLong,
        rows.map(r => cents(r._3)).sum)
    }.toSeq
    // exact quintile cuts: smallest value whose 5*cum >= q*n over the census
    def cuts(vals: Seq[Long]): Seq[Long] = {
      val sorted = vals.sorted; val n = sorted.size.toLong
      (1 to 4).map(q => sorted(sorted.indices.find(i => (i + 1).toLong * 5 >= n * q).get))
    }
    def score(v: Long, ts: Seq[Long]): Int = 1 + ts.count(v > _)
    val (rc, fc, mc) = (cuts(users.map(_._2)), cuts(users.map(_._3)), cuts(users.map(_._4)))
    val expect = users.groupBy { case (_, r, f, m) => (score(r, rc), score(f, fc), score(m, mc)) }
      .map { case (k, rs) =>
        k -> ((rs.size.toLong, BigDecimal(rs.map(_._4).sum.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    assert(out == expect, s"segment table replay:\n$out\nvs\n$expect")
    // quintile balance: users scoring <= k on each axis cover >= k/5 of the base
    val n = users.size.toLong
    for (k <- 1 to 4) {
      val atMost = out.collect { case ((r, _, _), (c, _)) if r <= k => c }.sum
      assert(atMost * 5 >= n * k, s"recency quintile $k holds ${atMost} of $n")
    }
  }
}
