package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MarketStats, TimeSeries}

/** Market-analytics operators (q67-q70): hand-computed references on
  * tiny frames, sequential-reference checks on the real events
  * table, and an independent cross-check of the integer-co-moment
  * correlation against Spark's own `corr` aggregate. */
class MarketStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("vwapHourly: hand-computed VWAP, zero-volume hour yields null") {
    val trades = Seq(
      ("a", ts("2024-01-01 10:05:00"), 10.0, 2L),  // pv 20
      ("a", ts("2024-01-01 10:40:00"), 20.0, 1L),  // pv 20 → vwap (40e6 div 3)
      ("a", ts("2024-01-01 11:10:00"), 99.0, 0L),  // vol 0 → null vwap
      ("b", ts("2024-01-01 10:30:00"), 5.5, 4L)    // vwap 5.5e6
    ).toDF("k", "t", "price", "qty")
    val got = MarketStats.vwapHourly(trades, "k", "t", "price", "qty")
      .select(col("k"), hour(col("hour")).as("h"), col("vwap_e6"))
      .as[(String, Int, Option[Long])].collect()
      .map { case (k, h, v) => (k, h) -> v }.toMap
    assert(got(("a", 10)) === Some(40000000L / 3))
    assert(got(("a", 11)) === None)
    assert(got(("b", 10)) === Some(5500000L))
    // integer sums: pv_e6 = Σ floor(p·1e6)·qty exactly
    val pv = MarketStats.vwapHourly(trades, "k", "t", "price", "qty")
      .filter(col("k") === "a" && hour(col("hour")) === 10)
      .select("pv_e6").as[Long].head()
    assert(pv === 40000000L)
  }

  test("drawdownFromHourly: matches a sequential per-key scan on real events") {
    val hourly = TimeSeries.hourlyClose(
      Tables.events(spark, sf), "user_id", "ts", "value")
    val got = MarketStats.drawdownFromHourly(hourly, "user_id")
      .select("user_id", "hour", "close_e6", "peak_e6", "dd_bps")
      .as[(Long, java.sql.Timestamp, Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (_, rows) =>
      var peak = Long.MinValue
      rows.sortBy(_._2.getTime).foreach { case (_, _, close, gotPeak, gotDd) =>
        peak = math.max(peak, close)
        assert(gotPeak === peak)
        assert(gotDd === (peak - close) * 10000 / peak) // peak > 0: prices positive
        assert(gotDd >= 0 && gotDd <= 10000)
      }
    }
  }

  test("rollingAnomaly: integer test agrees with a double-arithmetic reference") {
    val hourly = TimeSeries.hourlyClose(
      Tables.events(spark, sf), "user_id", "ts", "value")
    val rows = MarketStats.rollingAnomaly(hourly, "user_id", minN = 2)
      .select("close_e3", "n_24h", "sum_e3", "sumsq_e3", "is_anomaly")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.exists(_._5) && rows.exists(!_._5))
    rows.foreach { case (x, n, s, q, flag) =>
      // reference: |x − μ| > 2σ in plain doubles (ties cannot occur:
      // both sides of the integer comparison are integers, and the
      // double magnitudes here are far below 2^53 so the comparison
      // is exact in double too)
      val mu = s.toDouble / n
      val varN = (q.toDouble / n) - mu * mu
      val ref = n >= 2 && math.pow(x - mu, 2) * n * n > 4.0 * varN * n * n
      assert(flag === ref, s"x=$x n=$n s=$s q=$q")
    }
  }

  test("pairwiseCorr: integer co-moment corr matches Spark's corr aggregate") {
    val hourly = TimeSeries.hourlyClose(
        Tables.events(spark, sf), "user_id", "ts", "value")
      .filter(col("user_id") < 8)
    val got = MarketStats.pairwiseCorr(hourly, "user_id")
      .select("key_a", "key_b", "corr_e6")
      .as[(Long, Long, Option[Long])].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got.nonEmpty)
    // independent reference: Spark's built-in corr over the SAME
    // fixed-point series (corr is scale/shift-invariant, but fixed-
    // point flooring is not a pure rescale — so feed corr the e3
    // values themselves)
    val h = hourly.select(col("user_id"), col("hour"),
      floor(col("close") * lit(1e3)).cast("long").as("x"))
    val ref = h.as("a").join(h.as("b"), Seq("hour"))
      .filter(col("a.user_id") < col("b.user_id"))
      .groupBy(col("a.user_id").as("ka"), col("b.user_id").as("kb"))
      .agg(corr(col("a.x").cast("double"), col("b.x").cast("double")).as("r"))
      .as[(Long, Long, Option[Double])].collect()
      .map { case (a, b, r) => (a, b) -> r }.toMap
    assert(ref.keySet === got.keySet)
    ref.foreach { case (k, r) =>
      (r, got(k)) match {
        case (Some(rv), Some(ge6)) =>
          assert(math.abs(ge6 / 1e6 - rv) < 1e-5, s"pair $k: $ge6 vs $rv")
          assert(ge6 >= -1000000L && ge6 <= 1000000L)
        case (None, None) => // both degenerate
        case other => fail(s"pair $k disagree on definedness: $other")
      }
    }
  }

  test("trendSlopeE6: exact slope on a perfect line; single observation yields null") {
    // entity 1: y = 1.0, 2.0, 3.0 at hours 0,1,2 → slope exactly
    // 1000 e3-units/hour → slope_e6 = 1e9; entity 2: one point → null
    val hourly = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 01:00:00"), 2.0),
      (1L, ts("2024-01-01 02:00:00"), 3.0),
      (2L, ts("2024-01-01 00:00:00"), 5.0)
    ).toDF("user_id", "hour", "close")
    val got = graft.ops.MarketStats.trendSlopeE6(hourly, "user_id")
      .orderBy("user_id")
      .select("user_id", "n", "slope_e6", "sum_y_e3")
      .as[(Long, Long, Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, Some(1000000000L), 6000L),
      (2L, 1L, None, 5000L)))
  }
}
