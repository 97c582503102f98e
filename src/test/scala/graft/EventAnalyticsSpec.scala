package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventAnalytics
import graft.ext.Dedup

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: stages require strictly-after ordering, not mere presence") {
    val events = Seq(
      // u1 completes A -> B -> C in order
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-01 01:00:00"), "B"),
      (1L, ts("2024-01-01 02:00:00"), "C"),
      // u2 has B BEFORE A — presence alone would count it; order must not
      (2L, ts("2024-01-01 01:00:00"), "B"),
      (2L, ts("2024-01-01 02:00:00"), "A"),
      // u3 stops after A -> B
      (3L, ts("2024-01-01 00:00:00"), "A"),
      (3L, ts("2024-01-01 00:30:00"), "B"),
      // u4 B at the SAME instant as A — strictly-after excludes it
      (4L, ts("2024-01-01 00:00:00"), "A"),
      (4L, ts("2024-01-01 00:00:00"), "B")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, Seq("A", "B", "C"))
      .orderBy("stage").select("stage", "n_users").as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 4L), (2, 2L), (3, 1L)))
    graft.ops.Intermediates.sweep(spark)
  }

  test("retentionCohorts: first-day cohorting, offset counts, multi-event days collapse") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")), // same day: one active row
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-02 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retentionCohorts(events)
      .orderBy("cohort_day", "day_offset")
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_active"))
      .as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L), // u1, u2 on their first day
      ("2024-01-01", 2, 1L), // u1 back two days later
      ("2024-01-02", 0, 1L)  // u3's own cohort
    ))
    graft.ops.Intermediates.sweep(spark)
  }

  test("hoppingCounts: each event lands in exactly width/slide windows") {
    val events = Seq(
      (ts("2024-01-01 00:10:00"), 1.0), // window starts 23:30 (prev day) and 00:00
      (ts("2024-01-01 00:40:00"), 2.0)  // window starts 00:00 and 00:30
    ).toDF("ts", "value")
    val got = EventAnalytics.hoppingCounts(events)
      .orderBy("win_start")
      .select(col("win_start").cast("string"), col("n_events"), col("sum_value_e3"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2023-12-31 23:30:00", 1L, 1000L), // covers 00:10 only
      ("2024-01-01 00:00:00", 2L, 3000L), // covers both
      ("2024-01-01 00:30:00", 1L, 2000L)  // covers 00:40 only
    ))
  }

  test("histogram: fixed-width binning with exact fixed-point range stats") {
    val events = Seq(("a", 1.5), ("a", 9.9), ("a", 10.0), ("b", -0.5))
      .toDF("event_type", "value")
    val got = EventAnalytics.histogram(events, "value", 10.0, Seq("event_type"))
      .orderBy("event_type", "bin")
      .select("event_type", "bin", "n", "min_value_e3", "max_value_e3")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 0L, 2L, 1500L, 9900L),
      ("a", 1L, 1L, 10000L, 10000L),
      ("b", -1L, 1L, -500L, -500L)))
  }

  test("editDistanceProbe: finds matches within maxDist incl. at the length-prune boundary") {
    val corpus = Seq(
      (1L, "hello world example"),
      (2L, "completely different content here"),
      (3L, "hello world exampleXXXX") // 4 appended chars: len diff 4 == maxDist
    ).toDF("doc_id", "text")
    val probes = Seq((100L, "hello world example")).toDF("doc_id", "text")
    val got = Dedup.editDistanceProbe(probes, corpus, maxDist = 4)
      .orderBy("corpus_id")
      .select("probe_id", "corpus_id", "dist").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((100L, 1L, 0), (100L, 3L, 4)))
  }

  test("editDistanceProbe: banded DP rejects beyond maxDist even when lengths are close") {
    val corpus = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val probes = Seq((9L, "zyxwvutsrq")).toDF("doc_id", "text") // same length, dist 10
    assert(Dedup.editDistanceProbe(probes, corpus, maxDist = 4).count() == 0)
  }
}
