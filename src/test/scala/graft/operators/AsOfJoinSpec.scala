package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("nearestPrior matches the greatest right time <= left time per key") {
    val sp = spark; import sp.implicits._
    val probes = Seq(
      (1L, 10L, ts("10:00:00")),
      (2L, 10L, ts("10:05:00")),
      (3L, 20L, ts("10:00:00")),   // no signup for user 20 before
      (4L, 30L, ts("09:00:00")))   // signup exactly at probe time → match
      .toDF("event_id", "user_id", "ts")
    val refs = Seq(
      (10L, ts("09:30:00")),
      (10L, ts("10:02:00")),
      (10L, ts("11:00:00")),       // after both probes, never matched
      (20L, ts("10:30:00")),       // after user 20's probe
      (30L, ts("09:00:00")))
      .toDF("user_id", "ts")
    val out = AsOfJoin.nearestPrior(probes, refs, "user_id", "user_id", "ts", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3))))
    out.toSeq shouldBe Seq(
      (1L, Some(ts("09:30:00"))),
      (2L, Some(ts("10:02:00"))),
      (3L, None),
      (4L, Some(ts("09:00:00"))))
  }

  test("nearestFollowing matches the least right time >= left time per key") {
    val sp = spark; import sp.implicits._
    val probes = Seq(
      (1L, 10L, ts("10:00:00")),   // next signup 10:02
      (2L, 10L, ts("10:05:00")),   // next signup 11:00
      (3L, 20L, ts("11:00:00")),   // user 20's only signup was before → none
      (4L, 30L, ts("09:00:00")))   // signup exactly at probe time → match
      .toDF("event_id", "user_id", "ts")
    val refs = Seq(
      (10L, ts("09:30:00")),       // before both probes, never matched
      (10L, ts("10:02:00")),
      (10L, ts("11:00:00")),
      (20L, ts("10:30:00")),
      (30L, ts("09:00:00")))
      .toDF("user_id", "ts")
    val out = AsOfJoin.nearestFollowing(probes, refs, "user_id", "user_id", "ts", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3))))
    out.toSeq shouldBe Seq(
      (1L, Some(ts("10:02:00"))),
      (2L, Some(ts("11:00:00"))),
      (3L, None),
      (4L, Some(ts("09:00:00"))))
  }

  test("NULL keys never match (ANSI semantics), null-key left rows survive unmatched") {
    val sp = spark; import sp.implicits._
    val probes = Seq(
      (1L, Option(10L), ts("10:00:00")),
      (2L, Option.empty[Long], ts("10:00:00"))) // null key probe
      .toDF("event_id", "user_id", "ts")
    val refs = Seq(
      (Option(10L), ts("09:00:00")),
      (Option.empty[Long], ts("09:30:00")))     // null key ref: matches nothing
      .toDF("user_id", "ts")
    val out = AsOfJoin.nearestPrior(probes, refs, "user_id", "user_id", "ts", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3))))
    out.toSeq shouldBe Seq(
      (1L, Some(ts("09:00:00"))),
      (2L, None))
  }

  test("mismatched time types are rejected instead of silently cast") {
    val sp = spark; import sp.implicits._
    val l = Seq((1L, 10L, 100)).toDF("event_id", "user_id", "ts") // int time
    val r = Seq((10L, 99.5)).toDF("user_id", "ts")                // double time
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.nearestPrior(l, r, "user_id", "user_id", "ts", "ts")
  }
}
