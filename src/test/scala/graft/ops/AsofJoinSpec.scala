package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** As-of join semantics the driver oracle can't pin (DuckDB leaves equal-ts
 * winners unspecified and has no exclusive variant in the fixture), plus the
 * merge formulation's one-exchange plan shape. */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "u1", ts("2025-01-01 10:00:00")),
    (2L, "u1", ts("2025-01-01 12:00:00")),
    (3L, "u2", ts("2025-01-01 09:00:00")), // before any right row
    (4L, "u3", ts("2025-01-01 10:00:00"))  // key with no right rows at all
  ).toDF("id", "user", "ts")

  private lazy val right = Seq(
    ("u1", ts("2025-01-01 09:30:00"), 100L),
    ("u1", ts("2025-01-01 10:00:00"), 101L), // AT left id=1's ts
    ("u1", ts("2025-01-01 11:00:00"), 102L),
    ("u2", ts("2025-01-01 09:30:00"), 200L)
  ).toDF("user", "ts", "rid")

  test("inclusive: at-ts row matches; no-prior and no-key rows keep nulls; left never dropped") {
    val out = AsofJoin.asof(left, right, Seq("user"), "ts", Seq("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out == Map(1L -> 101L, 2L -> 102L, 3L -> -1L, 4L -> -1L))
  }

  test("exclusive: the at-ts row no longer matches") {
    val out = AsofJoin.asof(left, right, Seq("user"), "ts", Seq("rid"), inclusive = false)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == 100L) // falls back to the strictly-earlier row
    assert(out(2L) == 102L)
  }

  test("equal-ts right rows: last in tieCols order wins, deterministically under repartition") {
    val tied = Seq(
      ("u1", ts("2025-01-01 09:30:00"), 7L),
      ("u1", ts("2025-01-01 09:30:00"), 9L),
      ("u1", ts("2025-01-01 09:30:00"), 8L)
    ).toDF("user", "ts", "rid")
    val probe = Seq((1L, "u1", ts("2025-01-01 10:00:00"))).toDF("id", "user", "ts")
    (1 to 3).foreach { p =>
      val out = AsofJoin.asof(probe, tied.repartition(p), Seq("user"), "ts",
        Seq("rid"), tieCols = Seq("rid")).head()
      assert(out.getLong(3) == 9L, s"partitions=$p")
    }
  }

  test("colliding right column names are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right.withColumnRenamed("rid", "id"), Seq("user"), "ts", Seq("id"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("plan: exactly ONE exchange — merge formulation, not a range join") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val l = ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val out = AsofJoin.asof(l, r, Seq("user_id"), "ts", Seq("click_id"))
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // and it agrees with the quadratic reference formulation on real data
    val naive = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(max_by(col("r.click_id"), col("r.ts")).as("click_id"))
    val a = out.select("event_id", "click_id").collect()
      .map(r0 => r0.getLong(0) -> (if (r0.isNullAt(1)) -1L else r0.getLong(1))).toMap
    val b = naive.collect()
      .map(r0 => r0.getLong(0) -> (if (r0.isNullAt(1)) -1L else r0.getLong(1))).toMap
    assert(a == b)
  }
}
