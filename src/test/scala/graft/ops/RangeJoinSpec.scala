package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Range-join semantics + the bucketing plan shape: equi-join on the bucket
 * id, never a nested loop; half-open boundaries; explode-factor guard. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("half-open containment, boundary exactness, no duplicate pairs") {
    val points = Seq(0.5, 1.0, 5.0, 9.999, 10.0, 25.0).map(Tuple1(_)).toDF("pt")
    val intervals = Seq((1L, 1.0, 10.0), (2L, 9.0, 12.0), (3L, 100.0, 101.0))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 3.0)
      .select("pt", "iid").collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(out == Set(
      (1.0, 1L),                // lo inclusive
      (5.0, 1L),
      (9.999, 1L), (9.999, 2L), // overlap region: both intervals, once each
      (10.0, 2L)                // hi exclusive for interval 1, inside 2
    ), out.toString)
    // 0.5 (before any interval) and 25.0 (in none) drop — inner semantics
    assert(!out.exists(_._1 == 0.5) && !out.exists(_._1 == 25.0))
  }

  test("null interval bounds DROP per inner semantics instead of tripping the guard") {
    val points = Seq(Tuple1(5.0)).toDF("pt")
    val intervals = Seq((1L, Some(1.0), Some(10.0)), (2L, None, Some(10.0)),
        (3L, Some(1.0), None), (4L, None, None))
      .toDF("iid", "lo", "hi")
    // three-valued logic would route null bounds into the raise_error arm
    // (round-4 advice); the explicit null arm explodes a null array → drop
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 3.0)
      .select("iid").as[Long].collect().toSeq
    assert(out == Seq(1L), s"only the well-formed interval may match: $out")
    // null points drop too: the bucket equi-join never matches on null
    val nullPt = Seq(Some(5.0), None).map(Tuple1(_)).toDF("pt")
    val out2 = RangeJoin.pointInInterval(nullPt, "pt",
        Seq((1L, 1.0, 10.0)).toDF("iid", "lo", "hi"), "lo", "hi", 3.0)
    assert(out2.count() == 1L)
  }

  test("reserved __ prefix on inputs is rejected loudly") {
    val points = Seq(Tuple1(5.0)).toDF("__pt")
    val intervals = Seq((1L, 1.0, 10.0)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "__pt", intervals, "lo", "hi", 3.0)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("explode-factor guard fails loudly on a degenerate interval") {
    val points = Seq(Tuple1(5.0)).toDF("pt")
    val wide = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", wide, "lo", "hi", 1.0,
        maxBucketsPerInterval = 100L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("widen bucketWidth"),
      s"expected the guard diagnostic, got: ${e.getMessage}")
  }

  test("plan: hash equi-join on the bucket, no nested loop; parity with the θ-join on real data") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate").as("lo"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("hi"))
    val points = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_shipdate"))
    val out = RangeJoin.pointInInterval(points, "l_shipdate", orders, "lo", "hi", 86400.0)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    val theta = points.join(orders,
      col("l_shipdate") >= col("lo") && col("l_shipdate") < col("hi"))
    assert(out.count() == theta.count())
    val a = out.groupBy("o_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = theta.groupBy("o_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
