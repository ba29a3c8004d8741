package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.plans.GraftFunctions

/** graft_vdot (native codegen dot product) + blockedCosinePairs semantics. */
class VectorSimSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  // deterministic pseudo-random floats with negatives, no Math.random
  private def vec(seed: Int, dim: Int): Seq[Float] =
    (0 until dim).map(i => (((seed * 2654435761L + i * 40503L) % 1000L) - 500L).toFloat / 250f)

  test("graft_vdot matches the interpreted HOF dot bit-for-bit") {
    GraftFunctions.register(spark)
    val df = (1 to 50).map(i => (i, vec(i, 64), vec(i + 7, 64))).toDF("id", "a", "b")
    val got = df.select(col("id"), call_function("graft_vdot", col("a"), col("b")).as("d"))
      .as[(Int, Double)].collect().toMap
    val want = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
      .as[(Int, Double)].collect().toMap
    assert(got == want) // exact: same ascending-index double accumulation
    assert(got.values.exists(_ < 0) && got.values.exists(_ > 0)) // non-trivial data
  }

  test("graft_vdot null semantics mirror zip_with padding: mismatch/null → null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1, Seq(1f, 2f), Seq(3f, 4f)),          // ok: 11.0
      (2, Seq(1f, 2f), Seq(3f)),               // length mismatch → null
      (3, Seq(1f, 2f), null.asInstanceOf[Seq[Float]]) // null array → null
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), call_function("graft_vdot", col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1 -> Some(11.0), 2 -> None, 3 -> None))
    // null ELEMENT → null
    val e = spark.sql("SELECT graft_vdot(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d")
    assert(e.collect()(0).isNullAt(0))
  }

  test("graft_vdot runs inside whole-stage codegen (no fallback in the hot path)") {
    GraftFunctions.register(spark)
    // parquet-backed (a local Seq would be constant-folded to LocalTableScan)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(call_function("graft_vdot", col("embedding"), col("embedding")).as("d"))
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a whole-stage-codegen region
    assert("""\*\(\d+\) Project \[graft_vdot""".r.findFirstIn(p).isDefined, p)
    // the expression itself must not be a CodegenFallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.plans.VectorDot]))
  }

  test("blockedCosinePairs == unpruned brute force (prefix bound is exact, not approximate)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.blockedCosinePairs(emb, "label", "vec_id", "embedding", 0.3)
      .select(col("a"), col("b"), round(col("cos"), 10).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    // oracle: plain self-join + HOF cosine (the round-1 formulation)
    val ea = emb.select(col("label"), col("vec_id").as("a"), col("embedding").as("ea"))
    val eb = emb.select(col("label"), col("vec_id").as("b"), col("embedding").as("eb"))
    val want = ea.join(eb, Seq("label")).filter(col("a") < col("b"))
      .withColumn("cos", hofDot(col("ea"), col("eb")) /
        (sqrt(hofDot(col("ea"), col("ea"))) * sqrt(hofDot(col("eb"), col("eb")))))
      .filter(col("cos") >= 0.3)
      .select(col("a"), col("b"), round(col("cos"), 10).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("prefix-bound prune survives adversarial negative-head vectors") {
    // head dot (first 16 dims) is strongly negative, tail pushes cos above
    // threshold — a naive 'head >= threshold' prune would wrongly drop it
    val a = (Seq.fill(16)(-1f) ++ Seq.fill(48)(1f))
    val b = (Seq.fill(16)(1f) ++ Seq.fill(48)(1f))
    val df = Seq((0L, 1L, a), (1L, 1L, b)).toDF("vec_id", "label", "embedding")
    val got = Similarity.blockedCosinePairs(df, "label", "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    assert(math.abs(got(0)._3 - 32.0 / (8.0 * 8.0)) < 1e-12) // (-16+48)/(sqrt64*sqrt64)
  }
}
