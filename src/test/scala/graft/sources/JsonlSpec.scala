package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Reference JSONL semantics: permissive skip+count at mine/score, fail-fast
 * at tag (phrasekit_mine.rs:132-138 vs phrasekit_tag.rs:146). */
class JsonlSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", StringType), StructField("tokens", ArrayType(StringType))))

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"), lines.mkString("\n"))
    dir.toString
  }

  private val mixed = Seq(
    """{"doc_id":"d1","tokens":["a","b"]}""",
    """{this is not json""",
    "", // blank: silently skipped, NOT counted as malformed
    """{"doc_id":"d2","tokens":["c"]}""",
    """{"tokens":["x"]}""", // missing required doc_id → malformed
    """{"doc_id":"d3","tokens":[]}""")

  test("permissive: malformed lines skipped and counted; blanks silent") {
    val path = writeLines(mixed)
    val (docs, malformed) = Jsonl.readPermissive(spark, path, schema, Seq("doc_id", "tokens"))
    val got = docs.select("doc_id").as[String].collect().sorted.toSeq
    assert(got == Seq("d1", "d2", "d3"))
    assert(malformed() == 2L) // the broken JSON + the missing doc_id
  }

  test("permissive counter rides the main action: no extra jobs to read it") {
    val path = writeLines(mixed)
    val (docs, malformed) = Jsonl.readPermissive(spark, path, schema, Seq("doc_id", "tokens"))
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      docs.count() // the one action
      Thread.sleep(500) // listener events are async
      val after = jobs
      assert(malformed() == 2L)
      Thread.sleep(500) // listener events are async
      assert(jobs == after, "reading the malformed counter must not launch jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("strict (tag semantics): a malformed line is fatal") {
    val path = writeLines(mixed)
    val e = intercept[Exception] {
      Jsonl.readStrict(spark, path, schema).collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: chain(t.getCause)
    assert(chain(e).exists(m => m != null &&
      (m.contains("FAILFAST") || m.contains("Malformed") || m.contains("malformed"))))
    // a clean file parses fine
    val ok = writeLines(Seq("""{"doc_id":"d1","tokens":["a"]}"""))
    assert(Jsonl.readStrict(spark, ok, schema).count() == 1L)
  }

  test("strict: a WELL-FORMED line missing a required field is fatal (serde parity)") {
    // parses fine under FAILFAST (valid JSON, valid types) — only the
    // required-field guard catches it, like serde's required-field rejection
    val missing = writeLines(Seq(
      """{"doc_id":"d1","tokens":["a"]}""",
      """{"tokens":["b","c"]}"""))
    val e = intercept[Exception] {
      Jsonl.readStrict(spark, missing, schema, Seq("doc_id", "tokens")).collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: chain(t.getCause)
    assert(chain(e).exists(_.contains("required field 'doc_id'")), chain(e).toString)
    // explicit null is rejected the same way
    val explicitNull = writeLines(Seq("""{"doc_id":null,"tokens":["a"]}"""))
    intercept[Exception] {
      Jsonl.readStrict(spark, explicitNull, schema, Seq("doc_id", "tokens")).collect()
    }
    // the guard survives column pruning: a count (consumes no columns) and a
    // projection of the OTHER column must still abort — a projection-based
    // guard would be optimized away here
    intercept[Exception] {
      Jsonl.readStrict(spark, missing, schema, Seq("doc_id", "tokens")).count()
    }
    intercept[Exception] {
      Jsonl.readStrict(spark, missing, schema, Seq("doc_id", "tokens"))
        .select("tokens").collect()
    }
    // all required fields present → clean read, all rows survive
    val ok2 = writeLines(Seq(
      """{"doc_id":"d1","tokens":["a"]}""", """{"doc_id":"d2","tokens":[]}"""))
    assert(Jsonl.readStrict(spark, ok2, schema, Seq("doc_id", "tokens")).count() == 2L)
  }

  test("round-trip: parquet documents → JSONL → permissive read preserves content") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft-jsonl-rt").toString + "/docs"
    src.write.mode("overwrite").json(dir)
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val (back, malformed) = Jsonl.readPermissive(spark, dir, sch, Seq("doc_id", "text"))
    val a = src.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(malformed() == 0L)
  }
}
