package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** One-pass SimHash vs the explode-based formulation it replaced, including
 * the empty/null token-array edge the oracle drops. */
class SimHashSpec extends SparkSuite {
  import spark.implicits._

  test("empty and null token arrays produce no row (oracle drop semantics)") {
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])).toDF("doc_id", "t")
    val got = SimHash.simhash16(df, "doc_id", "t")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L))
  }

  test("one-pass simhash == explode-based reference formulation (real corpus)") {
    val tok = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.corpus.Extract.tokenize(col("text")).as("t"))
    val fast = SimHash.simhash16(tok, "doc_id", "t")
      .as[(Long, Long)].collect().toMap
    // the round-2 shape: explode tokens ×16 bits, vote via md5 hex digits
    val slow = tok.select(col("doc_id"), explode(col("t")).as("tok"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("i"),
        expr("position(substring(md5(tok), i + 1, 1) IN '0123456789abcdef') - 1").as("hv"))
      .groupBy("doc_id", "i")
      .agg(sum(when(col("hv") >= 8, 1).otherwise(-1)).as("sgn"))
      .select(col("doc_id"), col("i"),
        when(col("sgn") > 0, 1L).otherwise(0L).as("bit"))
      .groupBy("doc_id")
      .agg(sum(col("bit") * pow(lit(2.0), col("i")).cast("long")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(fast == slow && fast.nonEmpty)
  }
}
