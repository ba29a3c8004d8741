package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Curation operators: packing invariants, stratified-sampling contracts,
 * and LM-scoring semantics the SQL oracle can't see (OOV path, train/score
 * corpus split). */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("packSequences: budget respected, oversized docs isolated, bins contiguous, repartition-stable") {
    val docs = Seq(
      // group a: 300+300 fit one 512-bin? 300+300=600>512 → split
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 100L), ("a", 4L, 100L),
      // group b: an oversized doc between small ones
      ("b", 1L, 10L), ("b", 2L, 9999L), ("b", 3L, 10L),
      // group c: exact fill
      ("c", 1L, 256L), ("c", 2L, 256L), ("c", 3L, 1L)
    ).toDF("g", "id", "len")
    val packed = Curation.packSequences(docs, "g", "id", "len", 512L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byGroup = packed.groupBy(_._1)
    // no bin over budget unless it is a single oversized doc
    byGroup.values.flatten.groupBy(t => (t._1, t._4)).foreach { case ((g, bin), rows) =>
      val tot = rows.map(_._3).sum
      assert(tot <= 512L || rows.size == 1, s"group $g bin $bin holds $tot tokens in ${rows.size} docs")
    }
    // greedy semantics, spot-checked
    val a = byGroup("a").sortBy(_._2).map(_._4).toSeq
    assert(a == Seq(0L, 1L, 1L, 1L), s"group a bins: $a") // 300 | 300+100+100
    val b = byGroup("b").sortBy(_._2).map(_._4).toSeq
    assert(b == Seq(0L, 1L, 2L), s"group b bins: $b") // oversized doc isolated
    val c = byGroup("c").sortBy(_._2).map(_._4).toSeq
    assert(c == Seq(0L, 0L, 1L), s"group c bins: $c") // 256+256 = exact fit, 1 overflows
    // bins contiguous from 0
    byGroup.foreach { case (g, rows) =>
      val bins = rows.map(_._4).distinct.sorted.toSeq
      assert(bins == (0L until bins.length.toLong).toSeq, s"group $g bins $bins")
    }
    // deterministic under repartitioning
    val packed2 = Curation.packSequences(docs.repartition(7, col("id")), "g", "id", "len", 512L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.sortBy(t => (t._1, t._2)).toSeq == packed2.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("packSequences: output preserves the input column types (casts don't leak)") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    // int id + int len + string group: round-4 advice — the string/long casts
    // used for groupByKey must not surface in the output schema
    val docs = Seq(("a", 1, 300), ("a", 2, 300)).toDF("g", "id", "len")
    val out = Curation.packSequences(docs, "g", "id", "len", 512L)
    assert(out.schema("g").dataType == StringType)
    assert(out.schema("id").dataType == IntegerType)
    assert(out.schema("len").dataType == IntegerType)
    assert(out.schema("bin").dataType == LongType)
    // and a LONG group key round-trips through the internal string cast
    val byLong = Curation.packSequences(
      Seq((7L, 1, 300), (7L, 2, 300)).toDF("g", "id", "len"), "g", "id", "len", 512L)
    assert(byLong.schema("g").dataType == LongType)
    assert(byLong.select("g").distinct().as[Long].collect().toSeq == Seq(7L))
  }

  test("curation ops reject reserved __ columns loudly") {
    val docs = Seq(("a", 1L, 300L)).toDF("g", "id", "__n")
    assert(intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs, "g", "id", 10L)
    }.getMessage.contains("reserved"))
    assert(intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "g", "id", "__n", 512L)
    }.getMessage.contains("reserved"))
    assert(intercept[IllegalArgumentException] {
      AsofJoin.asof(Seq((1L, 1L, 1L)).toDF("k", "ts", "__tie"),
        Seq((1L, 1L, 1L)).toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
    }.getMessage.contains("reserved"))
  }

  test("stratifiedSample: under-quota keys survive whole, oversampled keys thin to ≈quota, deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val quota = 10L
    val sampled = Curation.stratifiedSample(docs, "source", "doc_id", quota)
    val perKey = sampled.groupBy("source").agg(count(lit(1)).as("kept"))
      .join(docs.groupBy("source").agg(count(lit(1)).as("n")), "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perKey.nonEmpty)
    perKey.foreach { case (src, kept, n) =>
      if (n <= quota) assert(kept == n, s"$src: under-quota key must keep all ($kept of $n)")
      else {
        // binomial(n, quota/n): mean `quota`, sd < sqrt(quota); 5 sd guards flake
        val sd = math.sqrt(quota.toDouble)
        assert(math.abs(kept - quota) <= 5 * sd + 1,
          s"$src: kept $kept of $n, expected ≈$quota")
      }
    }
    // exact determinism across runs and partitionings
    val again = Curation.stratifiedSample(docs.repartition(13), "source", "doc_id", quota)
    assert(sampled.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("lmScore: frequent tokens score lower, OOV scores pure smoothing mass, train/score split honored") {
    val train = Seq(
      (1L, Seq("the", "the", "the", "the", "cat")),
      (2L, Seq("the", "the", "dog", "cat", "sat"))
    ).toDF("doc_id", "t")
    // train corpus: N=10 tokens, V=4 distinct {the:6, cat:2, dog:1, sat:1}
    val score = Seq((10L, Seq("the")), (11L, Seq("dog")), (12L, Seq("unseen"))).toDF("doc_id", "t")
    val out = Curation.lmScore(score, "doc_id", "t", lmToks = Some(train))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 10.0; val v = 4.0
    assert(math.abs(out(10L) - -math.log(7.0 / (n + v))) < 1e-12) // the: (6+1)/(N+V)
    assert(math.abs(out(11L) - -math.log(2.0 / (n + v))) < 1e-12) // dog: (1+1)/(N+V)
    assert(math.abs(out(12L) - -math.log(1.0 / (n + v))) < 1e-12) // OOV: (0+1)/(N+V)
    assert(out(10L) < out(11L) && out(11L) < out(12L))
  }
}
