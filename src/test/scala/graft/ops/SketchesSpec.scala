package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Mergeable HLL distinct sketches: estimate ≈ exact, epoch-merge == direct,
 * partition-order insensitivity — the contracts that make per-epoch sketch
 * layers a sound substitute for corpus rescans. */
class SketchesSpec extends SparkSuite {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("per-source distinct-text estimate within the HLL error bound of exact") {
    val est = Sketches.withEstimate(
        Sketches.distinctSketch(docs, Seq("source"), "text"))
      .select(col("source"), col("distinct_est"), col("rows"))
    val exact = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("exact"), count(col("text")).as("n"))
    val joined = est.join(exact, "source").collect()
    assert(joined.nonEmpty, "no sources in testdata")
    joined.foreach { r =>
      val e = r.getAs[Long]("distinct_est").toDouble
      val x = r.getAs[Long]("exact").toDouble
      // lgK=12 → rse ≈ 1.6 %; 5 % is > 3 sigma, and small cardinalities are
      // exact in sparse mode — a miss here means broken plumbing, not noise
      assert(math.abs(e - x) / x <= 0.05,
        s"source ${r.getString(0)}: estimate $e vs exact $x")
      assert(r.getAs[Long]("rows") == r.getAs[Long]("n"))
    }
  }

  test("two-epoch sketch union == direct sketch of the union (per-key estimates)") {
    // epoch split by url hash — disjoint but content-overlapping halves
    // (duplicate texts exist across the split), the incremental-lake shape
    val a = docs.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0)
    val b = docs.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 1)
    assert(a.count() > 0 && b.count() > 0)
    val merged = Sketches.withEstimate(Sketches.mergeDistinct(
      Sketches.distinctSketch(a, Seq("source"), "text")
        .unionByName(Sketches.distinctSketch(b, Seq("source"), "text")),
      Seq("source")))
    val direct = Sketches.withEstimate(
      Sketches.distinctSketch(docs, Seq("source"), "text"))
    val m = merged.select("source", "distinct_est", "rows").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val d = direct.select("source", "distinct_est", "rows").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet == d.keySet)
    m.foreach { case (src, (estM, rowsM)) =>
      val (estD, rowsD) = d(src)
      assert(rowsM == rowsD, s"$src rows: merged $rowsM vs direct $rowsD")
      // HLL union of same-lgK sketches reconstructs the same register state
      // up to promotion mode; estimates agree within a fraction of the rse
      val tol = math.max(1.0, 0.02 * estD)
      assert(math.abs(estM - estD) <= tol,
        s"$src: merged estimate $estM vs direct $estD")
    }
  }

  test("estimate is partition-order insensitive") {
    val base = Sketches.withEstimate(
        Sketches.distinctSketch(docs, Seq("source"), "text"))
      .select("source", "distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shuffled = Sketches.withEstimate(
        Sketches.distinctSketch(docs.repartition(7, col("text")),
          Seq("source"), "text"))
      .select("source", "distinct_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
  }
}
