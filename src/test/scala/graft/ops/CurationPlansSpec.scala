package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Plan-shape pins for the curation operators — every scale claim the
 * scaladocs make must be visible in the executed plan, not assumed. */
class CurationPlansSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratifiedSample: corpus never shuffles — one group-size exchange + a broadcast join") {
    val p = plan(Curation.stratifiedSample(docs, "source", "doc_id", 10L))
    // the ONLY shuffle is the group-size partial agg (tiny key column scan);
    // the corpus branch is FileScan → Filter → BroadcastHashJoin, narrow
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("packSequences: exactly one exchange, on the shard key") {
    val toks = docs.select(col("source"), col("doc_id"),
      size(graft.corpus.Extract.tokenize(col("text"))).as("len"))
    val p = plan(Curation.packSequences(toks, "source", "doc_id", "len", 512L))
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("lmScore: training corpus scanned+tokenized ONCE (counts materialized, not re-derived)") {
    val toks = docs.select(col("doc_id"),
      graft.corpus.Extract.tokenize(col("text")).as("t"))
    val p = plan(Curation.lmScore(toks, "doc_id", "t"))
    // without the counts materialization the totals aggregate AND the score
    // join each re-derive the counts subtree: 3 corpus FileScans + 3
    // tokenize passes. With it: the score side's single scan.
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    // counts + totals read the materialized vocab table, not the corpus
    assert("Scan ExistingRDD".r.findAllIn(p).size == 2, p)
  }
}
