package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Ingest-time streaming dedup: exactly-one-survivor parity with batch
 * distinct inside the watermark horizon, bounded state, and the documented
 * re-emit once a key's state expires past the horizon. */
class DedupStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("within-horizon duplicates collapse to one; expired keys re-emit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val pages = input.toDF().toDF("url", "warc_ts", "text")
    val out = DedupStream.dedupByContent(pages, horizon = "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: an in-batch duplicate pair + a unique doc
      input.addData(
        ("u1", ts("2025-01-01 00:00:00"), "alpha body"),
        ("u2", ts("2025-01-01 00:10:00"), "alpha body"),
        ("u3", ts("2025-01-01 00:10:00"), "beta body"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate, still inside the 1 h horizon
      input.addData(("u4", ts("2025-01-01 00:30:00"), "alpha body"))
      q.processAllAvailable()
      val afterTwo = spark.table("dedup_out")
      // exactly-one-survivor parity with batch distinct on the same key
      assert(afterTwo.count() == 2)
      assert(afterTwo.select("text").as[String].collect().toSet ==
        Set("alpha body", "beta body"))
      // the survivor is the FIRST arrival (dropDuplicates keeps an arbitrary
      // row; the stream's keep-first is the stronger, asserted contract)
      assert(afterTwo.filter(col("text") === "alpha body")
        .select("url").as[String].head() == "u1")

      // batch 3: advance the watermark far past alpha's state lifetime
      input.addData(("u5", ts("2025-01-01 10:00:00"), "gamma body"))
      q.processAllAvailable()
      // batch 4: the same content re-arrives AFTER its state expired —
      // re-emitted (the bounded-state tradeoff), to be collapsed by the
      // batch dedup layer downstream
      input.addData(("u6", ts("2025-01-01 10:00:00"), "alpha body"))
      q.processAllAvailable()
      val all = spark.table("dedup_out")
      assert(all.count() == 4)
      assert(all.filter(col("text") === "alpha body").count() == 2)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS dedup_out")
    }
  }

  test("event-time column is rejected as a dedup key") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val df = input.toDF().toDF("k", "warc_ts")
    val e = intercept[IllegalArgumentException] {
      DedupStream.dedupWithin(df, Seq("k", "warc_ts"), "warc_ts", "1 hour")
    }
    assert(e.getMessage.contains("cannot be a dedup key"))
  }
}
