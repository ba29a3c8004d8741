package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, size}

/**
 * One-pass 16-bit SimHash document fingerprints (near-dup detection; Charikar
 * 2002 similarity-estimation scheme, md5-nibble feature hashes).
 *
 * Semantics (shared with the dd_simhash DuckDB oracle): for token t and bit
 * i ∈ [0,16), the i-th hex digit of md5(t) votes +1 if ≥ 8 else −1; bit i of
 * the fingerprint is 1 iff the summed vote is > 0; simhash = Σ bit_i · 2^i.
 *
 * The round-2 formulation exploded each token 16× (one row per bit) through
 * TWO shuffles — a constant-factor-16 shuffle tax. This is the same
 * computation as a narrow per-row map: the 16 counters live in one stack
 * array per document, md5 runs once per token, and the only exchange left in
 * a dd_simhash-style query is its final presentation sort. mapPartitions is
 * the justified imperative escape here (per-token MessageDigest + bit
 * twiddling has no codegen-friendly Column form that avoids the explode).
 */
object SimHash {

  /** @param docs (idCol BIGINT, tokensCol ARRAY<STRING>)
   *  @return (idCol, simhash BIGINT) — zero shuffles, one corpus pass.
   *  Documents with a null or EMPTY token array produce no row, matching the
   *  explode-based formulation and the DuckDB oracle (unnest of an empty
   *  list yields nothing, so such doc_ids vanish from the grouped result). */
  def simhash16(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(tokensCol))
      .where(size(col(tokensCol)) > 0)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, toks) =>
          val cnt = new Array[Int](16)
          toks.foreach { tok =>
            val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            // hex digit 2k is byte k's high nibble, 2k+1 its low nibble;
            // "digit >= 8" ⇔ the nibble's top bit is set
            var k = 0
            while (k < 8) {
              val b = d(k)
              cnt(2 * k) += (if ((b & 0x80) != 0) 1 else -1)
              cnt(2 * k + 1) += (if ((b & 0x08) != 0) 1 else -1)
              k += 1
            }
          }
          var h = 0L
          var i = 0
          while (i < 16) { if (cnt(i) > 0) h |= (1L << i); i += 1 }
          (id, h)
        }
      }
      .toDF(idCol, "simhash")
  }
}
