package graft.artifact

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matching.AhoCorasick
import graft.model.Payload

/**
 * The runtime tag model: vocab + token-level Aho-Corasick trie + dense payload
 * array, the broadcastable equivalent of the reference's artifact bundle
 * (phrases.daac + payloads.bin + vocab.json + manifest.json). Pattern order ==
 * payload order, exactly like the reference (phrasekit_build.rs:137-160), so the
 * automaton's dense pattern value indexes `payloads` directly (matcher.rs:92-94).
 */
final case class TagModel(vocab: Vocab, trie: AhoCorasick, payloads: Array[Payload],
    manifest: Manifest) extends Serializable {
  require(payloads.length == manifest.numPatterns,
    s"Payload count mismatch: manifest says ${manifest.numPatterns}, got ${payloads.length}")
}

/**
 * Build stage (SURVEY.md S3 + P6/P7/P8 + A6/A7 + O4 + S9) — Spark re-expression
 * of ext/phrasekit/src/bin/phrasekit_build.rs.
 *
 * Validation/filtering runs distributed (filter chain + window dedup); the
 * surviving phrase set (≤ a few M rows by construction — it passed min_count and
 * salience thresholds) is then collected to the driver to build the automaton,
 * which ships to executors as one broadcast. This mirrors the north rule's
 * "broadcast Aho-Corasick trie" mandate: the model is the small side; docs never
 * shuffle.
 */
object Builder {

  final case class BuildConfig(
      version: String = "graft-v1",
      tokenizer: String = "whitespace",
      separatorId: Long = Vocab.SeparatorId,
      minCount: Option[Long] = None,
      salienceThreshold: Option[Double] = None)

  final case class BuildStats(totalInput: Long, filteredLowCount: Long,
      filteredLowSalience: Long, duplicatePhraseIds: Long, invalidTokens: Long,
      built: Long)

  /**
   * @param phrases DataFrame with columns tokens ARRAY<STRING>, phrase_id,
   *                salience, count (or alias domain_count — phrasekit_build.rs:22)
   */
  def build(phrases: DataFrame, cfg: BuildConfig = BuildConfig()): (TagModel, BuildStats) = {
    val countCol =
      if (phrases.columns.contains("count")) col("count")
      else col("domain_count") // accepted alias (phrasekit_build.rs:22)

    val base = phrases.select(
      transform(col("tokens"), t => lower(t)).as("tokens"),
      col("phrase_id").cast("int").as("phrase_id"),
      col("salience").cast("float").as("salience"),
      countCol.cast("long").as("count"))

    // one aggregate pass computes every stage counter (the reference counts
    // these line by line; a count() per predicate would cost one Spark job
    // each — fused into a single action for driver-latency reasons)
    val validPred = size(col("tokens")) > 0 && !exists(col("tokens"), t => t === lit(""))
    val countPred = cfg.minCount.map(mc => col("count") >= mc).getOrElse(lit(true))
    val salPred = cfg.salienceThreshold
      .map(st => col("salience") >= st.toFloat).getOrElse(lit(true))
    val statsRow = base.agg(
      count(lit(1)).as("total"),
      coalesce(sum(when(!validPred, 1L).otherwise(0L)), lit(0L)).as("invalid"),
      coalesce(sum(when(validPred && !countPred, 1L).otherwise(0L)), lit(0L)).as("lowCount"),
      coalesce(sum(when(validPred && countPred && !salPred, 1L).otherwise(0L)), lit(0L)).as("lowSal")).head()
    val totalInput = statsRow.getLong(0)
    val invalidTokens = statsRow.getLong(1)
    val filteredLowCount = statsRow.getLong(2)
    val filteredLowSalience = statsRow.getLong(3)

    val afterSal = base.filter(validPred && countPred && salPred)

    // P8: duplicate phrase_id → first occurrence wins (phrasekit_build.rs:274-278).
    // "First" is file order in the reference; our inputs carry no line numbers, so
    // the deterministic stand-in is lexicographic-min token sequence per id.
    val deduped = afterSal
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("phrase_id"))
          .orderBy(array_join(col("tokens"), " "))))
      .filter(col("__rk") === 1).drop("__rk")

    val rows = deduped
      .select("tokens", "phrase_id", "salience", "count")
      .orderBy(col("phrase_id")) // deterministic pattern order (payload order)
      .collect()
    val built = rows.length.toLong
    val duplicates = (totalInput - invalidTokens - filteredLowCount - filteredLowSalience) - built

    // A7 + O4: vocab from the distinct lowercased tokens of ACCEPTED phrases
    val uniqueTokens = rows.iterator.flatMap(_.getSeq[String](0)).toSet
    val vocab = Vocab.fromTokens(uniqueTokens)

    val patterns = new Array[Array[Int]](rows.length)
    val payloads = new Array[Payload](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val toks = r.getSeq[String](0)
      patterns(i) = vocab.encodeAll(toks)
      payloads(i) = Payload(r.getInt(1), r.getFloat(2), r.getLong(3).toInt, toks.length.toByte)
      i += 1
    }
    // duplicate token sequences across phrase_ids are a fatal build error, like
    // daachorse's rejection (phrasekit_build.rs:141-143) — AhoCorasick.build throws.
    val trie = AhoCorasick.build(patterns)

    val manifest = Manifest(cfg.version, cfg.tokenizer, rows.length,
      cfg.minCount, cfg.salienceThreshold,
      java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC).toString, cfg.separatorId)

    (TagModel(vocab, trie, payloads, manifest),
      BuildStats(totalInput, filteredLowCount, filteredLowSalience, duplicates,
        invalidTokens, built))
  }

  /** S9: write vocab.json / payloads.bin / manifest.json (byte-exact payload
   * layout for fixture parity; the .daac automaton is replaced by the broadcast trie). */
  def writeArtifacts(model: TagModel, dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    Files.write(d.resolve("payloads.bin"), PayloadIO.write(model.payloads.toIndexedSeq))
    Files.writeString(d.resolve("vocab.json"), Vocab.toJson(model.vocab))
    Files.writeString(d.resolve("manifest.json"), Manifest.toJson(model.manifest))
  }
}
