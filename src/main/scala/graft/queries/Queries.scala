package graft.queries

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.corpus.Extract
import graft.mine.Miner
import graft.score.Scorer
import graft.ops.Ids

/**
 * Driver-contract queries (SURVEY.md §2 operator coverage) with DuckDB oracle
 * SQL. Every SQL-expressible operator gets BOTH a Spark query and an equivalent
 * ANSI-ish SQL the driver runs in DuckDB over the same parquet tables; outputs
 * are deterministic (total ORDER BY) and type-aligned (BIGINT counts, DOUBLE
 * floats, round(…, k) wherever both engines do float arithmetic).
 *
 * Shared pipeline parameters for the phrase queries:
 *   domain     = documents where lang='en', n-grams n∈[2,3], min_count 5
 *   background = documents where lang<>'en', n-grams n∈[2,3], min_count 2
 *   scoring    = min_domain_count 8, double semantics (floatSemantics=false)
 */
object Queries {

  // ---------- shared Spark-side builders (cached per sfDir) ----------

  private val cache = TrieMap.empty[String, DataFrame]
  private def cached(key: String)(f: => DataFrame): DataFrame =
    cache.getOrElseUpdate(key, f.persist())

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** (doc_id, t ARRAY<STRING>) lowercase whitespace tokens, empties dropped. */
  def toks(s: SparkSession, dir: String, langPred: Option[Boolean] = None): DataFrame = {
    val d = table(s, dir, "documents")
    val f = langPred match {
      case Some(true)  => d.filter(col("lang") === "en")
      case Some(false) => d.filter(col("lang") =!= "en")
      case None        => d
    }
    f.select(col("doc_id"), Extract.tokenize(col("text")).as("t"))
  }

  def domain(s: SparkSession, dir: String): DataFrame = cached(s"dom|$dir") {
    Miner.mine(toks(s, dir, Some(true)), "t", Miner.MineConfig(2, 3, 5, ordered = false))
      .select("ngram", "count")
  }

  def background(s: SparkSession, dir: String): DataFrame = cached(s"bg|$dir") {
    Miner.mine(toks(s, dir, Some(false)), "t", Miner.MineConfig(2, 3, 2, ordered = false))
      .select("ngram", "count")
  }

  def scored(s: SparkSession, dir: String, method: String, minSal: Float,
      assignIds: Boolean = false): DataFrame =
    cached(s"scored|$method|$minSal|$assignIds|$dir") {
      Scorer.score(domain(s, dir), background(s, dir),
        Scorer.ScoreConfig(method, minSal, 8, assignPhraseIds = assignIds,
          startingPhraseId = 1000, floatSemantics = false))
    }

  // ---------- shared SQL fragments ----------

  /** CTEs: {p}_toks, {p}_pos, {p}_grams (doc_id, pos 1-based, n, g), {p}
   * (ngram, count). Positions via a bounded cross join (docs here are ≤4096
   * tokens) — DuckDB 1.0's LATERAL + VALUES-alias reference hits an internal
   * binder bug, so no lateral. */
  private def minedSql(p: String, where: String, ns: Seq[Int], minCount: Int): String = {
    val vals = ns.map(n => s"($n)").mkString(",")
    s"""${p}_toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t FROM documents $where),
${p}_pos AS (SELECT unnest(range(1, 4096)) AS i),
${p}_grams AS (SELECT doc_id, i AS pos, ns.n AS n, array_to_string(t[i:i+ns.n-1], ' ') AS g
  FROM ${p}_toks, (VALUES $vals) ns(n), ${p}_pos
  WHERE i + ns.n - 1 <= len(t)),
$p AS (SELECT g AS ngram, CAST(count(*) AS BIGINT) AS count FROM ${p}_grams GROUP BY g HAVING count(*) >= $minCount)"""
  }

  private val domainSql = minedSql("dom", "WHERE lang = 'en'", Seq(2, 3), 5)
  private val bgSql = minedSql("bg", "WHERE lang <> 'en'", Seq(2, 3), 2)

  /** CTE `scored`: ngram, domain_count, background_count, salience(method). */
  private def scoredSql(method: String, minSal: String): String = {
    val sal = method match {
      case "ratio" => "CAST(d.count AS DOUBLE) / CAST(coalesce(b.count, 0) + 1 AS DOUBLE)"
      case "pmi" =>
        """CASE WHEN coalesce(b.count, 0) = 0 THEN 10.0
           ELSE log2((CAST(d.count AS DOUBLE) / dt.total) / (CAST(b.count AS DOUBLE) / bt.total)) END"""
      case "tfidf" =>
        "(CAST(d.count AS DOUBLE) / dt.total) * ln((dt.total + 1.0) / (CAST(coalesce(b.count, 0) AS DOUBLE) + 1.0))"
    }
    val totals =
      if (method == "ratio") ""
      else """, dtot AS (SELECT CAST(sum(count) AS DOUBLE) AS total FROM dom),
        btot AS (SELECT CAST(sum(count) AS DOUBLE) AS total FROM bg)"""
    val totalJoin = if (method == "ratio") "" else ", dtot dt, btot bt"
    s"""$domainSql, $bgSql $totals,
scored0 AS (SELECT d.ngram, d.count AS domain_count, CAST(coalesce(b.count, 0) AS BIGINT) AS background_count, $sal AS salience
  FROM dom d LEFT JOIN bg b USING (ngram) $totalJoin
  WHERE d.count >= 8),
scored AS (SELECT * FROM scored0 WHERE salience >= $minSal)"""
  }

  // ---------- the queries ----------

  type Q = (SparkSession, String) => DataFrame

  val all: Seq[(String, Q, Option[String])] = Seq(

    // S1/P1/P2: corpus scan + lowercase whitespace tokenize
    ("s1_tokenize",
      (s: SparkSession, dir: String) =>
        toks(s, dir).select(col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            element_at(col("t"), 1).as("first_token"))
          .orderBy("doc_id"),
      Some("""WITH x_toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t FROM documents)
SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t[1] AS first_token FROM x_toks ORDER BY doc_id""")),

    // G1 + A1 + P3 + O1: n-gram mining with min_count + total-order sort
    ("g1_mine_ngrams",
      (s: SparkSession, dir: String) =>
        domain(s, dir).orderBy(col("count").desc, col("ngram").asc),
      Some(s"""WITH $domainSql
SELECT ngram, count FROM dom ORDER BY count DESC, ngram""")),

    // P4 + J1 + F1 + P5 + O2: ratio scoring end-to-end
    ("j1_score_ratio",
      (s: SparkSession, dir: String) =>
        scored(s, dir, "ratio", 1.5f)
          .select(col("ngram"), round(col("salience"), 6).as("salience"),
            col("domain_count"), col("background_count"))
          .orderBy(col("salience").desc, col("ngram")),
      Some(s"""WITH ${scoredSql("ratio", "1.5")}
SELECT ngram, round(salience, 6) AS salience, domain_count, background_count
FROM scored ORDER BY round(salience, 6) DESC, ngram""")),

    // F2: PMI salience with the bg=0 → 10.0 clamp
    ("f2_score_pmi",
      (s: SparkSession, dir: String) =>
        scored(s, dir, "pmi", 1.0f)
          .select(col("ngram"), round(col("salience"), 6).as("salience"),
            col("domain_count"), col("background_count"))
          .orderBy(col("salience").desc, col("ngram")),
      Some(s"""WITH ${scoredSql("pmi", "1.0")}
SELECT ngram, round(salience, 6) AS salience, domain_count, background_count
FROM scored ORDER BY round(salience, 6) DESC, ngram""")),

    // F3: TF-IDF salience (total = n-gram occurrences, as the reference computes)
    ("f3_score_tfidf",
      (s: SparkSession, dir: String) =>
        scored(s, dir, "tfidf", 0.00048828125f)
          .select(col("ngram"), round(col("salience"), 9).as("salience"),
            col("domain_count"), col("background_count"))
          .orderBy(col("salience").desc, col("ngram")),
      Some(s"""WITH ${scoredSql("tfidf", "0.00048828125")}
SELECT ngram, round(salience, 9) AS salience, domain_count, background_count
FROM scored ORDER BY round(salience, 9) DESC, ngram""")),

    // O3: deterministic sequential phrase-id assignment (distributed two-phase)
    ("o3_phrase_ids",
      (s: SparkSession, dir: String) =>
        scored(s, dir, "ratio", 1.5f, assignIds = true)
          .select(col("phrase_id").cast("long").as("phrase_id"), col("ngram"))
          .orderBy("phrase_id"),
      Some(s"""WITH ${scoredSql("ratio", "1.5")}
SELECT CAST(999 + row_number() OVER (ORDER BY salience DESC, ngram) AS BIGINT) AS phrase_id, ngram
FROM scored ORDER BY phrase_id""")),

    // O4 + A7: vocabulary — unique tokens of accepted phrases, alphabetical ids
    ("o4_vocab",
      (s: SparkSession, dir: String) => {
        val uniq = scored(s, dir, "ratio", 1.5f)
          .select(explode(split(col("ngram"), " ")).as("token")).distinct()
        Ids.assignSequential(uniq, Seq(col("token").asc), 1, "id")
          .select(col("token"), col("id")).orderBy("id")
      },
      Some(s"""WITH ${scoredSql("ratio", "1.5")},
uniq AS (SELECT DISTINCT unnest(string_split(ngram, ' ')) AS token FROM scored)
SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS id FROM uniq ORDER BY id""")),

    // Exact dedup: hash-groupBy on content (training-data op)
    ("dd_exact",
      (s: SparkSession, dir: String) =>
        table(s, dir, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("dupes"), min(col("doc_id")).as("keeper"))
          .orderBy("h"),
      Some("""SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS dupes, min(doc_id) AS keeper
FROM documents GROUP BY 1 ORDER BY h""")),

    // Text analysis: token counting (whitespace + regex word runs)
    ("ta_token_count",
      (s: SparkSession, dir: String) =>
        table(s, dir, "documents").select(
            col("doc_id"),
            size(Extract.tokenize(col("text"))).cast("long").as("ws_tokens"),
            size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+"), lit(0)))
              .cast("long").as("word_tokens"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS BIGINT) AS word_tokens,
  CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id""")),

    // Text analysis: quality scoring (length/stopword/uniqueness ratios)
    ("ta_quality",
      (s: SparkSession, dir: String) => {
        val stop = Array("the", "a", "of", "in", "for", "to", "and", "is", "was", "on")
        val t = toks(s, dir)
        t.select(col("doc_id"),
            size(col("t")).cast("long").as("n_tokens"),
            (size(filter(col("t"), x => x.isin(stop.toIndexedSeq: _*))).cast("double") /
              size(col("t")).cast("double")).as("stop_ratio"),
            (size(array_distinct(col("t"))).cast("double") /
              size(col("t")).cast("double")).as("uniq_ratio"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("stop_ratio"), 6).as("stop_ratio"),
            round(col("uniq_ratio"), 6).as("uniq_ratio"),
            round(least(lit(1.0), col("n_tokens") / 100.0) * 0.4 +
              (lit(1.0) - col("stop_ratio")) * 0.3 + col("uniq_ratio") * 0.3, 6).as("quality"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t FROM documents),
m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(t, x -> x IN ('the','a','of','in','for','to','and','is','was','on'))) AS DOUBLE) / len(t) AS stop_ratio,
  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS uniq_ratio FROM t)
SELECT doc_id, n_tokens, round(stop_ratio, 6) AS stop_ratio, round(uniq_ratio, 6) AS uniq_ratio,
  round(least(1.0, n_tokens / 100.0) * 0.4 + (1.0 - stop_ratio) * 0.3 + uniq_ratio * 0.3, 6) AS quality
FROM m ORDER BY doc_id""")),

    // Multimodal plumbing: opaque binary column + typed metadata (decode stubbed)
    ("mm_binary_meta",
      (s: SparkSession, dir: String) =>
        table(s, dir, "documents").select(
            col("doc_id"),
            length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
            lower(substring(hex(encode(col("text"), "UTF-8")), 1, 8)).as("header"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  lower(substr(hex(encode(text)), 1, 8)) AS header
FROM documents ORDER BY doc_id""")),

    // Classic: TPC-H Q1-style aggregate (pushdown + partial agg)
    ("q1_agg_lineitem",
      (s: SparkSession, dir: String) =>
        table(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1998-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Classic: broadcast join + top-N
    ("q2_join_topn",
      (s: SparkSession, dir: String) => {
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        o.groupBy(col("o_custkey")).agg(round(sum(col("o_totalprice")), 2).as("total"),
            count(lit(1)).as("n_orders"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("total"), col("n_orders"))
          .orderBy(col("total").desc, col("c_custkey"))
          .limit(10)
      },
      Some("""SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS total, CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2 ORDER BY total DESC, c_custkey LIMIT 10""")),

    // Classic: window function (per-key top-k)
    ("q3_window_orders",
      (s: SparkSession, dir: String) =>
        table(s, dir, "orders")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
          .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Classic: event-time tumbling window aggregation (batch view of the
    // streaming shape; Structured Streaming variant covered in tests)
    ("q4_events_hourly",
      (s: SparkSession, dir: String) =>
        table(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
          .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Set ops: distinct
    ("q5_distinct_docs",
      (s: SparkSession, dir: String) =>
        table(s, dir, "documents").select("lang", "source").distinct()
          .orderBy("lang", "source"),
      Some("SELECT DISTINCT lang, source FROM documents ORDER BY lang, source")),

    // O5/O6-style: global top-k with total order
    ("q6_topk_lineitem",
      (s: SparkSession, dir: String) =>
        table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(20),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"""))
  )

  def queries: Map[String, Q] = all.map(q => q._1 -> q._2).toMap
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
