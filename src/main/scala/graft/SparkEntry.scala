package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Operator queries + DuckDB oracles live in graft.queries.Queries. */
object SparkEntry {
  /** Flagship: the end-to-end KG construction pipeline (mine → score → tag →
    * link → triples) over a deterministic synthetic web corpus; returns the
    * materialized triple table. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.corpus.Synth.corpus(spark, 500)
    graft.kg.KgPipeline.run(spark, pages).triples
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
