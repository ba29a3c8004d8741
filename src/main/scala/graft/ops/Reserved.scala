package graft.ops

/**
 * The `__`-prefixed namespace is reserved for the operators' internal
 * working columns (`__side`/`__payload`/`__tie`/`__match` in AsofJoin,
 * `__bucket` in RangeJoin, `__n`/`__rn` in Curation/Graph): a user column
 * with the same name would be silently overwritten by `withColumn`. Inputs
 * are rejected LOUDLY instead — the same convention as the operators'
 * explicit collision guards (round-4 advice).
 */
private[graft] object Reserved {
  def check(op: String, columns: Seq[String]): Unit = {
    val bad = columns.filter(_.startsWith("__")).distinct
    require(bad.isEmpty,
      s"$op: column(s) ${bad.mkString(", ")} use the reserved '__' prefix " +
        "(internal working-column namespace) — rename before calling")
  }
}
