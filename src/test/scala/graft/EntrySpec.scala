package graft

/** The driver's t1 smoke gate: SparkEntry.entry must return rows (>0) on
  * sf0.001. Exercised here so a registry rename or flagship regression is
  * caught before the driver runs it.
  */
class EntrySpec extends SparkSpec {
  test("entry flagship returns rows on sf0.001") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0L, s"driver smoke-checks rows>0, got $n")
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }

  test("query names are unique across packs") {
    val all = rel.RelQueries.queries.keys.toSeq ++ graph.GraphQueries.queries.keys.toSeq ++
      text.LlmQueries.queries.keys.toSeq ++ stream.StreamQueries.queries.keys.toSeq ++
      sources.SourceQueries.queries.keys.toSeq
    assert(all.size === SparkEntry.queries.size,
      "pack union and registry disagree — a pack is missing from SparkEntry or a name collides")
    assert(all.distinct.size === all.size,
      s"duplicate query names: ${all.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
  }

  test("bench headline names all resolve") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline queries missing from registry: $missing")
  }
}
