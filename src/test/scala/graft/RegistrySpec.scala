package graft

/** The round-1 failure mode, pinned forever: every declared operator MUST
  * be reachable through the driver contract, and every oracle key must
  * have a query. Also smoke-executes the flagship.
  */
class RegistrySpec extends SparkSpec {

  test("all twenty catalogs are registered (66 SURVEY keys + 315 extensions)") {
    assert(SparkEntry.queries.size == 400,
      s"expected 400 registered queries, got ${SparkEntry.queries.size}")
  }

  test("no oracle uses a constant generate_series bound (VERDICT r4 #2)") {
    // A constant series cap silently truncates the oracle on data larger
    // than the fixture (the udtf_generator 10000-bound bug). Small
    // structural constants (64-dim loops, 8 LSH bits) are legitimate;
    // anything ≥ 3 digits must derive from the data instead.
    val bad = "generate_series\\(\\s*1\\s*,\\s*\\d{3,}".r
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(bad.findFirstIn(sql).isEmpty,
        s"$name oracle has a constant generate_series bound")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every registered query is oracle-checked (no rows-only entries left)") {
    // r4: multimodal_decode gained a deterministic toy codec + SQL oracle,
    // closing the suite's last no_oracle row
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, noOracle.toString)
  }

  test("flagship entry returns rows on sf0.001 (driver t1)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("column names match between every query and its oracle SQL") {
    // The driver compare sorts columns BY NAME before hashing — a name
    // mismatch fails even with identical values. Cheap static guard:
    // every alias in the oracle must exist in the Spark schema.
    val aliasRe = "(?i)\\bAS\\s+([a-z_][a-z0-9_]*)".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      val sparkCols = SparkEntry.queries(name)(spark, sf).columns.toSet
      val oracleAliases = aliasRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // aliases used in subqueries/CTEs are fine; require spark cols ⊆ oracle text
      val missing = sparkCols.filterNot(c => sql.toLowerCase.contains(c.toLowerCase))
      assert(missing.isEmpty,
        s"$name: spark columns $missing never appear in oracle SQL")
    }
  }
}
