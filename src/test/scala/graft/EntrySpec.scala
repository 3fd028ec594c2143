package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, and
  * every query must have a matching oracle with aligned column names.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and runs at sf0.001") {
    val qs = SparkEntry.queries
    val sqls = SparkEntry.oracleSql
    assert(qs.keySet == sqls.keySet,
      s"missing oracles: ${qs.keySet.diff(sqls.keySet)}; orphan oracles: ${sqls.keySet.diff(qs.keySet)}")
    qs.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, s"$name returned no columns")
    }
  }
}
