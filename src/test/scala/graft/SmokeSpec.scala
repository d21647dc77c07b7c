package graft

import graft.core.Tables

/** t1-style smoke: every driver test table is readable and non-empty at
  * sf0.001, the view registry works, and the flagship entry returns rows. */
class SmokeSpec extends SparkSpec {

  test("all 10 test tables read and are non-empty") {
    val t = Tables(spark, TestSpark.sfDir)
    val counts = Map(
      "region" -> t.region.count(), "nation" -> t.nation.count(),
      "customer" -> t.customer.count(), "supplier" -> t.supplier.count(),
      "part" -> t.part.count(), "orders" -> t.orders.count(),
      "lineitem" -> t.lineitem.count(), "events" -> t.events.count(),
      "documents" -> t.documents.count(), "embeddings" -> t.embeddings.count())
    counts.foreach { case (n, c) => assert(c > 0, s"$n is empty") }
    assert(counts("lineitem") > counts("orders"))
  }

  test("registerAll exposes every table to spark.sql") {
    Tables(spark, TestSpark.sfDir).registerAll()
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql(
      """SELECT count(*) FROM orders o JOIN customer c
        |ON o.o_custkey = c.c_custkey""".stripMargin).head().getLong(0) > 0)
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a distinct name; oracles reference only real queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
