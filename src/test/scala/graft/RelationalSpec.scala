package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs at sf0.001 and returns rows") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      withClue(name) { assert(df.columns.nonEmpty) }
    }
  }

  test("every relational query has an oracle with matching name") {
    assert(Relational.oracle.keySet == Relational.queries.keySet)
  }

  test("q01 aggregates are sane") {
    val df = Relational.queries("q01_groupby_agg")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSet.contains("sum_qty"))
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("q02 topk is sorted by revenue desc") {
    val revs = Relational.queries("q02_join_topk")(spark, sf)
      .collect().map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
