package graft

class QueriesSpec extends GraftSuite {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("SURVEY §2 coverage: all 111 inventory queries are declared (50 round-1 + q51-q64 + q65-q74 + q75-q81 + q82-q95 + q96 + q97 + q98-q100 + q101-q106 + q107-q109 + q110-q111)") {
    assert(SparkEntry.queries.size == 111, s"got ${SparkEntry.queries.size}")
  }

  test("every query runs at sf0.001 and has a stable schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.count() // execute the plan
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
