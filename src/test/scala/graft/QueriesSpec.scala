package graft

class QueriesSpec extends GraftSuite {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("SURVEY §2 coverage: all 113 inventory queries are declared (50 round-1 + q51-q64 + q65-q74 + q75-q81 + q82-q95 + q96 + q97 + q98-q100 + q101-q106 + q107-q109 + q110-q112 + q113)") {
    assert(SparkEntry.queries.size == 113, s"got ${SparkEntry.queries.size}")
  }

  test("q112 lift invariants: support bound, df window, exact integer lift") {
    val rows = SparkEntry.queries("q112_pmi_cooccur")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "q112 returned no pairs at sf0.001")
    // same reader as the query itself (advisor r13: a hand-built
    // "$sf/documents.parquet" path duplicated the table-layout knowledge)
    val nDocs = graft.sources.Readers.table(spark, sf, "documents").count()
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("term_a"), r.getAs[String]("term_b"))
      val (cab, ca, cb) = (r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"))
      assert(a < b, s"pair not canonically ordered: $a / $b")
      assert(cab >= 2 && cab <= math.min(ca, cb),
        s"support outside [2, min(df)]: c_ab=$cab c_a=$ca c_b=$cb")
      assert(ca >= 3 && ca <= 50 && ca * 2 <= nDocs &&
        cb >= 3 && cb <= 50 && cb * 2 <= nDocs,
        s"df outside the [3, min(50, N/2)] window: c_a=$ca c_b=$cb n=$nDocs")
      assert(r.getAs[Long]("lift") == cab * nDocs * 10000L / (ca * cb),
        "lift is not the exact integer floor formula")
    }
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
