package graft.operators

import graft.GraftSuite
import org.apache.spark.sql.execution.LogicalRDD

/** Contract of the Checkpoints block bookkeeping (Dedup.scala): `tracked`
  * must identify exactly the checkpoint RDD of ITS OWN call — from the
  * returned plan, never from a registry diff — because the bench warmup
  * runs 16 queries concurrently on the shared session, and releasing a
  * sibling's truncated-lineage checkpoint blocks kills its job.
  */
class CheckpointsSpec extends GraftSuite {
  import spark.implicits._

  test("tracked returns exactly the checkpoint RDD backing its own plan") {
    val df = (1 to 100).toDF("n")
    val (out, blocks) = Checkpoints.tracked(df)
    // one checkpoint → one tracked RDD, and it is the LogicalRDD the
    // returned Dataset wraps (this pins the plan-extraction against Spark
    // plan-shape drift: if localCheckpoint stops producing a LogicalRDD
    // root, this fails instead of release silently becoming a no-op)
    assert(blocks.size == 1, s"expected 1 tracked RDD, got ${blocks.size}")
    val planRdd = out.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }
    assert(planRdd.map(_.id) == blocks.map(_.id))
    assert(blocks.head.getStorageLevel.isValid, "checkpoint RDD not persisted")
    assert(out.count() == 100)
    Checkpoints.release(blocks)
  }

  test("concurrent tracked calls never claim each other's blocks") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // 8 checkpoints racing on the shared session: each call must come back
    // with exactly its own RDD (the registry-diff implementation this
    // replaced would capture siblings' just-registered RDDs here)
    val runs = Future.traverse((1 to 8).toList) { i =>
      Future {
        val (out, blocks) = Checkpoints.tracked((1 to 50 * i).toDF("n"))
        val n = out.count()
        (i, n, blocks)
      }
    }
    val results = Await.result(runs, 120.seconds)
    for ((i, n, blocks) <- results) {
      assert(n == 50L * i)
      assert(blocks.size == 1, s"run $i tracked ${blocks.size} RDDs")
    }
    val ids = results.flatMap(_._3).map(_.id)
    assert(ids.distinct.size == ids.size, s"overlapping tracked RDDs: $ids")
    // releasing everything must not throw, and every run's data stays
    // readable up to its release point by construction (we already counted)
    results.foreach(r => Checkpoints.release(r._3))
  }
}
