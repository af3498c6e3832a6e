package graft

import graft.plans.{CosineSimilarity, LshBucketKey, MinHashSignature, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions: expose the native expressions to SQL users
  * (`SELECT graft_cosine(a.embedding, b.embedding) ...`). Registered via
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash(arr, numPerms): numPerms must be an int literal, got $other")
        }
        MinHashSignature(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_key"),
      new ExpressionInfo(classOf[LshBucketKey].getName, "graft_lsh_key"),
      (args: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Long = e match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_lsh_key: $what must be an integer literal, got $other")
        }
        LshBucketKey(args.head, intLit(args(1), "numPlanes").toInt,
          if (args.size > 2) intLit(args(2), "seed") else 42L)
      }))
  }
}
