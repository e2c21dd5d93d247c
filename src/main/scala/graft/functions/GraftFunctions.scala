package graft.functions

import graft.functions.VectorExpressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.bridge

/** Runtime SQL registration of the custom expressions on an existing
  * session (no conf needed — the imperative sibling of
  * `graft.GraftExtensions`).
  */
object GraftFunctions {
  private def intArg(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    bridge.registerTemp(spark, "cosine_sim", es => CosineSim(es(0), es(1)))
    bridge.registerTemp(spark, "dot_product", es => DotProduct(es(0), es(1)))
    bridge.registerTemp(spark, "l2_dist", es => L2Dist(es(0), es(1)))
    bridge.registerTemp(spark, "minhash_sig", es => MinHashSig(es(0), intArg(es(1))))
    bridge.registerTemp(spark, "lsh_bands", es => LshBands(es(0), intArg(es(1))))
    bridge.registerTemp(spark, "simhash64", es => SimHash64(es(0)))
    bridge.registerTemp(spark, "simhash_md5", es => SimHashMd5(es(0)))
    bridge.registerTemp(spark, "graft_fingerprint",
      es => Fingerprint(es(0), intArg(es(1)), intArg(es(2))))
    bridge.registerTemp(spark, "hyperplane_bucket",
      es => HyperplaneBucket(es(0), intArg(es(1))))
  }
}
