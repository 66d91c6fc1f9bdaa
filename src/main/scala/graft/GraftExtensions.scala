package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.ext.Dedup
import graft.functions._

/** SparkSessionExtensions entry point: injects the custom expressions
  * into the session's function registry so the engine is fully usable
  * from SQL:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Also reachable via config on an unmodified deployment:
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "cosine_sim",
      es => CosineSimilarity(es.head, es(1)))
    inject(ext, "simhash64",
      es => SimHash64(es.head))
    inject(ext, "minhash_sig",
      es => MinHashSignature(es.head, Dedup.hashParams))
    inject(ext, "minhash_bands",
      es => MinHashBands(es.head, Dedup.hashParams, Dedup.NumBands))
    inject(ext, "text_stats",
      es => TextStats(es.head))
    inject(ext, "hyperplane_lsh64",
      es => HyperplaneLsh64(es.head))
    inject(ext, "byte_stats",
      es => ByteStats(es.head, es(1)))
    // plan rewrites: declarative point-in-interval joins get the
    // bucketed equi-join plan instead of a nested loop (the rule's
    // match is deliberately narrow — see its scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.BucketedRangeJoinRule)
  }

  private def inject(ext: SparkSessionExtensions, name: String,
                     builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder))
}
