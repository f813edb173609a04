package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, HammingDistance, NfcNormalize}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions in the SQL function registry so they are usable
  * from `spark.sql` text exactly like built-ins (including inside the
  * dashboard-SQL surface).
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityDesc)
    ext.injectFunction(GraftExtensions.hammingDistanceDesc)
    ext.injectFunction(GraftExtensions.nfcNormalizeDesc)
    ext.injectOptimizerRule(_ => graft.plans.PushTimestampConversionBounds)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthBound)
  }
}

object GraftExtensions {

  private[graft] val cosineSimilarityDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "cosine_similarity(arrayA, arrayB) takes 2 arguments")
        CosineSimilarity(children.head, children(1))
      })

  private[graft] val hammingDistanceDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName,
        "hamming_distance"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "hamming_distance(strA, strB) takes 2 arguments")
        HammingDistance(children.head, children(1))
      })

  private[graft] val nfcNormalizeDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName,
        "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "nfc_normalize(str) takes 1 argument")
        NfcNormalize(children.head)
      })

  /** Register on an already-built session (tests, REPL): SQL functions
    * plus the timestamp-conversion pushdown rule (idempotent). The rule
    * goes through `experimental.extraOptimizations`, which run after
    * the main optimizer — by then predicate pushdown has inlined
    * Project aliases, so the conversion pattern sits in Filters
    * directly above relations and the conjuncts this rule adds are
    * collected into the scan during physical planning. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(cosineSimilarityDesc, hammingDistanceDesc, nfcNormalizeDesc)
      .foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(id, info, builder)
    }
    Seq(graft.plans.PushTimestampConversionBounds,
        graft.plans.LevenshteinLengthBound).foreach { rule =>
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
    }
  }
}
