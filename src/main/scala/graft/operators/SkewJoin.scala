package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * explicit salting is the planned-for answer when a known hot key (a
  * dominant country, a stopword-like shingle, a null-ish default id)
  * would otherwise put one reducer on the critical path at 100 TB.
  *
  * Left rows get a deterministic salt in [0, saltFactor); right rows
  * are replicated saltFactor times. The joined key space becomes
  * (key, salt), spreading each hot key across saltFactor reducers.
  * Deterministic: the salt is a hash of the whole left row, not a
  * random number, so re-runs and retried tasks produce identical
  * partitioning.
  */
object SkewJoin {

  /** Join types for which right-side replication is semantics-preserving:
    * every left row carries exactly one salt, so a (key, salt) match
    * exists iff a key match exists — inner/left-outer/semi/anti are all
    * correct. Right/full-outer are NOT: an unmatched right row would be
    * emitted once per salt copy. */
  private val supportedJoinTypes = Set(
    "inner", "left", "leftouter", "left_outer",
    "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left-outer/semi/anti joins only; " +
        s"'$joinType' would duplicate unmatched right rows (use AQE " +
        s"skew handling for right/full outer)")
    val leftSalted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor))
        .cast("int"))
    val rightSalted = right.withColumn("_salt",
      explode(lit((0 until saltFactor).toArray)))
    leftSalted.join(rightSalted, keys :+ "_salt", joinType)
      .drop("_salt")
  }
}
