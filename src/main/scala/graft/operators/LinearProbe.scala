package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distributed training of a linear quality probe — the
  * fastText/logistic-regression-style classifier every large corpus
  * pipeline trains on weak labels and then applies as a filter
  * (GPT-3's WebText-similarity filter, LLaMA's Wikipedia-reference
  * classifier are the published instances of this shape). Full-batch
  * gradient descent: each iteration is ONE map-side-combinable
  * aggregate over the feature frame; the model (a handful of
  * doubles) lives on the driver and re-enters the plan as literals —
  * the classic broadcast-the-model / shuffle-nothing loop. At 100 TB
  * the feature frame is the only wide object; iterations scan it (or
  * its cached projection) and reduce to d+2 scalars, so cost is
  * iterations × one scan, never a shuffle of the corpus.
  *
  * Cross-engine-exact math, so the whole optimization TRACE sits
  * under the DuckDB oracle hash (the q228 BPE-replay discipline):
  *  - the sigmoid is the algebraic surrogate
  *    σ̃(m) = 0.5 + m / (2·(1+|m|)) — add/mul/div/abs only, each
  *    IEEE-correctly-rounded, so Spark and DuckDB produce identical
  *    bits (a transcendental exp() differs in the last ulp across
  *    libm implementations and diverges over iterations);
  *  - per-row gradient contributions (σ̃(m)−y)·x_j are doubles cast
  *    to DECIMAL(38,6) before summing (the q134 rule), making the
  *    reduction exact and order-free. Scale 6 — not 12 — on purpose:
  *    the summed scaled integer stays < 2^53, so BOTH engines'
  *    decimal→double finalization is a single exactly-rounded
  *    division (at scale 12 a corpus-sized sum carries ~17
  *    significant digits and the conversion itself can differ by an
  *    ulp). A double is never exactly on a 10^-6 half-way point
  *    (5·10^-7 is not dyadic), so the cast's tie-rounding mode can
  *    never matter either;
  *  - the weight update w_j ← w_j − lr·(g_j/n) is the same double
  *    expression both engines evaluate on identical operands.
  */
object LinearProbe {

  /** Algebraic sigmoid surrogate, exactly reproducible across
    * engines. Range (0,1), monotone, σ̃(0)=0.5 — the properties the
    * probe needs; the logistic exp() form is NOT bit-stable across
    * libm implementations. */
  def sigmoid(m: Column): Column =
    lit(0.5) + m / (lit(2.0) * (lit(1.0) + abs(m)))

  /** w0 + w1·x1 + … — left-associated exactly like the SQL parse of
    * `w0 + w1*x1 + w2*x2 + …`, so both engines add in one order. */
  def margin(w: Seq[Double], feats: Seq[Column]): Column =
    feats.zipWithIndex.foldLeft(lit(w.head): Column) {
      case (acc, (f, i)) => acc + lit(w(i + 1)) * f
    }

  /** Full-batch GD from w = 0. `feats` must already be projected to
    * deterministic double feature columns plus a 0/1 double label;
    * callers persist it when iterations > 1 (each iteration is one
    * action). Driver traffic is d+2 scalars per iteration — control
    * plane, same class as the BPE merge pulls. Returns the weight
    * vector (bias first). */
  def train(feats: DataFrame, featCols: Seq[String], labelCol: String,
      iterations: Int, lr: Double): Array[Double] = {
    var w = Array.fill(featCols.size + 1)(0.0)
    for (_ <- 1 to iterations) {
      val resid = sigmoid(margin(w.toSeq, featCols.map(col))) -
        col(labelCol)
      val grads = (resid +: featCols.map(c => resid * col(c))).map(g =>
        sum(g.cast(DecimalType(38, 6))).cast(DoubleType))
      val r = feats.agg(grads.head, grads.tail :+ count(lit(1)): _*)
        .head()
      // empty input: decimal sums come back null and n = 0 — the
      // gradient is undefined, so the probe stays at its current
      // weights instead of silently going NaN
      if (r.getLong(w.length) == 0L) return w
      val n = r.getLong(w.length).toDouble
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (r.getDouble(j) / n)
      }
    }
    w
  }

  /** Score with a trained probe: adds `score` = σ̃(margin) — the
    * filter column a curation pipeline thresholds on. Pure
    * map-side expression; the model rides as literals. */
  def score(feats: DataFrame, w: Seq[Double],
      featCols: Seq[String]): DataFrame =
    feats.withColumn("score",
      sigmoid(margin(w, featCols.map(col))))
}
