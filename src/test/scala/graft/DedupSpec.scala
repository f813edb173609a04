package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "spark window merge sort hash join filter group order scan " +
      "table row batch stream value key small fast slow data"

  private def docs = Seq(
    (0L, base),
    (1L, base + " extra"), // near-dup of 0 (shares almost all shingles)
    (2L, "completely different words about cats dogs birds fish " +
      "lions tigers bears wolves foxes deer moose elk bison goats"))
    .toDF("doc_id", "text")

  test("ngramJaccardPairs: near-dup pair scores high, disjoint absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.8)
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("minHashLsh surfaces the planted near-dup with high estimate") {
    val cand = Dedup.minHashLsh(docs, 3, 8, 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(cand.contains((0L, 1L)) && cand((0L, 1L)) >= 0.75)
    assert(!cand.contains((0L, 2L)))
  }

  test("minHash signature stable across partitioning") {
    val one = Dedup.minHashSignatures(
      Dedup.shingleSets(docs.repartition(1), 3), 8).orderBy("doc_id")
    val four = Dedup.minHashSignatures(
      Dedup.shingleSets(docs.repartition(4), 3), 8).orderBy("doc_id")
    assert(one.collect().toSeq == four.collect().toSeq)
  }

  test("simHash: identical docs share signature, near-dups are close") {
    val sigs = Dedup.simHash(docs, 32).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) =
      a.zip(b).count { case (x, y) => x != y }
    assert(sigs(0L).length == 32)
    // near-dup distance is noisy on 20-token docs (many bit-sums sit at
    // ±1), so assert the relative ordering, not a tight absolute bound
    assert(hamming(sigs(0L), sigs(1L)) <= 12)
    assert(hamming(sigs(0L), sigs(2L)) > hamming(sigs(0L), sigs(1L)))
  }
}
