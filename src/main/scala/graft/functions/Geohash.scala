package graft.functions

/** Geohash encoding over integer lattice coordinates — the standard
  * base-32 interleaved-bisection cell id (public geohash.org scheme:
  * bits alternate longitude-first, 5 bits per character).
  *
  * Like [[ZOrder]], ONE term renderer serves both engines: the k-th
  * longitude bit of a point at integer lattice position x ∈ [0, xr)
  * is floor(x·2^(k+1) / xr) mod 2 — pure integer arithmetic, so the
  * Spark expression and the DuckDB oracle SQL are the same text
  * modulo the integer-division spelling (`DIV` vs `//`), and the
  * encoding is bit-exact across engines. */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 5-bit value of output character `j` as an arithmetic expression
    * over columns `x`/`y` with lattice ranges `xr`/`yr`; `d` is the
    * integer-division spelling. */
  def charVal(x: String, y: String, xr: Long, yr: Long, j: Int,
      d: String): String =
    (0 until 5).map { t =>
      val g = 5 * j + t
      val (c, r, k) =
        if (g % 2 == 0) (x, xr, g / 2) else (y, yr, (g - 1) / 2)
      s"((($c * ${1L << (k + 1)}) $d $r) % 2) * ${1 << (4 - t)}"
    }.mkString(" + ")

  /** Full `nChars`-character geohash as a SQL string expression. */
  def sqlExpr(x: String, y: String, xr: Long, yr: Long, nChars: Int,
      d: String): String =
    (0 until nChars).map { j =>
      s"substr('$Alphabet', (${charVal(x, y, xr, yr, j, d)}) + 1, 1)"
    }.mkString(" || ")
}
