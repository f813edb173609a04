package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PostgREST stored-procedure surface (reference Q9 second half:
  * `postgrest_stored_procedure.sql:5-33` exposes named procedures at
  * `GET /rpc/<name>`; `NOTIFY pgrst, 'reload schema'` republishes).
  *
  * A procedure is a named, parameterized DataFrame factory. Dispatch
  * takes the verbatim PostgREST URL: plain `key=value` params are
  * function ARGUMENTS; `key=op.value` params (and select/order/limit)
  * are PostgREST FILTERS applied to the procedure's result set through
  * the same [[RestQuery]] algebra as table endpoints — PostgREST's
  * actual composition rule for function calls.
  */
object RpcRegistry {

  type Proc = (SparkSession, Map[String, String]) => DataFrame

  private val procs =
    scala.collection.concurrent.TrieMap.empty[String, Proc]

  def register(name: String, proc: Proc): Unit = procs.put(name, proc)

  def procedures: Set[String] = procs.keySet.toSet

  // RestQuery owns the grammar; referencing its sets means a new
  // operator there extends dispatch classification automatically.
  // Residual PostgREST ambiguity (shared with PostgREST itself): a
  // function ARGUMENT whose value happens to start with an operator
  // prefix ("status=in.progress") is classified as a filter; real
  // PostgREST resolves this from the function signature, which a
  // generic registry doesn't have.
  private def FilterOps = RestQuery.FilterOps
  private def RestKeys = RestQuery.ReservedKeys

  /** Execute `/rpc/<name>?arg=v&col=op.v&select=...`. */
  def dispatch(spark: SparkSession, url: String): DataFrame = {
    require(url.startsWith("/rpc/"), s"not an RPC url: $url")
    val qIdx = url.indexOf('?')
    val name =
      if (qIdx < 0) url.substring(5) else url.substring(5, qIdx)
    val proc = procs.getOrElse(name, throw new IllegalArgumentException(
      s"unknown RPC procedure '$name' (registered: " +
        s"${procs.keySet.toSeq.sorted.mkString(", ")})"))
    val params =
      if (qIdx < 0) Array.empty[String]
      else url.substring(qIdx + 1).split("&").filter(_.nonEmpty)
    def split(kv: String): (String, String) = {
      val i = kv.indexOf('=')
      if (i < 0) (kv, "") else (kv.substring(0, i), kv.substring(i + 1))
    }
    val (rest, args) = params.partition { kv =>
      val (k, v) = split(kv)
      val dot = v.indexOf('.')
      RestKeys.contains(k) ||
        (dot > 0 && FilterOps.contains(v.substring(0, dot)))
    }
    // everything is percent-decoded — args and filters alike (a
    // PostgREST client encodes both). Filters go to RestQuery as
    // structured pairs, so decoded values containing '&'/'=' survive.
    def decode(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")
    val argMap = args.map { kv =>
      val (k, v) = split(kv)
      decode(k) -> decode(v)
    }.toMap
    val base = proc(spark, argMap)
    if (rest.isEmpty) base
    else RestQuery(base, rest.toSeq.map { kv =>
      val (k, v) = split(kv)
      decode(k) -> decode(v)
    })
  }
}
