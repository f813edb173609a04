package graft

import graft.operators.{RestQuery, RpcRegistry}

class RestQuerySpec extends SparkSpec {
  import spark.implicits._

  private def t = Seq(
    (1L, "wind", Some(10.0)),
    (2L, "wind", Some(30.0)),
    (3L, "solar", Some(20.0)),
    (4L, "gas", None),
    (5L, "biomass", Some(5.0)))
    .toDF("id", "tech", "mw")

  test("filters: eq/neq/gt/gte/lt/lte/like") {
    assert(RestQuery(t, "tech=eq.wind").count() == 2)
    assert(RestQuery(t, "tech=neq.wind").count() == 3)
    assert(RestQuery(t, "mw=gte.20").count() == 2)
    assert(RestQuery(t, "mw=lt.20").count() == 2) // null mw drops out
    assert(RestQuery(t, "tech=like.*io*").count() == 1)
  }

  test("filters: in / is.null / is.true / not negation") {
    assert(RestQuery(t, "tech=in.(wind,solar)").count() == 3)
    assert(RestQuery(t, "mw=is.null").count() == 1)
    assert(RestQuery(t, "tech=not.eq.wind").count() == 3)
    assert(RestQuery(t, "mw=not.is.null").count() == 4)
    val flagged = t.withColumn("big",
      org.apache.spark.sql.functions.col("mw") > 15)
    assert(RestQuery(flagged, "big=is.true").count() == 2)
    assert(RestQuery(flagged, "big=is.false").count() == 2) // null mw excluded
  }

  test("order grammar incl. null ordering; offset + limit page") {
    // postgres default: asc -> nulls last
    val asc = RestQuery(t, "order=mw").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(asc == Seq(5L, 1L, 3L, 2L, 4L))
    val descFirst = RestQuery(t, "order=mw.desc").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(descFirst == Seq(4L, 2L, 3L, 1L, 5L)) // desc -> nulls first
    val descLast = RestQuery(t, "order=mw.desc.nullslast").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(descLast == Seq(2L, 3L, 1L, 5L, 4L))
    val page = RestQuery(t, "order=id&offset=2&limit=2").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(page == Seq(3L, 4L))
  }

  test("aggregate select groups by the plain columns") {
    val agg = RestQuery(t, "select=tech,mw.sum(),id.count()&order=tech")
      .collect()
    assert(agg.map(_.getString(0)).toSeq ==
      Seq("biomass", "gas", "solar", "wind"))
    val wind = agg.find(_.getString(0) == "wind").get
    assert(wind.getDouble(1) == 40.0 && wind.getLong(2) == 2L)
  }

  test("rpc dispatch: args decoded, filters composed, errors usable") {
    RpcRegistry.register("by_tech", (sp, args) => {
      val minMw = args.getOrElse("min_mw", "0").toDouble
      val tag = args.getOrElse("tag", "")
      import sp.implicits._
      t.filter($"mw" >= minMw).withColumn("tag",
        org.apache.spark.sql.functions.lit(tag))
    })
    val out = RpcRegistry.dispatch(spark,
      "/rpc/by_tech?min_mw=10&tag=a%20b&tech=eq.wind&order=id&limit=5")
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(rows.head.getAs[String]("tag") == "a b") // percent-decoded
    // valueless param is an empty-string arg, not a crash
    assert(RpcRegistry.dispatch(spark, "/rpc/by_tech?refresh").count() == 4)
    val err = intercept[IllegalArgumentException] {
      RpcRegistry.dispatch(spark, "/rpc/nope")
    }
    assert(err.getMessage.contains("by_tech")) // lists registered procs
  }

  test("rpc classification keeps pace with RestQuery's grammar") {
    RpcRegistry.register("all_rows", (_, args) => {
      // the proc must NOT receive filter-shaped params as args
      assert(!args.contains("tech") && !args.contains("mw") &&
        !args.contains("offset"), s"misclassified: $args")
      t
    })
    // not./in./is. are REST filters, offset is a REST key — none of
    // them may leak into the argument map, and all must take effect
    assert(RpcRegistry.dispatch(spark,
      "/rpc/all_rows?tech=not.eq.wind").count() == 3)
    assert(RpcRegistry.dispatch(spark,
      "/rpc/all_rows?tech=in.(wind,solar)").count() == 3)
    assert(RpcRegistry.dispatch(spark,
      "/rpc/all_rows?mw=is.null").count() == 1)
    assert(RpcRegistry.dispatch(spark,
      "/rpc/all_rows?order=id&offset=3&limit=5").count() == 2)
    // filter VALUES are percent-decoded like args
    assert(RpcRegistry.dispatch(spark,
      "/rpc/all_rows?tech=in.(wind%2Csolar)").count() == 3)
  }
}
