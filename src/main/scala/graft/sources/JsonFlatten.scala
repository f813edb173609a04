package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2/F6 — nested-JSON flattening with parent backlinks (reference:
  * `gie_crawler.py:106-132` descends country→company→location, writing
  * one flat table per level with a `parent` column; nesting is fixed at
  * 3 levels, so the recursion unrolls to three explodes).
  */
object JsonFlatten {

  private def node(children: DataType): StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("code", StringType),
    StructField("value", DoubleType),
    StructField("children", children)))

  /** Schema of the 3-level {name, code, value, children:[…]} document. */
  val threeLevelSchema: ArrayType =
    ArrayType(node(ArrayType(node(ArrayType(node(NullType))))))

  /** Flatten a JSON document column into (level1, level2, level3)
    * frames, each row carrying its parent's name — empty-string values
    * normalized to null (`entsog.py:71-72`). */
  def flattenThreeLevels(spark: SparkSession, json: DataFrame,
      jsonCol: String): (DataFrame, DataFrame, DataFrame) = {
    val parsed = json.withColumn("_root",
      from_json(col(jsonCol), threeLevelSchema))
    def clean(df: DataFrame): DataFrame =
      df.withColumn("name", nullifEmpty(col("name")))
        .withColumn("code", nullifEmpty(col("code")))
    val l1 = clean(parsed
      .select(explode(col("_root")).as("n"))
      .select(col("n.name"), col("n.code"), col("n.value"),
        col("n.children").as("_children"),
        lit(null).cast(StringType).as("parent")))
    val l2 = clean(l1
      .select(col("name").as("parent"), explode(col("_children")).as("n"))
      .select(col("n.name"), col("n.code"), col("n.value"),
        col("n.children").as("_children"), col("parent")))
    val l3 = clean(l2
      .select(col("name").as("parent"), explode(col("_children")).as("n"))
      .select(col("n.name"), col("n.code"), col("n.value"),
        col("parent")))
    (l1.drop("_children"), l2.drop("_children"), l3)
  }

  private def nullifEmpty(c: org.apache.spark.sql.Column) =
    when(length(trim(c)) === 0, lit(null)).otherwise(c)
}
