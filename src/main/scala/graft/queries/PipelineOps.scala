package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.operators.SpatialJoin

/** Composite reference-pipeline parity: the ECMWF/DWD weather chain
  * (SURVEY.md B10 fixture shape) end-to-end in ONE oracle-checked
  * query — raster grid → de-accumulate 24h-summed radiation (W1 diff +
  * clip + zero-at-midnight, `ecmwf.py:159-166`) → wind speed
  * `sqrt(u²+v²)` (`ecmwf.py:153-155`) → point-in-polygon NUTS tagging
  * (J4, `ecmwf.py:193-206`) → per-(time, zone) means (A1).
  *
  * The raster is generated deterministically from integer sequences
  * (the GRIB decode itself is a source-adapter concern, SURVEY.md S6),
  * so the oracle reproduces every value with exact integer/decimal
  * arithmetic — the whole transform chain is hash-checked.
  */
object PipelineOps {

  private val zones = Seq(
    ("west", "POLYGON ((4.9951 44.9951, 10.0051 44.9951, 10.0051 55.0051, 4.9951 55.0051, 4.9951 44.9951))"),
    ("east", "POLYGON ((10.0051 44.9951, 15.0051 44.9951, 15.0051 55.0051, 10.0051 55.0051, 10.0051 44.9951))"))

  private val windDec = DecimalType(18, 9)
  private val ghiDec = DecimalType(28, 2)

  val qs: Seq[Q] = Seq(
    Q("q49_weather_pipeline",
      (s, dir) => {
        // deterministic 11×11×48h raster
        val lats = s.range(1).select(
          explode(sequence(lit(45), lit(55))).as("lat"))
        val lons = s.range(1).select(
          explode(sequence(lit(5), lit(15))).as("lon"))
        val hours = s.range(1).select(
          explode(sequence(lit(0), lit(47))).as("h"))
        val grid = lats.crossJoin(lons).crossJoin(hours)
          .withColumn("ts",
            timestamp_seconds(lit(1704067200L) + col("h") * 3600L))
          .withColumn("dh", col("h") % 24)
          .withColumn("fl", col("lat") + col("lon"))
          .withColumn("ghi_acc",
            col("dh") * (col("dh") + 1) / 2 * col("fl"))
          .withColumn("u",
            (col("lat") * 3 + col("lon") * 7 + col("h")) % 10 - 5)
          .withColumn("v",
            (col("lat") * 5 + col("lon") * 11 + col("h")) % 7 - 3)

        // W1: de-accumulate, clip negatives, zero the midnight step
        val w = Window.partitionBy("lat", "lon").orderBy("ts")
        val derived = grid
          .withColumn("ghi_raw",
            col("ghi_acc") - lag(col("ghi_acc"), 1).over(w))
          .withColumn("ghi",
            when(col("dh") === 0, lit(0.0))
              .otherwise(greatest(lit(0.0),
                coalesce(col("ghi_raw"), lit(0.0))))
              .cast(DoubleType))
          .withColumn("wind_speed",
            sqrt((col("u") * col("u") + col("v") * col("v"))
              .cast(DoubleType)))
          .withColumn("lon_d", col("lon").cast(DoubleType))
          .withColumn("lat_d", col("lat").cast(DoubleType))

        // J4 + A1: zone tagging + zonal hourly means (exact partials)
        val polys = s.createDataFrame(zones).toDF("zone", "geometry")
        SpatialJoin.pointInPolygon(derived,
            "lon_d", "lat_d",
            polys, "geometry")
          .groupBy("ts", "zone")
          .agg(
            count(lit(1)).as("n"),
            (sum(col("ghi").cast(ghiDec)).cast(DoubleType) /
              count(col("ghi")).cast(DoubleType)).as("avg_ghi"),
            (sum(col("wind_speed").cast(windDec)).cast(DoubleType) /
              count(col("wind_speed")).cast(DoubleType)).as("avg_wind"))
          .orderBy("ts", "zone")
      },
      Some("""WITH g AS (
          SELECT lat, lon, h,
            TIMESTAMP '2024-01-01 00:00:00' + h * INTERVAL 1 HOUR AS ts,
            h % 24 AS dh, lat + lon AS fl
          FROM (SELECT unnest(range(45, 56)) AS lat),
               (SELECT unnest(range(5, 16)) AS lon),
               (SELECT unnest(range(0, 48)) AS h)),
        m AS (SELECT *, dh * (dh + 1) / 2 * fl AS ghi_acc,
            (lat * 3 + lon * 7 + h) % 10 - 5 AS u,
            (lat * 5 + lon * 11 + h) % 7 - 3 AS v
          FROM g),
        d AS (SELECT lat, lon, ts, dh,
            CASE WHEN dh = 0 THEN 0.0
              ELSE greatest(0.0, coalesce(
                ghi_acc - lag(ghi_acc, 1) OVER (
                  PARTITION BY lat, lon ORDER BY ts), 0.0)) END AS ghi,
            sqrt(CAST(u * u + v * v AS DOUBLE)) AS wind_speed
          FROM m),
        z AS (SELECT *, CASE
            WHEN lon > 4.9951 AND lon < 10.0051
              AND lat > 44.9951 AND lat < 55.0051 THEN 'west'
            WHEN lon > 10.0051 AND lon < 15.0051
              AND lat > 44.9951 AND lat < 55.0051 THEN 'east'
            END AS zone
          FROM d)
        SELECT ts, zone, count(*) AS n,
          CAST(sum(CAST(ghi AS DECIMAL(28,2))) AS DOUBLE)
            / CAST(count(ghi) AS DOUBLE) AS avg_ghi,
          CAST(sum(CAST(wind_speed AS DECIMAL(18,9))) AS DOUBLE)
            / CAST(count(wind_speed) AS DOUBLE) AS avg_wind
        FROM z GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
