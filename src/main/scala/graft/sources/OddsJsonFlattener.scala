package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P1/P2/O1: the odds-API ingest pipeline (SURVEY §3.2).
  *
  * The reference flattens a 4-level nested JSON payload (games →
  * bookmakers → markets → outcomes) with nested Python loops
  * (get_odds.py:42-60). Spark-first: a fixed ingest StructType (fail
  * fast on drift — the odds schema is the reference's one *fixed*
  * schema, test_odds_collector.py:170-172), `from_json`, and three
  * `explode`s (Catalyst `Generate` — narrow, no shuffle), then the
  * reference's 5-key mixed-direction sort.
  */
object OddsJsonFlattener {

  /** Ingest schema for one API response (array of games). */
  private val outcomeType = StructType(Seq(
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("point", DoubleType)))
  private val marketType = StructType(Seq(
    StructField("key", StringType),
    StructField("outcomes", ArrayType(outcomeType))))
  private val bookmakerType = StructType(Seq(
    StructField("key", StringType),
    StructField("markets", ArrayType(marketType))))
  val payloadSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("id", StringType),
    StructField("commence_time", StringType),
    StructField("home_team", StringType),
    StructField("away_team", StringType),
    StructField("bookmakers", ArrayType(bookmakerType)))))

  /** Flatten raw JSON payloads (one per row in `jsonCol`) to the fixed
    * 9-column odds row set. Missing `point` → 0.0 (get_odds.py:61);
    * final ordering reproduces get_odds.py:62-66 with nulls-last on the
    * ascending string keys for pandas parity (SURVEY §2.6 O1). */
  def flatten(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw
      .select(explode(from_json(col(jsonCol), payloadSchema)).as("g"))
      .select(col("g.id").as("game_id"), col("g.commence_time").as("game_time"),
              col("g.home_team").as("home_team"), col("g.away_team").as("away_team"),
              explode(col("g.bookmakers")).as("bk"))
      .select(col("game_id"), col("game_time"), col("home_team"), col("away_team"),
              col("bk.key").as("book"), explode(col("bk.markets")).as("mkt"))
      .select(col("game_id"), col("game_time"), col("home_team"), col("away_team"),
              col("book"), col("mkt.key").as("market"), explode(col("mkt.outcomes")).as("o"))
      .select(col("game_id"), col("game_time"), col("home_team"), col("away_team"),
              col("book"), col("market"), col("o.name").as("outcome"),
              col("o.price").as("price"),
              coalesce(col("o.point"), lit(0.0)).as("point"))
      .orderBy(col("game_time").asc_nulls_last, col("game_id").asc_nulls_last,
               col("outcome").asc_nulls_last, col("point").desc, col("price").desc)

  /** The fixed odds row — the reference's one stable schema, exposed
    * typed for compile-time field checks (SURVEY §1.1). */
  case class OddsRow(game_id: String, game_time: String, home_team: String,
                     away_team: String, book: String, market: String,
                     outcome: String, price: Double, point: Double)

  /** Typed variant of flatten. */
  def flattenTyped(raw: DataFrame, jsonCol: String = "json"): org.apache.spark.sql.Dataset[OddsRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    flatten(raw, jsonCol).as[OddsRow]
  }

  /** P5: stamp the collection timestamp (odds_data_collector.py:25). */
  def withCollectionTimestamp(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("timestamp", ts)

  /** A4: data-quality check — distinct markets present vs expected
    * (get_odds.py:69-77). Returns missing market keys. */
  def missingMarkets(flat: DataFrame,
                     expected: Set[String] = Set("h2h", "spreads", "totals")): Set[String] = {
    val present = flat.select("market").distinct().collect().map(_.getString(0)).toSet
    expected -- present
  }
}
