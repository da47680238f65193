package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Workout-corpus data model and CSV ingest, re-deriving the reference DDL +
  * COPY semantics (`/root/reference/01_method1_cortex_search.sql:72-94`,
  * `:111-142`) as a Spark CSV read plus a typed projection:
  *
  *  - quoted multiline fields (`FIELD_OPTIONALLY_ENCLOSED_BY='"'`)
  *    => `multiLine=true, quote=escape='"'`
  *  - `SKIP_HEADER=1` => `header=true`
  *  - `ON_ERROR='CONTINUE'` => PERMISSIVE mode + corrupt-record audit column
  *  - `NULLIF($n,'')::INTEGER` (`01:120-121`) => empty-string -> null -> int
  *  - `$11::TIMESTAMP_NTZ` => timestamp parse with UTC session semantics
  */
/** Typed view of the fixed core columns (SURVEY §1.3: DataFrame-first API,
  * `Dataset[Workout]` where compile-time safety helps).
  */
case class Workout(
    ID: String,
    EMBED_STR: String,
    SPORT_TYPE: String,
    DIFFICULTY: String,
    MOVING_TIME_SECONDS: Option[Int],
    DISTANCE_METERS: Option[Int],
    GENERATION_MODEL: String,
    WORKOUT_SOURCE: String,
    STORE_VERSION: String,
    RAW_JSON_STR: String,
    CREATED_AT: Option[java.sql.Timestamp])

object WorkoutCorpus {

  /** Core scalar schema (`01:72-94`). Everything lands as string first (the
    * COPY reads `$1..$11` text) and is cast in [[typed]].
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("EMBED_STR", StringType),
    StructField("SPORT_TYPE", StringType),
    StructField("DIFFICULTY", StringType),
    StructField("MOVING_TIME_SECONDS", StringType),
    StructField("DISTANCE_METERS", StringType),
    StructField("GENERATION_MODEL", StringType),
    StructField("WORKOUT_SOURCE", StringType),
    StructField("STORE_VERSION", StringType),
    StructField("RAW_JSON_STR", StringType),
    StructField("CREATED_AT", StringType),
    StructField("_corrupt_record", StringType)))

  /** Permissive nested schema for the `RAW_JSON_STR` VARIANT payload — the
    * superset shape (core 5-key corpus rows + full structured cache rows);
    * absent paths parse to null, matching VARIANT missing-path semantics.
    */
  val rawJsonSchema: StructType = {
    val scalarValue = StructType(Seq(
      StructField("value_type", StringType), StructField("value", LongType),
      StructField("min_value", LongType), StructField("max_value", LongType)))
    StructType(Seq(
      StructField("workout_title", StringType),
      StructField("workout_instructions", StringType),
      StructField("workout_difficulty", StringType),
      StructField("workout_query", StringType),
      StructField("sport_specs", ArrayType(StructType(Seq(
        StructField("sport_type", StringType))))),
      StructField("structured_characteristics", StructType(Seq(
        StructField("workout_data_tags", ArrayType(StringType))))),
      StructField("sets", ArrayType(StructType(Seq(
        StructField("repeats_min", LongType),
        StructField("steps", ArrayType(StructType(Seq(
          StructField("workout_step_type", StringType),
          StructField("scalar_value", scalarValue),
          StructField("description", StringType))))),
        StructField("display_data", StructType(Seq(
          StructField("set_description", StringType)))))))),
      StructField("scalar_values", ArrayType(scalarValue)),
      StructField("structured_workout_source_info", StructType(Seq(
        StructField("source", StringType), StructField("source_uid", StringType),
        StructField("generation_model", StringType)))),
      StructField("parametrized_strings", ArrayType(StringType))))
  }

  /** The staged all-string layer of a corpus CSV (what COPY's `$n`
    * positional references see, before any `::` cast).
    */
  def readCsvRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(rawSchema)
      .csv(path)

  /** Read a corpus CSV with the reference's load semantics. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    typed(readCsvRaw(spark, path))

  /** Read a corpus as JSON-lines with the same permissive load semantics as
    * the CSV COPY path (one object per line, corrupt lines audited in
    * `_corrupt_record`, absent keys -> null, numbers coerced to the staged
    * string layer) and the same [[typed]] cast layer on top — so either
    * interchange format lands in one canonical shape.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    typed(spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(rawSchema)
      .json(path))

  /** The per-column cast layer (`01:116-126`): strict casts for the columns
    * COPY casts with `::`, NULLIF('')-style empty handling for the nullable
    * ints, and a parsed struct view of the JSON payload alongside the raw
    * string (queries return the raw document verbatim, `02:346`).
    */
  def typed(raw: DataFrame): DataFrame = {
    def emptyToNullInt(c: String) =
      when(col(c) === "", lit(null)).otherwise(col(c)).cast(IntegerType).as(c)
    raw.select(
      col("ID"), col("EMBED_STR"), col("SPORT_TYPE"), col("DIFFICULTY"),
      emptyToNullInt("MOVING_TIME_SECONDS"),
      emptyToNullInt("DISTANCE_METERS"),
      col("GENERATION_MODEL"), col("WORKOUT_SOURCE"), col("STORE_VERSION"),
      col("RAW_JSON_STR"),
      from_json(col("RAW_JSON_STR"), rawJsonSchema).as("WORKOUT_DOC"),
      col("CREATED_AT").cast(TimestampType).as("CREATED_AT"),
      col("_corrupt_record"))
  }

  /** Typed dataset over the scalar core (drops the parsed struct + audit
    * columns; keep the DataFrame form when the nested payload is needed).
    */
  def typedDs(df: DataFrame): Dataset[Workout] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("ID", "EMBED_STR", "SPORT_TYPE", "DIFFICULTY",
      "MOVING_TIME_SECONDS", "DISTANCE_METERS", "GENERATION_MODEL",
      "WORKOUT_SOURCE", "STORE_VERSION", "RAW_JSON_STR", "CREATED_AT")
      .as[Workout]
  }
}
