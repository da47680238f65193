package graft

import java.nio.file.Files

import graft.ingest.WorkoutCorpus

class IngestSpec extends SparkSpec {

  /** Synthetic CSV reproducing the reference load semantics: quoted multiline
    * fields, empty-string->NULL ints, JSON payload, trailing timestamp
    * (`01_method1_cortex_search.sql:111-142` behaviors, own data).
    */
  private lazy val csvPath = {
    val dir = Files.createTempDirectory("graft-ingest")
    val f = dir.resolve("corpus.csv")
    val json = """{""workout_title"":""T1"",""sets"":[{""repeats_min"":3,""steps"":[{""workout_step_type"":""warmup"",""description"":""easy""}]}]}"""
    Files.writeString(f,
      "ID,EMBED_STR,SPORT_TYPE,DIFFICULTY,MOVING_TIME_SECONDS,DISTANCE_METERS,GENERATION_MODEL,WORKOUT_SOURCE,STORE_VERSION,RAW_JSON_STR,CREATED_AT\n" +
      s""""W1","line one
         |line two
         |line three","run","easy",1800,5000,"m1","slam","v1","$json",2025-10-10 10:00:00
         |"W2","short text","yoga","very hard",,,"m1","slam","v1","{""workout_title"":""T2""}",2025-10-11 11:30:00
         |""".stripMargin)
    f.toString
  }

  private lazy val df = WorkoutCorpus.readCsv(spark, csvPath).cache()

  test("multiline quoted fields parse as one row") {
    assert(df.count() == 2)
    val w1 = df.where(df("ID") === "W1").head()
    assert(w1.getAs[String]("EMBED_STR").split("\n").length == 3)
  }

  test("empty string -> NULL for nullable ints (NULLIF semantics)") {
    val w2 = df.where(df("ID") === "W2").head()
    assert(w2.isNullAt(w2.fieldIndex("MOVING_TIME_SECONDS")))
    assert(w2.isNullAt(w2.fieldIndex("DISTANCE_METERS")))
    val w1 = df.where(df("ID") === "W1").head()
    assert(w1.getAs[Int]("MOVING_TIME_SECONDS") == 1800)
    assert(w1.getAs[Int]("DISTANCE_METERS") == 5000)
  }

  test("VARIANT duality: raw string kept AND parsed struct view") {
    val w1 = df.where(df("ID") === "W1").head()
    assert(w1.getAs[String]("RAW_JSON_STR").contains("workout_title"))
    val doc = w1.getAs[org.apache.spark.sql.Row]("WORKOUT_DOC")
    assert(doc.getAs[String]("workout_title") == "T1")
    // missing-path => NULL (W2 has no sets)
    val w2 = df.where(df("ID") === "W2").head()
    val doc2 = w2.getAs[org.apache.spark.sql.Row]("WORKOUT_DOC")
    assert(doc2.getAs[String]("workout_title") == "T2")
    assert(doc2.isNullAt(doc2.fieldIndex("sets")))
  }

  test("timestamp cast applied") {
    val w1 = df.where(df("ID") === "W1").head()
    assert(w1.getAs[java.sql.Timestamp]("CREATED_AT").toString.startsWith("2025-10-10"))
  }

  test("difficulty vocabulary preserved verbatim (very hard with a space)") {
    assert(df.where(df("DIFFICULTY") === "very hard").count() == 1)
    assert(df.where(df("DIFFICULTY") === "very_hard").count() == 0)
  }

  test("typed Dataset[Workout] view roundtrips the scalar core") {
    val ds = graft.ingest.WorkoutCorpus.typedDs(df)
    val w1 = ds.collect().find(_.ID == "W1").get
    assert(w1.SPORT_TYPE == "run" && w1.MOVING_TIME_SECONDS.contains(1800))
    val w2 = ds.collect().find(_.ID == "W2").get
    assert(w2.DISTANCE_METERS.isEmpty && w2.DIFFICULTY == "very hard")
  }
}
