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

  test("JSONL ingest lands in the same canonical shape as CSV") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("corpus.jsonl")
    Files.writeString(f,
      """{"ID":"J1","EMBED_STR":"jsonl doc","SPORT_TYPE":"swim","DIFFICULTY":"easy","MOVING_TIME_SECONDS":900,"DISTANCE_METERS":1500,"GENERATION_MODEL":"m1","WORKOUT_SOURCE":"slam","STORE_VERSION":"v1","RAW_JSON_STR":"{\"workout_title\":\"J\"}","CREATED_AT":"2025-10-12 09:00:00"}
        |{"ID":"J2","EMBED_STR":"no numbers","SPORT_TYPE":"ride","DIFFICULTY":"hard","GENERATION_MODEL":"m1","WORKOUT_SOURCE":"slam","STORE_VERSION":"v1","RAW_JSON_STR":"{\"workout_title\":\"K\"}"}
        |this line is not json
        |""".stripMargin)
    // cache: Spark disallows corrupt-record-only queries on raw JSON scans
    val jdf = WorkoutCorpus.readJsonl(spark, f.toString).cache()
    // same canonical columns as the CSV path
    assert(jdf.columns.toSeq == df.columns.toSeq)
    val ok = jdf.where(jdf("ID").isNotNull)
    assert(ok.count() == 2)
    val j1 = ok.where(jdf("ID") === "J1").head()
    assert(j1.getAs[Int]("MOVING_TIME_SECONDS") == 900)
    assert(j1.getAs[org.apache.spark.sql.Row]("WORKOUT_DOC")
      .getAs[String]("workout_title") == "J")
    // absent keys -> null ints (the NULLIF analog for JSONL)
    val j2 = ok.where(jdf("ID") === "J2").head()
    assert(j2.isNullAt(j2.fieldIndex("DISTANCE_METERS")))
    // the corrupt line is audited, not dropped
    assert(jdf.where(jdf("_corrupt_record").isNotNull).count() == 1)
  }
}
