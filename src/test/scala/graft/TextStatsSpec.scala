package graft

import org.apache.spark.sql.functions._

import graft.functions.TextStats.textStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val pool =
    "abz AZM09 .,;:!? \t\n éü漢字🙂-_\"'".toCharArray

  private def randomTexts(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => new String(
      Array.fill(rnd.nextInt(200))(pool(rnd.nextInt(pool.length)))))
  }

  test("single-pass counts equal the regex-built battery (incl. unicode edges)") {
    val edge = Seq("", " ", "   ", "a", "...", "ABC123", "é é é", "漢 字",
      "🙂🙂", "no-specials", "trailing space ", " leading", "\ttab\nnl")
    val df = (edge ++ randomTexts(500, 7)).toDF("t")
      .withColumn("s", textStats(col("t")))
    val t = col("t")
    val rows = df.select(
      col("s.n_chars"), col("s.n_spaces"), col("s.n_punct"),
      col("s.n_digits"), col("s.n_upper"),
      length(t).as("len"),
      (length(t) - length(regexp_replace(t, " ", ""))).as("r_spaces"),
      (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).as("r_punct"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).as("r_digits"),
      (length(t) - length(regexp_replace(t, "[A-Z]", ""))).as("r_upper"),
      size(split(t, " ")).as("n_tokens")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(5), s"n_chars: $r")
      assert(r.getInt(1) == r.getInt(6), s"n_spaces: $r")
      assert(r.getInt(2) == r.getInt(7), s"n_punct: $r")
      assert(r.getInt(3) == r.getInt(8), s"n_digits: $r")
      assert(r.getInt(4) == r.getInt(9), s"n_upper: $r")
      // the derived identity the profiling queries rely on
      assert(r.getInt(1) + 1 == r.getInt(10), s"token identity: $r")
    }
  }

  test("null in, null out; codegen and interpreted agree") {
    val df = Seq(Some("a b"), None).toDF("t").withColumn("s", textStats(col("t")))
    val got = df.select("s").collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
    // force the interpreted path and compare
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = Seq("a b").toDF("t").withColumn("s", textStats(col("t")))
        .select("s.n_chars", "s.n_spaces").head()
      assert(interp.getInt(0) == 3 && interp.getInt(1) == 1)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("microbench: one fused scan vs five regex passes (informational)") {
    val big = randomTexts(60000, 11).toDF("t").cache()
    big.count() // materialize input out of the timed region
    val t = col("t")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def runRegex(): Unit = big.select(
      length(t), length(regexp_replace(t, " ", "")),
      length(regexp_replace(t, "[.,;:!?]", "")),
      length(regexp_replace(t, "[0-9]", "")),
      length(regexp_replace(t, "[A-Z]", "")))
      .write.format("noop").mode("overwrite").save()
    def runFused(): Unit = big.select(textStats(t))
      .write.format("noop").mode("overwrite").save()
    runRegex(); runFused() // JIT warm-up pass
    val regex = time(runRegex()); val fused = time(runFused())
    info(f"five regex passes: $regex%.3f s, fused single scan: $fused%.3f s "
      + f"(${regex / fused}%.1fx)")
    // loose bound only — contended-host safe; the honest claim is the scan
    // count, the speedup is corroborating evidence
    assert(fused <= regex * 1.5, f"fused $fused%.3f unexpectedly slower than regex $regex%.3f")
    big.unpersist()
  }
}
