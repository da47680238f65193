package graft

import java.nio.file.Files

import org.apache.commons.io.FileUtils

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // small deliberately-messy corpus: exact dups, near-dups, a benchmark
  // source, quality spread, enough rows that every stage does real work
  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    def sentence(n: Int) =
      (0 until n).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
    val base = (0 until 120).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", s"src${i % 5}",
        sentence(8 + rnd.nextInt(30)))
    }
    val dups = base.take(15).map { case (id, l, s, t) => (id + 500L, l, s, t) }
    val nears = base.slice(15, 30).map { case (id, l, s, t) =>
      (id + 600L, l, s, t + " w1") }
    (base ++ dups ++ nears).toDF("doc_id", "lang", "source", "text")
  }

  test("seam mode does not change results: LocalSeam == StageDir, and stages persist") {
    val local = Curation.curate(docs, "src4", Curation.LocalSeam)
      .collect().map(_.toSeq).toSet
    assert(local.nonEmpty)
    val dir = Files.createTempDirectory("curation_seam").toFile
    try {
      val staged = Curation.curate(docs, "src4", Curation.StageDir(dir.toString))
        .collect().map(_.toSeq).toSet
      assert(staged == local,
        "StageDir seam changed the pipeline result vs LocalSeam")
      // the production property the seam exists for: stage outputs are on
      // disk, independently re-readable after the run
      val stages = dir.listFiles().map(_.getName).toSet
      assert(stages == Set("s1_exact_dedup", "s2_scored"))
      val s1 = spark.read.parquet(s"$dir/s1_exact_dedup")
      assert(s1.count() > 0 && s1.columns.contains("doc_id"))
      val s2 = spark.read.parquet(s"$dir/s2_scored")
      assert(s2.columns.contains("q"))
    } finally FileUtils.deleteQuietly(dir)
  }
}
