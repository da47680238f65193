package graft

import graft.api.{IndexBuilder, SemanticSearch}
import graft.embed.HashingTfEmbedder
import graft.llm.{Recommender, TemplateCompleter, TextCompleter}

/** Driver-side LLM orchestration flows (notebook Demo Query 4/5 shapes:
  * `03_cortex_search_demo_notebook.ipynb` raw lines 338-383, 453-564).
  */
class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    ("W1", "easy 5k recovery run in the park", "run"),
    ("W2", "hard 10k tempo run with hills", "run"),
    ("W3", "interval swim session in open water", "swim")
  ).toDF("ID", "EMBED_STR", "SPORT_TYPE")

  private lazy val recommender = {
    val embedder = HashingTfEmbedder(128)
    val index = IndexBuilder.withEmbeddings(corpus, embedder)
    new Recommender(new SemanticSearch(index, embedder), new TemplateCompleter)
  }

  test("modify flow: retrieves the match and composes a modification prompt") {
    val out = recommender.modifyWorkout("easy recovery run", "make it 10% harder")
    assert(out.contains("MODIFIED WORKOUT"))
    assert(out.contains("make it 10% harder"))
    assert(out.contains("W1"))
  }

  test("progression flow: chains two searches into a recommendation") {
    val out = recommender.recommendProgression("easy recovery run", "hard tempo run")
    assert(out.contains("COACH RECOMMENDATION"))
    assert(out.contains("W1") || out.contains("W2"))
  }

  test("completer is pluggable (custom backend sees model and prompt)") {
    var seen: (String, String) = null
    val spy: TextCompleter = new TextCompleter {
      def complete(model: String, prompt: String): String = {
        seen = (model, prompt); "SPY"
      }
    }
    val embedder = HashingTfEmbedder(128)
    val index = IndexBuilder.withEmbeddings(corpus, embedder)
    val r = new Recommender(new SemanticSearch(index, embedder), spy, model = "m-x")
    assert(r.modifyWorkout("swim session", "shorter") == "SPY")
    assert(seen._1 == "m-x" && seen._2.contains("shorter"))
  }
}
