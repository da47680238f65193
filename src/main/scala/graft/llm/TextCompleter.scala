package graft.llm

import org.apache.spark.sql.DataFrame

import graft.api.SemanticSearch

/** LLM text-generation contract, re-deriving the observable use of the
  * reference's `SNOWFLAKE.CORTEX.COMPLETE(model, prompt)`
  * (`/root/reference/03_cortex_search_demo_notebook.ipynb` raw lines 382-383
  * and 563-564): prompt in, text out, called from driver-side orchestration
  * (never inside the query plan — generation is an application-tier concern).
  *
  * The default implementation is a deterministic template transformer so the
  * demo flows run hermetically offline; a real endpoint is a drop-in.
  */
trait TextCompleter extends Serializable {
  def complete(model: String, prompt: String): String
}

/** Deterministic rule-based completer. Recognizes the two prompt families the
  * notebook builds (workout modification, progression recommendation) and
  * produces a structured textual answer derived only from the prompt content.
  */
final class TemplateCompleter extends TextCompleter {
  def complete(model: String, prompt: String): String = {
    val p = prompt.toLowerCase
    if (p.contains("modify")) {
      s"[${model}] MODIFIED WORKOUT\n" +
        "Adjustment applied per request. Derived deterministically from:\n" +
        prompt.linesIterator.take(8).mkString("\n")
    } else if (p.contains("recommend") || p.contains("progression")) {
      s"[${model}] COACH RECOMMENDATION\n" +
        "Progress to the next-harder cached workout; increase load ~10%.\n" +
        prompt.linesIterator.take(8).mkString("\n")
    } else {
      s"[${model}] COMPLETION\n" + prompt.take(400)
    }
  }
}

/** Driver-side orchestration of the notebook's Demo Query 4/5 flows
  * (`nb:338-383`, `nb:453-564`): search (once or twice), build a prompt from
  * the top hit, call the completer. Plain Scala control flow above the query
  * engine; the only cluster work is the search jobs themselves.
  */
final class Recommender(search: SemanticSearch, completer: TextCompleter,
                        model: String = "offline-template") {

  private def topHitText(df: DataFrame): Option[(String, String)] = {
    val rows = df.collect()
    rows.headOption.map(r => (
      r.getAs[String]("ID"),
      Option(r.getAs[Any]("EMBED_STR")).map(_.toString).getOrElse("")))
  }

  /** Demo Query 4: retrieve best match, ask for a modification. */
  def modifyWorkout(query: String, modification: String, k: Int = 1): String = {
    topHitText(search.topK(query, k)) match {
      case Some((id, text)) =>
        val prompt =
          s"""Modify this workout: $modification
             |Original workout ($id):
             |$text""".stripMargin
        completer.complete(model, prompt)
      case None => s"[$model] NO MATCH - generate new workout for: $query"
    }
  }

  /** Demo Query 5: completed workout + harder candidates -> progression advice. */
  def recommendProgression(completedQuery: String, harderQuery: String): String = {
    val completed = topHitText(search.topK(completedQuery, 1))
    val harder = topHitText(search.topK(harderQuery, 3))
    (completed, harder) match {
      case (Some((cid, ctext)), Some((hid, htext))) =>
        val prompt =
          s"""Recommend a progression. Athlete completed ($cid):
             |${ctext.take(400)}
             |Candidate harder workout ($hid):
             |${htext.take(400)}""".stripMargin
        completer.complete(model, prompt)
      case _ => s"[$model] NO CANDIDATES - recommend repeating: $completedQuery"
    }
  }
}
