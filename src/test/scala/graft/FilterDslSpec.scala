package graft

import org.apache.spark.sql.functions._

import graft.filter.FilterDsl

class FilterDslSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", "run", "easy", 3000, 900),
    ("b", "run", "hard", 6000, 1800),
    ("c", "ride", "easy", 20000, 3600),
    ("d", "swim", "very hard", 1500, 2400),
    ("e", "run", "very_hard", 5000, 1500)
  ).toDF("id", "sport", "difficulty", "distance", "duration")

  private def ids(json: String): Set[String] =
    df.where(FilterDsl.compile(json)).select("id").collect().map(_.getString(0)).toSet

  test("@eq / @ne") {
    assert(ids("""{"@eq":{"sport":"run"}}""") == Set("a", "b", "e"))
    assert(ids("""{"@ne":{"sport":"run"}}""") == Set("c", "d"))
  }

  test("@gt/@gte/@lt/@lte") {
    assert(ids("""{"@gte":{"distance":5000}}""") == Set("b", "c", "e"))
    assert(ids("""{"@gt":{"distance":5000}}""") == Set("b", "c"))
    assert(ids("""{"@lte":{"duration":1500}}""") == Set("a", "e"))
    assert(ids("""{"@lt":{"duration":1500}}""") == Set("a"))
  }

  test("@and / @or / @not nesting") {
    val j = """{"@and":[{"@eq":{"sport":"run"}},
              |  {"@or":[{"@gte":{"distance":5500}},{"@lte":{"duration":1000}}]}]}""".stripMargin
    assert(ids(j) == Set("a", "b"))
    assert(ids("""{"@not":{"@eq":{"sport":"run"}}}""") == Set("c", "d"))
  }

  test("@in and @contains") {
    assert(ids("""{"@in":{"sport":["ride","swim"]}}""") == Set("c", "d"))
    assert(ids("""{"@contains":{"difficulty":"hard"}}""") == Set("b", "d", "e"))
  }

  test("difficulty vocabulary is matched verbatim (very hard vs very_hard)") {
    // Reference notebook Q3 filters `very_hard` which matches 0 corpus rows
    // (corpus spells it `very hard`) — we preserve both spellings verbatim.
    assert(ids("""{"@eq":{"difficulty":"very hard"}}""") == Set("d"))
    assert(ids("""{"@eq":{"difficulty":"very_hard"}}""") == Set("e"))
  }

  test("filters stay Catalyst predicates (pushdown-visible), not UDFs") {
    val plan = df.where(FilterDsl.compile("""{"@eq":{"sport":"run"}}"""))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("sport"))
    assert(!plan.toLowerCase.contains("udf"))
  }

  test("unknown operator and malformed nodes throw") {
    intercept[IllegalArgumentException](FilterDsl.compile("""{"@xor":[]}"""))
    intercept[IllegalArgumentException](
      ids("""{"@eq":{"sport":"run","extra":"x"}}"""))
  }

  test("request-level filter extraction") {
    val req = """{"query":"q","limit":3,"filter":{"@eq":{"sport":"ride"}}}"""
    assert(df.where(FilterDsl.compileRequestFilter(req).get).count() == 1)
    assert(FilterDsl.compileRequestFilter("""{"query":"q"}""").isEmpty)
  }
}
