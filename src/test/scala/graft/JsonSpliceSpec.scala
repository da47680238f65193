package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.JsonSplice

/** The structural splice the bench tools' merge-on-rewrite paths depend
  * on — the cases the old regex silently corrupted: nested values, and
  * strings containing '}' / ',' / escaped quotes.
  */
class JsonSpliceSpec extends AnyFunSuite {

  test("membersOf: flat object") {
    val ms = JsonSplice.membersOf("""{"a":1,"b":"x","c":true}""")
    assert(ms == Seq("a" -> "1", "b" -> "\"x\"", "c" -> "true"))
  }

  test("membersOf: nested values and brace-bearing strings") {
    val obj =
      """{"q1":{"sec":1.5,"err":"boom } mid-string, {really}"},"list":[1,{"k":2}],"s":"a\"b"}"""
    val ms = JsonSplice.membersOf(obj)
    assert(ms.map(_._1) == Seq("q1", "list", "s"))
    assert(ms(0)._2 == """{"sec":1.5,"err":"boom } mid-string, {really}"}""")
    assert(ms(1)._2 == """[1,{"k":2}]""")
    assert(ms(2)._2 == """"a\"b"""")
  }

  test("membersOf: empty object; malformed input fails loudly") {
    assert(JsonSplice.membersOf("{}").isEmpty)
    intercept[IllegalArgumentException](JsonSplice.membersOf("""{"a":1"""))
    intercept[IllegalArgumentException](JsonSplice.membersOf("""[1,2]"""))
    intercept[Exception](JsonSplice.membersOf("""{"a" 1}"""))
  }

  test("elementsOf: array of objects with nested arrays") {
    val arr = """[{"path":"a","v":[1,2]},{"path":"b,c","v":{"x":"]"}},3]"""
    val es = JsonSplice.elementsOf(arr)
    assert(es.size == 3)
    assert(es(0) == """{"path":"a","v":[1,2]}""")
    assert(es(1) == """{"path":"b,c","v":{"x":"]"}}""")
    assert(es(2) == "3")
  }

  test("member lookup + emit round-trips") {
    val obj = """{"metric":"serve_bench","results":[{"path":"x","qps":1.0}]}"""
    assert(JsonSplice.member(obj, "results").contains("""[{"path":"x","qps":1.0}]"""))
    assert(JsonSplice.member(obj, "nope").isEmpty)
    assert(JsonSplice.emitObject(JsonSplice.membersOf(obj)) == obj)
    val arr = JsonSplice.member(obj, "results").get
    assert(JsonSplice.emitArray(JsonSplice.elementsOf(arr)) == arr)
  }

  test("splice pattern: replace one member's cells, keep the rest byte-identical") {
    val prev =
      """{"metric":"m","queries":{"q1":{"t":1.0},"q2":{"t":2.0,"err":"a } b"}}}"""
    val fresh = Map("q2" -> """{"t":0.5}""")
    val prevQ = JsonSplice.membersOf(JsonSplice.member(prev, "queries").get)
    val merged = JsonSplice.emitObject(
      prevQ.filterNot(kv => fresh.contains(kv._1)) ++ fresh.toSeq)
    assert(merged == """{"q1":{"t":1.0},"q2":{"t":0.5}}""")
  }
}
