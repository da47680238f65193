package graft.filter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Compiler for the reference's JSON filter request language into a Catalyst
  * `Column` predicate.
  *
  * Grammar observed at `/root/reference/01_method1_cortex_search.sql:211-216`
  * and the notebook (`@and` nb:219, `@or` nb:285, `@eq` nb:359, `@gte`/`@lte`
  * nb:219):
  *
  * {{{
  *   filter := {"@and": [filter, ...]} | {"@or": [filter, ...]}
  *           | {"@not": filter}
  *           | {"@eq"|"@ne"|"@gt"|"@gte"|"@lt"|"@lte": {col: value}}
  *           | {"@in": {col: [value, ...]}}
  *           | {"@contains": {col: substring}}
  * }}}
  *
  * Semantics (pinned by the notebook's "Filters ensure ALL results match
  * criteria" note): purely conjunctive/boolean pre-filtering applied BEFORE
  * ranking. Compiling to a `Column` (never a UDF) keeps the predicate visible
  * to Catalyst, so it pushes down to the Parquet scan and prunes partitions —
  * the property that makes filtered search cheap at scale.
  */
object FilterDsl {

  private val mapper = new ObjectMapper()

  def compile(filterJson: String): Column = toColumn(mapper.readTree(filterJson))

  /** Compile the filter member of a full request object, if present. */
  def compileRequestFilter(requestJson: String): Option[Column] = {
    val root = mapper.readTree(requestJson)
    Option(root.get("filter")).map(toColumn)
  }

  private def literal(v: JsonNode): Any = {
    if (v.isTextual) v.asText()
    else if (v.isIntegralNumber) v.asLong()
    else if (v.isNumber) v.asDouble()
    else if (v.isBoolean) v.asBoolean()
    else if (v.isNull) null
    else throw new IllegalArgumentException(s"unsupported literal: $v")
  }

  private def single(node: JsonNode, op: String): (String, JsonNode) = {
    val fields = node.properties().asScala.toSeq
    require(fields.size == 1, s"$op expects exactly one {column: value}, got $node")
    (fields.head.getKey, fields.head.getValue)
  }

  def toColumn(node: JsonNode): Column = {
    val fields = node.properties().asScala.toSeq
    require(fields.size == 1, s"filter node must have exactly one operator key: $node")
    val (op, body) = (fields.head.getKey, fields.head.getValue)
    op match {
      case "@and" => body.elements().asScala.map(toColumn).reduce(_ && _)
      case "@or"  => body.elements().asScala.map(toColumn).reduce(_ || _)
      case "@not" => !toColumn(body)
      case "@eq"  => val (c, v) = single(body, op); col(c) === lit(literal(v))
      case "@ne"  => val (c, v) = single(body, op); col(c) =!= lit(literal(v))
      case "@gt"  => val (c, v) = single(body, op); col(c) > lit(literal(v))
      case "@gte" => val (c, v) = single(body, op); col(c) >= lit(literal(v))
      case "@lt"  => val (c, v) = single(body, op); col(c) < lit(literal(v))
      case "@lte" => val (c, v) = single(body, op); col(c) <= lit(literal(v))
      case "@in" =>
        val (c, v) = single(body, op)
        require(v.isArray, s"@in expects an array, got $v")
        col(c).isin(v.elements().asScala.map(literal).toSeq: _*)
      case "@contains" =>
        val (c, v) = single(body, op)
        col(c).contains(lit(literal(v)))
      case other => throw new IllegalArgumentException(s"unknown filter operator: $other")
    }
  }
}
