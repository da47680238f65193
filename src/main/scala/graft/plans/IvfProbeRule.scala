package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.CosineSimilarity

/** Catalyst optimizer rule: rewrite a brute-force cosine top-k over an
  * IVF-indexed table into a partition-pruned probe — the "database picks the
  * index" moment for the pure-SQL front door.
  *
  * A user writes exactly the reference's search shape
  * (`/root/reference/02_method2_manual_vector_embedding.sql:226-227`):
  *
  * {{{
  *   SELECT id, cosine_similarity(embedding, <query literal>) AS score
  *   FROM indexed_table ORDER BY score DESC, id LIMIT k
  * }}}
  *
  * When the scanned parquet directory carries an [[AnnIndexMeta]] sidecar
  * (written by [[AnnIndexMeta.buildIvfIndex]] next to a
  * `partitionBy(ivf_cell)` layout), this rule computes the `nProbe`
  * query-nearest centroids on the driver (kilobytes of math — the same
  * argmax [[graft.operators.Ann.topKIvf]] does) and injects
  * `ivf_cell IN (<cells>)` directly above the relation. FileSourceStrategy
  * classifies a partition-column predicate as a PartitionFilter, so the
  * probed cells are the only directories *read* — the scan itself shrinks by
  * (1 - nProbe/nCells), which is the entire point of IVF at 100 TB.
  *
  * Opt-in and conservative, like choosing an approximate index scan in any
  * engine (the rewrite trades exactness for scan pruning — recall measured
  * empirically in RECALL.md):
  *  - fires only with `spark.graft.ann.autoProbe=true`;
  *  - only on the exact top-k shape: GlobalLimit over Sort whose FIRST key
  *    is `cosine_similarity(indexed emb column, constant vector)` DESC;
  *  - only when the single scanned relation has a readable sidecar whose
  *    centroid dim matches the query literal;
  *  - never when a predicate on the assign column already exists (also what
  *    makes the rule a fixed-point no-op on its own output);
  *  - never when `nProbe >= nCells` (a full probe prunes nothing — the
  *    untouched exact plan is strictly better).
  *
  * `spark.graft.ann.nProbe` overrides the sidecar's default probe width per
  * session, the recall/latency knob a user tunes (RECALL.md's curve).
  */
case class IvfProbeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import IvfProbeRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(AutoProbeKey, "false").toBoolean) return plan
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s: Sort)) =>
        gl.copy(child = ll.copy(child = rewrite(s)))
    }
  }

  private def rewrite(s: Sort): LogicalPlan = {
    if (s.order.isEmpty || s.order.head.direction != Descending) return s

    // resolve the sort key through Project aliases down the child chain
    val aliasMap: Map[ExprId, Expression] = s.child.collect {
      case p: Project =>
        p.projectList.collect { case a: Alias => a.exprId -> a.child }
    }.flatten.toMap
    val key = stripCast(s.order.head.child) match {
      case ar: AttributeReference =>
        aliasMap.get(ar.exprId).map(stripCast).getOrElse(ar)
      case other => other
    }

    val (queryExpr, embExpr) = key match {
      case CosineSimilarity(l, r) if l.foldable && !r.foldable => (l, r)
      case CosineSimilarity(l, r) if r.foldable && !l.foldable => (r, l)
      case _ => return s
    }
    val embAttr = stripCast(embExpr) match {
      case ar: AttributeReference => ar
      case _ => return s
    }
    val query = constArray(queryExpr).getOrElse(return s)

    // exactly one file-source relation, carrying the sidecar, owning embAttr
    val rels = s.child.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] => l
    }
    if (rels.size != 1) return s
    val lr = rels.head
    val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
    if (fsRel.location.rootPaths.size != 1) return s
    val meta = AnnIndexMeta.read(spark.sessionState.newHadoopConf(),
      fsRel.location.rootPaths.head).getOrElse(return s)
    if (embAttr.name != meta.embCol ||
        !lr.output.exists(_.exprId == embAttr.exprId)) return s
    if (meta.dim != query.length) return s
    val assignAttr = lr.output.find(_.name == meta.assignCol).getOrElse(return s)

    // an existing predicate on the assign column means the user (or a prior
    // application of this rule) already probes — leave the plan alone
    val alreadyProbed = s.child.exists {
      case f: Filter => f.condition.references.exists(_.exprId == assignAttr.exprId)
      case _ => false
    }
    if (alreadyProbed) return s

    val nProbe = conf.getConfString(NProbeKey, "") match {
      case v if v.nonEmpty => v.toInt
      case _ => meta.nProbe
    }
    if (nProbe >= meta.centroids.size) return s // full probe: keep exact plan

    // the same query-nearest-cells argmax as Ann.topKIvf (ties: lower cid)
    val cells = meta.centroids.indices
      .map(i => (cosineD(query, meta.centroids(i)), i))
      .sortBy { case (sim, cid) => (-sim, cid) }
      .take(nProbe).map(_._2)

    s.copy(child = s.child.transformUp {
      case l: LogicalRelation if l eq lr =>
        Filter(In(assignAttr, cells.map(c => Literal(c))), l)
    })
  }
}

object IvfProbeRule {
  val AutoProbeKey = "spark.graft.ann.autoProbe"
  val NProbeKey = "spark.graft.ann.nProbe"

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Evaluate a foldable array<float/double> expression to doubles
    * (float → double is value-exact, the expressions' own promotion rule).
    */
  private def constArray(e: Expression): Option[Array[Double]] = {
    if (!e.foldable) return None
    e.dataType match {
      case ArrayType(DoubleType, _) =>
        Option(e.eval()).map(_.asInstanceOf[ArrayData].toDoubleArray())
      case ArrayType(FloatType, _) =>
        Option(e.eval()).map(_.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble))
      case _ => None
    }
  }

  /** Driver-side cosine, double fold in element order — same ordering as
    * [[graft.operators.Ann.cosine]], so the rule picks exactly the cells
    * `topKIvf` would.
    */
  private def cosineD(q: Array[Double], c: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < q.length) {
      val x = q(i); val y = c(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
