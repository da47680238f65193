package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients over an undirected
  * pair graph — the graph-shape diagnostic for near-duplicate clusters:
  * a component whose nodes close many triangles is a tight template
  * family (safe to collapse to one survivor); a star — same component
  * size, zero triangles — is one hub spuriously similar to many
  * unrelated docs, exactly the case where component-collapse
  * over-deletes. PageRank (q223) ranks nodes ACROSS the graph; the
  * clustering coefficient describes the neighborhood AROUND each node.
  *
  * Algorithm: the degree-ordered node-iterator (Suri & Vassilvitskii
  * WWW'11, "Counting triangles and the curse of the last reducer").
  * Each undirected edge is oriented from its lower endpoint to its
  * higher in the total order (degree ASC, id ASC); every triangle then
  * has exactly ONE wedge rooted at its minimum-order vertex, so
  *
  *   wedges  = oriented ⋈ oriented on the root (src)
  *   closed  = wedges   ⋈ oriented on the closing (v, w) edge
  *
  * counts each triangle once, no dedup pass. The orientation is the
  * scale argument: out-degree in the order is O(sqrt(E)) for ANY graph
  * (a vertex with out-degree d has d successors of degree >= d, which
  * costs d^2 <= 2E edge endpoints), so wedge volume is O(E^1.5) worst
  * case and — the "last reducer" point — a degree-10^6 hub roots ZERO
  * wedges: its edges orient INTO it. All shuffles are plain equi-joins
  * on node keys; nothing is ever all-pairs.
  *
  * All decisions are integer (degrees, ids, counts), so results are
  * bit-portable with no fold pinning. The coefficient 2T / (d(d-1)) is
  * the single correctly-rounded double division both engines perform
  * identically (degree-1 nodes get 0.0, not NaN — no closable wedge is
  * vacuously "all closed" false).
  */
object Triangles {

  /** Per-node (degree, triangles, clustering coefficient) over the
    * undirected graph given as unique canonical pairs (idA < idB — the
    * [[Dedup.jaccardPairs]] contract). Self-loops are dropped, duplicate
    * pairs collapse; isolated nodes do not appear (they have no pair
    * row to appear from).
    */
  def triangleCounts(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b"): DataFrame = {
    // canonical undirected edge set: a < b, distinct — materialized once
    // (eager localCheckpoint, the Components/KCore lesson): the frame has
    // SIX consumers below (deg twice via the endpoint explode, the two
    // orientation joins, the wedge sides, the closing probe); left lazy,
    // each one re-executes the whole upstream pair pipeline — measured in
    // r16 as most of q227's 9 s.
    val e = pairs
      .select(least(col(idA), col(idB)).as("a"), greatest(col(idA), col(idB)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    // endpoint multiset as ONE explode, not a union of two projections
    // (union branches would scan `e` twice)
    val deg = e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    // orient each edge low -> high in the (deg, id) total order
    val withDegs = e
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
    def lowFirst(da: Column, a: Column, db: Column, b: Column): Column =
      (da < db) || (da === db && a < b)
    // materialized: three consumers (both wedge sides + the closing
    // probe) would otherwise each re-run the two degree joins above
    val oriented = withDegs.select(
      when(lowFirst(col("da"), col("a"), col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(lowFirst(col("da"), col("a"), col("db"), col("b")),
        struct(col("db").as("d"), col("b").as("n")))
        .otherwise(struct(col("da").as("d"), col("a").as("n"))).as("dstk"))
      .select(col("src"), col("dstk.n").as("dst"), col("dstk.d").as("ddst"))
      .localCheckpoint(true)

    // wedges rooted at the order-minimum vertex: (src -> v, src -> w)
    // with v before w in the same order, then close on the (v, w) edge.
    val l = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val r = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = l.join(r, "src")
      .where((col("dv") < col("dw")) ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))

    // one explode, not a 3-way union: the wedge-close join (the costly
    // subtree) executes once instead of three times
    val perNode = tris.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))

    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff",
        when(col("degree") < 2, lit(0.0))
          .otherwise(col("triangles").cast("double") * 2.0 /
            (col("degree") * (col("degree") - 1)).cast("double")))
  }
}
