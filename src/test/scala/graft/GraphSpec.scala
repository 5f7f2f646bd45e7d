package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Semantics of the graph family: the degree-oriented triangle count
  * must equal the naive canonical-edge enumeration (orientation
  * invariance), and component labels must be closed under the edge
  * relation. */
class GraphSpec extends SparkSpec {

  test("triangleCounts matches the naive u<v wedge enumeration") {
    val edges = Graph.coOccurrenceEdges(spark, sf0001).cache()
    try {
      // naive: for canonical edges (a,b),(a,c) with b<c, the triangle
      // closes iff (b,c) is an edge — each triangle enumerated once
      val naive = edges.as("e1")
        .join(edges.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
        .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
        .join(edges.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("n_triangles"))
      val fast = Graph.triangleCounts(spark, sf0001)
      assert(fast.count() > 0, "no triangles at sf0.001 — edge derivation broken")
      val diff = fast.join(naive, Seq("part"), "full_outer")
        .filter(fast("n_triangles") =!= naive("n_triangles")
          || fast("n_triangles").isNull || naive("n_triangles").isNull)
      assert(diff.count() == 0, "degree-oriented counts diverge from naive enumeration")
    } finally {
      edges.unpersist()
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("componentsOverCoOccurrence labels are closed under the edge relation") {
    val labels = Graph.componentsOverCoOccurrence(spark, sf0001).cache()
    try {
      assert(labels.count() > 0, "no components at sf0.001 — sparsified graph empty")
      // both endpoints of every edge must share a label, and each
      // component's label must be its minimum member
      val items = Tables.lineitem(spark, sf0001)
        .filter(col("l_quantity") >= 48)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val edges = items.as("x").join(items.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("u"), col("y.pk").as("v")).distinct()
      val lu = labels.select(col("part").as("u"), col("component").as("cu"))
      val lv = labels.select(col("part").as("v"), col("component").as("cv"))
      val split = edges.join(lu, "u").join(lv, "v").filter(col("cu") =!= col("cv"))
      assert(split.count() == 0, "an edge crosses two components")
      val badMin = labels.groupBy(col("component")).agg(min(col("part")).as("mn"))
        .filter(col("component") =!= col("mn"))
      assert(badMin.count() == 0, "component label is not the member minimum")
    } finally {
      labels.unpersist()
      Caches.releaseAll()
      spark.catalog.clearCache()
    }
  }
}
