package graft.operators

import graft.SparkSpec

/** The degree-orientation argument behind q59: per-vertex triangle
  * counts are orientation-invariant (so the id-ordered oracle checks
  * the degree-ordered engine), while WEDGE counts — the join's actual
  * intermediate size — are quadratic in the hub degree under id
  * ordering and linear under degree ordering. Pure-Scala reference
  * computations on enumerable fixtures.
  */
class TriangleSpec extends SparkSpec {

  /** Oriented wedge count: Σ over vertices of C(outdeg, 2)-ish — the
    * number of (s→t1, t1→t2) paths, i.e. the join's row count.
    */
  private def wedges(edges: Seq[(Long, Long)]): Long = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    edges.map { case (_, t) => out.getOrElse(t, Set.empty).size.toLong }.sum
  }

  private def orientById(und: Seq[(Long, Long)]): Seq[(Long, Long)] =
    und.map { case (a, b) => if (a < b) (a, b) else (b, a) }

  private def orientByDegree(und: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ord = Ordering.Tuple2[Long, Long]
    und.map { case (a, b) =>
      if (ord.lt((deg(a), a), (deg(b), b))) (a, b) else (b, a)
    }
  }

  private def triangles(oriented: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val es = oriented.toSet
    (for {
      (s, t1) <- es; (s2, t2) <- es if s2 == t1 && es.contains((s, t2))
    } yield (s, t1, t2)).toSet
  }

  test("star-with-rim fixture: degree orientation collapses the hub's quadratic wedges") {
    // hub id sits in the MIDDLE of the id range — id-orientation then
    // routes half the spokes INTO the hub and half OUT, so wedges
    // through it are (d/2)² (the quadratic case; a hub at either id
    // extreme gets indeg·outdeg = 0 and hides the blowup). Rim forms a
    // cycle, so triangles hub-i-(i+1) exist.
    val hub = 20L
    val rimIds = (0L to 40L).filterNot(_ == hub)
    val spokes = rimIds.map(i => (hub, i))
    val rim = rimIds.zip(rimIds.tail :+ rimIds.head)
    val und = spokes ++ rim
    val byId = orientById(und)
    val byDeg = orientByDegree(und)
    // same triangles, both orientations, each exactly once
    def vertexCounts(tris: Set[(Long, Long, Long)]): Map[Long, Int] =
      tris.toSeq.flatMap { case (a, b, c) => Seq(a, b, c) }
        .groupBy(identity).view.mapValues(_.size).toMap
    assert(triangles(byId).size == triangles(byDeg).size)
    assert(vertexCounts(triangles(byId)) == vertexCounts(triangles(byDeg)))
    assert(vertexCounts(triangles(byId))(hub) == rimIds.size) // hub touches all
    // the wedge blowup: id orientation routes all spokes out of the
    // hub (C(40,2)-scale wedge fan); degree orientation points spokes
    // INTO the hub (out-degree ≤ 2 everywhere)
    val wId = wedges(byId)
    val wDeg = wedges(byDeg)
    assert(wDeg * 5 < wId, s"degree=$wDeg id=$wId — expected order-of-magnitude gap")
  }

  test("q59 on sf0.001 equals a brute-force reference over the same graph") {
    import spark.implicits._
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val und = li.groupBy(_._1).values.toSeq.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val expected = triangles(orientByDegree(und)).toSeq
      .flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.queries.Relational.q59Triangles(spark2, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q59 returns the top-20; every returned count must match the
    // reference exactly
    got.foreach { case (p, n) =>
      assert(expected.get(p).contains(n), s"part $p: got $n, want ${expected.get(p)}")
    }
    if (expected.nonEmpty) assert(got.nonEmpty)
  }
}
