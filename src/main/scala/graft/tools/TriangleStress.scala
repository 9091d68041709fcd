package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Triangles

/** Skew stress for degree-ordered triangle counting
  * (`x_triangle_top`): a celebrity graph — one hub adjacent to d
  * leaves (the hub is id 0, so the naive src<dst orientation points
  * EVERY hub edge outward and enumerates ~d²/2 wedges at the hub),
  * a leaf ring so some of those wedges actually close, and a
  * background ring of non-hub nodes for realistic bulk. The
  * degree-ordered orientation points every hub edge INWARD (leaves
  * have degree ≤4 ≪ d), so its hub wedge count is ZERO and its work
  * tracks |E|, not d².
  *
  * Both orientations compute the SAME triangle counts (orientation
  * invariance — asserted here on the full result, not sampled), so
  * the wall-clock gap is pure plan quality under skew.
  *
  * Usage: `sbt "runMain graft.tools.TriangleStress [d1,d2,...]"`
  * (default 1000,4000,16000). Prints one line per d: edge count,
  * wedge counts for both orientations, min-of-2 warm seconds each.
  */
object TriangleStress {
  def main(args: Array[String]): Unit = {
    val ds = args.lift(0).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1000, 4000, 16000))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("triangle-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    /** Celebrity graph, deterministic: hub 0 — leaves 1..d; leaf ring
      * i—(i+1) (closes d-1 hub triangles); background ring over nodes
      * d+1 .. d+100k with a +1 and a +7919 chord (triangle-sparse
      * bulk). Symmetric distinct edge list, the operator's contract.
      */
    def graph(d: Int): DataFrame = {
      val nBg = 100000
      val hub = (1 to d).map(l => (0L, l.toLong))
      val ring = (1 until d).map(i => (i.toLong, i.toLong + 1))
      val bg = (0 until nBg).flatMap { i =>
        val base = (d + 1).toLong
        Seq((base + i, base + (i + 1) % nBg),
            (base + i, base + (i + 7919) % nBg))
      }
      val half = (hub ++ ring ++ bg).toDF("src", "dst")
        .filter(col("src") =!= col("dst"))
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
    }

    def time2(body: => Long): (Double, Long) = {
      body // warm
      var best = Double.MaxValue; var rows = 0L
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        rows = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }

    ds.foreach { d =>
      val g = graph(d).cache()
      val nEdges = g.count() / 2
      // wedge volume per orientation: sum over nodes of C(outdeg, 2)
      def wedges(e: DataFrame): Long =
        e.groupBy("lo").agg(count(lit(1)).as("od"))
          .agg(sum(expr("od * (od - 1) / 2")).cast("long")).as[Long].head()
      val wOrd = wedges(Triangles.orient(g))
      val wNaive = wedges(Triangles.orientById(g))
      def result(ordered: Boolean) =
        Triangles.topVerticesByTriangles(g, 1000000, ordered)
      val (tOrd, rOrd) = time2(result(ordered = true).count())
      // The naive leg materializes the hub's adjacency array once PER
      // HUB EDGE in the intersect join — Σdeg² cells. Measured: d=64k
      // (2.0e9 wedge census) OOMs a 24g heap outright. Guard rather
      // than crash, and say so: the refusal IS the measurement.
      val naiveFeasible = wNaive < 500000000L
      val (tNaive, rNaive) =
        if (naiveFeasible) time2(result(ordered = false).count())
        else (-1.0, rOrd)
      // full-result orientation invariance: row count + an order-free
      // checksum over every (id, n_tri) pair
      def chk(ordered: Boolean): Long = result(ordered)
        .agg(sum(hash(col("id"), col("n_tri")).cast("long"))).as[Long].head()
      require(rOrd == rNaive &&
        (!naiveFeasible || chk(ordered = true) == chk(ordered = false)),
        s"orientation changed the result: $rOrd vs $rNaive rows")
      val naiveCell =
        if (naiveFeasible) f"sec_naive=$tNaive%.2f"
        else "sec_naive=SKIPPED(would OOM: deg^2 adjacency replication)"
      println(f"[tri-stress] d=$d%d edges=$nEdges%d wedges_ordered=$wOrd%d " +
        f"wedges_naive=$wNaive%d sec_ordered=$tOrd%.2f " + naiveCell +
        f" tri_nodes=$rOrd%d")
      g.unpersist()
    }
    spark.stop()
  }
}
