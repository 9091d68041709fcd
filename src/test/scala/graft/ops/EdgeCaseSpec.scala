package graft.ops

import graft.SparkSpec
import graft.model.Tables
import graft.sim.{DedupOps, VectorOps}
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an empty (or
  * sentinel) result on empty input, never throw — at 100 TB some
  * partition, bucket, or filtered branch is ALWAYS empty.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Tables.documents(spark, sf).filter(col("doc_id") < 0)
  private def emptyEmb = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)

  test("pagination beyond the end returns empty") {
    val out = CoreOps.paginate(Tables.customer(spark, sf),
      Seq(col("c_custkey")), offset = 1000000, limit = 10)
    assert(out.count() == 0L)
  }

  test("dedup operators on empty input return empty") {
    assert(DedupOps.exactDedup(emptyDocs, "text", "doc_id").count() == 0L)
    assert(DedupOps.jaccardPairs(emptyDocs, "text", "doc_id", 3, 0.1).count() == 0L)
    assert(DedupOps.nearDupPairs(emptyDocs, "text", "doc_id").count() == 0L)
    assert(DedupOps.simhash64(emptyDocs, "text", "doc_id").count() == 0L)
  }

  test("connected components on empty pair list returns empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(DedupOps.connectedComponents(empty).count() == 0L)
  }

  test("exact k-means / PCA / MAD / label-prop on empty input return empty") {
    assert(graft.sim.KMeansExact.fit(emptyEmb, k = 8, iters = 2).count() == 0L)
    assert(graft.sim.PcaPower.topComponent(emptyEmb).count() == 0L)
    assert(RobustStats.madOutliers(
      Tables.events(spark, sf).filter(col("event_id") < 0),
      "event_type", "value").count() == 0L)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(LabelPropagation.communities(noEdges, 2).count() == 0L)
    assert(graft.streaming.ClusterProfileIngest
      .profileRows(emptyEmb, Array.fill(8 * 64)(0L)).count() == 0L)
  }

  test("exact k-means with fewer vectors than k fails loudly, not wrongly") {
    val three = Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
    val e = intercept[IllegalArgumentException] {
      graft.sim.KMeansExact.fit(three, k = 8, iters = 1)
    }
    assert(e.getMessage.contains("seed needs"))
  }

  test("KNN with empty query or candidate side returns empty") {
    val emb = Tables.embeddings(spark, sf)
    assert(VectorOps.knnBruteForce(emptyEmb, emb, 5).count() == 0L)
    assert(VectorOps.knnBruteForce(emb.limit(3), emptyEmb, 5).count() == 0L)
    assert(VectorOps.knnLsh(emptyEmb, emb, 5).count() == 0L)
  }

  test("sequence packing on empty input returns empty; oversize doc gets its own pack") {
    assert(SeqPacking.packDocs(emptyDocs, 64L, 4).count() == 0L)
    // one doc far above the budget must still land in exactly one pack
    val one = Seq((7L, ("tok " * 50).trim, "en", "src")).toDF(
      "doc_id", "text", "lang", "source")
    val packed = SeqPacking.packDocs(one, 8L, 4).collect()
    assert(packed.length == 1 && packed.head.getAs[Long]("pack_id") == 0L)
  }

  test("quantization handles the all-zero vector without NaN") {
    val z = Seq((1L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val r = VectorOps.quantizeInt8Stats(z).collect().head
    assert(r.getAs[Double]("q_scale") == 0.0)   // rounds to 0 at 6 dp
    assert(r.getAs[Double]("max_err") == 0.0)
    assert(!r.getAs[Double]("mse").isNaN)
    assert(VectorOps.quantizeInt8Stats(emptyEmb).count() == 0L)
  }

  test("as-of join with empty right side yields all-null as-of columns") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 10L))
      .toDF("user_id", "ts", "click_id")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts",
      Seq("click_id"), Seq("purchase_id", "purchase_value"),
      "click_id", "purchase_id").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("asof_purchase_id")))
  }

  test("kernels handle degenerate strings") {
    val df = Seq("", " ", "x").toDF("text")
    val fps = df.select(graft.functions.Kernels.fingerprintCol(col("text")))
      .collect().map(_.getLong(0))
    assert(fps(0) == 0L)           // empty
    assert(fps(1) == 32L)          // single space = codepoint 32
    assert(fps(2) == 'x'.toLong)
    val sh = df.select(graft.functions.Kernels.shinglesCol(col("text"), 3))
      .collect().map(_.getSeq[String](0))
    assert(sh.forall(_.isEmpty))   // all shorter than 3 tokens
  }

  test("IVF-PQ with empty query side returns empty") {
    val emb = Tables.embeddings(spark, sf)
    assert(graft.sim.IvfOps.knnIvfPq(emptyEmb, emb, 5).count() == 0L)
  }

  test("PQ assignment of the zero vector is deterministic and in range") {
    import graft.functions.Kernels
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") >= 5)
    val books = graft.sim.IvfOps.pqCodebooks(emb, m = 8, ksub = 16)
    val zero = Seq(Tuple1(Array.fill(64)(0.0f))).toDF("embedding")
    val codes = zero.select(
      Kernels.pqAssignCol(col("embedding"), lit(books), 8, 16))
      .head().getSeq[Int](0)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
  }

  test("compact of a single-file (or empty) dir is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nocompact_")
      .resolve("t").toString
    Tables.region(spark, sf).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val (b, a) = Bucketing.compact(spark, dir)
    assert(b == 1 && a == 1)
    val empty = java.nio.file.Files.createTempDirectory("graft_emptydir_")
      .toString
    val (b2, a2) = Bucketing.compact(spark, empty)
    assert(b2 == 0 && a2 == 0)
  }

  test("JDBC CDC apply of an empty micro-batch touches nothing") {
    // an empty trigger must not even open a connection — the URL is
    // unresolvable on purpose
    val empty = Tables.events(spark, sf).filter(lit(false)).select(
      lit("insert").as("op"), lit("t").as("table"), lit(1L).as("key"),
      col("ts"), lit(1L).as("seq"), lit("{}").as("payload"))
    graft.streaming.CdcPipeline.applyBatchJdbc(
      empty, "jdbc:derby:/nonexistent/nope", "no_table")
  }
}
