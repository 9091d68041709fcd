package graft.sim

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Approximate operators tested against their exact counterparts on the
  * sf0.001 fixtures (SURVEY §5.2): MinHash-LSH recall vs exact Jaccard,
  * sign-LSH KNN recall vs brute force, SimHash behavior on near-dups.
  */
class SimSpec extends SparkSpec {
  import spark.implicits._

  test("minhash-LSH + exact-verify finds every high-jaccard pair (recall=1 here)") {
    val docs = Tables.documents(spark, sf)
    val exact = DedupOps.jaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = DedupOps.nearDupPairs(docs, "text", "doc_id", 3, 32, 8, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs at j>=0.5")
    // approx ⊆ exact always (verify stage recomputes exact jaccard)
    assert(approx.subsetOf(exact))
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (found ${approx.size}/${exact.size})")
  }

  test("registered two-stage form (portable, k=16): exact-verified candidates") {
    // pins the x_neardup_twostage query's semantics: its pairs are
    // exactly the exact-Jaccard-qualifying pairs that survive the band
    // join — a subset of the all-pairs exact result with full precision
    // (the verify stage recomputes true jaccard), and on this fixture
    // the 8 two-row bands lose none of the seeded high-jaccard dups
    val docs = Tables.documents(spark, sf)
    val exact = DedupOps.jaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = DedupOps.nearDupPairs(docs, "text", "doc_id", 3, 16, 8, 0.5,
      portable = true)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(two.subsetOf(exact), "two-stage pairs must verify exactly")
    assert(two == exact,
      s"banding dropped ${exact.size - two.size} of ${exact.size} " +
        "fixture pairs — recall regression on the seeded dups")
  }

  test("prefix-filtered jaccard join equals the full inverted index, with fewer candidates") {
    val docs = Tables.documents(spark, sf)
    val full = DedupOps.jaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val pref = DedupOps.prefixJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(full.nonEmpty, "fixture should contain pairs at j>=0.5")
    assert(pref == full,
      "prefix filtering is EXACT: it must produce the identical pair set " +
        s"(missing ${(full -- pref).size}, extra ${(pref -- full).size})")
    // cluster stance: an EXPLICIT shared-FS workDir carries the staged
    // token table (file:-scheme URI forces the Hadoop FS path — a
    // java.io path would not resolve it); results identical
    val wd = java.nio.file.Files.createTempDirectory("prefix_wd_").toString
    val viaWorkDir = DedupOps.prefixJaccardPairs(docs, "text", "doc_id",
        3, 0.5, workDir = Some(s"file:$wd"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(viaWorkDir == full, "explicit workDir must not change results")
    assert(new java.io.File(wd).listFiles().nonEmpty,
      "the staged token table must land under the passed workDir")
    // the scale claim: the prefix index generates strictly fewer
    // shared-token candidate pairs than the full inverted index
    def candCount(index: org.apache.spark.sql.DataFrame): Long =
      index.select(col("doc_id").as("a_id"), col("shingle"))
        .join(index.select(col("doc_id").as("b_id"), col("shingle")), "shingle")
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct().count()
    val fullIdx = DedupOps.shinglePairs(docs, "text", "doc_id", 3)
    val t = 0.5
    val pairs = DedupOps.shingleArrays(docs, "text", "doc_id", 3)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dfreq = pairs.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
    val prefIdx = pairs.join(dfreq, "shingle")
      .withColumn("sz", count(lit(1)).over(w.partitionBy(col("doc_id"))))
      .withColumn("rn", row_number().over(
        w.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * t) + 1)
      .select("doc_id", "shingle")
    val (fullCands, prefCands) = (candCount(fullIdx), candCount(prefIdx))
    assert(prefCands < fullCands,
      s"prefix index should cut candidates: $prefCands vs $fullCands")
    info(s"candidate pairs: full=$fullCands prefix=$prefCands " +
      f"(${prefCands.toDouble / fullCands}%.3f of full)")
  }

  test("identical texts collide on every minhash component") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val sig = DedupOps.minhashSignatures(df, "text", "doc_id", 3, 8).collect()
      .map(r => r.getLong(0) -> (1 until 9).map(r.getLong)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("simhash: identical docs equal; near-dups within small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "completely unrelated legal boilerplate concerning maritime insurance claims")
    ).toDF("doc_id", "text")
    val fp = DedupOps.simhash64(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) <= 12)
    assert(ham(fp(1L), fp(3L)) > ham(fp(1L), fp(2L)))
  }

  test("connected components labels every node with its cluster minimum") {
    val pairs = Seq((2L, 5L), (5L, 9L), (11L, 12L)).toDF("a_id", "b_id")
    val got = DedupOps.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 11L -> 11L, 12L -> 11L))
  }

  test("simhash-banded near-dup finds the high-jaccard pairs") {
    val docs = Tables.documents(spark, sf)
    val jacc = DedupOps.jaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = DedupOps.simhashNearDup(docs, "text", "doc_id",
      maxHamming = 10, bands = 8)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacc.nonEmpty)
    val overlap = (jacc intersect sim).size.toDouble / jacc.size
    assert(overlap >= 0.7,
      s"simhash should find most jaccard near-dups, got $overlap")
  }

  test("edit-distance near-dup equals the brute-force band-free predicate") {
    val docs = Tables.documents(spark, sf)
    // brute force: every pair, hamming + prefix-levenshtein predicate —
    // the band candidates must reproduce it exactly (pigeonhole: any
    // pair at hamming<=3 shares one of 4 bands)
    val fp = DedupOps.simhash48(docs, "text", "doc_id")
      .join(docs.select(col("doc_id"),
        substring(col("text"), 1, 96).as("p")), "doc_id")
    val a = fp.select(col("doc_id").as("a_id"), col("simhash").as("af"),
      col("p").as("ap"))
    val b = fp.select(col("doc_id").as("b_id"), col("simhash").as("bf"),
      col("p").as("bp"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter(bit_count(col("af").bitwiseXOR(col("bf"))) <= 3)
      .filter(levenshtein(col("ap"), col("bp")) <= 48)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = DedupOps.editDistanceNearDup(docs, "text", "doc_id",
      maxHamming = 3, bands = 4, prefixLen = 96, maxEdit = 48)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain edit-distance near-dups")
    assert(banded == brute)
  }

  test("LSH-bucketed embedding near-dup equals the exact form, with no cartesian plan") {
    val emb = Tables.embeddings(spark, sf)
    val exact = VectorOps.cosineDupPairs(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = VectorOps.cosineDupPairsLsh(emb, 0.4)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs at cos>=0.4")
    assert(got == exact, s"LSH near-dup must equal exact pairs " +
      s"(missing ${(exact -- got).take(3)}, extra ${(got -- exact).take(3)})")
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join, not an all-pairs join")
  }

  test("query-directed probing: full-probe parity with blind, and >= blind recall at equal cost") {
    import graft.functions.Kernels
    val emb = Tables.embeddings(spark, sf)
    // flipping ALL bits makes directed and blind reach the same buckets —
    // the probe ORDER differs but the key SET per row must be identical
    val both = emb.select(
      Kernels.lshKeysCol(col("embedding"), 8, 4, 64, 4).as("blind"),
      Kernels.lshKeysDirectedCol(col("embedding"), 8, 4, 64, 4).as("dir"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Any](0).toSet == r.getSeq[Any](1).toSet,
        "directed probes=planes must reach the same key set as blind")
    }
    // directed probing raises recall in EXPECTATION, not pointwise (a
    // blind flip can luckily catch a pair whose differing bit isn't a
    // min-margin bit of either endpoint) — so pin a high absolute floor
    // rather than per-fixture dominance
    val exact = VectorOps.cosineDupPairs(emb, 0.4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = VectorOps.cosineDupPairsLsh(emb, 0.4, probes = 2, directed = true)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dir.subsetOf(exact), "verify stage must keep output exact")
    val recall = dir.size.toDouble / exact.size
    assert(recall >= 0.9,
      s"directed probes=2 recall $recall below 0.9 (${dir.size}/${exact.size})")
  }

  test("multi-probe LSH KNN is bit-identical to brute force, with no cartesian plan") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = VectorOps.knnBruteForce(q, c, 10).collect().toSeq
    val lsh = VectorOps.knnLsh(q, c, 10, multiProbe = 4)
    assert(lsh.collect().toSeq == brute,
      "multiProbe=4 candidate recall must cover the full top-10 set")
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay a bucketed equi-join")
  }

  test("int8 quantization: positive scale, error bounded by half a step") {
    val emb = Tables.embeddings(spark, sf)
    val stats = VectorOps.quantizeInt8Stats(emb).collect()
    assert(stats.length == emb.count())
    stats.foreach { r =>
      val scale = r.getAs[Double]("q_scale")
      val maxErr = r.getAs[Double]("max_err")
      assert(scale > 0.0)
      // both sides are rounded to 6 dp, so allow one ulp of that grid
      assert(maxErr <= scale * 0.5 + 1e-6,
        s"dequant error $maxErr exceeds half step of scale $scale")
    }
  }

  test("cosine on known vectors") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 1f), Array(1f, 1f)))
      .toDF("a", "b")
    val got = df.select(round(VectorOps.cosine(col("a"), col("b")), 6)).collect()
      .map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(got(1) == 1.0)
  }

  test("IVF KNN recalls most brute-force neighbors and is a subset-scored exact rank") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val exact = VectorOps.knnBruteForce(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfOps.knnIvf(q, c, 10, c = 16, nprobe = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall below 0.5")
  }

  test("hash-sampled centroids: partitioning-independent, corpus-spread, working") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    // deterministic under any physical layout — the scale contract
    val a = IvfOps.hashSampleCentroids(c, 16)
    val b = IvfOps.hashSampleCentroids(c.repartition(7), 16)
    assert(a.sameElements(b),
      "hash sample must not depend on partitioning")
    // and an actual sample of the corpus, not its ingestion-order head
    val head = IvfOps.centroids(c, 16)
    assert(!a.sameElements(head),
      "hash sample should differ from the first-c-by-id head seed")
    // the swapped-in seed drives the same index end to end
    val exact = VectorOps.knnBruteForce(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfOps.knnIvf(q, c, 10, c = 16, nprobe = 6,
      centroidsFlat = Some(a))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall with hash-sampled seed $recall below 0.5")
  }

  test("IVF-PQ recalls brute-force neighbors through the compressed index") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val exact = VectorOps.knnBruteForce(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // generous probe/rerank at the tiny fixture: the recall dial works
    // exactly like IVF's nprobe + a rerank depth; the floor guards the
    // pipeline (assignment → ADC → rerank) against silent regressions
    val approx = IvfOps.knnIvfPq(q, c, 10, c = 16, nprobe = 12,
      m = 8, ksub = 16, rerank = 100)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall below 0.5")
    // the ADC survivors are re-ranked EXACTLY, so every reported
    // neighbor's sim equals the brute-force cosine (subset-exactness)
    val bruteSims = VectorOps.knnBruteForce(q, c, 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    IvfOps.knnIvfPq(q, c, 10, c = 16, nprobe = 12, m = 8, ksub = 16,
      rerank = 100).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteSims.get(key).contains(r.getDouble(2)),
        s"IVF-PQ sim for $key diverges from the exact cosine")
    }
  }

  test("k-means-refined PQ codebooks keep (or improve) IVF-PQ recall") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val exact = VectorOps.knnBruteForce(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallWith(books: Option[Array[Double]]): Double = {
      val approx = IvfOps.knnIvfPq(q, c, 10, c = 16, nprobe = 12,
        m = 8, ksub = 16, rerank = 100, codebooksFlat = books)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val refined = IvfOps.pqKmeansCodebooks(c, m = 8, ksub = 16, iters = 3)
    assert(refined.length == 8 * 16 * 8)
    val sampled = recallWith(None)
    val kmeans = recallWith(Some(refined))
    // Lloyd refinement tightens quantization error; on the fixture that
    // must not LOSE recall (and in practice gains it) — pin no-regression
    // plus the same absolute floor as the sampled-codebook test
    assert(kmeans >= sampled - 0.04,
      s"refined codebooks lost recall: $kmeans vs sampled $sampled")
    assert(kmeans >= 0.5, s"refined IVF-PQ recall $kmeans below 0.5")
  }

  test("k-means-refined IVF centroids keep (or improve) recall") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val exact = VectorOps.knnBruteForce(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = IvfOps.kmeansCentroids(c, c = 16, iters = 3)
    assert(cents.length == 16 * 64)
    val approx = IvfOps.knnIvf(q, c, 10, c = 16, nprobe = 6,
      centroidsFlat = Some(cents))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"k-means IVF recall $recall below 0.5")
  }

  test("sign-LSH KNN recalls most brute-force neighbors") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val exact = VectorOps.knnBruteForce(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.knnLsh(q, c, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH KNN recall $recall below 0.5")
    // multi-probe must not lose candidates (supersets only) and should
    // recover at least as many true neighbors
    val probed = VectorOps.knnLsh(q, c, 10, multiProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probedRecall = (exact intersect probed).size.toDouble / exact.size
    assert(probedRecall >= recall,
      s"multi-probe recall $probedRecall below base $recall")
  }

  test("capped containment scores use the pruned-universe denominator") {
    // doc 1 has 4 shingles; "common header line" (df=3 across docs) is
    // pruned under cap=2, and doc 2 shares doc 1's remaining 3 — so the
    // 1→2 score must be counted AND sized over the pruned universe:
    // inter=3, |sh(1)|_pruned=3 → containment 1.0. Dividing by the full
    // |sh(1)|=4 (the pre-fix bug) would read 0.75.
    val docs = Seq(
      (1L, "common header line uniq1 uniq1b uniq1c"),
      (2L, "common header line uniq1 uniq1b uniq1c trailer two"),
      (3L, "common header line other stuff entirely")).toDF("doc_id", "text")
    // 3-shingles: "common header line" appears in all 3 docs (df=3)
    val capped = DedupOps.containmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.6, maxShingleDf = Some(2))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.contains((1L, 2L)),
      s"1→2 must survive the cap with a pruned-universe score: $capped")
    assert(capped((1L, 2L)) === 1.0,
      "numerator and denominator must share the pruned shingle universe")
    // 1→3 overlaps ONLY on the pruned boilerplate → no pair under cap
    assert(!capped.contains((1L, 3L)))
  }

  test("portable permutation constants are distinct, nonzero, in range") {
    import PortableHash._
    val k = 64
    val as = (0 until k).map(permA)
    val bs = (0 until k).map(permB)
    assert(as.forall(a => a > 0 && a < P), "multipliers must be in (0, P)")
    assert(bs.forall(b => b >= 0 && b < P), "offsets must be in [0, P)")
    assert(as.distinct.size == k, "multipliers must be pairwise distinct")
    assert(bs.distinct.size == k, "offsets must be pairwise distinct")
    // products with any h < P stay inside a signed 64-bit long
    assert(as.max <= (Long.MaxValue - P) / (P - 1),
      "permutation product may overflow a signed long")
  }
  test("O(n^2) oracle twins refuse oversized inputs, naming the scale path") {
    import org.apache.spark.sql.functions._
    val vecs = spark.range(10001L).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(2.0f)).as("embedding"))
    val e1 = intercept[IllegalStateException](
      VectorOps.cosineDupPairs(vecs, 0.5))
    assert(e1.getMessage.contains("x_dedup_embedding_lsh"))
    val e2 = intercept[IllegalStateException](
      VectorOps.knnBruteForce(vecs.limit(3), vecs, 5))
    assert(e2.getMessage.contains("x_knn_ivf"))
    val docs = spark.range(20001L).select(col("id").as("doc_id"),
      concat(lit("w"), col("id")).as("text"))
    val e3 = intercept[IllegalStateException](
      DedupOps.containmentPairs(docs, "text", "doc_id"))
    assert(e3.getMessage.contains("x_containment_capped"))
    // the CAPPED production form takes any size (lazy — no refusal)
    DedupOps.containmentPairs(docs, "text", "doc_id",
      maxShingleDf = Some(2))
    ()
  }
}
