package graft.functions

import graft.SparkSpec
import graft.model.Tables
import graft.ops.CoreOps
import org.apache.spark.sql.functions._

/** Regression-pins for the kernel rewrites: the StaticInvoke kernels must
  * reproduce the expression forms they replaced, and the decimal-sum
  * pattern must be invariant under any partitioning (the claim the whole
  * oracle strategy rests on).
  */
class KernelParitySpec extends SparkSpec {

  test("shingle kernel equals the expression-form shingles on real docs") {
    val docs = Tables.documents(spark, sf).limit(100)
    val kernel = docs.select(col("doc_id"),
      Kernels.shinglesCol(col("text"), 3).as("sh"))
    // expression form: distinct 3-gram shingles via transform over tokens
    val t = TextFunctions.tokens(lower(col("text")))
    val expr = docs.select(col("doc_id"),
      when(size(t) >= 3,
        array_distinct(transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", slice(t, i + lit(1), lit(3))))))
        .otherwise(array().cast("array<string>")).as("sh"))
    val k = kernel.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val e = expr.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(k == e)
  }

  test("escapeCanonical kernel equals the two-pass regexp_replace form") {
    import spark.implicits._
    val tricky = Seq("plain", "", "a|b", "a\\b", "\\", "|", "\\|",
      "|\\", "a\\\\|b", "\\\\\\", "|||", "a\\|b\\\\c|",
      "unicodeé|café\\", "tab\t|nl\n\\")
    val df = tricky.toDF("s")
    val twoPass = regexp_replace(
      regexp_replace(col("s"), "\\\\", "\\\\\\\\"), "\\|", "\\\\|")
    val rows = df.select(col("s"),
        Kernels.escapeCanonicalCol(col("s")).as("k"), twoPass.as("r"))
      .collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"mismatch for '${r.getString(0)}': " +
        s"kernel='${r.getString(1)}' regex='${r.getString(2)}'"))
    // and on real data: the whole-table digest is unchanged by the swap
    val o = Tables.orders(spark, sf)
    val viaKernel = o.select(
      graft.sync.Validate.canonicalRow(o.columns.toSeq.map(col)).as("c"))
    val viaRegex = o.select(concat_ws("|", o.columns.toSeq.map(c =>
      coalesce(regexp_replace(regexp_replace(col(c).cast("string"),
        "\\\\", "\\\\\\\\"), "\\|", "\\\\|"), lit("\\N"))): _*).as("c"))
    assert(viaKernel.collect().map(_.getString(0)).sorted.toSeq ==
      viaRegex.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("minhash kernel equals per-seed xxhash64 minima") {
    val docs = Tables.documents(spark, sf).limit(30)
    val viaKernel = graft.sim.DedupOps
      .minhashSignatures(docs, "text", "doc_id", 3, 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    val sh = graft.sim.DedupOps.shinglePairs(docs, "text", "doc_id", 3)
    val viaExpr = sh.groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("shingle"))).as("h0"),
        min(xxhash64(lit(1), col("shingle"))).as("h1"),
        min(xxhash64(lit(2), col("shingle"))).as("h2"),
        min(xxhash64(lit(3), col("shingle"))).as("h3"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(viaKernel == viaExpr)
  }

  test("langId kernel equals the expression-form decision ladder") {
    val docs = Tables.documents(spark, sf)
    // the expression form the kernel replaced, verbatim
    val t = TextFunctions.tokens(lower(col("text")))
    def hits(words: Seq[String]) =
      size(filter(t, x => x.isInCollection(words))).cast("double")
    val all = Seq(
      "en" -> hits(Seq("the", "and", "of", "is", "to", "in", "that", "with")),
      "de" -> hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit")),
      "fr" -> hits(Seq("le", "la", "les", "et", "est", "une", "dans", "pas")),
      "es" -> hits(Seq("el", "los", "las", "es", "una", "que", "por", "como")),
      "it" -> hits(Seq("il", "gli", "di", "che", "non", "per", "sono", "della")),
      "pt" -> hits(Seq("o", "os", "um", "uma", "não", "com", "para", "mais")),
      "nl" -> hits(Seq("de", "het", "een", "van", "niet", "met", "voor", "zijn")))
    val top = greatest(all.map(_._2): _*)
    val pick = all.reverse.foldLeft(lit("unknown")) { case (acc, (name, score)) =>
      when(score === top, lit(name)).otherwise(acc)
    }
    val exprForm =
      when(length(regexp_replace(col("text"), "[^\\x{4e00}-\\x{9fff}]", "")) > 0, lit("zh"))
        .when(length(regexp_replace(col("text"), "[^\\x{0400}-\\x{04ff}]", "")) > 0, lit("ru"))
        .when(top === lit(0.0), lit("unknown"))
        .otherwise(pick)
    val mixed = docs.select(col("doc_id"), col("text"))
      .union(spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(90001L, "der hund ist nicht mit der katze"),
        org.apache.spark.sql.Row(90002L, "  le chat est dans la maison  "),
        org.apache.spark.sql.Row(90003L, "这是一个测试"),
        org.apache.spark.sql.Row(90004L, "Это тест"),
        org.apache.spark.sql.Row(90005L, ""),
        org.apache.spark.sql.Row(90006L, "zzz qqq xxx")),
        docs.select("doc_id", "text").schema))
    val k = mixed.select(col("doc_id"), TextFunctions.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val e = mixed.select(col("doc_id"), exprForm)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k == e)
  }

  test("lshKeys kernel equals the expression-form buckets (incl. probes)") {
    import graft.sim.VectorOps
    val emb = Tables.embeddings(spark, sf).limit(50)
    val (nT, nP, dim, probes) = (3, 4, 64, 2)
    val kernel = emb.select(col("vec_id"),
      Kernels.lshKeysCol(col("embedding"), nT, nP, dim, probes).as("keys"))
    val exprKeys = {
      val keys = for { t <- 0 until nT; v <- -1 until probes } yield {
        val planes = VectorOps.hyperplanes(nP, dim, seed = 42L + t)
        val base = VectorOps.lshBucket(col("embedding"), planes)
        val bucket = if (v < 0) base else base.bitwiseXOR(lit(1L << v))
        struct(lit(t).as("tbl"), bucket.as("bucket"))
      }
      array(keys: _*)
    }
    val expr = emb.select(col("vec_id"), exprKeys.as("keys"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getLong(1)))).toMap
    assert(toMap(kernel) == toMap(expr))
  }

  test("charTrigrams kernel equals the expression-form trigrams") {
    val docs = Tables.documents(spark, sf).limit(100)
      .select("doc_id", "text")
      .union(spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(91001L, "ab"),
        org.apache.spark.sql.Row(91002L, ""),
        org.apache.spark.sql.Row(91003L, "AbCd eF")),
        Tables.documents(spark, sf).select("doc_id", "text").schema))
    val kernel = docs.select(col("doc_id"),
      Kernels.charTrigramsCol(col("text")).as("tri"))
    val exprForm = docs.select(col("doc_id"), expr(
      "CASE WHEN length(text) >= 3 THEN " +
        "transform(sequence(1, length(text) - 2), i -> substr(lower(text), i, 3)) " +
        "ELSE array() END").as("tri"))
    val k = kernel.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val e = exprForm.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(k == e)
  }

  test("graft_lang_id is callable from plain SQL and matches the Column form") {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(50).createOrReplaceTempView("docs_kp")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_lang_id(text) AS l FROM docs_kp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaCol = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), TextFunctions.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaSql == viaCol)
    val err = intercept[Exception](spark.sql("SELECT graft_lang_id()").collect())
    assert(err.getMessage.contains("graft_lang_id expects 1 argument"))
  }

  test("md5_48 kernel equals the hex-fold expression form (and DuckDB's)") {
    // conv(substr(md5(s),1,12),16,10) is the same fold the generated
    // DuckDB oracle runs — parity here pins the cross-engine contract
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("text")).union(spark.sql("SELECT 'hello' AS text"))
    val both = docs.select(
      Kernels.md5_48Col(col("text")).as("k"),
      expr("CAST(conv(substr(md5(text), 1, 12), 16, 10) AS BIGINT)").as("e"))
      .collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    // known value: md5('hello') = 5d41402abc4b... → 0x5d41402abc4b
    val hello = spark.sql("SELECT 'hello' AS t")
      .select(Kernels.md5_48Col(col("t"))).head().getLong(0)
    assert(hello == 102534830799947L)
  }

  test("portable minhash kernel equals the md5-expression minima") {
    import graft.sim.PortableHash.{P, permA, permB}
    val docs = Tables.documents(spark, sf).limit(30)
    val viaKernel = graft.sim.DedupOps
      .minhashSignatures(docs, "text", "doc_id", 3, 4, portable = true)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    val sh = graft.sim.DedupOps.shinglePairs(docs, "text", "doc_id", 3)
      .withColumn("hm",
        expr("CAST(conv(substr(md5(shingle), 1, 12), 16, 10) AS BIGINT)") % P)
    val aggCols = (0 until 4).map(i =>
      min((col("hm") * permA(i) + permB(i)) % P).as(s"h$i"))
    val viaExpr = sh.groupBy("doc_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(viaKernel == viaExpr)
  }

  test("simhash48 kernel equals an independent driver-side re-implementation") {
    // edge rows exercise the oracle-parity tokenization: space-only trim,
    // empty tokens skipped, no-token text → 0
    val docs = Tables.documents(spark, sf).limit(50)
      .select("doc_id", "text")
      .union(spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(92001L, "\tfoo bar"),
        org.apache.spark.sql.Row(92002L, "   "),
        org.apache.spark.sql.Row(92003L, ""),
        org.apache.spark.sql.Row(92004L, "one\n two")),
        Tables.documents(spark, sf).select("doc_id", "text").schema))
    val got = graft.sim.DedupOps.simhash48(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    val exp = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).toLowerCase
        .dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        .split("\\s+", -1).filter(_.nonEmpty)
      val sums = new Array[Int](48)
      for (t <- toks; i <- 0 until 48)
        sums(i) += (if (((h48(t) >>> i) & 1L) == 1L) 1 else -1)
      r.getLong(0) -> (0 until 48).foldLeft(0L)((fp, i) =>
        if (sums(i) > 0) fp | (1L << i) else fp)
    }.toMap
    assert(got == exp)
    assert(got(92002L) == 0L && got(92003L) == 0L)
  }

  test("portable simhash near-dup output is exactly the hamming<=k pair set") {
    // bands(4) > maxHamming(3) ⇒ pigeonhole: the banded candidate join
    // must lose NO qualifying pair — the property the DuckDB oracle
    // (which has no band logic) relies on
    val docs = Tables.documents(spark, sf)
    val viaBands = graft.sim.DedupOps
      .simhashNearDup(docs, "text", "doc_id", maxHamming = 3, bands = 4,
        portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fp = graft.sim.DedupOps.simhash48(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, fa) <- fp; (b, fb) <- fp if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(viaBands == brute)
  }

  test("portable hash family is callable from plain SQL and matches Column forms") {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(30).createOrReplaceTempView("docs_ph")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_md5_48(text) AS h, graft_simhash48(text) AS s,
        | graft_minhash_portable(graft_shingles(text, 3), 4) AS m
        | FROM docs_ph""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    val viaCol = Tables.documents(spark, sf).limit(30)
      .select(col("doc_id"), Kernels.md5_48Col(col("text")).as("h"),
        Kernels.simhash48Col(col("text")).as("s"),
        Kernels.minhashPortableCol(Kernels.shinglesCol(col("text"), 3), 4).as("m"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(viaSql == viaCol)
  }

  test("exact decimal sums are bit-identical under any repartitioning") {
    val li = Tables.lineitem(spark, sf)
    def total(parts: Int): Double = li.repartition(parts)
      .agg(CoreOps.exactSum(col("l_extendedprice"))).head().getDouble(0)
    val results = Seq(1, 3, 7, 16).map(total).distinct
    assert(results.size == 1, s"partitioning changed the sum: $results")
    // contrast: a plain double sum is NOT guaranteed stable — the decimal
    // path is what the oracle strategy rests on (no assertion on the
    // plain form; it may or may not collide at this scale)
  }
}
