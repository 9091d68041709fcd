package graft.ops

import graft.SparkSpec

/** Hand-computed BPE merge sequences — the oracle pins cross-engine
  * identity, this pins the SEMANTICS against worked examples.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def merges(text: String, rounds: Int): Seq[(Long, String, String, String, Long)] =
    BpeTrain.train(Seq((1L, text)).toDF("doc_id", "text"), "text", rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("weighted merge order follows pair frequency with lexicographic ties") {
    // histogram: aab x2, ab x1
    // round 1: (a,a)=2, (a,b)=3 -> merge (a,b) n=3
    // round 2: ' a ab ' x2 -> (a,ab)=2 -> merge (a,ab) n=2
    assert(merges("aab aab ab", 2) == Seq(
      (1L, "a", "b", "ab", 3L),
      (2L, "a", "ab", "aab", 2L)))
  }

  test("double-pass replace merges adjacent alternating occurrences") {
    // single word 'abab': round-1 pairs (a,b)=2, (b,a)=1 -> merge (a,b);
    // ' a b a b ' needs the second replace pass to reach ' ab ab '
    // (one pass leaves ' ab a b ' — the shared-delimiter quirk)
    // round 2 then sees (ab,ab)=1
    assert(merges("abab", 2) == Seq(
      (1L, "a", "b", "ab", 2L),
      (2L, "ab", "ab", "abab", 1L)))
  }

  test("single-char words produce no pairs and training degrades gracefully") {
    // only word 'a': no adjacent pairs at all -> zero merge rows
    assert(merges("a a a", 3).isEmpty)
  }

  test("train + encode equal a direct statement of the semantics on seeded corpora") {
    // driver-side reference: same weighted pair counts, same
    // (n desc, left, right) tie-break, same double-pass non-overlapping
    // replace (java String.replace == Spark/DuckDB replace semantics)
    def refTrain(words: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
      var seqs = words.groupBy(identity).toSeq.map { case (w, ws) =>
        (w.toSeq.mkString(" ", " ", " "), ws.size.toLong)
      }
      var out = Seq.empty[(String, String, Long)]
      for (_ <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        seqs.foreach { case (s, c) =>
          val a = s.trim.split(" ").toSeq
          a.zip(a.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.nonEmpty) {
          val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
          out = out :+ ((l, r, n))
          val (pat, rep) = (s" $l $r ", s" $l$r ")
          seqs = seqs.map { case (s, c) =>
            (s.replace(pat, rep).replace(pat, rep), c) }
        }
      }
      out
    }
    def refEncode(w: String, ms: Seq[(String, String, Long)]): Long = {
      var s = w.toSeq.mkString(" ", " ", " ")
      ms.foreach { case (l, r, _) =>
        val (pat, rep) = (s" $l $r ", s" $l$r ")
        s = s.replace(pat, rep).replace(pat, rep)
      }
      s.trim.split(" ").length.toLong
    }
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 8) {
      val alphabet = "abc"
      def word() = Seq.fill(1 + rng.nextInt(5))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      val docs = (1L to 4L).map(id =>
        (id, Seq.fill(1 + rng.nextInt(6))(word()).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val allWords = docs.flatMap(_._2.split(" "))
      val expectedMerges = refTrain(allWords, 3)
      val merges = BpeTrain.train(df, "text", 3)
      assert(merges.collect().map(r =>
        (r.getString(1), r.getString(2), r.getLong(4))).toSeq == expectedMerges)
      val got = BpeTrain.encodeStats(df, "text", merges, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val expected = docs.map { case (id, text) =>
        val ws = text.split(" ").toSeq
        (id, ws.size.toLong, ws.map(refEncode(_, expectedMerges)).sum)
      }
      assert(got == expected)
    }
  }

  test("a held, unconsumed merge table survives training on a second corpus") {
    // per-invocation scratch dirs: train() returns a lazy plan over the
    // staged word histogram, so training on corpus B (same column name)
    // must not overwrite the histogram underneath corpus A's result
    val a = BpeTrain.train(Seq((1L, "aab aab ab")).toDF("doc_id", "text"),
      "text", 1)                            // NOT collected yet
    val b = BpeTrain.train(Seq((1L, "xyz xyz")).toDF("doc_id", "text"),
      "text", 1)
    assert(b.collect().map(_.getString(3)).toSeq == Seq("xy"))
    assert(a.collect().map(_.getString(3)).toSeq == Seq("ab"),
      "first merge table must still reflect the FIRST corpus")
  }

  test("encode skips rounds the corpus never earned instead of emptying out") {
    // 'ab' yields exactly ONE merge; asking encode for 3 rounds must
    // apply that one and ignore the rest — not annihilate the corpus
    val docs = Seq((1L, "ab ab"), (2L, "cd")).toDF("doc_id", "text")
    val m = BpeTrain.train(docs, "text", 1) // (a,b) n=2
    val got = BpeTrain.encodeStats(docs, "text", m, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: 2 words, each 'ab' = 1 symbol after the merge
    // doc 2: 1 word 'cd' = 2 symbols (no merge learned for it)
    assert(got == Seq((1L, 2L, 2L), (2L, 1L, 2L)))
  }
}
