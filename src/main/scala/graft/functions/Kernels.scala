package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot scalar kernels as JVM statics invoked through Catalyst's
  * `StaticInvoke` — a direct (codegen'd) method call per row, replacing
  * interpreted higher-order array expressions (`aggregate`/`zip_with`
  * folds) on the BENCH-hot paths. Semantics are bit-identical to the
  * expression versions they replace (same double-precision operation
  * order), so the DuckDB oracles keep matching.
  */
object Kernels {

  /** Polynomial rolling hash over Unicode code points:
    * h := (h*131 + codePoint) mod 1e9+7 — the [[TextFunctions.fingerprint]]
    * fold (matches `ascii(substr(text,i,1))` per-character semantics).
    */
  def rollingFingerprint(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Count of sorted upper bounds strictly below `xd` — the range
    * layout's bucket index ([[graft.streaming.CdcProfileRanged]]
    * assignment), as a binary search: O(log boundaries) per row where
    * the expression twin (`size(filter(ubs, _ < xd))`) scans all of
    * them, so boundary growth from repeated splits cannot turn
    * assignment linear. Semantics match Spark's `<` on doubles
    * exactly, including `b < NaN` = true (NaN largest): a NaN value
    * returns the full length and lands in the unbounded top bucket.
    * The bounds array is a plan-time literal of finite doubles
    * (seed/split/reseed all filter non-finite cuts).
    */
  def rangeBucketIdx(ubs: ArrayData, xd: Double): Int = {
    val n = ubs.numElements()
    if (java.lang.Double.isNaN(xd)) return n
    var lo = 0
    var hi = n // invariant: ubs(i) < xd for all i < lo; ubs(i) >= xd for all i >= hi
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ubs.getDouble(mid) < xd) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Dot product of two float arrays, accumulated left-to-right in
    * double (same op order as the `zip_with`+`aggregate` fold).
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Dot product of a float array with a double array (LSH planes). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** L2 norm of a float array (double accumulation, sequential). */
  def normF(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** One-pass 64-bit SimHash: lowercase (UTF8String semantics, matching
    * Spark's `lower`), whitespace-tokenize, xxhash64 each token with
    * Spark's seed (42), ±1 bit votes, pack sign bits.
    */
  def simhash64(s: UTF8String): Long = {
    val lowered = s.toLowerCase.trimAll().toString
    if (lowered.isEmpty) return 0L
    val sums = new Array[Int](64)
    for (tok <- lowered.split("\\s+") if tok.nonEmpty) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(tok), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** Distinct word n-gram shingles of lowercased text, in first-occurrence
    * order. Tokenization mirrors the expression pipeline it replaces —
    * `split(trim(lower(text)), "\\s+")` with Spark semantics (lowercase
    * via UTF8String, space-only trim, regex split keeping boundary
    * empties) — so the DuckDB Jaccard oracle keeps matching. Docs shorter
    * than `n` tokens yield an empty array.
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val lowered = s.toLowerCase.toString
    var lo = 0
    var hi = lowered.length
    while (lo < hi && lowered.charAt(lo) == ' ') lo += 1
    while (hi > lo && lowered.charAt(hi - 1) == ' ') hi -= 1
    val toks = lowered.substring(lo, hi).split("\\s+", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass MinHash signature over a (distinct) shingle array: for each
    * of `k` hash functions, the min of xxhash64(seed_i, shingle) across
    * the array — seed chain identical to Spark's `xxhash64(lit(i), s)`
    * (seed 42 folded through the int, then the string). One kernel call
    * per row replaces k interpreted `transform` folds.
    */
  def minhashSig(sh: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      val s = sh.getUTF8String(j)
      i = 0
      while (i < k) {
        val h = XXH64.hashUTF8String(s, seeds(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 48-bit hash: the first 6 bytes of MD5(utf8 bytes), read
    * big-endian — numerically equal to folding the first 12 hex chars of
    * `md5(s)`, which any engine with an md5() string function (DuckDB,
    * MySQL, Postgres, Spark itself) reproduces exactly. Always ≥ 0.
    */
  def md5_48(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h
  }

  /** Morton (Z-order) interleave of the low 21 bits of two non-negative
    * keys: bit i of `a` lands at position 2i, bit i of `b` at 2i+1 —
    * a 42-bit space-filling-curve value. Sorting a table by this value
    * clusters rows that are close in BOTH dimensions into the same
    * parquet row groups, so min/max footer stats prune two-column range
    * predicates (the standard lakehouse Z-ORDER layout; neither linear
    * sort key can serve both dimensions). Keys wider than 21 bits keep
    * their low 21 (locality, not identity — fine for a sort key).
    */
  def morton2(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Inverse of [[morton2]]: (a, b) packed as (a & 0x1FFFFF) | (b << 21)
    * — test/verification helper for the round-trip property.
    */
  def morton2Inverse(z: Long): Long = {
    var a = 0L
    var b = 0L
    var i = 0
    while (i < 21) {
      a |= ((z >>> (2 * i)) & 1L) << i
      b |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    a | (b << 21)
  }

  /** Portable MinHash signature: h_i = min over shingles of
    * (permA(i) * (md5_48(sh) mod P) + permB(i)) mod P, with the
    * constants from [[graft.sim.PortableHash]] — the same arithmetic the
    * generated DuckDB oracle runs, so signatures hash-match across
    * engines. Same one-kernel-call-per-row shape as [[minhashSig]].
    */
  def minhashSigPortable(sh: ArrayData, k: Int): ArrayData = {
    import graft.sim.PortableHash.{P, permA, permB}
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) { as(i) = permA(i); bs(i) = permB(i); i += 1 }
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      val hm = md5_48(sh.getUTF8String(j)) % P
      i = 0
      while (i < k) {
        val h = (as(i) * hm + bs(i)) % P
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Portable 48-bit SimHash: same vote/pack pass as [[simhash64]] but
    * over [[md5_48]] token hashes, so the fingerprint is reproducible by
    * the generated DuckDB oracle. Tokenization follows the oracle-parity
    * convention of the [[shingles]]/[[langId]] kernels — space-only
    * trim, regex split, empty tokens skipped (the oracle filters them
    * out too). No-token text → 0.
    */
  def simhash48(s: UTF8String): Long = {
    val bits = graft.sim.PortableHash.SimhashBits
    val lowered = s.toLowerCase.toString
    var lo = 0
    var hi = lowered.length
    while (lo < hi && lowered.charAt(lo) == ' ') lo += 1
    while (hi > lo && lowered.charAt(hi - 1) == ' ') hi -= 1
    val sums = new Array[Int](bits)
    for (tok <- lowered.substring(lo, hi).split("\\s+", -1) if tok.nonEmpty) {
      val h = md5_48(UTF8String.fromString(tok))
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (sums(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** Fraction of equal components between two equal-length signature
    * arrays — the MinHash estimator of Jaccard similarity (each
    * component matches with probability J(A,B)). Empty → 0.
    */
  def sigEqFrac(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  private val LangMarkers: Array[(String, java.util.HashSet[String])] = {
    def set(ws: String*): java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }
    Array(
      "en" -> set("the", "and", "of", "is", "to", "in", "that", "with"),
      "de" -> set("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
      "fr" -> set("le", "la", "les", "et", "est", "une", "dans", "pas"),
      "es" -> set("el", "los", "las", "es", "una", "que", "por", "como"),
      "it" -> set("il", "gli", "di", "che", "non", "per", "sono", "della"),
      "pt" -> set("o", "os", "um", "uma", "não", "com", "para", "mais"),
      "nl" -> set("de", "het", "een", "van", "niet", "met", "voor", "zijn"))
  }

  private val LangZh = UTF8String.fromString("zh")
  private val LangRu = UTF8String.fromString("ru")
  private val LangUnknown = UTF8String.fromString("unknown")
  private val LangCodes: Array[UTF8String] =
    LangMarkers.map(m => UTF8String.fromString(m._1))

  /** Unicode NFC normalization (JDK `java.text.Normalizer`) — corpus
    * canonicalization BEFORE any hash/dedup/tokenize step: composed vs
    * decomposed sequences (é as U+00E9 vs e+U+0301) are byte-different
    * but render identically, so an un-normalized corpus under-dedups
    * and splits token statistics. The NFC tables are Unicode-standard,
    * which makes the output engine-portable (DuckDB `nfc_normalize`
    * yields the identical string, hence identical downstream md5-48
    * fingerprints). The fast path is free: `Normalizer.isNormalized`
    * is a cheap scan that short-circuits the (dominant) already-NFC
    * case without allocating.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Apply a DEFERRED MySQL JSON diff vector (the binlog decoder's
    * `{"__jsondiff":"<base64>"}` surface under
    * `binlog_row_image=MINIMAL` × `PARTIAL_JSON`, where the log carries
    * no before image to patch) onto the consumer's tracked latest
    * document. Empty vector = unchanged. Decode/apply semantics are
    * exactly [[graft.streaming.MysqlJsonDiff]]'s strict wire path — a
    * malformed vector or an inapplicable path throws rather than
    * fabricating a document.
    */
  def applyJsonDiffB64(before: UTF8String, b64: UTF8String): UTF8String = {
    val raw = java.util.Base64.getDecoder.decode(b64.toString)
    if (raw.isEmpty) before
    else UTF8String.fromString(
      graft.streaming.MysqlJsonBinary.render(
        graft.streaming.MysqlJsonDiff.apply(
          graft.streaming.MysqlJsonBinary.parseText(before.toString),
          graft.streaming.MysqlJsonDiff.decode(raw))))
  }

  /** One-pass language ID — identical decision ladder to the expression
    * form it replaces ([[TextFunctions.langId]]'s documented semantics,
    * mirrored by the x_lang_id DuckDB oracle): CJK char → zh, Cyrillic →
    * ru, else the first of en/de/fr/es/it/pt/nl (in that priority order)
    * whose marker-word hit count equals the maximum; all-zero hits →
    * unknown. Replaces 7 interpreted higher-order `filter` lambdas (7
    * token-array scans) with one tokenize + one hash probe per token.
    */
  def langId(s: UTF8String): UTF8String = {
    val text = s.toString
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return LangZh
      i += 1
    }
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x0400 && c <= 0x04ff) return LangRu
      i += 1
    }
    // tokens = split(trim(lower(text)), "\s+"), Spark semantics (space-
    // only trim, lowercase via UTF8String) — same as the shingles kernel
    val lowered = s.toLowerCase.toString
    var lo = 0
    var hi = lowered.length
    while (lo < hi && lowered.charAt(lo) == ' ') lo += 1
    while (hi > lo && lowered.charAt(hi - 1) == ' ') hi -= 1
    val toks = lowered.substring(lo, hi).split("\\s+", -1)
    val counts = new Array[Int](LangMarkers.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < LangMarkers.length) {
        if (LangMarkers(l)._2.contains(toks(t))) counts(l) += 1
        l += 1
      }
      t += 1
    }
    var top = 0
    var l = 0
    while (l < counts.length) { if (counts(l) > top) top = counts(l); l += 1 }
    if (top == 0) return LangUnknown
    l = 0
    while (counts(l) != top) l += 1
    LangCodes(l)
  }

  /** All character trigrams of lowercased text (with repeats, in order) —
    * the kernel form of `transform(sequence(1, length-2),
    * i -> substr(lower(text), i, 3))`, which is interpreted per row.
    * Code-unit based like the expression for BMP text (the fixtures are
    * ASCII); docs under 3 chars yield an empty array.
    */
  def charTrigrams(s: UTF8String): ArrayData = {
    val lowered = s.toLowerCase.toString
    val n = lowered.length
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.fromString(lowered.substring(i, i + 3))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  /** Seeded gaussian hyperplanes, identical draw order to
    * `VectorOps.hyperplanes` (same `scala.util.Random(seed)` sequence),
    * cached per (seed, planes, dim).
    */
  private def planesFor(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] =
    planesCache.computeIfAbsent((seed, nPlanes, dim), k => {
      val rng = new scala.util.Random(k._1)
      Array.fill(k._2)(Array.fill(k._3)(rng.nextGaussian()))
    })

  /** Multi-table sign-LSH keys in one call: for table t (seed 42+t),
    * bucket bit p = sign(emb · plane_p); besides the base bucket, emit
    * the buckets reached by flipping each of the first `probes` bits
    * (`probes = 0` → base keys only). Output rows are (tbl, bucket)
    * structs in the same (table-major, base-then-flips) order as the
    * expression form it replaces — whose literal plane arrays grew past
    * the JVM method-size limit and knocked the whole stage out of
    * codegen; one static call keeps the stage compiled.
    */
  def lshKeys(emb: ArrayData, nTables: Int, planesPerTable: Int,
              dim: Int, probes: Int): ArrayData = {
    val out = new Array[Any](nTables * (probes + 1))
    var idx = 0
    var t = 0
    while (t < nTables) {
      val planes = planesFor(42L + t, planesPerTable, dim)
      var base = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = planes(p)
        val n = math.min(emb.numElements(), plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += emb.getFloat(i).toDouble * plane(i); i += 1 }
        if (acc > 0) base |= (1L << p)
        p += 1
      }
      var v = -1
      while (v < probes) {
        val bucket = if (v < 0) base else base ^ (1L << v)
        out(idx) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](t, bucket))
        idx += 1
        v += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Query-directed multi-probe sign-LSH keys: same output contract as
    * [[lshKeys]], but instead of flipping the FIRST `probes` bits, each
    * table flips the `probes` bits with the smallest margin
    * `|emb · plane|` — the hyperplanes the vector sits closest to, which
    * are exactly the bits most likely to differ between two genuinely
    * similar vectors. Directed probing reaches the recall of blind
    * probing with fewer probe keys, shrinking the candidate join's
    * fan-out (probes+1 keys per row per table).
    */
  def lshKeysDirected(emb: ArrayData, nTables: Int, planesPerTable: Int,
                      dim: Int, probes: Int): ArrayData = {
    // only planesPerTable distinct single-bit flips exist — clamp, don't
    // walk the margin-selection loop past the last untaken plane
    val nProbes = math.min(probes, planesPerTable)
    val out = new Array[Any](nTables * (nProbes + 1))
    var idx = 0
    var t = 0
    while (t < nTables) {
      val planes = planesFor(42L + t, planesPerTable, dim)
      val margins = new Array[Double](planesPerTable)
      var base = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = planes(p)
        val n = math.min(emb.numElements(), plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += emb.getFloat(i).toDouble * plane(i); i += 1 }
        if (acc > 0) base |= (1L << p)
        margins(p) = math.abs(acc)
        p += 1
      }
      out(idx) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](t, base))
      idx += 1
      val taken = new Array[Boolean](planesPerTable)
      var v = 0
      while (v < nProbes) {
        var best = -1
        var bestMargin = Double.MaxValue
        var q = 0
        while (q < planesPerTable) {
          if (!taken(q) && margins(q) < bestMargin) { best = q; bestMargin = margins(q) }
          q += 1
        }
        taken(best) = true
        out(idx) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](t, base ^ (1L << best)))
        idx += 1
        v += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** IVF probe: cosine of a float embedding against `c` centroids (flat
    * row-major double array), returning the indices of the `nprobe`
    * nearest centroids, best first. Selection sort over c entries —
    * c is small by construction.
    */
  def ivfProbe(emb: ArrayData, centroidsFlat: ArrayData, c: Int, nprobe: Int): ArrayData = {
    val dim = emb.numElements()
    var embNorm = 0.0
    var i = 0
    while (i < dim) {
      val x = emb.getFloat(i).toDouble
      embNorm += x * x
      i += 1
    }
    embNorm = math.sqrt(embNorm)
    val sims = new Array[Double](c)
    var ci = 0
    while (ci < c) {
      var dot = 0.0
      var norm = 0.0
      i = 0
      while (i < dim) {
        val y = centroidsFlat.getDouble(ci * dim + i)
        dot += emb.getFloat(i).toDouble * y
        norm += y * y
        i += 1
      }
      sims(ci) = if (norm == 0.0 || embNorm == 0.0) -2.0
        else dot / (embNorm * math.sqrt(norm))
      ci += 1
    }
    val n = math.min(nprobe, c)
    val out = new Array[Any](n)
    val taken = new Array[Boolean](c)
    var r = 0
    while (r < n) {
      var best = -1
      var bestSim = -3.0
      ci = 0
      while (ci < c) {
        if (!taken(ci) && sims(ci) > bestSim) { best = ci; bestSim = sims(ci) }
        ci += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Product-quantization code assignment: split `emb` (dim) into `m`
    * subvectors of dim/m, assign each to its nearest (squared-L2, first
    * minimum wins — deterministic) codebook centroid. `codebooksFlat`
    * layout: centroid j of subvector s occupies
    * [((s*ksub)+j)*dsub, +dsub). Returns the m int codes — the
    * compressed representation (m bytes at ksub≤256) that replaces
    * dim floats in the scan at 100 TB.
    */
  def pqAssign(emb: ArrayData, codebooksFlat: ArrayData,
               m: Int, ksub: Int): ArrayData = {
    val dim = emb.numElements()
    val dsub = dim / m
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var dist = 0.0
        var t = 0
        val base = ((s * ksub) + j) * dsub
        while (t < dsub) {
          val diff = emb.getFloat(s * dsub + t).toDouble -
            codebooksFlat.getDouble(base + t)
          dist += diff * diff
          t += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-query ADC distance table: squared L2 between each query
    * subvector and each codebook centroid — m×ksub doubles computed
    * ONCE per query, so scoring a candidate is m table lookups instead
    * of a dim-length pass. Layout matches [[pqAssign]]: entry for
    * (subvector s, centroid j) at s*ksub + j.
    */
  def pqTable(emb: ArrayData, codebooksFlat: ArrayData,
              m: Int, ksub: Int): ArrayData = {
    val dim = emb.numElements()
    val dsub = dim / m
    val out = new Array[Any](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        var dist = 0.0
        var t = 0
        val base = ((s * ksub) + j) * dsub
        while (t < dsub) {
          val diff = emb.getFloat(s * dsub + t).toDouble -
            codebooksFlat.getDouble(base + t)
          dist += diff * diff
          t += 1
        }
        out(s * ksub + j) = dist
        j += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC score: approximate squared-L2 distance between the query
    * behind `qtable` and the candidate behind `codes` — m lookups.
    */
  def pqAdc(codes: ArrayData, qtable: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += qtable.getDouble(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** Canonical-field escaping in ONE byte scan: `\` → `\\`, `|` → `\|`
    * — bit-identical to the two-pass
    * `regexp_replace(regexp_replace(s, \\, \\\\), \|, \\|)` it replaces
    * on every digest/reconcile row (backslashes inserted FOR pipes are
    * not re-doubled, exactly the two-pass order). Byte-level is safe:
    * 0x5C and 0x7C are ASCII and never occur inside a UTF-8 multi-byte
    * sequence. Strings containing neither char return unchanged, no
    * copy.
    */
  def escapeCanonical(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var extra = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '\\'.toByte || b == '|'.toByte) extra += 1
      i += 1
    }
    if (extra == 0) return s
    val out = new Array[Byte](bytes.length + extra)
    var j = 0
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == '\\'.toByte) {
        out(j) = '\\'.toByte; out(j + 1) = '\\'.toByte; j += 2
      } else if (b == '|'.toByte) {
        out(j) = '\\'.toByte; out(j + 1) = '|'.toByte; j += 2
      } else { out(j) = b; j += 1 }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  // ---- Column wrappers ----------------------------------------------

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Expression-level builder (shared by the Column wrappers and the SQL
    * function registrations in graft.GraftExtensions).
    */
  private def invokeExpr(dt: DataType, fn: String, args: Seq[Expression]): Expression =
    StaticInvoke(
      Kernels.getClass, dt, fn, args.toIndexedSeq,
      inputTypes = Nil, propagateNull = true, returnNullable = false,
      isDeterministic = true)

  private def invoke(dt: DataType, fn: String, args: Column*): Column =
    ColumnBridge.column(invokeExpr(dt, fn, args.map(ColumnBridge.expression)))

  def fingerprintExpr(e: Expression): Expression =
    invokeExpr(LongType, "rollingFingerprint", Seq(e))
  def langIdExpr(e: Expression): Expression =
    invokeExpr(StringType, "langId", Seq(e))
  def simhashExpr(e: Expression): Expression =
    invokeExpr(LongType, "simhash64", Seq(e))
  def simhash48Expr(e: Expression): Expression =
    invokeExpr(LongType, "simhash48", Seq(e))
  def md5_48Expr(e: Expression): Expression =
    invokeExpr(LongType, "md5_48", Seq(e))
  def minhashPortableExpr(sh: Expression, k: Expression): Expression =
    invokeExpr(ArrayType(LongType, containsNull = false),
      "minhashSigPortable", Seq(sh, k))
  def shinglesExpr(text: Expression, n: Expression): Expression =
    invokeExpr(ArrayType(StringType, containsNull = false), "shingles", Seq(text, n))
  def minhashExpr(sh: Expression, k: Expression): Expression =
    invokeExpr(ArrayType(LongType, containsNull = false), "minhashSig", Seq(sh, k))
  def cosineExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply}
    Divide(
      invokeExpr(DoubleType, "dotFF", Seq(a, b)),
      Multiply(invokeExpr(DoubleType, "normF", Seq(a)),
        invokeExpr(DoubleType, "normF", Seq(b))))
  }

  def fingerprintCol(text: Column): Column =
    invoke(LongType, "rollingFingerprint", text)

  def simhashCol(text: Column): Column = invoke(LongType, "simhash64", text)

  def simhash48Col(text: Column): Column = invoke(LongType, "simhash48", text)

  def md5_48Col(text: Column): Column = invoke(LongType, "md5_48", text)

  def escapeCanonicalCol(text: Column): Column =
    invoke(StringType, "escapeCanonical", text)

  def morton2Col(a: Column, b: Column): Column =
    invoke(LongType, "morton2", a, b)

  def sigEqFracCol(a: Column, b: Column): Column =
    invoke(DoubleType, "sigEqFrac", a, b)

  def minhashCol(shingles: Column, k: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "minhashSig",
      shingles, org.apache.spark.sql.functions.lit(k))

  def minhashPortableCol(shingles: Column, k: Int): Column =
    invoke(ArrayType(LongType, containsNull = false), "minhashSigPortable",
      shingles, org.apache.spark.sql.functions.lit(k))

  def shinglesCol(text: Column, n: Int): Column =
    invoke(ArrayType(StringType, containsNull = false), "shingles",
      text, org.apache.spark.sql.functions.lit(n))

  def ivfProbeCol(emb: Column, centroidsFlat: Column, c: Int, nprobe: Int): Column =
    invoke(ArrayType(IntegerType, containsNull = false), "ivfProbe",
      emb, centroidsFlat, org.apache.spark.sql.functions.lit(c),
      org.apache.spark.sql.functions.lit(nprobe))

  def pqAssignCol(emb: Column, codebooksFlat: Column, m: Int, ksub: Int): Column =
    invoke(ArrayType(IntegerType, containsNull = false), "pqAssign",
      emb, codebooksFlat, org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(ksub))
  def pqTableCol(emb: Column, codebooksFlat: Column, m: Int, ksub: Int): Column =
    invoke(ArrayType(DoubleType, containsNull = false), "pqTable",
      emb, codebooksFlat, org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(ksub))
  def pqAdcCol(codes: Column, qtable: Column, ksub: Int): Column =
    invoke(DoubleType, "pqAdc", codes, qtable,
      org.apache.spark.sql.functions.lit(ksub))

  def rangeBucketIdxCol(ubs: Array[Double], xd: Column): Column =
    invoke(IntegerType, "rangeBucketIdx",
      org.apache.spark.sql.functions.lit(ubs), xd)

  def dotFFCol(a: Column, b: Column): Column = invoke(DoubleType, "dotFF", a, b)
  def dotFDCol(a: Column, b: Column): Column = invoke(DoubleType, "dotFD", a, b)
  def normFCol(a: Column): Column = invoke(DoubleType, "normF", a)

  def langIdCol(text: Column): Column = invoke(StringType, "langId", text)

  def applyJsonDiffB64Col(before: Column, b64: Column): Column =
    invoke(StringType, "applyJsonDiffB64", before, b64)

  def nfcCol(text: Column): Column = invoke(StringType, "nfc", text)
  def nfcExpr(e: Expression): Expression =
    invokeExpr(StringType, "nfc", Seq(e))

  def charTrigramsCol(text: Column): Column =
    invoke(ArrayType(StringType, containsNull = false), "charTrigrams", text)

  private val LshKeyType: DataType = ArrayType(StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("bucket", LongType, nullable = false))), containsNull = false)

  def lshKeysCol(emb: Column, nTables: Int, planesPerTable: Int,
                 dim: Int, probes: Int): Column =
    invoke(LshKeyType, "lshKeys", emb,
      org.apache.spark.sql.functions.lit(nTables),
      org.apache.spark.sql.functions.lit(planesPerTable),
      org.apache.spark.sql.functions.lit(dim),
      org.apache.spark.sql.functions.lit(probes))

  def lshKeysDirectedCol(emb: Column, nTables: Int, planesPerTable: Int,
                         dim: Int, probes: Int): Column =
    invoke(LshKeyType, "lshKeysDirected", emb,
      org.apache.spark.sql.functions.lit(nTables),
      org.apache.spark.sql.functions.lit(planesPerTable),
      org.apache.spark.sql.functions.lit(dim),
      org.apache.spark.sql.functions.lit(probes))

  /** Cosine similarity of two float-array embeddings (double math). */
  def cosineFFCol(a: Column, b: Column): Column =
    dotFFCol(a, b) / (normFCol(a) * normFCol(b))
}
