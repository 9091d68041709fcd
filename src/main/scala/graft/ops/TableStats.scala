package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Data-profiling / data-quality / sufficient-statistics operators —
  * the validation layer a 100 TB ingest runs BEFORE training-data
  * curation (the reference ships raw sync with no profiling; these are
  * engine-mandated extensions in the Deequ/TFX-data-validation family,
  * re-expressed as single-pass Spark aggregates).
  *
  * Scale stance shared by everything in this file: what crosses the
  * shuffle is statistics-sized (group counts, distinct values, check
  * tallies), never data rows, and every byte of the table is read at
  * most once — [[validate]] and the regression/correlation fits fuse
  * all their sums into one `agg` pass; [[profile]] deliberately does
  * NOT (k exact `count(DISTINCT)` in one agg plan as a k+1×
  * row-widening Expand — see its scaladoc for the measured numbers)
  * and instead runs one column-pruned branch per column, which on
  * columnar storage still totals one table read.
  */
object TableStats {

  /** What a profiled column is: its name, and how to render its
    * min/max (numerics → DOUBLE, strings → as-is, dates → ISO string
    * via DATE cast — the one cross-engine-stable temporal rendering).
    */
  sealed trait ColKind
  case object NumCol extends ColKind
  case object StrCol extends ColKind
  case object DateCol extends ColKind

  /** Column-parallel whole-table profiler: for every listed column,
    * row count, null count, exact NDV, and typed min/max. One
    * aggregate BRANCH per column, each scanning ONLY its column
    * (explicit projection → parquet reads one column chunk per
    * branch), unioned to one output row per column. Output schema:
    * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str) — numeric min/max ride as DOUBLE and
    * string/date min/max as STRING so no cross-engine float/temporal
    * FORMATTING is ever compared, only values.
    *
    * Why branches, not one fused agg: k exact `count(DISTINCT)` in a
    * single agg plan as one Expand that widens every row k+1× before
    * partial aggregation — measured 25.6 s vs ~3 s at sf0.1 for this
    * 11-column profile. Per-column branches keep each distinct-count a
    * plain two-level hash aggregate; on columnar storage the k
    * branches together still read each byte of the table exactly
    * once, and Spark schedules them as independent stages. (At
    * extreme widths the further cheapening is `approx_count_distinct`
    * — kept out of the oracled path so the result stays
    * engine-portable.)
    */
  def profile(df: DataFrame, cols: Seq[(String, ColKind)]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val branches = cols.map { case (c, kind) =>
      val mm: Seq[Column] = kind match {
        case NumCol => Seq(
          min(col(c)).cast("double").as("__min"),
          max(col(c)).cast("double").as("__max"))
        case StrCol => Seq(
          min(col(c)).cast("string").as("__min"),
          max(col(c)).cast("string").as("__max"))
        case DateCol => Seq(
          min(col(c).cast("date")).cast("string").as("__min"),
          max(col(c).cast("date")).cast("string").as("__max"))
      }
      val (minNum, maxNum, minStr, maxStr) = kind match {
        case NumCol =>
          (col("__min"), col("__max"),
           lit(null).cast("string"), lit(null).cast("string"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
           col("__min"), col("__max"))
      }
      val aggs: Seq[Column] = Seq(
        count(lit(1)).as("__n"), count(col(c)).as("__cnt"),
        count_distinct(col(c)).as("__ndv")) ++ mm
      df.select(col(c))
        .agg(aggs.head, aggs.tail: _*)
        .select(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col("__cnt")).as("n_nulls"),
          col("__ndv").as("n_distinct"),
          minNum.as("min_num"), maxNum.as("max_num"),
          minStr.as("min_str"), maxStr.as("max_str"))
    }
    branches.reduce(_ unionByName _).orderBy("col_name")
  }

  /** One row-local data-quality check: a name and the predicate that a
    * ROW VIOLATES it (null predicate counts as no violation, matching
    * SQL `sum(CASE WHEN p THEN 1 ELSE 0 END)` semantics).
    */
  final case class Check(name: String, violation: Column)

  /** Deequ-family constraint suite, fused: every row-local check plus
    * any number of exact-uniqueness checks run in ONE aggregation pass
    * (conditional sums + `count(DISTINCT key)` side by side in the same
    * `agg`); referential-integrity checks are each one broadcast-able
    * anti-join COUNT (the lookup side is a key projection — at 100 TB
    * the fact scan still dominates). Output: one row per check,
    * (check_name, violations BIGINT, passed BOOLEAN), sorted.
    */
  def validate(
      df: DataFrame,
      rowChecks: Seq[Check],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      refChecks: Seq[(String, Column, DataFrame, Column)] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKeys.nonEmpty || refChecks.nonEmpty,
      "validate with zero checks")
    val refs = refChecks.map { case (name, factKey, dim, dimKey) =>
      // No broadcast hint: the referenced side may itself be
      // data-scale (orders, not a dimension) — shuffle anti-join on
      // the key projection; AQE still demotes to broadcast when the
      // projected key set turns out small at runtime.
      val missing = df.select(factKey.as("__k"))
        .join(dim.select(dimKey.as("__k")).distinct(),
          Seq("__k"), "left_anti")
      missing.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))
    }
    // the fused branch only exists when it carries a check: explode of
    // an empty `array()` is ArrayType(NullType) and `p.*` fails
    // analysis, so a refs-only suite starts from the ref branches alone
    val branches =
      if (rowChecks.isEmpty && uniqueKeys.isEmpty) refs
      else {
        val aggs: Seq[Column] =
          (count(lit(1)).as("__n") +:
            rowChecks.map(c =>
              sum(when(c.violation, 1L).otherwise(0L)).as(s"rc__${c.name}"))) ++
          uniqueKeys.map { case (name, keyCols) =>
            count_distinct(struct(keyCols.map(col): _*)).as(s"uk__$name")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val fused = one.select(explode(array(
          (rowChecks.map(c =>
            struct(lit(c.name).as("check_name"),
              coalesce(col(s"rc__${c.name}"), lit(0L)).as("violations"))) ++
          uniqueKeys.map { case (name, _) =>
            struct(lit(name).as("check_name"),
              (col("__n") - col(s"uk__$name")).as("violations"))
          }): _*)).as("p")).select(col("p.*"))
        fused +: refs
      }
    branches.reduce(_ unionByName _)
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy("check_name")
  }

  /** k-anonymity risk profile over a quasi-identifier column set: for
    * each threshold in `ks`, how many QI equivalence classes have
    * fewer than k members, and how many ROWS sit in those classes
    * (the re-identification risk mass a privacy review reads first).
    * One groupBy shuffle to class sizes (statistics-sized — at most
    * |classes| rows), then one tiny agg over the sizes computes every
    * threshold at once. Output: (k, groups_below, rows_at_risk),
    * ordered by k.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[Column], ks: Seq[Int])
      : DataFrame = {
    require(qiCols.nonEmpty && ks.nonEmpty, "kAnonymity needs QI cols and ks")
    val sizes = df.groupBy(qiCols: _*).agg(count(lit(1)).as("sz"))
    val aggs: Seq[Column] = ks.flatMap(k => Seq(
      coalesce(sum(when(col("sz") < k, 1L)), lit(0L)).as(s"g__$k"),
      coalesce(sum(when(col("sz") < k, col("sz"))), lit(0L)).as(s"r__$k")))
    val one = sizes.agg(aggs.head, aggs.tail: _*)
    val rows = ks.map(k => struct(lit(k.toLong).as("k"),
      col(s"g__$k").as("groups_below"), col(s"r__$k").as("rows_at_risk")))
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy("k")
  }

  /** l-diversity risk profile, [[kAnonymity]]'s companion: a QI class
    * can be large (k-anonymous) yet still leak if every member shares
    * one SENSITIVE value — so per threshold l, count the classes whose
    * distinct-sensitive-value count is below l, and the rows inside
    * them. Same shape: one groupBy to class statistics (size + exact
    * sensitive NDV via `count_distinct` per class), one tiny agg for
    * every threshold.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[Column], sensitive: Column,
      ls: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ls.nonEmpty, "lDiversity needs QI cols and ls")
    val classes = df.groupBy(qiCols: _*).agg(
      count(lit(1)).as("sz"), count_distinct(sensitive).as("div"))
    val aggs: Seq[Column] = ls.flatMap(l => Seq(
      coalesce(sum(when(col("div") < l, 1L)), lit(0L)).as(s"g__$l"),
      coalesce(sum(when(col("div") < l, col("sz"))), lit(0L)).as(s"r__$l")))
    val one = classes.agg(aggs.head, aggs.tail: _*)
    val rows = ls.map(l => struct(lit(l.toLong).as("l"),
      col(s"g__$l").as("groups_below"), col(s"r__$l").as("rows_at_risk")))
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy("l")
  }

  /** Join-key skew advisor: per candidate key column, the histogram
    * statistics that decide whether a join on it needs salting
    * ([[Skew]]) or an AQE skew split — NDV, the hottest key's count,
    * its corpus share (ppm), and hot-over-average ratio (×1000, both
    * in exact integer DIV arithmetic so the advisory is
    * engine-portable). One column-pruned groupBy branch per key (the
    * [[profile]] stance: no row-widening, each branch reads one
    * column). Output: (col_name, n_rows, n_distinct, max_count,
    * top_share_ppm, skew_x1000).
    */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "keySkew of zero columns")
    val branches = cols.map { c =>
      df.select(col(c)).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_distinct"),
          max(col("cnt")).as("max_count"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_distinct"),
          col("max_count"),
          expr("CAST(max_count * 1000000 DIV n_rows AS BIGINT)")
            .as("top_share_ppm"),
          expr("CAST(max_count * 1000 DIV (n_rows DIV n_distinct) AS BIGINT)")
            .as("skew_x1000"))
    }
    branches.reduce(_ unionByName _).orderBy("col_name")
  }

  /** Snap a fixed-point double column to its exact integer grid
    * (`round(c·grid)` as long — the `q_stats_moments` contract: the
    * input must genuinely lie on the 1/grid lattice, true for every
    * harness monetary / quantity / rate column). Second-moment sums of
    * double PRODUCTS are NOT engine-portable — the double→decimal
    * rounding of a product is conversion-algorithm-dependent (measured
    * 1-ulp drift, `Queries.scala` q_stats_moments note) — so all
    * sufficient statistics below are exact integer sums on the grid,
    * widened to DECIMAL(28,0) where 100 TB row counts overflow int64.
    */
  private def grid(c: Column, g: Int): Column = round(c * g).cast("long")

  private val Dec28 = org.apache.spark.sql.types.DecimalType(28, 0)

  /** Per-group simple linear regression (y ~ slope·x + intercept, plus
    * R²) fit from SUFFICIENT STATISTICS: one `groupBy(...).agg` pass
    * computes n, ΣX, ΣY, ΣX², ΣXY, ΣY² as exact decimal sums over the
    * grid-snapped integers (bit-stable under any partitioning and
    * engine), and the closed-form normal-equation solve is a handful
    * of DOUBLE ops on those sums, rescaled from the grid (slope scales
    * by gx/gy, R² is scale-invariant). This is how model fitting
    * scales: the shuffle carries 6 numbers per group, never data rows,
    * so fitting per-group models over 100 TB costs one scan regardless
    * of group count. Degenerate groups (zero x- or y-variance) yield
    * NULL slope/intercept/R² rather than ±Inf.
    */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, xGrid: Int = 100, yGrid: Int = 100): DataFrame = {
    val x = grid(col(xCol), xGrid); val y = grid(col(yCol), yGrid)
    val suff = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x.cast(Dec28)).cast("double").as("sx"),
      sum(y.cast(Dec28)).cast("double").as("sy"),
      sum((x * x).cast(Dec28)).cast("double").as("sxx"),
      sum((x * y).cast(Dec28)).cast("double").as("sxy"),
      sum((y * y).cast(Dec28)).cast("double").as("syy"))
    // The double-precision solve. Every expression below is mirrored
    // TOKEN FOR TOKEN in the registered oracle SQL: IEEE +,-,*,/ are
    // exactly rounded, so identical operand order ⇒ identical bits
    // cross-engine. `nd` is n cast to double once, up front.
    val nd = col("n").cast("double")
    val xg = lit(xGrid.toDouble); val yg = lit(yGrid.toDouble)
    val covN = nd * col("sxy") - col("sx") * col("sy")
    val varXN = nd * col("sxx") - col("sx") * col("sx")
    val varYN = nd * col("syy") - col("sy") * col("sy")
    val slope = (covN / varXN) * (xg / yg)
    suff.select(col(groupCol), col("n"),
        when(varXN =!= 0.0, slope).as("slope"),
        when(varXN =!= 0.0,
          ((col("sy") / yg) - slope * (col("sx") / xg)) / nd)
          .as("intercept"),
        when(varXN =!= 0.0 && varYN =!= 0.0,
          (covN * covN) / (varXN * varYN)).as("r2"))
      .orderBy(groupCol)
  }

  /** All-pairs Pearson correlation over a column list, ONE pass: a
    * single `agg` computes every ΣC, ΣC², and Σ(A·B) for the
    * upper-triangle pairs as exact grid sums; each correlation is then
    * closed-form double math on those sums (correlation is
    * scale-invariant, so the grid needs no unscaling; same cross-engine
    * determinism contract as [[groupedOls]]). k columns ⇒ k(k+1)/2 + k
    * aggregates in one scan — a 100 TB correlation matrix costs one
    * read, not k² reads.
    */
  def corrPairs(df: DataFrame, cols: Seq[String], gridScale: Int = 100)
      : DataFrame = {
    require(cols.size >= 2, "corrPairs needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def g(c: String): Column = grid(col(c), gridScale)
    val aggs: Seq[Column] =
      count(lit(1)).as("n") +:
      (cols.flatMap(c => Seq(
        sum(g(c).cast(Dec28)).cast("double").as(s"s__$c"),
        sum((g(c) * g(c)).cast(Dec28)).cast("double").as(s"ss__$c"))) ++
       pairs.map { case (a, b) =>
         sum((g(a) * g(b)).cast(Dec28)).cast("double").as(s"sp__${a}__$b") })
    val one = df.agg(aggs.head, aggs.tail: _*)
    val nd = col("n").cast("double")
    val rows = pairs.map { case (a, b) =>
      val covN = nd * col(s"sp__${a}__$b") - col(s"s__$a") * col(s"s__$b")
      val vaN = nd * col(s"ss__$a") - col(s"s__$a") * col(s"s__$a")
      val vbN = nd * col(s"ss__$b") - col(s"s__$b") * col(s"s__$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(vaN =!= 0.0 && vbN =!= 0.0,
          covN / sqrt(vaN * vbN)).as("corr"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy("col_a", "col_b")
  }
}
