package graft.operators

import graft.{Num, QueryPack, Tables}
import graft.functions.VectorOps
import graft.ml.KMeans
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.F ML / stats surface — colStats, Pearson correlation, KMeans.
  *
  * Origin: ny_taxi/MlLibNyTaxiExamples.scala:69-87,117 (Statistics
  * .colStats / Statistics.corr / KMeans.train on trip feature vectors).
  * Re-expressed as single-pass DataFrame aggregates over exact
  * scaled-integer sums: every statistic is derived from exact BIGINT /
  * DECIMAL sums via one fixed double expression, so both engines produce
  * bit-identical results (determinism by construction, not by tolerance).
  */
object MlStats extends QueryPack {
  import Num.cents

  private case class ColSpec(name: String, c: String)
  private val statCols = Seq(
    ColSpec("l_quantity", "l_quantity"),
    ColSpec("l_discount", "l_discount"),
    ColSpec("l_tax", "l_tax"))

  /** Per-column min/max/mean/var_pop/nnz/L1/L2 in one aggregate pass,
    * then unpivoted. Cent-scaled sums and sums of squares stay exactly inside
    * BIGINT for these bounded columns (max |cents| = 5000 -> S2 <= 1.5e13
    * at sf0.1), so the derived doubles are deterministic. */
  def q60Colstats(s: SparkSession, dir: String): DataFrame = {
    val aggs = statCols.flatMap { cs =>
      val x = cents(col(cs.c))
      Seq(
        count(lit(1)).as(s"${cs.name}__n"),
        sum(when(x =!= 0, 1L).otherwise(0L)).as(s"${cs.name}__nnz"),
        min(col(cs.c)).as(s"${cs.name}__mn"),
        max(col(cs.c)).as(s"${cs.name}__mx"),
        sum(x).as(s"${cs.name}__s1"),
        sum(x * x).as(s"${cs.name}__s2"),
        sum(abs(x)).as(s"${cs.name}__l1c"))
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val rows = statCols.map { cs =>
      val p = cs.name
      val n = col(s"${p}__n")
      val s1d = col(s"${p}__s1").cast("double")
      val s2d = col(s"${p}__s2").cast("double")
      struct(
        lit(cs.name).as("col_name"), n.as("n"), col(s"${p}__nnz").as("nnz"),
        col(s"${p}__mn").as("mn"), col(s"${p}__mx").as("mx"),
        (s1d / 100.0 / n).as("mean"),
        (((s2d - s1d * s1d / n) / n) / 10000.0).as("var_pop"),
        (col(s"${p}__l1c") / 100.0).as("l1"),
        // normL2 = sqrt(sum x^2), the reference's colStats.normL2
        // (MLlibNyTaxi summary) — from the same exact cent-scaled s2,
        // so the one sqrt is deterministic across engines
        (sqrt(s2d) / 100.0).as("l2"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy(col("col_name"))
  }

  /** Pearson correlation of three column pairs from exact sums; the
    * price-squared sums exceed BIGINT at scale, so those accumulate in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both cast to double with
    * correct rounding, keeping the final expression deterministic. */
  def q61Corr(s: SparkSession, dir: String): DataFrame = {
    val pairs = Seq(
      ("l_quantity", "l_extendedprice"),
      ("l_quantity", "l_discount"),
      ("l_extendedprice", "l_discount"))
    def dsum(e: Column): Column = sum(e.cast("decimal(38,0)")).cast("double")
    val cols = pairs.map { case (a, b) => (a, b, cents(col(a)), cents(col(b))) }
    val aggs = count(lit(1)).as("n") +: cols.zipWithIndex.flatMap {
      case ((_, _, xa, xb), i) =>
        Seq(dsum(xa).as(s"sx_$i"), dsum(xb).as(s"sy_$i"),
          dsum(xa * xa).as(s"sxx_$i"), dsum(xb * xb).as(s"syy_$i"),
          dsum(xa * xb).as(s"sxy_$i"))
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case ((a, b, _, _), i) =>
      val n = col("n").cast("double")
      val (sx, sy) = (col(s"sx_$i"), col(s"sy_$i"))
      val num = n * col(s"sxy_$i") - sx * sy
      val den = sqrt(n * col(s"sxx_$i") - sx * sx) * sqrt(n * col(s"syy_$i") - sy * sy)
      struct(lit(a).as("col_a"), lit(b).as("col_b"), (num / den).as("corr"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** KMeans over embeddings (k=8, 5 Lloyd iterations, deterministic
    * seed): per-cluster size and inertia. Oracle-exact — the fit runs
    * [[graft.ml.KMeans.fitQuantized]] on 1e-7-quantized integer
    * vectors, so the whole Lloyd trajectory (integer argmin
    * assignment, floor-division centroid update) is bit-deterministic
    * under any partitioning and replayed in DuckDB as 5 chained CTEs
    * (the q96 PageRank-replay precedent); convergence laws are
    * additionally spec-tested in MlSpec. */
  def q62Kmeans(s: SparkSession, dir: String): DataFrame = {
    // projection of the globally cached decode (FrameCache), so fit's
    // fit-scoped persist/unpersist and profile's rescan both read the
    // shared entry instead of re-decoding per call
    val rvecs = Similarity.decodedVecs(s, dir).select(col("vec_id"),
      transform(col("e"), x => round(x * 1e7).cast("long")).as("r"))
    val cents = KMeans.fitQuantized(rvecs, k = 8, iters = 5)
    KMeans.profileQuantized(rvecs, cents)
  }

  /** Per-dimension stats over the embedding column — the QA pass a
    * vector pipeline runs before building an ANN index (are dims
    * centered? any dead or exploded dims?). posexplode to (pos, val)
    * then ONE partial-aggregable groupBy on the 64 dims. Sums
    * accumulate on 1e-7-scaled integers (exact, order-independent;
    * squares in DECIMAL(38,0) / HUGEINT because n * r^2 can pass 2^63),
    * so mean/var_pop are single deterministic double expressions —
    * oracle-exact, unlike a naive float sum which is partition-order
    * dependent. Stats are over the 1e-7 quantization of each value
    * (exactly mirrored in the oracle; error 5e-8 per element is far
    * below any QA threshold). */
  def q64EmbeddingStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(posexplode(VectorOps.asDouble(col("embedding"))).as(Seq("pos", "val")))
      .select(col("pos"), col("val"),
        round(col("val") * 10000000.0).cast("long").as("r"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), min(col("val")).as("mn"),
        max(col("val")).as("mx"),
        sum(col("r")).as("s1"),
        sum((col("r") * col("r")).cast("decimal(38,0)")).as("s2"))
      .select(col("pos").cast("long").as("pos"), col("n"), col("mn"), col("mx"),
        (col("s1").cast("double") / 10000000.0 / col("n")).as("mean"),
        (((col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("n"))
          / col("n")) / 100000000000000.0).as("var_pop"))
      .orderBy(col("pos"))

  /** Greedy decision tree on lineitem features predicting the "returned"
    * flag with HELD-OUT evaluation — the MlLibNyTaxiExamples workflow
    * (MlLibNyTaxiExamples.scala:108-125: 70/30 randomSplit, maxDepth 5,
    * test error), DataFrame-native: split search = one aggregate pass
    * per LEVEL, the driver holds split statistics only. The 70/30 split
    * is the q35 deterministic hash assignment on the row's primary key
    * (l_orderkey, l_linenumber) — stable across reruns, machines and
    * physical layouts, unlike randomSplit. The train side is further
    * split 80/20 into grow/prune and the grown tree is reduced-error
    * pruned on the held-out prune subset ([[graft.ml.DecisionTree
    * .pruneReducedError]]) — without it a depth-5 greedy tree on these
    * near-uninformative features memorizes noise and grades BELOW the
    * majority baseline on test. Output: the node table plus train
    * accuracy, test accuracy, and the held-out majority baseline
    * (test rows matching the TRAIN-majority class — the honest baseline
    * a model grade compares against). Rows-only (greedy-tree structure
    * has no SQL oracle); MlSpec asserts test_acc >= baseline. */
  /** q63's labeled training frame with its deterministic split
    * assignment — exposed so the structure-equality spec can train an
    * independent in-JVM reimplementation on the IDENTICAL rows. */
  private[graft] def q63TrainFrame(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextOps
    val h = TextOps.polyHash61(concat(lit("tree-salt-"),
      col("l_orderkey").cast("string"), lit(","),
      col("l_linenumber").cast("string")))
    val bucket = pmod(h, lit(100L))
    // single-file layouts scan as one task; rebalance BEFORE the hash
    // projection so split assignment and persist encode on all cores
    // (the documentsBalanced rule), moving only the 5 needed raw columns
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val p = s.sparkContext.defaultParallelism
    val balanced = if (li.rdd.getNumPartitions < p) li.repartition(p) else li
    balanced
      .select((col("l_returnflag") === "R").cast("long").as("y"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        (bucket < 70).as("is_train"), (bucket < 56).as("is_grow"))
  }

  def q63DecisionTree(s: SparkSession, dir: String): DataFrame = {
    import graft.ml.DecisionTree
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount")
    val cached = graft.FrameCache.persisted(s, s"q63train:$dir") {
      q63TrainFrame(s, dir)
    }
    // materialize on all cores, then run the sequential trainer passes
    // on a BYTES-sized view of the cache: each pass is one tiny
    // partial-aggregable job over a few-MB projection, so its partition
    // count follows cached bytes, not cores (Engine.rightSizedForPasses)
    cached.count()
    val df = graft.Engine.rightSizedForPasses(cached)
    val grown = DecisionTree.fit(df.filter(col("is_grow")), feats, col("y"),
      maxDepth = 5)
    // ONE fused pass grades pruning AND both accuracy splits: every row
    // routes to its GROWN leaf tagged (is_train, is_grow, y) — the
    // prune histogram is the (is_train && !is_grow) slice, and the
    // train/test accuracies + majority baseline are exact sums over the
    // same counts, because a row's pruned-tree prediction is a function
    // of its grown leaf (pruning only merges leaves). Replaces the
    // separate prune-set pass and the whole-frame accuracy pass with
    // identical longs summed / identical doubles divided.
    val cnt = df.groupBy(DecisionTree.leafIdExpr(grown).as("leaf"),
        col("is_train"), col("is_grow"), col("y"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val pruneHist = cnt.filter(r => r.getBoolean(1) && !r.getBoolean(2))
      .map(r => (r.getInt(0), r.getLong(3)) -> r.getLong(4)).toMap
    val nodes = DecisionTree.pruneFromHist(grown, pruneHist, z = 2.0)
    val predOf = DecisionTree.prunedLeafPrediction(grown, nodes)
    var (trainN, trainPos, trainOk) = (0L, 0L, 0L)
    var (testN, testPos, testOk) = (0L, 0L, 0L)
    cnt.foreach { r =>
      val (leaf, isTrain) = (r.getInt(0), r.getBoolean(1))
      val (y, n) = (r.getLong(3), r.getLong(4))
      val ok = if (predOf(leaf).toLong == y) n else 0L
      if (isTrain) { trainN += n; if (y == 1L) trainPos += n; trainOk += ok }
      else { testN += n; if (y == 1L) testPos += n; testOk += ok }
    }
    val trainAcc = trainOk.toDouble / trainN
    val testAcc = testOk.toDouble / testN
    val baseline = (if (2 * trainPos >= trainN) testPos else testN - testPos)
      .toDouble / testN
    cached.unpersist()
    import s.implicits._
    nodes.map(nd => (nd.id.toLong, nd.depth.toLong, Option(nd.feature),
        nd.threshold, nd.n, nd.gini, nd.prediction.toLong,
        nd.leftId.toLong, nd.rightId.toLong,
        trainAcc, testAcc, baseline))
      .toDF("node_id", "depth", "feature", "threshold", "n", "gini",
        "prediction", "left_id", "right_id", "train_acc", "test_acc",
        "majority_baseline")
      .orderBy(col("node_id"))
  }

  /** q90: GPT-3-style quality classifier — train a logistic regression
    * on "reference domain vs rest" (weak label: the stored lang = 'en',
    * the reference-corpus proxy) over row-local text features, then
    * score EVERY document; a real pipeline keeps docs whose score
    * clears a threshold (Brown et al., NeurIPS'20 §A.2 train exactly
    * this shape against WebText as the positive class).
    *
    * Training is [[graft.ml.Logistic]]: driver-held weight vector, one
    * partial-aggregable integer-scaled gradient aggregate per
    * iteration (20 rounds, lr 0.5) over the PERSISTED feature frame —
    * the corpus is touched once to featurize, the iterations run on the
    * cached projection. Scoring is one row-local expression pass.
    *
    * Honesty note (the q32 contract): the driver's synthetic corpus
    * shares one vocabulary across its lang labels, so these features
    * carry no real lang signal and heldout accuracy ~ the base rate —
    * REPORTED, not asserted. The trainer's learnability laws (planted
    * separable corpus, loss decrease, heldout accuracy) are
    * spec-asserted in MlSpec. Rows-only: sigmoid/log go through libm,
    * so no cross-engine oracle by design. */
  /** Row-local quality features over a `text` column — ONE definition
    * shared by q90's batch trainer and the s12 streaming gate (a model
    * trained here scores streams there with identical featurization,
    * the train/serve-skew rule). */
  private[graft] val QualityFeatureNames = Seq("f_len", "f_stop", "f_punct", "f_wlen")
  private[graft] def withQualityFeatures(df: DataFrame): DataFrame = {
    val tk = graft.functions.TextOps.toks(lower(col("text")))
    df.withColumn("nc_", length(col("text")).cast("long"))
      .withColumn("tk_", tk)
      .withColumn("f_len", least(lit(1.0), size(col("tk_")).cast("double") / 100.0))
      .withColumn("f_stop",
        size(filter(col("tk_"), t => t.isin("the", "a", "of", "to", "and", "in", "is")))
          .cast("double") / greatest(size(col("tk_")), lit(1)))
      .withColumn("f_punct",
        regexp_count(col("text"), lit("[.,!?;:]")).cast("double")
          / greatest(col("nc_"), lit(1L)))
      .withColumn("f_wlen",
        aggregate(col("tk_"), lit(0L), (a, t) => a + length(t)).cast("double")
          / greatest(size(col("tk_")), lit(1)) / 10.0)
      .drop("nc_", "tk_")
  }

  def q90QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val feats = QualityFeatureNames
    val base = graft.FrameCache.persisted(s, s"q90features:$dir") {
      withQualityFeatures(Tables.documentsBalanced(s, dir))
        .select(col("doc_id") +: (col("lang") === "en").cast("double").as("label") +:
          feats.map(col) :+
          when(pmod(graft.functions.TextOps.polyHash61(
            concat(lit("clf-salt-"), col("doc_id").cast("string"))), lit(100L)) < 80,
            "train").otherwise("val").as("split"): _*)
    }
    // materialize the cache first (featurization — the expensive
    // row-local step — runs once, on all cores), then run the 20
    // sequential gradient passes on a BYTES-sized view of it: a few-MB
    // cached projection spread over defaultParallelism partitions pays
    // cores × task-launch per pass for sub-millisecond per-task compute
    // (Engine.rightSizedForPasses; scale-adaptive, a 100 TB frame keeps
    // its bytes/target partitions)
    base.count()
    val (w, _) = graft.ml.Logistic.fit(
      graft.Engine.rightSizedForPasses(base).filter(col("split") === "train"),
      feats, col("label"), iters = 20, lr = 0.5)
    base
      .select(col("doc_id"), col("split"), col("label").cast("boolean").as("label"),
        graft.ml.Logistic.scoreExpr(feats, w).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q60_colstats" -> (q60Colstats _),
    "q61_corr" -> (q61Corr _),
    "q62_kmeans" -> (q62Kmeans _),
    "q63_decision_tree" -> (q63DecisionTree _),
    "q64_embedding_stats" -> (q64EmbeddingStats _),
    "q90_quality_classifier" -> (q90QualityClassifier _))

  private val S = Num.sql

  val oracleSql: Map[String, String] = Map(
    "q90_quality_classifier" -> {
      // DuckDB replay of the 20-round rational-squash GD trajectory —
      // mirrors graft.ml.Logistic.fit token for token: the z fold
      // order, the rational sigmoid (IEEE +,*,/,abs only — no libm),
      // the [1e-12, 1-1e-12] clamp, the 1e-9 integer-scaled
      // contribution sums, and the driver's w -= lr * ((g/1e9)/n)
      // update arithmetic. Features mirror withQualityFeatures.
      // Every chained CTE is MATERIALIZED: each w_i is referenced by
      // both g_{i+1} and w_{i+1}, so default inlining expands the
      // 20-round chain exponentially (observed as DuckDB exhausting
      // the fd limit re-opening documents.parquet thousands of times).
      val iters = 20
      val stop = Seq("the", "a", "of", "to", "and", "in", "is")
        .map("'" + _ + "'").mkString(", ")
      val h = graft.functions.TextOps.sqlPolyHash61(
        "'clf-salt-' || CAST(doc_id AS VARCHAR)")
      val head =
        s"""WITH f AS MATERIALIZED (
           |  SELECT doc_id,
           |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
           |         ELSE CAST(0.0 AS DOUBLE) END AS y,
           |    least(1.0, CAST(len(tk) AS DOUBLE) / 100.0) AS f_len,
           |    CAST(len(list_filter(tk, t -> t IN ($stop))) AS DOUBLE)
           |      / greatest(len(tk), 1) AS f_stop,
           |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
           |      / greatest(length(text), 1) AS f_punct,
           |    CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE)
           |      / greatest(len(tk), 1) / 10.0 AS f_wlen,
           |    CASE WHEN $h % 100 < 80 THEN 'train' ELSE 'val' END AS split
           |  FROM (SELECT doc_id, text, lang, string_split(lower(text), ' ') AS tk
           |        FROM documents)),
           |w0 AS MATERIALIZED (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
           |  CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
           |  CAST(0.0 AS DOUBLE) AS wb)"""
      def z(w: String) =
        s"((((f.f_len * $w.w0 + f.f_stop * $w.w1) + f.f_punct * $w.w2)" +
          s" + f.f_wlen * $w.w3) + $w.wb)"
      def p(w: String) = {
        val zz = z(w)
        s"least(greatest(0.5 + (0.5 * $zz) / (1.0 + abs($zz)), 1e-12), 1.0 - 1e-12)"
      }
      val rounds = (1 to iters).map { i =>
        val pw = p(s"w${i - 1}")
        def g(fcol: String) =
          s"CAST(sum(CAST(round((($pw - f.y) * $fcol) * 1000000000.0) AS BIGINT)) AS DOUBLE)"
        def gb =
          s"CAST(sum(CAST(round(($pw - f.y) * 1000000000.0) AS BIGINT)) AS DOUBLE)"
        s""",
           |g$i AS MATERIALIZED (
           |  SELECT ${g("f.f_len")} AS g0, ${g("f.f_stop")} AS g1,
           |    ${g("f.f_punct")} AS g2, ${g("f.f_wlen")} AS g3,
           |    $gb AS gb, CAST(count(*) AS DOUBLE) AS n
           |  FROM f, w${i - 1} WHERE f.split = 'train'),
           |w$i AS MATERIALIZED (
           |  SELECT w.w0 - 0.5 * ((g.g0 / 1000000000.0) / g.n) AS w0,
           |    w.w1 - 0.5 * ((g.g1 / 1000000000.0) / g.n) AS w1,
           |    w.w2 - 0.5 * ((g.g2 / 1000000000.0) / g.n) AS w2,
           |    w.w3 - 0.5 * ((g.g3 / 1000000000.0) / g.n) AS w3,
           |    w.wb - 0.5 * ((g.gb / 1000000000.0) / g.n) AS wb
           |  FROM w${i - 1} w, g$i g)"""
      }.mkString
      val tail =
        s"""
           |SELECT f.doc_id, f.split, (f.y = 1.0) AS label,
           |  ${p(s"w$iters")} AS score,
           |  (${p(s"w$iters")} >= 0.5) AS predicted
           |FROM f, w$iters ORDER BY f.doc_id"""
      (head + rounds + tail).stripMargin
    },
    "q62_kmeans" -> {
      // DuckDB replay of the quantized Lloyd trajectory (k=8, 5
      // iterations) — every CTE is integer arithmetic: argmin with
      // (d2, cluster) ordering, centroid update by portable floor
      // division, empty clusters carried forward by the LEFT JOIN
      // coalesce. Mirrors graft.ml.KMeans.fitQuantized op for op.
      val iters = 5
      val head =
        """WITH q AS (
          |  SELECT vec_id, CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS pos,
          |    CAST(round(unnest(e) * 10000000.0) AS BIGINT) AS r
          |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
          |seed AS (
          |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
          |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
          |c0 AS (
          |  SELECT seed.cluster, q.pos, q.r AS v
          |  FROM seed JOIN q ON q.vec_id = seed.vec_id)"""
      val rounds = (1 to iters).map { i =>
        s""",
           |d$i AS (
           |  SELECT q.vec_id, c.cluster, sum((q.r - c.v) * (q.r - c.v)) AS d2
           |  FROM q JOIN c${i - 1} c ON q.pos = c.pos GROUP BY 1, 2),
           |a$i AS (
           |  SELECT vec_id, cluster FROM (
           |    SELECT vec_id, cluster,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
           |    FROM d$i) WHERE rn = 1),
           |s$i AS (
           |  SELECT a.cluster, q.pos, CAST(sum(q.r) AS BIGINT) AS sm,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM a$i a JOIN q ON a.vec_id = q.vec_id GROUP BY 1, 2),
           |c$i AS (
           |  SELECT o.cluster, o.pos, coalesce(
           |    CAST((s.sm - (((s.sm % s.n) + s.n) % s.n)) / s.n AS BIGINT), o.v) AS v
           |  FROM c${i - 1} o LEFT JOIN s$i s
           |    ON o.cluster = s.cluster AND o.pos = s.pos)"""
      }.mkString
      val tail =
        s""",
           |df AS (
           |  SELECT q.vec_id, c.cluster, sum((q.r - c.v) * (q.r - c.v)) AS d2
           |  FROM q JOIN c$iters c ON q.pos = c.pos GROUP BY 1, 2),
           |af AS (
           |  SELECT vec_id, cluster, d2 FROM (
           |    SELECT vec_id, cluster, d2,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
           |    FROM df) WHERE rn = 1)
           |SELECT CAST(cluster AS BIGINT) AS cluster, count(*) AS n,
           |  CAST(sum(d2) AS DOUBLE) / 100000000000000.0 AS inertia
           |FROM af GROUP BY 1 ORDER BY 1"""
      (head + rounds + tail).stripMargin
    },
    "q64_embedding_stats" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |ex AS (
        |  SELECT CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS pos,
        |    unnest(e) AS val
        |  FROM v),
        |r AS (
        |  SELECT pos, val, CAST(round(val * 10000000.0) AS BIGINT) AS r FROM ex),
        |g AS (
        |  SELECT pos, count(*) AS n, min(val) AS mn, max(val) AS mx,
        |    CAST(sum(r) AS DOUBLE) AS s1d, CAST(sum(r * r) AS DOUBLE) AS s2d
        |  FROM r GROUP BY 1)
        |SELECT pos, n, mn, mx,
        |  s1d / 10000000.0 / n AS mean,
        |  ((s2d - s1d * s1d / n) / n) / 100000000000000.0 AS var_pop
        |FROM g ORDER BY pos""".stripMargin,
    "q60_colstats" -> {
      val selects = statCols.map { cs =>
        val x = S.cents(cs.c)
        s"""SELECT '${cs.name}' AS col_name, count(*) AS n,
           |  CAST(sum(CASE WHEN $x <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
           |  min(${cs.c}) AS mn, max(${cs.c}) AS mx,
           |  CAST(sum($x) AS DOUBLE) / 100.0 / count(*) AS mean,
           |  ((CAST(sum($x * $x) AS DOUBLE)
           |    - CAST(sum($x) AS DOUBLE) * CAST(sum($x) AS DOUBLE) / count(*))
           |   / count(*)) / 10000.0 AS var_pop,
           |  CAST(sum(abs($x)) AS BIGINT) / 100.0 AS l1,
           |  sqrt(CAST(sum($x * $x) AS DOUBLE)) / 100.0 AS l2
           |FROM lineitem""".stripMargin
      }
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q61_corr" -> {
      val selects = Seq(
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount")).map { case (a, b) =>
        val (xa, xb) = (S.cents(a), S.cents(b))
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  (CAST(count(*) AS DOUBLE) * CAST(sum($xa * $xb) AS DOUBLE)
           |     - CAST(sum($xa) AS DOUBLE) * CAST(sum($xb) AS DOUBLE))
           |  / (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum($xa * $xa) AS DOUBLE)
           |        - CAST(sum($xa) AS DOUBLE) * CAST(sum($xa) AS DOUBLE))
           |     * sqrt(CAST(count(*) AS DOUBLE) * CAST(sum($xb * $xb) AS DOUBLE)
           |        - CAST(sum($xb) AS DOUBLE) * CAST(sum($xb) AS DOUBLE))) AS corr
           |FROM lineitem""".stripMargin
      }
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    })
}
