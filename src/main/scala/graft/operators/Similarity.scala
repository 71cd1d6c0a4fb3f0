package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.E similarity search over the embeddings table.
  *
  *  - q50: brute-force cosine top-k — the exact baseline. orderBy+limit
  *    plans as TakeOrderedAndProject (per-partition top-k, tiny shuffle).
  *  - q51: random-hyperplane LSH ANN — the scale path. 12 tables x 6-bit
  *    sign codes; candidates share a full code in some table, then exact
  *    cosine only within candidates. Rows-only (probabilistic recall);
  *    recall against q50 is asserted in SimilaritySpec.
  *  - q52: per-label top-k most-similar pairs — label-blocked exact join
  *    + the bounded TopKByScore aggregate (no low-cardinality window).
  *  - q53: IVF-style centroid probe — per-label midrange centroids
  *    ((min+max)/2 per dim: order-independent, hence exactly
  *    reproducible), probe the 2 nearest cells, exact search inside.
  */
object Similarity extends QueryPack {
  import VectorOps._

  /** (vec_id, label, e: array<double>, n2) — THE decoded-embedding frame
    * for the whole ANN/dedup family (the q44/q87 tiers project label
    * away). One [[graft.FrameCache]] entry per (session, dir), so a run
    * touching q44/q50-q54/q73/q79/q85/q87 holds ONE cache entry instead
    * of registering a fresh never-unpersisted Dataset per call — with
    * the cache's bound, LRU unpersist-on-evict, stopped-session
    * eviction, and dir-immutability contract (documented there). */
  private[graft] def decodedVecs(s: SparkSession, dir: String): DataFrame =
    graft.FrameCache.persisted(s, s"decodedVecs:$dir") {
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
        .withColumn("n2", norm2(col("e")))
    }
  private def vecs(s: SparkSession, dir: String): DataFrame = decodedVecs(s, dir)

  /** Exact-content canonicalization of a vector frame — the dedup-ladder
    * step every LSH tier runs first (R exact copies otherwise feed
    * C(R,2) bucket pairs): (doc_id, rep_id) with rep = min vec_id per
    * identical decoded array (xxhash64), persisted for the reps +
    * expansion reads. Shared by q44b/q73b/q87b so the tiers cannot
    * drift apart. [[graft.FrameCache]]-persisted so repeated runs reuse
    * ONE entry instead of leaking one per call: gated queries pass their
    * (query, dir)-pure `cacheKey`; with no key the entry is keyed by the
    * input's canonicalized plan (the spec path — note plans containing
    * higher-order-function lambdas never canonicalize equal across
    * calls, because lambda variables get fresh global-counter names, so
    * an explicit key is REQUIRED for stable reuse of such inputs). */
  private[graft] def contentGroups(v: DataFrame, cacheKey: String = ""): DataFrame = {
    def build = {
      val dg = v.select(col("vec_id").as("doc_id"), xxhash64(col("e")).as("dg"))
      val reps = dg.groupBy(col("dg")).agg(min(col("doc_id")).as("rep_id"))
      dg.join(reps, "dg").select(col("doc_id"), col("rep_id"))
    }
    if (cacheKey.nonEmpty)
      graft.FrameCache.persisted(v.sparkSession, s"contentGroups:$cacheKey")(build)
    else graft.FrameCache.persistedFor(v, "contentGroups")(build)
  }

  /** Restrict `v` to the group representatives — the frame the bucketed
    * candidate join runs on. */
  private[graft] def groupReps(v: DataFrame, groups: DataFrame): DataFrame =
    v.join(groups.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).filter(col("vec_id") === 0)
      .select(col("e").as("qe"), col("n2").as("qn2"))

  def q50KnnBrute(s: SparkSession, dir: String): DataFrame =
    knnBrute(s, dir, 10)

  /** The exact query-vs-corpus cosine scan at parameterized k — q50 at
    * k=10 is the gated tier; q104's fusion pulls a k=20 list. */
  private[graft] def knnBrute(s: SparkSession, dir: String, k: Int): DataFrame =
    vecs(s, dir).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)

  // Default LSH geometry: 12 tables x 12 sign bits; fixed gaussian
  // hyperplanes (seed 7). 12-bit codes (not 6) because the query side
  // MULTIPROBES: longer codes keep random-pair collisions rare, and
  // probing neighboring codes buys the recall back for near neighbors.
  //
  // `tables`/`bits`/`radius` are the RECALL KNOBS a production run
  // raises until a measured recall target holds (more tables = more
  // independent chances to collide; larger radius = more probed codes;
  // fewer bits = coarser buckets). Every entry point below takes them
  // with these defaults, so the gated queries are unchanged while a
  // caller can turn the dials. At fixed `bits` the seed-7 plane stream
  // makes table sets NESTED (the planes for t tables are a prefix of
  // those for t' > t), so the candidate set — and therefore recall — is
  // deterministically MONOTONE in `tables`, spec-asserted in
  // SimilaritySpec alongside the q53 nprobe monotonicity.
  private[graft] val LshTables = 12
  private[graft] val LshBits = 12
  private val hyperplaneCache = scala.collection.concurrent.TrieMap
    .empty[(Int, Int), Array[Array[Double]]]
  private def hyperplanes(tables: Int, bits: Int): Array[Array[Double]] =
    hyperplaneCache.getOrElseUpdate((tables, bits), {
      val rnd = new scala.util.Random(7)
      Array.fill(tables * bits)(Array.fill(64)(rnd.nextGaussian()))
    })

  /** `tables` LSH codes per vector via the native
    * [[graft.functions.HyperplaneCodes]] expression (the builtin
    * composition needs ~4600 literal nodes and falls out of codegen).
    * Join key = (array position, code). */
  private[graft] def lshCodes(e: Column, tables: Int = LshTables,
      bits: Int = LshBits): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.HyperplaneCodes(
        org.apache.spark.sql.GraftSqlBridge.toExpression(e),
        hyperplanes(tables, bits), bits))

  /** XOR masks for multiprobe at Hamming radius `r` over `bits`-bit codes
    * (identity mask included): radius 1 -> bits+1 probes, radius 2 ->
    * 1 + bits + bits*(bits-1)/2. */
  private[graft] def probeMasks(bits: Int, r: Int): Array[Long] = {
    val singles = (0 until bits).map(i => 1L << i)
    val pairs = for { i <- 0 until bits; j <- i + 1 until bits }
      yield (1L << i) | (1L << j)
    (Seq(0L) ++ (if (r >= 1) singles else Nil) ++
      (if (r >= 2) pairs else Nil)).toArray
  }

  /** ANN with query-side multiprobe: a vector is a candidate when its
    * code in some table is within Hamming distance 2 of the query's code
    * there; exact cosine only on candidates. Rows-only: recall is
    * probabilistic, spec-checked against q50.
    *
    * Why multiprobe: the driver's embeddings are near-orthogonal noise
    * (query's 10th neighbor at cos ~0.3, p_bit ~0.6), the worst case for
    * angular LSH — single-probe 12x6 tables measured recall@10 ~0.2 at
    * ~17% candidates. Probing the 79 codes at Hamming <= 2 per 12-bit
    * table lifts per-neighbor retrieval to 1-(1-p^12-12p^11q-66p^10q^2)^12
    * ~ 0.63 at cos 0.3 while random-pair collisions stay at
    * 1-(1-79/4096)^12 ~ 21% — multiprobe trades probe count for recall
    * WITHOUT growing the stored index (only the broadcast query side
    * expands, by 79x on a handful of rows). At production similarity
    * (cos >= 0.8) the same tables retrieve with p ~ 1. */
  def q51KnnLsh(s: SparkSession, dir: String): DataFrame =
    knnLsh(s, dir)

  /** q51 with the recall knobs exposed: `tables`/`bits` set the stored
    * index geometry, `radius` the query-side multiprobe Hamming ball.
    * Defaults reproduce the gated q51 exactly. */
  private[graft] def knnLsh(s: SparkSession, dir: String,
      tables: Int = LshTables, bits: Int = LshBits, radius: Int = 2): DataFrame = {
    val v = vecs(s, dir)
    val codes = v.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        posexplode(lshCodes(col("e"), tables, bits)).as(Seq("t", "code")))
    val masks = array(probeMasks(bits, radius).map(lit): _*)
    val qCodes = queryVec(s, dir)
      .select(posexplode(lshCodes(col("qe"), tables, bits)).as(Seq("qt", "qcode")))
      .select(col("qt"), col("qcode"), explode(masks).as("mask"))
      .select(col("qt"), col("qcode").bitwiseXOR(col("mask")).as("qprobe"))
    val candIds = codes.join(broadcast(qCodes),
        col("t") === col("qt") && col("code") === col("qprobe"))
      .select(col("vec_id")).distinct()
    v.join(candIds, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** Per-label top-3 most-similar pairs — the EXACT tier (the oracle
    * gate). The within-label pair join is inherently O(n^2/labels); that
    * is acceptable only because this is the verification tier, exactly
    * like q44 vs q51 — the scale path is [[q52bPairwiseTopkLsh]], which
    * generates candidates through bucketed LSH and rescores exactly.
    * (An LSH prefilter cannot keep THIS query oracle-exact: the driver
    * corpus's true top-3 pairs sit at cos 0.32-0.51 on near-orthogonal
    * noise, where every sublinear candidate scheme has recall < 1; see
    * the q52b scaladoc for the numbers.)
    *
    * Pair identity is encoded as (id_a << 31) | id_b for the bounded
    * top-k aggregate — exact for any vec_id below 2^31 (enforced inside
    * the aggregated expression: pairKey throws on out-of-range ids
    * rather than silently corrupting pair identity), and its numeric
    * order is the (id_a, id_b) lexicographic order, so the tie-break is
    * unchanged. */
  def q52PairwiseTopk(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val pairs = v.as("a").join(v.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        pairKey(col("a.vec_id"), col("b.vec_id")).as("pk"),
        cosineFrom(dot(col("a.e"), col("b.e")), col("a.n2"), col("b.n2")).as("cos"))
    topPairs(pairs)
  }

  /** (id_a << 31) | id_b with the 2^31 contract ENFORCED: ids at or past
    * 2^31 raise instead of decoding to a different pair downstream. */
  private def pairKey(idA: Column, idB: Column): Column = {
    val lim = 1L << 31
    val guard = (id: Column) => when(id >= lim || id < 0,
      raise_error(concat(lit(s"q52 pair key overflow: vec_id "), id,
        lit(s" outside [0, $lim)")))).otherwise(id.cast("long"))
    shiftleft(guard(idA), 31).bitwiseOR(guard(idB))
  }

  /** Shared q52/q52b tail: bounded top-3 per label + pair-key unpack. */
  private def topPairs(pairs: DataFrame): DataFrame = {
    val topk = udaf(new TopKByScore(3))
    pairs.groupBy(col("label"))
      .agg(topk(col("cos"), col("pk")).as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("label"), (col("pos") + 1).cast("long").as("rk"),
        shiftright(col("t.key"), 31).cast("long").as("id_a"),
        col("t.key").bitwiseAND(lit((1L << 31) - 1)).cast("long").as("id_b"),
        col("t.score").as("cos"))
      .orderBy(col("label"), col("rk"))
  }

  /** The 100x-scale path for per-label top-k pairs: candidate pairs are
    * vectors sharing an LSH code (Hamming <= 1 via index-side probe
    * expansion) in some table WITHIN their label — a bucket-keyed
    * equi-join, never the within-label cross product — then exact cosine
    * rescoring and the same bounded top-k tail as q52.
    *
    * Regime analysis (12 tables x 12 bits, radius-1 probing on one join
    * side): a random pair collides in a table w.p. 13/4096, so candidate
    * volume is ~1-(1-0.0032)^12 ~ 3.7% of all within-label pairs; a real
    * near-dup pair at cos 0.95 (p_bit ~0.9) collides w.p.
    * p^12 + 12 p^11 q ~ 0.65 per table -> retrieved w.p. ~0.999997.
    * On the driver's near-orthogonal corpus (top pairs at cos 0.32-0.51)
    * retrieval of the exact top-3 is genuinely probabilistic (~0.3-0.8
    * per pair) — which is WHY q52 keeps the exact tier for the oracle and
    * this entry is gated rows-only, with the planted-near-dup recall
    * property spec-checked in SimilaritySpec. */
  def q52bPairwiseTopkLsh(s: SparkSession, dir: String): DataFrame =
    pairwiseTopkLsh(vecs(s, dir))

  /** Shared LSH candidate-pair generator — the bucket-keyed equi-join
    * that replaces a cross product in every ANN-family scale path:
    * (id_a < id_b) pairs sharing a code (expanded to Hamming <= `radius`
    * on one join side) in some table, optionally blocked by `blockCols`
    * (carried through on the output). Input `v` needs (vec_id, e).
    *
    * `carry` columns of `v` ride the code tables through the bucket join
    * and come out as `<c>_a`/`<c>_b` — the zero-extra-join way for a
    * caller to PRUNE candidate pairs on per-vector properties (q87b's
    * split-crossable filter) before the rescore stage pays the vector
    * joins: joining such properties onto the pair table afterwards
    * would re-shuffle the pairs twice for data the codes already had in
    * hand (measured ~1 s extra at sf0.1, and at real scale the property
    * table is corpus-sized — not broadcastable). Functionally dependent
    * on vec_id, so the dedup distinct is unaffected. */
  private[graft] def lshCandidatePairs(v: DataFrame, blockCols: Seq[String],
      radius: Int, carry: Seq[String] = Nil,
      tables: Int = LshTables, bits: Int = LshBits): DataFrame = {
    val keep = (blockCols ++ carry).map(col)
    val codes = v.select(col("vec_id") +: keep :+
      posexplode(lshCodes(col("e"), tables, bits)).as(Seq("t", "code")): _*)
    val masks = array(probeMasks(bits, radius).map(lit): _*)
    val probed = codes
      .select((col("vec_id") +: keep) ++ Seq(col("t"),
        col("code"), explode(masks).as("mask")): _*)
      .select((col("vec_id") +: keep) ++ Seq(col("t"),
        col("code").bitwiseXOR(col("mask")).as("code")): _*)
    val joinCond = (Seq("t", "code") ++ blockCols)
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.vec_id") < col("b.vec_id")
    probed.as("a").join(codes.as("b"), joinCond)
      .select(blockCols.map(c => col(s"a.$c").as(c)) ++
        Seq(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b")) ++
        carry.flatMap(c =>
          Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b"))): _*)
      .distinct()
  }

  /** Exact cosine rescoring of candidate (id_a, id_b) pairs against the
    * decoded vector frame `v` — two vector equi-joins, shared by every
    * LSH tier's verify stage. Extra candidate columns pass through. */
  private[graft] def rescorePairs(cand: DataFrame, v: DataFrame): DataFrame =
    cand
      .join(v.select(col("vec_id"), col("e").as("ea"), col("n2").as("na")),
        col("id_a") === col("vec_id")).drop("vec_id")
      .join(v.select(col("vec_id"), col("e").as("eb"), col("n2").as("nb")),
        col("id_b") === col("vec_id")).drop("vec_id")
      .withColumn("cos",
        cosineFrom(dot(col("ea"), col("eb")), col("na"), col("nb")))
      .drop("ea", "na", "eb", "nb")

  private[graft] def pairwiseTopkLsh(v: DataFrame): DataFrame = {
    val cand = lshCandidatePairs(v, Seq("label"), radius = 1)
    val rescored = rescorePairs(cand, v)
      .select(col("label"), pairKey(col("id_a"), col("id_b")).as("pk"), col("cos"))
    topPairs(rescored)
  }

  /** Integer dot product of two equal-length array<bigint> columns via
    * the native codegen'd [[graft.functions.LongDot]] — exact (integer
    * arithmetic, no float order concerns), so the quantized distance is
    * bit-identical in any engine. DotSpec asserts it agrees with the
    * builtin zip_with/aggregate composition. */
  private def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(graft.functions.LongDot(
      org.apache.spark.sql.GraftSqlBridge.toExpression(a),
      org.apache.spark.sql.GraftSqlBridge.toExpression(b)))

  /** Scalar-quantized (8-bit) brute-force kNN — the memory-compression
    * scan path for ANN. Brute-force cosine at 100 TB is scan-bound, so
    * the standard production lever is shrinking the bytes scanned:
    * per-dimension min/max over the corpus (one partial-aggregable
    * pass), affine-quantize every component to 0..255 (4x smaller than
    * float32, 8x smaller than the decoded doubles), and run the same
    * top-k scan on integer dot products. Quantization error at 8 bits
    * is ~0.4% of each dim's range, so the cosine ranking is essentially
    * preserved (recall vs exact q50 is spec-asserted); unlike q51/q52b
    * the result here is DETERMINISTIC, so this op is oracle-gated
    * exactly, not rows-only: integer dots are exact, and the one float
    * division per pair mirrors the oracle bit-for-bit.
    *
    * The min/max "codebook" is a 64-row aggregate kept distributed and
    * broadcast — no driver collect. Degenerate all-zero codes guard the
    * division (score -2.0 sorts last) identically in both engines. */
  def q54KnnQuantized(s: SparkSession, dir: String): DataFrame = {
    val qv = quantizedVecs(s, dir)
    val qq = qv.filter(col("vec_id") === 0)
      .select(col("q").as("cq"), col("qn2").as("cqn2"))
    qv.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qq))
      .select(col("vec_id"),
        quantCos(col("q"), col("qn2"), col("cq"), col("cqn2")).as("qcos"))
      .orderBy(col("qcos").desc, col("vec_id"))
      .limit(10)
  }

  /** Quantized cosine from integer dots, with the all-zero-code guard
    * (score -2.0 sorts last) mirrored in the oracle — shared by q54 and
    * q106 so the two tiers cannot drift. */
  private def quantCos(q: Column, qn2: Column, cq: Column, cqn2: Column): Column =
    when(qn2 === 0 || cqn2 === 0, lit(-2.0))
      .otherwise(intDot(q, cq).cast("double") /
        (sqrt(qn2.cast("double")) * sqrt(cqn2.cast("double"))))

  /** (vec_id, q: array<bigint>, qn2) — the 8-bit affine-quantized frame
    * shared by q54's gated scan and q106's eval (FrameCache-persisted
    * so an eval run quantizes the corpus ONCE, not once per retriever).
    * Codebook = per-dimension min/max over the corpus: one
    * partial-aggregable pass, kept distributed and broadcast — no
    * driver collect. */
  private[graft] def quantizedVecs(s: SparkSession, dir: String): DataFrame =
    graft.FrameCache.persisted(s, s"quantizedVecs:$dir") {
      quantizeCorpus(vecs(s, dir))
    }

  /** The per-dimension min/max codebook of a (vec_id, e) frame — one
    * row (mn: array, mx: array); the serving store persists it so a
    * fresh process can quantize QUERIES with the corpus's own affine
    * map. */
  private[graft] def corpusCodebook(v: DataFrame): DataFrame =
    v.select(posexplode(col("e")).as(Seq("pos", "val")))
      .groupBy(col("pos"))
      .agg(min(col("val")).as("mn"), max(col("val")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("mn")))).as("mns"),
        array_sort(collect_list(struct(col("pos"), col("mx")))).as("mxs"))
      .select(transform(col("mns"), x => x.getField("mn")).as("mn"),
        transform(col("mxs"), x => x.getField("mx")).as("mx"))

  /** 8-bit affine quantization of a (vec_id, e) frame against its own
    * [[corpusCodebook]] — (vec_id, q: array<bigint>, qn2). Shared by
    * the in-memory q54/q106 tier and the persisted store build
    * ([[graft.sources.AnnIndexStore]]), so the two tiers fold the
    * identical integer codes and stay gated by the same oracle. */
  private def quantExpr(e: Column, mn: Column, mx: Column): Column =
    transform(e, (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi > lo, round((x - lo) * 255.0 / (hi - lo)).cast("long"))
        .otherwise(lit(0L))
    })

  private[graft] def quantizeCorpus(v: DataFrame): DataFrame =
    v.crossJoin(broadcast(corpusCodebook(v)))
      .select(col("vec_id"), quantExpr(col("e"), col("mn"), col("mx")).as("q"))
      .withColumn("qn2", intDot(col("q"), col("q")))

  /** The decoded frame with its quantized codes ALONGSIDE the exact
    * vectors — (vec_id, e, n2, q, qn2), the same affine map as
    * [[quantizeCorpus]] (identical expressions against the identical
    * codebook, so the codes cannot drift from q54's tier). Lets q106
    * score both retrievers off ONE corpus scan. */
  private def withQuantized(v: DataFrame): DataFrame =
    v.crossJoin(broadcast(corpusCodebook(v)))
      .select(col("vec_id"), col("e"), col("n2"),
        quantExpr(col("e"), col("mn"), col("mx")).as("q"))
      .withColumn("qn2", intDot(col("q"), col("q")))

  /** Integer dot as a column function for the store probe (the native
    * codegen'd LongDot behind q54's arithmetic). */
  private[graft] def intDotCol(a: Column, b: Column): Column = intDot(a, b)

  /** Exact cosine kNN GRAPH (top-3 neighbors for EVERY vector) — the
    * all-nodes generalization of q50's single-query scan, the structure
    * an ANN-graph index build (or graph-based near-dup walk) starts
    * from. Exact tier: the all-pairs join is O(n²) by definition and is
    * kept as the oracle gate; at 100 TB the candidate generation swaps
    * to the q52b shape (per-bucket LSH equi-join + exact rescoring, same
    * bounded top-k tail) — this query IS that tail, so the two tiers
    * share everything but the pair source.
    *
    * Per-node top-3 through the bounded [[TopKByScore]] aggregate: each
    * map task reduces its pair block to ≤3 rows per node before the
    * node-keyed shuffle — never a per-node sort of all n-1 candidates. */
  def q73KnnGraph(s: SparkSession, dir: String): DataFrame =
    knnGraphTail(q73Scored(s, dir))

  /** The exact all-pairs scored frame feeding q73's bounded top-3. */
  private def q73Scored(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    // The streamed side inherits the cached frame's scan partitioning
    // (ONE partition on a single-file input), serializing the O(n²)
    // rescore loop on one core; spreading it across the cluster's
    // parallelism costs one tiny exchange of the vector rows and buys
    // the whole join stage. Result-identical: the bounded top-3 tail is
    // an order-independent aggregate with a total (score desc, id)
    // order. The build side is hinted broadcast (it already was — this
    // pins the choice so the repartition can't flip it).
    val a = v.repartition(s.sparkContext.defaultParallelism)
    a.as("a").join(broadcast(v.as("b")),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr"),
        cosineFrom(dot(col("a.e"), col("b.e")), col("a.n2"), col("b.n2")).as("cos"))
  }

  /** q73's exact graph as a bare (src, dst) edge relation — the q96
    * walk's input, read straight off the bounded top-3 lists: same edge
    * SET as `q73KnnGraph.select(vec_id, nbr_id)`, minus the ranked
    * unpack's global sort and rank projection the walk never consumes
    * (the q73bEdgesWithDeg move, applied to the exact tier). */
  private[graft] def q73Edges(s: SparkSession, dir: String): DataFrame =
    knnGraphTop(q73Scored(s, dir))
      .select(col("vec_id").as("src"), explode(col("top")).as("t"))
      .select(col("src"), col("t.key").as("dst"))

  /** Per-node bounded top-3 lists (vec_id, top) — the pre-unpack form of
    * [[knnGraphTail]], exposed separately so graph CONSUMERS that only
    * need (src, dst, deg) can read deg = size(top) off the aggregate
    * instead of re-counting exploded rows with a self-join (q96b /
    * KnnGraphStore — guide §2.4, remove shuffles outright). */
  private def knnGraphTop(scored: DataFrame): DataFrame = {
    val topk = udaf(new TopKByScore(3))
    scored
      .groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("nbr")).as("top"))
  }

  /** Ranked unpack of a (vec_id, top) list frame — the q73/q73b
    * presentation (rk from list position, full order). */
  private def unpackKnnTop(top: DataFrame): DataFrame =
    top.select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rk"),
        col("t.key").as("nbr_id"), col("t.score").as("cos"))
      .orderBy(col("vec_id"), col("rk"))

  /** (src, dst, deg) edge relation off a (vec_id, top) list frame — ONE
    * projection: deg = size(top) is EXACTLY the per-src row count the
    * old `e.join(e.groupBy("src").count)` self-join recomputed (each
    * exploded row is one list element), and the walk never needs the
    * ranked unpack's global sort. */
  private def edgesWithDegFromTop(top: DataFrame): DataFrame =
    top.select(col("vec_id").as("src"),
        size(col("top")).cast("long").as("deg"), explode(col("top")).as("t"))
      .select(col("src"), col("t.key").as("dst"), col("deg"))

  /** Shared q73/q73b tail: per-node bounded top-3 + rank unpack. */
  private def knnGraphTail(scored: DataFrame): DataFrame =
    unpackKnnTop(knnGraphTop(scored))

  /** Approximate kNN graph — the 100×-scale path q73's contract points
    * at, now executable: candidate edges from [[lshCandidatePairs]]
    * (12 tables × 12 bits, Hamming <= 1 probing — ~3.7% of all pairs on
    * random data, ~every pair at production similarity), symmetrized so
    * each candidate feeds BOTH endpoints' lists, exact cosine rescoring,
    * then the same bounded top-3 tail as q73. Nodes whose buckets
    * surface no candidate emit no rows — the standard ANN-graph build
    * contract (a production run raises tables/radius until coverage).
    * Rows-only by design (LSH retrieval is probabilistic); the
    * planted-duplicate mutual-rank-1 property and the ranked-list shape
    * are spec-asserted in SimilaritySpec, mirroring q51/q52b.
    *
    * Exact-content canonicalization first — the dedup-ladder rule, same
    * as q44b: R exact copies share every LSH code, so member-level
    * candidate generation is quadratic in R (measured 62× wall at 16×
    * replication without this). The rep-level graph runs over unique
    * vectors; member lists are then reconstructed EXACTLY, because a
    * vector's cosine to anything depends only on its content group:
    * co-members enter at cosine 1.0 (the mathematically exact value),
    * each rep-level neighbor group expands to its members (identical
    * arrays ⇒ identical cosines), and the same bounded top-3 re-ranks —
    * a member's true top-3 can only draw from its co-members and the 3
    * nearest groups, so expanding the bounded rep lists is lossless (up
    * to rep-level ties at equal cosine, resolved by id). On a
    * duplicate-free corpus every group is a singleton and both stages
    * collapse to the plain symmetrized candidate graph. */
  def q73bKnnGraphLsh(s: SparkSession, dir: String): DataFrame =
    approxKnnGraph(vecs(s, dir), cacheKey = s"q73b:$dir")

  /** The q73b LSH kNN graph as a (src, dst, deg) edge relation in one
    * pass — the form the centrality walk and the persisted graph store
    * consume. Bit-identical to deriving it from [[q73bKnnGraphLsh]] plus
    * a degree self-join (deg = bounded-list size = per-src row count),
    * minus that join and the ranked unpack's global sort. */
  private[graft] def q73bEdgesWithDeg(s: SparkSession, dir: String): DataFrame =
    edgesWithDegFromTop(approxKnnTop(vecs(s, dir), cacheKey = s"q73b:$dir"))

  private[graft] def approxKnnGraph(v: DataFrame, cacheKey: String = ""): DataFrame =
    unpackKnnTop(approxKnnTop(v, cacheKey))

  /** The approximate-graph pipeline up to the per-node bounded lists
    * (vec_id, top) — shared by the ranked q73b presentation and the
    * edge-relation consumers. */
  private def approxKnnTop(v: DataFrame, cacheKey: String = ""): DataFrame = {
    val groupsStd = contentGroups(v, cacheKey)
    val vReps = groupReps(v, groupsStd)
    val groups = groupsStd.withColumnRenamed("doc_id", "m_id")
    val scored = rescorePairs(lshCandidatePairs(vReps, Nil, radius = 1), vReps)
    // bound the rep-level lists BEFORE member expansion: the expansion
    // multiplies rows by group sizes, so it must ride on <= 3 rows per
    // rep, never the full candidate set.
    //
    // Symmetrization is a per-row EXPLODE of both directions, not the
    // earlier self-union: union branches are separate plans to Spark,
    // so the candidate join + rescore ran TWICE per build (~13k-node
    // plan, 2x the LSH bucket join's exchanges — guide §2.4/§7.2,
    // duplicated subtrees). The exploded rows are the identical
    // multiset (each scored pair contributes exactly its two directed
    // rows), and the bounded top-k aggregate is order-independent, so
    // the lists — and every downstream tier — are unchanged.
    val topk = udaf(new TopKByScore(3))
    val repTop = scored
      .select(explode(array(
        struct(col("id_a").as("rep"), col("id_b").as("nbr_rep"), col("cos")),
        struct(col("id_b").as("rep"), col("id_a").as("nbr_rep"), col("cos"))))
        .as("p"))
      .select(col("p.rep").as("rep"), col("p.nbr_rep").as("nbr_rep"),
        col("p.cos").as("cos"))
      .groupBy(col("rep"))
      .agg(topk(col("cos"), col("nbr_rep")).as("top"))
      .select(col("rep"), explode(col("top")).as("t"))
      .select(col("rep"), col("t.key").as("nbr_rep"), col("t.score").as("cos"))
    val coEdges = groups.as("x").join(groups.as("y"),
        col("x.rep_id") === col("y.rep_id") && col("x.m_id") =!= col("y.m_id"))
      .select(col("x.m_id").as("vec_id"), col("y.m_id").as("nbr"),
        lit(1.0).as("cos"))
    val expEdges = groups.select(col("m_id").as("vec_id"), col("rep_id").as("rep"))
      .join(repTop, "rep")
      .join(groups.select(col("rep_id").as("nbr_rep"), col("m_id").as("nbr")),
        "nbr_rep")
      .select(col("vec_id"), col("nbr"), col("cos"))
    knnGraphTop(coEdges.unionAll(expEdges))
  }

  // JL projection 64 -> 16 dims: fixed Gaussian planes (seed 11), rows
  // scaled by 1/sqrt(k) so squared distances are preserved in
  // expectation. k = 16 keeps E[relative distortion] ~ sqrt(2/k) ~ 35%
  // — coarse, but rank-1-preserving for true duplicates (distance 0
  // projects to 0 exactly) and 4x fewer bytes per scan.
  private val ProjDims = 16
  private val ProjPlanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(11)
    Array.fill(ProjDims)(
      Array.fill(64)(rnd.nextGaussian() / math.sqrt(ProjDims.toDouble)))
  }

  private def project(e: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.ProjectVector(
        org.apache.spark.sql.GraftSqlBridge.toExpression(e), ProjPlanes))

  /** Johnson–Lindenstrauss-projected kNN scan — the DIMENSION-compression
    * lever beside q54's cell-compression: project every vector 64 -> 16
    * dims through the native [[graft.functions.ProjectVector]] (matrix as
    * a codegen reference object), then run the q50 top-k scan in the
    * projected space at a quarter of the bytes. Rows-only by design: the
    * projection matrix is engine-internal (like the LSH planes), so the
    * ranking is deterministic but not oracle-reproducible; the JL
    * distance-preservation law and planted-duplicate rank-1 contract are
    * spec-asserted (SimilaritySpec), mirroring q51's recall gate. */
  def q79RandProj(s: SparkSession, dir: String): DataFrame =
    projectedKnn(vecs(s, dir))

  private[graft] def projectedKnn(v: DataFrame): DataFrame = {
    val p = v.select(col("vec_id"), project(col("e")).as("pe"))
      .withColumn("pn2", norm2(col("pe")))
    val q = p.filter(col("vec_id") === 0)
      .select(col("pe").as("qpe"), col("pn2").as("qpn2"))
    p.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosineFrom(dot(col("pe"), col("qpe")), col("pn2"), col("qpn2")).as("pcos"))
      .orderBy(col("pcos").desc, col("vec_id"))
      .limit(10)
  }

  /** Pairwise distances before/after projection for the spec's JL law
    * check (not a gated query). */
  private[graft] def projectionDistortion(v: DataFrame): DataFrame = {
    val p = v.select(col("vec_id"), col("e"), project(col("e")).as("pe"))
    p.as("a").join(p.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        dot(col("a.e"), col("a.e")).as("aa"), dot(col("b.e"), col("b.e")).as("bb"),
        dot(col("a.e"), col("b.e")).as("ab"),
        dot(col("a.pe"), col("a.pe")).as("paa"), dot(col("b.pe"), col("b.pe")).as("pbb"),
        dot(col("a.pe"), col("b.pe")).as("pab"))
      .select((col("aa") + col("bb") - col("ab") * 2).as("d2"),
        (col("paa") + col("pbb") - col("pab") * 2).as("pd2"))
  }

  /** Matryoshka truncation report — the measurement behind storing
    * embedding PREFIXES (the third bytes-scanned lever after q54's
    * quantization and q79's projection, and the one MRL-trained models
    * make near-free): for each prefix length k ∈ {8, 16, 32}, how far
    * prefix cosine drifts from full-width cosine over the deterministic
    * consecutive-id pair sample. Per-pair errors are exact doubles;
    * they aggregate through 1e-9-scaled integer sums (double partial
    * sums would be merge-order-dependent — the q64 rule), so the whole
    * report is oracle-exact. One equi-join, three row-local prefix
    * evaluations, one 3-group aggregate. */
  def q85Matryoshka(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val pairs = v.as("a").join(v.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(col("a.e").as("ea"), col("b.e").as("eb"),
        cosineFrom(dot(col("a.e"), col("b.e")), col("a.n2"), col("b.n2"))
          .as("cos_full"))
    // all three prefix errors in ONE struct array per pair row, exploded
    // — a per-k union would re-run the join and full-width cosine three
    // times; this is one join, one pass. Zero-norm prefixes take the q54
    // guard (cos := -2.0) instead of dividing to NaN.
    val perK = array(Seq(8, 16, 32).map { k =>
      val (sa, sb) = (slice(col("ea"), 1, k), slice(col("eb"), 1, k))
      val cosK = when(norm2(sa) === 0 || norm2(sb) === 0, lit(-2.0))
        .otherwise(cosineFrom(dot(sa, sb), norm2(sa), norm2(sb)))
      struct(lit(k.toLong).as("k_dims"),
        abs(cosK - col("cos_full")).as("err"))
    }: _*)
    pairs.select(explode(perK).as("t"))
      .select(col("t.k_dims").as("k_dims"), col("t.err").as("err"))
      .withColumn("errn", round(col("err") * 1e9).cast("long"))
      .groupBy(col("k_dims"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("errn")) / 1e9 / count(lit(1))).as("mean_abs_err"),
        max(col("err")).as("max_abs_err"))
      .orderBy(col("k_dims"))
  }

  /** IVF centroid probe: midrange centroid per label cell, query probes
    * the 2 nearest cells, exact top-10 within them. Midrange (not mean)
    * keeps the centroid order-independent → bit-exact across engines. */
  def q53CentroidSearch(s: SparkSession, dir: String): DataFrame =
    centroidSearch(s, dir)

  /** q53 with the IVF probe-count knob exposed: `nprobe` nearest cells
    * are searched exactly. The probed cell set is nested in `nprobe`
    * (top-k cells ⊆ top-(k+1) cells), so recall against the exact scan
    * is deterministically monotone — at nprobe = #cells this IS the
    * exact scan (spec-asserted). Default reproduces the gated q53. */
  private[graft] def centroidSearch(s: SparkSession, dir: String,
      nprobe: Int = 2): DataFrame = {
    val v = vecs(s, dir)
    val cent = v.select(col("label"), posexplode(col("e")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(((min(col("val")) + max(col("val"))) / 2.0).as("mid"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mid")))).as("pm"))
      .select(col("label").as("c_label"),
        transform(col("pm"), x => x.getField("mid")).as("c"))
      .withColumn("cn2", norm2(col("c")))
    val probed = cent.crossJoin(broadcast(queryVec(s, dir)))
      .select(col("c_label"),
        cosineFrom(dot(col("c"), col("qe")), col("cn2"), col("qn2")).as("ccos"))
      .orderBy(col("ccos").desc, col("c_label"))
      .limit(nprobe)
    v.filter(col("vec_id") =!= 0)
      .join(broadcast(probed), col("label") === col("c_label"), "left_semi")
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), col("label"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** q92: IVF with a LEARNED coarse quantizer — the production shape
    * q53 approximates with label cells: KMeans centroids (k = 8, 5
    * Lloyd rounds, the q62 trainer) are the cell table, every vector is
    * assigned through the native codegen'd NearestCentroid argmin, the
    * query probes its `nprobe` nearest cells (centroids are driver-held
    * k x dim state, so cell ranking is a driver computation — the same
    * contract as the KMeans fit itself), and the exact cosine top-10
    * runs inside the probed cells only.
    *
    * The probed cell set is nested in nprobe, so recall against the
    * exact scan is monotone, and nprobe = k IS the exact scan — both
    * spec-asserted (the q53 laws, now on learned cells). Rows-only:
    * the cell structure depends on the KMeans iteration, which has no
    * one-shot SQL twin (the q62 precedent). */
  def q92IvfKmeans(s: SparkSession, dir: String): DataFrame =
    ivfKmeans(s, dir, nprobe = 2)

  private[graft] val IvfCells = 8

  private[graft] def ivfKmeans(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= IvfCells, s"nprobe in [1, $IvfCells], got $nprobe")
    val v = vecs(s, dir)
    val corpus = v.filter(col("vec_id") =!= 0)
    val cents = graft.ml.KMeans.fit(
      corpus.select(col("vec_id"), col("e")), IvfCells, iters = 5)
    val qe = v.filter(col("vec_id") === 0).select(col("e"))
      .head.getSeq[Double](0).toArray
    // driver-side cell ranking by L2 (the assignment metric); ties by
    // cell index for determinism
    val probed = cents.zipWithIndex.map { case (c, i) =>
      val d2 = c.zip(qe).map { case (a, b) => (a - b) * (a - b) }.sum
      (d2, i)
    }.sortBy(identity).take(nprobe).map(_._2)
    corpus
      .withColumn("cell", graft.ml.KMeans.assign(col("e"), cents).getField("cluster"))
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*))
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), col("cell"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** Damped PageRank over a constant-out-degree edge set, in EXACT
    * integer arithmetic: ranks are parts-per-trillion longs seeded at
    * 10¹², each round every node ships `pr div outDeg` along its edges
    * and re-seeds as `0.15·10¹² + (85·inSum) div 100` — floor division
    * in both engines, and the in-sum is a sum of LONGS (order-
    * independent), so the trajectory is bit-identical under any
    * partitioning. The rank VECTOR stays distributed (a DataFrame
    * joined per round) — unlike the driver-held KMeans/BPE/logistic
    * state, rank is O(nodes) and must never collect. Each round is one
    * equi-join on src + one dst-keyed partial-aggregable sum; lineage
    * stays 2·iters plans deep (bounded, no checkpoint needed at 5).
    * Long overflow headroom: 85·inSum < 2⁶³ holds while total rank mass
    * (nodes·10¹²) stays under ~10⁸ nodes per connected hub — past that,
    * the same plan runs on DECIMAL(38,0). */
  private[graft] def pageRank(vertices: DataFrame, edges: DataFrame,
      outDeg: Int, iters: Int): DataFrame =
    pageRankOn(vertices, edges.withColumn("deg", lit(outDeg.toLong)), iters)

  /** PageRank over a VARIABLE-out-degree edge set — the LSH-built graph
    * case: bucketed candidate generation guarantees no constant degree
    * (a node whose buckets surface < 3 candidates has a short list, or
    * none). Each node's actual out-degree is counted once and attached
    * to its edges (one aggregate + equi-join paid once, NOT per round),
    * so contributions divide by the true fan-out and the trajectory
    * stays exact integer arithmetic. */
  private[graft] def pageRankVarDeg(vertices: DataFrame, edges: DataFrame,
      iters: Int): DataFrame =
    pageRankOn(vertices,
      edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src"),
      iters)

  /** Lineage truncation for the walk's per-round side relations.
    * Default: `localCheckpoint` — blocks live on executors, fine on a
    * single host but NON-RECOVERABLE on executor loss (a lost block
    * fails the walk instead of recomputing; guide §5). Setting
    * `SPARK_GRAFT_CHECKPOINT_DIR` switches to a RELIABLE checkpoint in
    * that directory (HDFS/object store at cluster scale), trading one
    * write per side relation for mid-walk fault tolerance — the r17
    * verdict/ADVICE robustness item. Local default unchanged. */
  private def truncateLineage(df: DataFrame): DataFrame =
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty) match {
      case Some(d) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  private def pageRankOn(vertices: DataFrame, edgesWithDeg: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"pageRankOn needs iters >= 1, got $iters")
    // Decomposed walk — same longs, fewer shuffles. A vertex with no
    // in-edge never receives rank: it holds 10¹² before round 1 and the
    // bare seed 0.15·10¹² after EVERY round, so (a) round 1 needs no
    // rank join at all (every source is at the uniform 10¹²), (b) from
    // round 2 on, constant-rank sources contribute a FIXED long per dst,
    // precomputed once (`perDst.c`), and the per-round join touches only
    // edges whose source can change (`dynEdges`). This removes the old
    // per-round join against the full vertex relation — an O(V) shuffle
    // per round at scale — and shrinks each round to one rank-vector
    // shuffle plus one partial-aggregable sum. Exactness: every in-sum
    // remains a sum of the SAME longs (order-independent), and the
    // restriction of edges to the vertex universe up front is exactly
    // the old behaviour (rank only ever lived on `vertices`, so edges
    // with a foreign endpoint never moved rank). The side relations are
    // eagerly localCheckpoint'ed: they are read every round, and
    // truncating their lineage keeps the 5-round plan small (the q96b
    // edge build otherwise inlines a ~1 MB logical plan per round) —
    // driver-replan cost, not data loss, is what's at stake (rank stays
    // a distributed O(V) frame throughout; nothing collects).
    val vs = vertices.select(col("vec_id"))
    // eV stays lazy: its two broadcast semi-joins ride the two
    // materialization jobs below instead of paying their own barrier.
    val eV = edgesWithDeg
      .join(vs.withColumnRenamed("vec_id", "src"), Seq("src"), "left_semi")
      .join(vs.withColumnRenamed("vec_id", "dst"), Seq("dst"), "left_semi")
    // The dsts checkpoint goes FIRST and it alone decides when the
    // caller's (usually persisted) edge frame materializes: it scans eV
    // exactly once, so the expensive edge build populates the cache in
    // one pass. (Folding the membership test into the later jobs as a
    // lazy subtree was tried and measured SLOWER: the join's probe and
    // broadcast-build sides are independent root stages, AQE submits
    // them concurrently, and on a cold cache both race to materialize
    // the same edge build — task time doubled on the q96 exact tier.)
    val dsts = truncateLineage(eV.select(col("dst")).distinct())
    val dynEdges = truncateLineage(eV
      .join(dsts.withColumnRenamed("dst", "src"), Seq("src"), "left_semi")
      .repartition(col("src")))
    // perDst fuses the old `base` aggregate with round 1's in-sum
    // (guide §2.4): one groupBy(dst) pass over the cache-hot eV emits
    // BOTH the constant-source contribution `c` (0 for dsts with none —
    // an additive identity the per-round sum cannot observe) and round
    // 1's full in-sum, so the walk's final job starts from this tiny
    // relation instead of paying a fourth eV evaluation + aggregate.
    // Exactness: `dsts` is distinct, so the membership left join tags
    // without duplicating rows; every sum remains a sum of the SAME
    // longs per dst (order-independent, zero terms inert), so the
    // trajectory — and the oracle-exact q96 top-50 — is bit-identical.
    val perDst = truncateLineage(eV
      .join(dsts.withColumnRenamed("dst", "src").withColumn("is_dyn", lit(true)),
        Seq("src"), "left")
      .select(col("dst"),
        when(col("is_dyn").isNull, expr("150000000000 div deg"))
          .otherwise(lit(0L)).as("cc"),
        expr("1000000000000 div deg").as("c1"))
      .groupBy(col("dst"))
      .agg(sum(col("cc")).as("c"), sum(col("c1")).as("in1")))
    // Round 1: every source holds 10¹² — the in-sum came with perDst.
    var r = perDst.select(col("dst").as("vec_id"),
      (lit(150000000000L) + expr("(85 * in1) div 100")).as("pr"))
    for (_ <- 2 to iters) {
      r = dynEdges.join(r.withColumnRenamed("vec_id", "src"), Seq("src"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .unionAll(perDst.select(col("dst"), col("c")))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
        .select(col("dst").as("vec_id"),
          (lit(150000000000L) + expr("(85 * in_sum) div 100")).as("pr"))
    }
    // Vertices that never receive: the bare seed, appended once.
    r.unionAll(vs.join(dsts.withColumnRenamed("dst", "vec_id"),
        Seq("vec_id"), "left_anti")
      .select(col("vec_id"), lit(150000000000L).as("pr")))
  }

  /** Shared q96/q96b presentation: top-50 by final rank, full order. */
  private def centralityTail(ranks: DataFrame): DataFrame =
    ranks.orderBy(col("pr").desc, col("vec_id"))
      .limit(50)
      .select(col("vec_id"), col("pr").as("rank_ppt"))

  /** Graph-centrality data selection — PageRank over the q73 kNN graph:
    * the "pick the most REPRESENTATIVE documents" lever of a curation
    * pipeline (vectors many near-neighbors point at are cluster cores;
    * isolated vectors are outliers/noise), the graph-walk cousin of
    * q53/q92's geometric centroids. 5 damped rounds over the exact
    * 3-NN edge set, top-50 by final rank (full order: rank desc, id).
    * The kNN edge build is the q73 oracle tier (its LSH twin q73b is
    * the 100× path); the walk itself is scale-shaped: distributed rank
    * vector, bounded driver state (none), shuffles keyed on node id.
    * ORACLE-EXACT — the integer trajectory lets DuckDB replay all 5
    * rounds as chained CTEs to the same bits. */
  def q96KnnCentrality(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.FrameCache.persisted(s, s"q96edges:$dir") {
      q73Edges(s, dir)
    }
    val vertices = vecs(s, dir).select(col("vec_id"))
    centralityTail(pageRank(vertices, edges, outDeg = 3, iters = 5))
  }

  /** q96b: the 100×-scale twin of q96 — the SAME damped integer PageRank
    * walk, fed by the q73b LSH-built kNN graph instead of the exact
    * all-pairs tier, so the whole plan is executable at scale: candidate
    * edges come from the bucketed LSH equi-join (never n²), and the walk
    * keeps its distributed rank vector and node-keyed shuffles. The LSH
    * graph has no constant out-degree (bucketing surfaces < 3 neighbors
    * for some nodes), so contributions divide by each node's ACTUAL
    * fan-out via [[pageRankVarDeg]] — degrees are counted once and ride
    * the persisted edge frame, not recomputed per round. Rows-only by
    * design (LSH retrieval is probabilistic, the q73b precedent); the
    * planted-hub agreement with exact-graph centrality and the
    * variable-degree division law are spec-asserted in SimilaritySpec. */
  /** The q96b walk over a caller-supplied (src, dst, deg) edge frame —
    * shared with the persisted graph tier
    * ([[graft.sources.KnnGraphStore]]) so the two serve bit-identical
    * trajectories from the same longs. */
  private[graft] def centralityFromEdges(vertices: DataFrame,
      edgesWithDeg: DataFrame): DataFrame =
    centralityTail(pageRankOn(vertices, edgesWithDeg, iters = 5))

  def q96bKnnCentralityLsh(s: SparkSession, dir: String): DataFrame = {
    // persist the edge frame WITH degrees attached: all 5 rounds (and a
    // repeated run) read the bounded (src, dst, deg) relation from cache
    // instead of re-running the LSH graph build — degrees come off the
    // bounded top lists in the same pass (no degree self-join, no
    // ranked-unpack sort; see q73bEdgesWithDeg)
    val edges = graft.FrameCache.persisted(s, s"q96bedges:$dir") {
      q73bEdgesWithDeg(s, dir)
    }
    val vertices = vecs(s, dir).select(col("vec_id"))
    centralityTail(pageRankOn(vertices, edges, iters = 5))
  }

  /** q104: hybrid retrieval — reciprocal-rank fusion of the engine's
    * two retrieval systems (the production RAG answer: BM25 catches
    * exact-term matches embeddings blur, embeddings catch paraphrases
    * BM25 misses; RRF [Cormack et al., SIGIR'09] fuses WITHOUT score
    * calibration because it only consumes RANKS). Lexical list = q86's
    * BM25 top-20; vector list = the q50 scan at k=20 (vec 0 is the
    * query's embedding, excluded from results); each doc contributes
    * `10⁹ div (60 + rank)` per list it appears in — integer floor
    * division, so fusion is bit-deterministic and the whole query
    * ORACLE-EXACT (ranks are total orders: score desc then id). Both
    * source lists are ≤20 rows at ANY corpus scale — the fusion
    * windows/join are constant-size; the real work is the two
    * upstream retrievals, each already scale-shaped (q86b serves the
    * lexical side from the persisted index in production). */
  def q104HybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = graft.operators.Text.q86Bm25(s, dir)
      .select(col("doc_id"), col("score"))
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long").as("lex_rank"))
    val vec = knnBrute(s, dir, 20)
      .select(col("vec_id").as("doc_id"), col("cos"))
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("cos").desc, col("doc_id")))
        .cast("long").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .filter(col("doc_id") =!= 0)
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_score",
        expr("CASE WHEN lex_rank > 0 THEN 1000000000 div (60 + lex_rank) ELSE 0 END") +
          expr("CASE WHEN vec_rank > 0 THEN 1000000000 div (60 + vec_rank) ELSE 0 END"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(10)
  }

  /** q106: retrieval-quality evaluation — the harness that JUSTIFIES an
    * ANN/compression tier before it ships: for a deterministic sample of
    * query vectors (vec_id % 31 = 0, so the sample scales with the
    * corpus), run the exact cosine retriever as ground truth and the
    * 8-bit quantized retriever (q54's tier) as the system under test,
    * and report per-query recall@10 and the true nearest neighbor's
    * rank/reciprocal-rank in the system list. All quality numbers are
    * integer (ppm floor divisions) over deterministic ranked lists, so
    * the report is ORACLE-EXACT — unusual for an eval harness, and
    * exactly why the quantized tier is the one evaluated here (the LSH
    * tiers' recall laws live in SimilaritySpec instead, where
    * probabilistic retrieval belongs).
    *
    * Scale shape: ground truth on a SAMPLE is the production eval
    * contract — the exact side is O(|sample|·n) by design, never n².
    * Both scans broadcast the sample, score per partition, and reduce
    * through the bounded top-k aggregate (k rows per task per query
    * cross the shuffle); the final joins are sample-sized. */
  def q106RetrievalEval(s: SparkSession, dir: String): DataFrame =
    retrievalEval(s, dir, modulus = 31)

  /** q106 at a parameterized sampling modulus — THE production knob:
    * the gated tier evaluates every 31st vector; a corpus 100× larger
    * raises the modulus ~100× so |sample| (and the eval's cost) stays
    * constant. Because the eval is per-query independent, a query
    * sampled at any modulus gets the IDENTICAL row at every other
    * modulus that samples it (nested samples: m | m' ⇒ the m'-sample ⊆
    * the m-sample) — spec-asserted, so turning the dial provably
    * changes coverage, never semantics. */
  private[graft] def retrievalEval(s: SparkSession, dir: String,
      modulus: Int): DataFrame = {
    val k = 10
    val topk = udaf(new TopKByScore(k))
    // ONE corpus pass scores BOTH retrievers (r17 verdict item 2): the
    // quantized codes ride the exact scan's rows via [[withQuantized]],
    // so the parallelism spread, the broadcast sample attach, the
    // O(n·|sample|) scoring loop and the bounded top-k shuffle are paid
    // once instead of once per system — and the two ranked lists land in
    // the SAME aggregate row, collapsing the old hits/truth-size/nn-rank
    // joins into row-local array arithmetic on two ≤k-element lists.
    // Result-identical: the pair set, both score expressions and the
    // bounded top-k tie order are unchanged; n_hits = |truth ∩ system|
    // (ids are unique per list), nt = |truth list|, nn_rank =
    // 1-based position of the truth top-1 in the system list with 0 for
    // absent — exactly the old join semantics. The corpus scan spreads
    // over the cluster parallelism before the broadcast sample attaches
    // (the q73/q44/q87 fix), as before.
    val vq = withQuantized(vecs(s, dir))
    val sample = vq.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("qid"), col("e").as("sqe"), col("n2").as("sqn2"),
        col("q").as("cq"), col("qn2").as("cqn2"))
    val par = s.sparkContext.defaultParallelism
    val lists = vq.repartition(par).crossJoin(broadcast(sample))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosineFrom(dot(col("e"), col("sqe")), col("n2"), col("sqn2")).as("cos"),
        quantCos(col("q"), col("qn2"), col("cq"), col("cqn2")).as("qcos"))
      .groupBy(col("qid"))
      .agg(topk(col("cos"), col("vec_id")).as("ttop"),
        topk(col("qcos"), col("vec_id")).as("stop"))
    val tids = transform(col("ttop"), t => t.getField("key"))
    val sids = transform(col("stop"), t => t.getField("key"))
    // recall normalizes by the ACTUAL truth-list size (≤ k when the
    // corpus holds fewer than k non-self vectors or the modulus is
    // aggressive) — a 100%-recall query must report 1000000 ppm even
    // when its truth list is short, not a silently deflated n_hits/k
    val metrics = lists.select(col("qid"),
      size(array_intersect(tids, sids)).cast("long").as("h"),
      size(tids).cast("long").as("nt"),
      array_position(sids, element_at(tids, 1)).cast("long").as("nnr"))
    sample.select(col("qid"))
      .join(metrics, Seq("qid"), "left_outer")
      .select(col("qid"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        coalesce(col("nt"), lit(0L)).as("nt"),
        coalesce(col("nnr"), lit(0L)).as("nn_rank"))
      .withColumn("recall_ppm",
        expr("if(nt = 0, 0L, (n_hits * 1000000) div nt)"))
      .drop("nt")
      .withColumn("rr_ppm",
        expr("CASE WHEN nn_rank > 0 THEN 1000000 div nn_rank ELSE 0 END"))
      .orderBy(col("qid"))
  }

  // ---- oracle SQL ----

  private val V = VectorOps
  private val vSql =
    s"""SELECT vec_id, label, ${V.sqlAsDouble("embedding")} AS e,
       |  ${V.sqlNorm2(V.sqlAsDouble("embedding"))} AS n2
       |FROM embeddings""".stripMargin
  private val qSql =
    s"SELECT e AS qe, n2 AS qn2 FROM ($vSql) WHERE vec_id = 0"

  /** The 8-bit quantization CTE chain (expects a CTE `v` = [[vSql]];
    * yields `qn` = (vec_id, q, qn2)) — shared by the q54 and q106
    * oracles, mirroring the shared [[quantizedVecs]] on the engine
    * side. */
  private val quantCtes =
    """ex AS (
      |  SELECT generate_subscripts(e, 1) AS pos, unnest(e) AS val FROM v),
      |mm AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM ex GROUP BY 1),
      |mmx AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx
      |  FROM mm),
      |qv AS (
      |  SELECT vec_id,
      |    list_transform(range(1, len(e) + 1), i ->
      |      CASE WHEN mx[i] > mn[i]
      |        THEN CAST(round((e[i] - mn[i]) * 255.0 / (mx[i] - mn[i])) AS BIGINT)
      |        ELSE 0 END) AS q
      |  FROM v CROSS JOIN mmx),
      |qn AS (
      |  SELECT vec_id, q,
      |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn2
      |  FROM qv)""".stripMargin

  /** The q54 twin with an EXCLUSION predicate on the candidate set —
    * the purged-ANN-store gate (q124): the store's codes stay quantized
    * under the FULL corpus codebook (a purge removes rows, it never
    * refits the affine map — the trained-map semantics every quantized
    * index keeps), so only the final selection filters. */
  private[graft] def q54OracleSqlExcluding(pred: String): String =
    s"""WITH v AS ($vSql),
       |$quantCtes,
       |qq AS (SELECT q AS cq, qn2 AS cqn2 FROM qn WHERE vec_id = 0)
       |SELECT vec_id,
       |  ${quantCosSql("q", "qn2", "cq", "cqn2")} AS qcos
       |FROM qn CROSS JOIN qq WHERE vec_id <> 0 AND $pred
       |ORDER BY qcos DESC, vec_id LIMIT 10""".stripMargin

  /** Quantized cosine with the zero-guard — the SQL twin of [[quantCos]]. */
  private def quantCosSql(q: String, qn2: String, cq: String, cqn2: String): String =
    s"""CASE WHEN $qn2 = 0 OR $cqn2 = 0 THEN -2.0
       |    ELSE CAST(CAST(list_sum(list_transform(list_zip($q, $cq),
       |        p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST($qn2 AS DOUBLE)) * sqrt(CAST($cqn2 AS DOUBLE))) END"""
      .stripMargin

  val queries: Map[String, Q] = Map(
    "q50_knn_brute" -> (q50KnnBrute _),
    "q51_knn_lsh" -> (q51KnnLsh _),
    "q52_pairwise_topk" -> (q52PairwiseTopk _),
    "q52b_pairwise_topk_lsh" -> (q52bPairwiseTopkLsh _),
    "q53_centroid_search" -> (q53CentroidSearch _),
    "q54_knn_quantized" -> (q54KnnQuantized _),
    "q73_knn_graph" -> (q73KnnGraph _),
    "q73b_knn_graph_lsh" -> (q73bKnnGraphLsh _),
    "q79_rand_proj" -> (q79RandProj _),
    "q85_matryoshka" -> (q85Matryoshka _),
    "q92_ivf_kmeans" -> (q92IvfKmeans _),
    "q96_knn_centrality" -> (q96KnnCentrality _),
    "q96b_knn_centrality_lsh" -> (q96bKnnCentralityLsh _),
    "q104_hybrid_rrf" -> (q104HybridRrf _),
    "q106_retrieval_eval" -> (q106RetrievalEval _))

  val oracleSql: Map[String, String] = Map(
    "q104_hybrid_rrf" ->
      s"""WITH lex0 AS (${graft.operators.Text.bm25OracleSql}),
         |lex AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |    AS BIGINT) AS lex_rank
         |  FROM lex0),
         |v AS ($vSql), q AS ($qSql),
         |vec0 AS (
         |  SELECT vec_id AS doc_id,
         |    ${V.sqlDot("v.e", "q.qe")} / (sqrt(v.n2) * sqrt(q.qn2)) AS cos
         |  FROM v CROSS JOIN q WHERE vec_id <> 0
         |  ORDER BY cos DESC, doc_id LIMIT 20),
         |vec AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
         |    AS BIGINT) AS vec_rank
         |  FROM vec0),
         |j AS (
         |  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         |    coalesce(lex_rank, 0) AS lex_rank,
         |    coalesce(vec_rank, 0) AS vec_rank
         |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
         |SELECT doc_id, lex_rank, vec_rank,
         |  (CASE WHEN lex_rank > 0 THEN 1000000000 // (60 + lex_rank) ELSE 0 END
         |   + CASE WHEN vec_rank > 0 THEN 1000000000 // (60 + vec_rank) ELSE 0 END)
         |  AS rrf_score
         |FROM j WHERE doc_id <> 0
         |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    "q96_knn_centrality" -> {
      val iters = 5
      val head =
        s"""WITH v AS ($vSql),
           |p AS (
           |  SELECT a.vec_id, b.vec_id AS nbr_id,
           |    ${V.sqlDot("a.e", "b.e")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
           |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
           |rnk AS (
           |  SELECT vec_id, nbr_id,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cos DESC, nbr_id) AS rk
           |  FROM p),
           |ed AS (SELECT vec_id AS src, nbr_id AS dst FROM rnk WHERE rk <= 3),
           |vert AS (SELECT vec_id FROM v),
           |r0 AS (SELECT vec_id, CAST(1000000000000 AS BIGINT) AS pr FROM vert)"""
      val rounds = (1 to iters).map { i =>
        s""",
           |c$i AS (SELECT ed.dst, sum(r${i - 1}.pr // 3) AS in_sum
           |  FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.vec_id GROUP BY ed.dst),
           |r$i AS (SELECT vert.vec_id,
           |  CAST(150000000000 + (85 * coalesce(c$i.in_sum, 0)) // 100 AS BIGINT) AS pr
           |  FROM vert LEFT JOIN c$i ON vert.vec_id = c$i.dst)"""
      }.mkString
      val tail =
        s"""
           |SELECT vec_id, pr AS rank_ppt FROM r$iters
           |ORDER BY pr DESC, vec_id LIMIT 50"""
      (head + rounds + tail).stripMargin
    },
    "q50_knn_brute" ->
      s"""WITH v AS ($vSql), q AS ($qSql)
         |SELECT vec_id, ${V.sqlDot("v.e", "q.qe")} / (sqrt(v.n2) * sqrt(q.qn2)) AS cos
         |FROM v CROSS JOIN q WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    // q51 intentionally has no oracle (probabilistic recall; spec-checked)
    "q85_matryoshka" -> {
      def kErr(k: Int): String = {
        val (sa, sb) = (s"ea[1:$k]", s"eb[1:$k]")
        s"SELECT $k AS k_dims, abs(CASE WHEN ${V.sqlNorm2(sa)} = 0 " +
          s"OR ${V.sqlNorm2(sb)} = 0 THEN -2.0 ELSE ${V.sqlDot(sa, sb)} / " +
          s"(sqrt(${V.sqlNorm2(sa)}) * sqrt(${V.sqlNorm2(sb)})) END - cos_full) " +
          s"AS err FROM p"
      }
      s"""WITH v AS ($vSql),
         |p AS (
         |  SELECT a.e AS ea, b.e AS eb,
         |    ${V.sqlDot("a.e", "b.e")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos_full
         |  FROM v a JOIN v b ON b.vec_id = a.vec_id + 1),
         |e AS (${kErr(8)} UNION ALL ${kErr(16)} UNION ALL ${kErr(32)})
         |SELECT CAST(k_dims AS BIGINT) AS k_dims, count(*) AS n_pairs,
         |  CAST(sum(CAST(round(err * 1e9) AS BIGINT)) AS BIGINT) / 1e9
         |    / count(*) AS mean_abs_err,
         |  max(err) AS max_abs_err
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q73_knn_graph" ->
      s"""WITH v AS ($vSql),
         |p AS (
         |  SELECT a.vec_id, b.vec_id AS nbr_id,
         |    ${V.sqlDot("a.e", "b.e")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
         |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT vec_id, nbr_id, cos,
         |    CAST(row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, nbr_id) AS BIGINT) AS rk
         |  FROM p)
         |SELECT vec_id, rk, nbr_id, cos FROM r WHERE rk <= 3
         |ORDER BY vec_id, rk""".stripMargin,
    "q52_pairwise_topk" ->
      s"""WITH v AS ($vSql),
         |p AS (
         |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${V.sqlDot("a.e", "b.e")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id),
         |r AS (
         |  SELECT label, id_a, id_b, cos,
         |    CAST(row_number() OVER (PARTITION BY label
         |      ORDER BY cos DESC, id_a, id_b) AS BIGINT) AS rk
         |  FROM p)
         |SELECT label, rk, id_a, id_b, cos FROM r WHERE rk <= 3
         |ORDER BY label, rk""".stripMargin,
    "q54_knn_quantized" ->
      s"""WITH v AS ($vSql),
         |$quantCtes,
         |qq AS (SELECT q AS cq, qn2 AS cqn2 FROM qn WHERE vec_id = 0)
         |SELECT vec_id,
         |  ${quantCosSql("q", "qn2", "cq", "cqn2")} AS qcos
         |FROM qn CROSS JOIN qq WHERE vec_id <> 0
         |ORDER BY qcos DESC, vec_id LIMIT 10""".stripMargin,
    "q106_retrieval_eval" ->
      s"""WITH v AS ($vSql),
         |$quantCtes,
         |s AS (SELECT vec_id AS qid, e AS sqe, n2 AS sqn2 FROM v
         |  WHERE vec_id % 31 = 0),
         |tp AS (
         |  SELECT qid, v.vec_id AS id,
         |    ${V.sqlDot("v.e", "s.sqe")} / (sqrt(v.n2) * sqrt(s.sqn2)) AS cos
         |  FROM v CROSS JOIN s WHERE v.vec_id <> qid),
         |truth AS (SELECT qid, id, rk FROM (
         |  SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY cos DESC, id) AS BIGINT) AS rk FROM tp) WHERE rk <= 10),
         |qs AS (SELECT vec_id AS qid, q AS cq, qn2 AS cqn2 FROM qn
         |  WHERE vec_id % 31 = 0),
         |sp AS (
         |  SELECT qid, qn.vec_id AS id,
         |    ${quantCosSql("q", "qn2", "cq", "cqn2")} AS qcos
         |  FROM qn CROSS JOIN qs WHERE qn.vec_id <> qid),
         |sys AS (SELECT qid, id, rk FROM (
         |  SELECT qid, id, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY qcos DESC, id) AS BIGINT) AS rk FROM sp) WHERE rk <= 10),
         |hits AS (
         |  SELECT truth.qid, count(*) AS h
         |  FROM truth JOIN sys ON truth.qid = sys.qid AND truth.id = sys.id
         |  GROUP BY 1),
         |nn AS (
         |  SELECT truth.qid, coalesce(sys.rk, 0) AS nr
         |  FROM truth LEFT JOIN sys
         |    ON truth.qid = sys.qid AND truth.id = sys.id
         |  WHERE truth.rk = 1),
         |tsz AS (SELECT qid, count(*) AS nt FROM truth GROUP BY 1)
         |SELECT s.qid,
         |  CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
         |  CAST(coalesce(nr, 0) AS BIGINT) AS nn_rank,
         |  CAST(CASE WHEN coalesce(nt, 0) = 0 THEN 0
         |    ELSE (coalesce(h, 0) * 1000000) // nt END AS BIGINT) AS recall_ppm,
         |  CAST(CASE WHEN coalesce(nr, 0) > 0 THEN 1000000 // nr
         |    ELSE 0 END AS BIGINT) AS rr_ppm
         |FROM s LEFT JOIN hits ON s.qid = hits.qid
         |LEFT JOIN tsz ON s.qid = tsz.qid
         |LEFT JOIN nn ON s.qid = nn.qid
         |ORDER BY s.qid""".stripMargin,
    "q53_centroid_search" ->
      s"""WITH v AS ($vSql), q AS ($qSql),
         |ex AS (
         |  SELECT label, generate_subscripts(embedding, 1) AS pos,
         |    CAST(unnest(embedding) AS DOUBLE) AS val
         |  FROM embeddings),
         |mids AS (
         |  SELECT label, pos, (min(val) + max(val)) / 2.0 AS mid
         |  FROM ex GROUP BY 1, 2),
         |cent AS (
         |  SELECT label AS c_label, list(mid ORDER BY pos) AS c FROM mids GROUP BY 1),
         |cent2 AS (
         |  SELECT c_label, c, ${V.sqlNorm2("c")} AS cn2 FROM cent),
         |top2 AS (
         |  SELECT c_label, ${V.sqlDot("cent2.c", "q.qe")} / (sqrt(cn2) * sqrt(q.qn2)) AS ccos
         |  FROM cent2 CROSS JOIN q
         |  ORDER BY ccos DESC, c_label LIMIT 2)
         |SELECT vec_id, label, ${V.sqlDot("v.e", "q.qe")} / (sqrt(v.n2) * sqrt(q.qn2)) AS cos
         |FROM v CROSS JOIN q
         |WHERE vec_id <> 0 AND label IN (SELECT c_label FROM top2)
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)
}
