package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** §2.D deduplication over the documents / embeddings tables.
  *
  * Scale shapes (the point of each variant):
  *  - q40 exact: hash-groupBy on a content digest — one shuffle keyed by
  *    digest, perfectly partition-parallel.
  *  - q41 n-gram Jaccard: inverted shingle index self-join — candidates
  *    are pairs sharing >= 1 shingle (a superset of every pair with
  *    jac >= t), never the O(n^2) cross product.
  *  - q42 minhash-LSH: 126 minhashes, 42 bands x 3 rows — the shuffle key
  *    is the band bucket, candidate volume ~0.5% of all pairs at j~0.05,
  *    miss probability at the 0.6 threshold <= 3.6e-5 (and ~1e-15 for the
  *    corpus's actual >= 0.9 near-dups), then exact-Jaccard verification
  *    within buckets only.
  *  - q43 simhash: 64-bit portable simhash, 4 bands x 16 bits; pigeonhole
  *    guarantees every pair at hamming <= 3 shares a band, so banded
  *    candidate generation is EXACTLY equivalent to the all-pairs filter
  *    the oracle runs — no probabilistic recall at all.
  *  - q44 embedding cosine: exact threshold join. Dense exact similarity
  *    join is inherently O(n^2); this is the verification tier — the ANN
  *    scale path is q51's random-hyperplane LSH.
  */
object Dedup extends QueryPack {

  private val jacT = 0.6

  private def docTokens: Column = TextOps.toks(lower(col("text")))

  /** (doc_id, sh = distinct word-3-gram set as xxhash64 LONGS, n = |sh|).
    * Staged projections so the split/shingle transforms evaluate once per
    * row (a single Project would inline them into every consumer).
    *
    * Hashing at the source is the scale move: every downstream exchange
    * (document frequency, prefix candidates, band buckets) keys on a
    * fixed 8-byte long instead of a ~30-byte string, and the verify
    * join's set intersection compares longs instead of strings (measured
    * ~2x on the q41 verify stage). Jaccard over the hashed sets equals
    * Jaccard over the string sets up to 64-bit collisions (~1e-12 for
    * this corpus's vocabulary; deterministic either way), which is far
    * below the banding miss probability the pipeline already accepts.
    *
    * Sorted ascending so the verify stage can run the allocation-free
    * merge-scan [[graft.functions.SortedIntersectCount]] instead of the
    * builtin's per-pair hash set. */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.documentsBalanced(s, dir)
      .select(col("doc_id"), docTokens.as("tk"))
      .select(col("doc_id"), TextOps.shingles3(col("tk")).as("shRaw"))
      .select(col("doc_id"),
        array_sort(array_distinct(transform(col("shRaw"), g => xxhash64(g)))).as("sh"))
      .withColumn("n", size(col("sh")).cast("long"))

  /** |sh_a ∩ sh_b| for the verify joins (sorted-merge count kernel). */
  private def intersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.SortedIntersectCount(
        org.apache.spark.sql.GraftSqlBridge.toExpression(a),
        org.apache.spark.sql.GraftSqlBridge.toExpression(b)))

  /** Exact dedup across two ingest feeds of the same corpus (the
    * re-ingest scenario: one topic replayed into two stores — reference
    * CsvKafkaPublisher re-publishing a file). Keep the smallest doc_id
    * per content digest. */
  def q40DedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val feed1 = d.select(col("doc_id"), col("text"))
    val feed2 = d.select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    feed1.unionAll(feed2)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))
  }

  /** (doc_id, rep_id): every document mapped to the smallest doc_id
    * sharing its exact content digest. The near-dup pipelines run on the
    * REPRESENTATIVES only and expand pairs back over group members —
    * lossless (identical text => identical shingle set/simhash => the
    * rep's pair results transfer verbatim to every member), and it
    * removes the quadratic blow-up a replay-heavy corpus otherwise
    * feeds the pair verifiers: R exact copies of a corpus multiply
    * candidate pairs by R^2 (measured: 16x replication sent the
    * member-level q41 to 72x its 1x wall-clock; canonicalized, pair
    * volume on the verify path is back to the unique-content count).
    * On a dup-free corpus (the driver testdata) every group is a
    * singleton and this is an identity transform — the oracles are
    * unchanged. Same digest rule as q40 (md5 of the exact text). */
  private def digestGroups(s: SparkSession, dir: String): DataFrame =
    graft.FrameCache.persisted(s, s"digestGroups:$dir") {
      val dg = Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("dg"))
      // groupBy-agg + join-back (not a window): the partial-aggregable min
      // halves the shuffle, AQE sees the aggregated side's real size and
      // broadcasts it when small, and the persisted result serves every
      // reference in the query (reps + both expansion sides) at one cost.
      val reps = dg.groupBy(col("dg")).agg(min(col("doc_id")).as("rep_id"))
      dg.join(reps, "dg").select(col("doc_id"), col("rep_id"))
    }

  /** Expand representative-level pairs (id_a, id_b, payload cols) to all
    * member pairs, plus the within-group pairs with `withinPayload`
    * (exact copies: jac = 1.0 / hamming = 0). `withinFilter` excludes
    * degenerate groups whose metric is undefined (empty shingle sets:
    * the oracle's 0/0 jaccard is NaN, which fails the threshold). */
  private def expandPairs(repPairs: DataFrame, groups: DataFrame,
      payload: Seq[String], withinPayload: Seq[Column],
      withinKeep: DataFrame => DataFrame): DataFrame = {
    // `groups` arrives already persisted (digestGroups/contentGroups are
    // FrameCache entries) — no extra persist here, the three reads below
    // share the caller's cache entry
    val m = groups
    val cross = repPairs
      .join(m.select(col("rep_id").as("ra"), col("doc_id").as("a")),
        col("id_a") === col("ra"))
      .join(m.select(col("rep_id").as("rb"), col("doc_id").as("b")),
        col("id_b") === col("rb"))
      .select(Seq(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b")) ++ payload.map(col): _*)
    val within = withinKeep(
      m.as("x").join(m.as("y"),
          col("x.rep_id") === col("y.rep_id") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(Seq(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          col("x.rep_id").as("rep_id")): _*))
      .select(Seq(col("id_a"), col("id_b")) ++ withinPayload: _*)
    cross.unionByName(within)
  }

  /** Near-dup pairs by exact shingle-set Jaccard >= 0.6, with AllPairs/
    * PPJoin prefix filtering (Bayardo et al., WWW'07; Xiao et al.,
    * WWW'08) for candidate generation:
    *
    * order every doc's shingles by ascending global document frequency
    * (rarest first; ties by shingle text), keep only the first
    * floor((1-t)*n)+1 — two sets with jac >= t MUST share a shingle
    * inside these prefixes, so joining on prefix shingles only is
    * provably lossless while skipping the frequent-shingle f^2 blowup
    * (the naive inverted index took 29s at sf0.1 on this small-vocab
    * corpus; prefixes of the rarest shingles cut candidates by orders of
    * magnitude). Candidates are then verified with the exact Jaccard
    * over the full sets. */
  /** Representative-only shingle sets — the persisted index frame q41
    * and q42 share (one [[graft.FrameCache]] entry per dir: it feeds
    * candidate generation twice via the self-join and both verify joins;
    * at 100 TB this intermediate is what you would checkpoint).
    * Representatives only: exact copies transfer their rep's pairs. */
  private def repShingleSets(s: SparkSession, dir: String): DataFrame =
    graft.FrameCache.persisted(s, s"repShingleSets:$dir") {
      val reps = digestGroups(s, dir)
        .filter(col("doc_id") === col("rep_id")).select(col("doc_id"))
      shingleSets(s, dir).join(reps, Seq("doc_id"), "left_semi")
    }

  def q41DedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val groups = digestGroups(s, dir)
    val d = repShingleSets(s, dir) // 23s -> 4s at sf0.1 vs recomputing
    val ex = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // Prefix correctness needs only a consistent global shingle order;
    // df-over-reps ascending is that order AND the candidate-minimizing
    // heuristic. (A two-window row_number/count formulation of this
    // stage was tried and measured 11x SLOWER than collect_list +
    // array_sort + slice — the aggregate keeps the ranking inside one
    // ObjectHashAggregate, the windows pay two full sort passes.)
    // posexplode carries each prefix entry's 1-based rank in the FULL
    // ranked list (the prefix is its head, so positions coincide) for
    // the PPJoin positional filter below.
    val prefix = graft.FrameCache.persisted(s, s"q41prefix:$dir") {
      ex.join(dfreq, "s")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("ranked"))
        .select(col("doc_id"), size(col("ranked")).cast("long").as("n"),
          expr(s"slice(ranked, 1, cast(floor((1.0 - $jacT) * size(ranked)) as int) + 1)")
            .as("pref"))
        .select(col("doc_id"), col("n"), posexplode(col("pref")).as(Seq("pos", "p")))
        .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("pos"),
          col("p.s").as("s"))
    } // persisted: both sides of the self-join
    // Two further lossless PPJoin prunes before the expensive verify:
    //  - length filter: jac >= t forces min(na,nb)/max(na,nb) >= t
    //    (overlap is at most the smaller set);
    //  - positional filter (Xiao et al. WWW'08 §3.2): a shared prefix
    //    entry at ranks (pa, pb) bounds the total overlap by
    //    1 + min(na-pa, nb-pb), which must reach the required overlap
    //    alpha = ceil(t/(1+t) * (na+nb)). A qualifying pair always
    //    passes at this shared prefix entry with the smallest ranks, so
    //    filtering before the pair-distinct is lossless (spec-checked
    //    against naive all-pairs Jaccard in DedupSpec).
    val alpha = ceil(lit(jacT / (1 + jacT)) * (col("a.n") + col("b.n")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            lit(jacT) * greatest(col("a.n"), col("b.n")) &&
          (lit(1L) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))) >= alpha)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val repPairs = cand
      .join(d.select(col("doc_id"), col("sh").as("sh_a"), col("n").as("na")),
        col("id_a") === col("doc_id")).drop("doc_id")
      .join(d.select(col("doc_id"), col("sh").as("sh_b"), col("n").as("nb")),
        col("id_b") === col("doc_id")).drop("doc_id")
      .withColumn("common", intersectCount(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("na") + col("nb") - col("common"))).as("jac"))
      .filter(col("jac") >= jacT)
    val nonEmpty = d.filter(col("n") > 0).select(col("doc_id").as("ne_rep"))
    expandPairs(repPairs, groups, Seq("jac"), Seq(lit(1.0).as("jac")),
      _.join(nonEmpty, col("rep_id") === col("ne_rep"), "left_semi"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Incremental near-dup: probe an incoming BATCH of documents
    * (doc_id % 10 == 0 stands in for today's ingest) against the
    * standing CORPUS (the other 90%) for cross near-dups at jac >= 0.6 —
    * the asymmetric shape a daily pipeline actually runs, where q41's
    * symmetric self-join is the backfill job.
    *
    * Why asymmetric matters at 100 TB: the corpus prefix index is built
    * (in production: materialized) ONCE and only the small batch side is
    * shingled and probed per run — cost scales with the batch, not the
    * corpus. Prefix correctness needs one consistent total shingle
    * order shared by both sides; corpus document frequency (rarest
    * first, batch-only shingles df=0 sorting rarest of all) is that
    * order and keeps the index stable as batches arrive. Same lossless
    * AllPairs/PPJoin prefix + length + positional prunes as q41,
    * spec-checked against naive cross-pairs Jaccard. Exact-copy batches
    * are assumed pre-deduplicated by q40/s7 (the dedup ladder). */
  def q69IncrementalNeardup(s: SparkSession, dir: String): DataFrame = {
    val sets = graft.FrameCache.persisted(s, s"shingleSets:$dir")(shingleSets(s, dir))
    val isNew = pmod(col("doc_id"), lit(10L)) === 0
    val corpus = sets.filter(!isNew)
    val batch = sets.filter(isNew)
    val dfreq = corpus.select(explode(col("sh")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    def prefixOf(side: DataFrame): DataFrame = side
      .select(col("doc_id"), col("n"), explode(col("sh")).as("g"))
      .join(dfreq, Seq("g"), "left")
      .na.fill(0L, Seq("df"))
      .groupBy(col("doc_id"), col("n"))
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("ranked"))
      .select(col("doc_id"), col("n"),
        expr(s"slice(ranked, 1, cast(floor((1.0 - $jacT) * size(ranked)) as int) + 1)")
          .as("pref"))
      .select(col("doc_id"), col("n"), posexplode(col("pref")).as(Seq("pos", "p")))
      .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("pos"),
        col("p.g").as("g"))
    // the standing index side (persisted: in production this is the
    // materialized artifact reused across batches)
    val corpusPref = graft.FrameCache.persisted(s, s"q69corpusPref:$dir")(prefixOf(corpus))
    val batchPref = prefixOf(batch)
    val alpha = ceil(lit(jacT / (1 + jacT)) * (col("a.n") + col("b.n")))
    val cand = batchPref.as("a").join(corpusPref.as("b"),
        col("a.g") === col("b.g") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            lit(jacT) * greatest(col("a.n"), col("b.n")) &&
          (lit(1L) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))) >= alpha)
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("corpus_id"))
      .distinct()
    cand
      .join(sets.select(col("doc_id"), col("sh").as("sh_a"), col("n").as("na")),
        col("new_id") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh").as("sh_b"), col("n").as("nb")),
        col("corpus_id") === col("doc_id")).drop("doc_id")
      .withColumn("common", intersectCount(col("sh_a"), col("sh_b")))
      .select(col("new_id"), col("corpus_id"),
        (col("common").cast("double") / (col("na") + col("nb") - col("common"))).as("jac"))
      .filter(col("jac") >= jacT)
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** Banded minhash-LSH near-dup detection with exact verification:
    * per-seed signatures minimize xxhash64(shingle_hash, seed) (hash
    * re-keying instead of an affine remix — ANSI mode forbids wrapping
    * multiplication), band buckets as the shuffle key, candidate pairs
    * deduplicated, then the true Jaccard recomputed within candidates
    * only. Output is identical to q41 (same threshold) up to the ~1e-15
    * miss probability of the banding for this corpus's >= 0.9 near-dups. */
  def q42DedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val groups = digestGroups(s, dir)
    // Representatives only (see digestGroups): signatures, banding and
    // verification all run per unique content; member pairs expand after.
    val sets = repShingleSets(s, dir)
    // all 126 signature minima in one native compiled pass (the builtin
    // composition is ~2.5k lambda nodes and evaluates interpreted);
    // shingleSets already emits xxhash64 longs, so the signature consumes
    // `sh` directly (same hash values as the old string->long transform)
    val sigArr = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.MinhashSignature(
        org.apache.spark.sql.GraftSqlBridge.toExpression(col("sh")), 126))
    val d = sets.select(col("doc_id"), sigArr.as("sig"))
    val bandKeys = array((0 until 42).map { j =>
      xxhash64(element_at(col("sig"), 3 * j + 1),
        element_at(col("sig"), 3 * j + 2),
        element_at(col("sig"), 3 * j + 3), lit(j))
    }: _*)
    // persist the tiny (doc_id, band) relation: the self-join would
    // otherwise evaluate the 126-signature pipeline once per side
    val bands = graft.FrameCache.persisted(s, s"q42bands:$dir")(
      d.select(col("doc_id"), explode(bandKeys).as("bk")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val repPairs = cand
      .join(sets.select(col("doc_id"), col("sh").as("sh_a"), col("n").as("na")),
        col("id_a") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh").as("sh_b"), col("n").as("nb")),
        col("id_b") === col("doc_id")).drop("doc_id")
      .withColumn("common", intersectCount(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") / (col("na") + col("nb") - col("common"))).as("jac"))
      .filter(col("jac") >= jacT)
    val nonEmpty = sets.filter(col("n") > 0).select(col("doc_id").as("ne_rep"))
    expandPairs(repPairs, groups, Seq("jac"), Seq(lit(1.0).as("jac")),
      _.join(nonEmpty, col("rep_id") === col("ne_rep"), "left_semi"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit simhash over the token multiset (portable mixed polynomial
    * token hashes — [[TextOps.tokenHashes64]]), near-dup = hamming
    * distance <= 3. Banded candidate generation (4 x 16 bits) is exactly
    * complete by pigeonhole, and the 16-bit bands carry 16x fewer random
    * band collisions than the 12-bit bands the 48-bit config paid — the
    * n^2/2^bandBits candidate term that dominated the 16x scale smoke.
    * (The wider hash is a FINER near-dup relation, not the same output:
    * the oracle recomputes the identical 64-bit hashes.) */
  def q43DedupSimhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(s, dir, bits = 64, bands = 4, maxHamming = 3)

  /** Parametric banded-simhash near-dup pairs, exactly complete whenever
    * `bands > maxHamming` (pigeonhole: fewer flipped bits than bands
    * means some band is untouched, so every qualifying pair shares a
    * band bucket).
    *
    * The band width is the SCALE KNOB: random-pair band collisions grow
    * as n^2 / 2^(bits/bands), so a corpus 16x larger wants ~4 more bits
    * per band to hold the candidate volume. q43 ships 64/4 (16-bit
    * bands, matched exactly by the DuckDB oracle): the earlier 48/4
    * config's 12-bit bands were the 16x scale smoke's residual 9x
    * growth, and the narrower config remains spec-proven complete
    * against its own all-pairs hamming filter in DedupSpec (each width
    * is a different — finer or coarser — near-dup relation, not the
    * same output). Token hashes come from [[TextOps.tokenHashes64]],
    * whose mix leaves only bit 63 structurally clear (bands 0-2 full
    * rank, band 3 rank 15 — an aggregate 16x collision cut; polyHash61
    * alone would leave bits 30/61-63 dead, costing two bands a quarter
    * of their selectivity). */
  private[graft] def simhashPairs(s: SparkSession, dir: String,
      bits: Int, bands: Int, maxHamming: Int): DataFrame = {
    require(bands > maxHamming, "pigeonhole completeness needs bands > maxHamming")
    require(bits % bands == 0, "bands must divide bits")
    val bandBits = bits / bands
    val bandMask = (1L << bandBits) - 1
    val groups = digestGroups(s, dir)
    val reps = groups.filter(col("doc_id") === col("rep_id")).select(col("doc_id"))
    val th = TextOps.tokenHashes64(docTokens)
    // one compiled pass over the token hashes instead of `bits`
    // interpreted aggregate folds (identical bit-sum semantics)
    val simhash = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.SimhashBits(
        org.apache.spark.sql.GraftSqlBridge.toExpression(col("th")), bits))
    // Representatives only: identical text => identical simhash, so
    // exact copies would land in every band bucket together and feed the
    // pair join R^2 duplicate work (measured 94x at 16x replication).
    val d = graft.FrameCache.persisted(s, s"simhash:$dir:$bits") {
      Tables.documentsBalanced(s, dir)
        .join(reps, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), th.as("th"))
        .select(col("doc_id"), simhash.as("sim"))
    } // persisted: both band sides + the hamming filter reuse sim
    val bandKeys = array((0 until bands).map { j =>
      struct(lit(j).as("j"),
        shiftright(col("sim"), bandBits * j).bitwiseAND(lit(bandMask)).as("v"))
    }: _*)
    val bands_ = d.select(col("doc_id"), col("sim"), explode(bandKeys).as("bk"))
    val repPairs = bands_.as("a").join(bands_.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    // exact copies have hamming 0 and always pass the threshold — no
    // degenerate-group guard needed (unlike the 0/0 jaccard case)
    expandPairs(repPairs, groups, Seq("hamming"),
      Seq(lit(0L).as("hamming")), identity)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** (vec_id, e, n2) decoded embedding frame for the q44/q87 family — a
    * projection of [[Similarity.decodedVecs]], the ONE cached decode the
    * whole ANN/dedup family shares (per-session cache, stopped-session
    * eviction, re-persist after an external clearCache — documented
    * there). */
  private def embVecs(s: SparkSession, dir: String): DataFrame =
    Similarity.decodedVecs(s, dir).select(col("vec_id"), col("e"), col("n2"))

  /** The q87 held-out assignment (deterministic hash split on vec_id) —
    * one definition for both tiers. */
  private def semSplit: Column = when(
    pmod(TextOps.polyHash61(concat(lit("semsplit-"),
      col("vec_id").cast("string"))), lit(100L)) < 80, "train")
    .otherwise("val")

  /** Exact cosine near-dup pairs over embeddings (threshold 0.4; this
    * corpus's embeddings are near-orthogonal so higher thresholds are
    * empty). Norms computed once per vector; the pair dot product is the
    * only per-pair work. EXACT ORACLE TIER: the all-pairs join is O(n²)
    * by definition — the 100×-scale path is [[q44bDedupEmbeddingLsh]],
    * whose bucketed candidate join replaces this cross product (the
    * same exact-vs-LSH split as q52/q52b and q73/q73b). */
  def q44DedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    // n2 > 0 on both sides makes a NaN cosine impossible BY CONSTRUCTION
    // (a zero-norm vector's cosine is 0/0): Spark and DuckDB disagree on
    // NaN ordering (Spark ranks NaN above every double, DuckDB likewise
    // in comparisons — but only Spark's typed comparisons reject it), so
    // the only oracle-safe contract is to never let NaN reach the
    // threshold predicate. Degenerate on real corpora (no zero-norm
    // embeddings in testdata); the guard is for the contract, not rows.
    val v = embVecs(s, dir).filter(col("n2") > 0)
    // Streamed side spread over the cluster parallelism (one tiny
    // exchange) — the cached single-file scan would otherwise run the
    // whole O(n²) pair loop in ONE task; build side pinned broadcast.
    // Result-identical: pair set and downstream sort don't depend on
    // partitioning.
    v.repartition(s.sparkContext.defaultParallelism)
      .as("a").join(broadcast(v.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        VectorOps.cosineFrom(
          VectorOps.dot(col("a.e"), col("b.e")), col("a.n2"), col("b.n2")).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Scale tier of q44: embedding near-dup pairs through LSH-bucketed
    * candidate generation ([[Similarity.lshCandidatePairs]] — 12 tables
    * × 12-bit hyperplane codes, Hamming <= 1 probe expansion, a
    * bucket-keyed equi-join) + exact cosine rescoring at the same 0.4
    * threshold. Candidate volume on random data is ~3.7% of all pairs
    * and a true near-dup at cos 0.95 is retrieved w.p. ~0.999997 (the
    * q52b regime analysis); precision is exactly 1 because rescoring is
    * the exact cosine — every emitted pair is a true q44 pair. Rows-only
    * by design (recall at LOW similarity is probabilistic — the driver
    * corpus's pairs at cos 0.4-0.5 sit in the worst LSH regime, which
    * is WHY q44 keeps the exact oracle tier); the planted-near-dup
    * recall and exact-subset properties are spec-asserted in DedupSpec. */
  def q44bDedupEmbeddingLsh(s: SparkSession, dir: String): DataFrame =
    embeddingNeardupLsh(embVecs(s, dir), cacheKey = s"q44b:$dir")

  private[graft] def embeddingNeardupLsh(v: DataFrame, cacheKey: String = ""): DataFrame = {
    // Exact-content canonicalization FIRST — the same dedup-ladder rule
    // the text family measured (member-level candidate joins are
    // quadratic in the replication factor: R exact copies share every
    // LSH code, so each group alone feeds C(R,2) bucket pairs):
    // identical vectors collapse to one representative
    // ([[Similarity.contentGroups]]), the bucketed join runs on
    // representatives, and pairs expand back over members — lossless,
    // because identical vectors have bit-identical cosines to
    // everything.
    val groups = Similarity.contentGroups(v, cacheKey)
    // zero-norm reps never clear the exact threshold (their cosine is
    // NaN in the exact tier) — drop them BEFORE candidate generation so
    // NaN can't reach the rescore predicate (same guard as q44/q87)
    val vReps = Similarity.groupReps(v.filter(col("n2") > 0), groups)
    val repPairs = Similarity
      .rescorePairs(Similarity.lshCandidatePairs(vReps, Nil, radius = 1), vReps)
      .filter(col("cos") >= 0.4)
      .select(col("id_a"), col("id_b"), col("cos"))
    expandPairs(repPairs, groups, Seq("cos"), Seq(withinCos),
      withinNonZero(v))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Within-group (exact-copy) pair cosine, spelled as the EXACT TIER'S
    * float formulation n2/(sqrt(n2)*sqrt(n2)) rather than lit(1.0):
    * norm2 is dot(e, e), so this is bit-identical to what q44/q87
    * compute for the same pair (~1 ulp under 1.0 for most norms) — the
    * subset/max_cos parity between tiers holds EXACTLY, not just to
    * tolerance. Requires an `n2` column on the within frame (see
    * [[withinNonZero]]). */
  private def withinCos: Column =
    VectorOps.cosineFrom(col("n2"), col("n2"), col("n2")).as("cos")

  /** withinKeep for the embedding tiers: attach the member's n2 (members
    * of a group are identical vectors, so id_a's n2 is the group's) and
    * drop zero-norm groups — their exact-tier cosine is NaN, which fails
    * the threshold, so emitting a value for them would NOT be lossless. */
  private def withinNonZero(v: DataFrame): DataFrame => DataFrame =
    _.join(v.filter(col("n2") > 0).select(col("vec_id").as("nz_id"), col("n2")),
      col("id_a") === col("nz_id"))

  /** Semantic (embedding-space) decontamination — the third tier of the
    * decontamination family: q66/q66b catch VERBATIM leakage by n-gram
    * overlap; this catches PARAPHRASED/near-duplicate leakage, which
    * n-grams miss entirely: for every held-out vector (the q35
    * deterministic hash split, here on vec_id), count training vectors
    * whose cosine clears the near-dup threshold and flag. Every val
    * vector appears (contaminated or not) — the audit a training run
    * logs before trusting its eval numbers.
    *
    * EXACT ORACLE TIER by the q44/q52/q73 contract: the cross-split
    * theta join is O(train×val) by definition and gates the oracle; the
    * 100×-scale path is the q44b machinery (digest canonicalization +
    * LSH-bucketed candidates + exact rescoring) restricted to
    * cross-split pairs. max/count aggregate order-independently, so the
    * report is oracle-exact. */
  def q87SemanticDecontam(s: SparkSession, dir: String): DataFrame =
    semanticDecontamTagged(embVecs(s, dir).withColumn("split", semSplit))

  private[graft] def semanticDecontamTagged(tagged: DataFrame): DataFrame = {
    // n2 > 0 on BOTH pair sides: a zero-norm embedding's cosine is 0/0 =
    // NaN, and the two engines disagree on whether NaN clears `>= 0.4`
    // (DuckDB orders NaN above every double) — the guard makes NaN
    // impossible by construction, so oracle parity cannot hinge on a
    // degenerate corpus. Zero-norm VAL vectors still appear in the
    // report (below — they are simply never contaminated).
    val train = tagged.filter(col("split") === "train" && col("n2") > 0)
    val vals = tagged.filter(col("split") === "val")
    val cosExpr = VectorOps.cosineFrom(
      VectorOps.dot(col("v.e"), col("t.e")), col("v.n2"), col("t.n2"))
    // Stream the (bigger) train side spread over the cluster
    // parallelism and broadcast the val side: the theta join would
    // otherwise stream a cached single-partition scan through one task
    // (and broadcast whichever side sized smaller). Result-identical:
    // the aggregate is order-independent.
    val pairs = train.repartition(
        train.sparkSession.sparkContext.defaultParallelism).as("t")
      .join(broadcast(vals.filter(col("n2") > 0).as("v")), cosExpr >= 0.4)
      .select(col("v.vec_id").as("vec_id"), cosExpr.as("cos"))
    vals.select(col("vec_id"))
      .join(pairs, Seq("vec_id"), "left_outer")
      .groupBy(col("vec_id"))
      .agg(count(col("cos")).as("n_near_train"),
        coalesce(max(col("cos")), lit(-2.0)).as("max_cos"))
      .withColumn("contaminated", col("n_near_train") > 0)
      .orderBy(col("vec_id"))
  }

  /** Scale tier of q87: the same per-val-vector contamination report
    * through the q44b machinery — digest canonicalization, LSH-bucketed
    * candidate generation ([[Similarity.lshCandidatePairs]]), exact
    * cosine rescoring — with the train/val restriction applied AFTER
    * member expansion (split is a property of the member vec_id, not of
    * the content group: an exact copy of a train vector can sit in val,
    * and the within-group expansion is exactly what finds it, at cosine
    * exactly 1.0). The exact tier's O(train x val) theta join never
    * runs; every shuffle is keyed by LSH bucket or vec_id. Candidate
    * rep pairs are pruned to SPLIT-CROSSABLE ones (per-group
    * has_train/has_val flags — one tiny aggregate) before the exact
    * rescore, dropping the train x train bulk of the candidate volume
    * (~64% at an 80/20 split) without changing the output.
    *
    * Rows-only by design (the q44b contract: recall at LOW cosine is
    * probabilistic, which is why q87 keeps the exact oracle tier);
    * what IS exact: every flagged val vector is truly contaminated
    * (rescoring is the exact cosine — precision 1), max_cos is the true
    * cosine of a found pair, and every val vector appears. Planted-leak
    * recall and the flagged-subset-of-exact property are spec-asserted
    * in DedupSpec. */
  def q87bSemanticDecontamLsh(s: SparkSession, dir: String): DataFrame =
    semanticDecontamLsh(embVecs(s, dir).withColumn("split", semSplit),
      cacheKey = s"q87b:$dir")

  private[graft] def semanticDecontamLsh(tagged: DataFrame,
      cacheKey: String = ""): DataFrame = {
    // identical vectors collapse to one representative for candidate
    // generation (the q44b canonicalization, [[Similarity.contentGroups]]
    // — R exact copies otherwise feed C(R,2) bucket pairs); the split
    // tag stays with the MEMBER
    val groups = Similarity.contentGroups(tagged, cacheKey)
    val vReps = Similarity.groupReps(tagged.filter(col("n2") > 0), groups)
    // Per-group split stats in ONE aggregate: the crossable flags (they
    // ride the LSH code tables through the bucket join, pruning
    // candidates to split-crossable pairs BEFORE the rescore — the r17
    // move) plus n_train (the group's member TRAIN count) and the
    // group's shared norm gn2 (members of a content group are IDENTICAL
    // vectors, so one n2 value is the group's). n_train/gn2 are what
    // let the report aggregate at GROUP level below instead of
    // exploding member pairs (guide §2.3, aggregate before you
    // shuffle): a val member's contribution set is fully determined by
    // its group's stats and its group's rep pairs.
    def buildFlags = tagged
      .select(col("vec_id").as("doc_id"), col("split"), col("n2"))
      .join(groups, "doc_id")
      .groupBy(col("rep_id"))
      .agg(max(when(col("split") === "train", true).otherwise(false)).as("has_train"),
        max(when(col("split") === "val", true).otherwise(false)).as("has_val"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        max(col("n2")).as("gn2"))
    val groupFlags =
      if (cacheKey.nonEmpty)
        graft.FrameCache.persisted(tagged.sparkSession, s"groupFlags:$cacheKey")(buildFlags)
      else graft.FrameCache.persistedFor(tagged, "groupFlags")(buildFlags)
    val vRepsFlagged = vReps.join(
      groupFlags.withColumnRenamed("rep_id", "vec_id"), "vec_id")
    val crossable = Similarity
      .lshCandidatePairs(vRepsFlagged, Nil, radius = 1,
        carry = Seq("has_train", "has_val"))
      .filter((col("has_train_a") && col("has_val_b")) ||
        (col("has_val_a") && col("has_train_b")))
      .select(col("id_a"), col("id_b"))
    val repPairs = Similarity.rescorePairs(crossable, vReps)
      .filter(col("cos") >= 0.4)
      .select(col("id_a"), col("id_b"), col("cos"))
    // GROUP-LEVEL report aggregation — replaces the old member-pair
    // explosion (expandPairs to all member pairs, split-orient, re-
    // aggregate by val member): a rep pair (A, B, cos) contributes to
    // every val member of A exactly n_train(B) near-train hits at that
    // one cosine (all of B's members are the identical vector), and the
    // within-group term contributes n_train(own group) hits at the
    // exact tier's float cosine — nonzero-norm groups only (a zero-norm
    // copy's exact cosine is NaN, excluded, the old withinNonZero
    // guard). Identical output: the per-val count is the same sum of
    // the same longs, and max_cos maxes over the same candidate set —
    // while the shuffled volume drops from Σ |A|·|B| member pairs to
    // one row per (group, paired group), the at-scale point (a
    // replay-heavy corpus multiplies member pairs by R² per side).
    // Spec-asserted: planted near/exact leaks, subset-of-exact
    // precision, and the replicated-group count law in DedupSpec.
    val perGroupCross = repPairs
      .select(explode(array(
        struct(col("id_a").as("g"), col("id_b").as("o"), col("cos")),
        struct(col("id_b").as("g"), col("id_a").as("o"), col("cos")))).as("p"))
      .select(col("p.g").as("g"), col("p.o").as("o"), col("p.cos").as("cos"))
      .join(groupFlags.select(col("rep_id").as("o"), col("n_train").as("n_train_o")), "o")
      .groupBy(col("g"))
      .agg(sum(col("n_train_o")).as("n_cross"),
        max(when(col("n_train_o") > 0, col("cos"))).as("max_cross"))
    val withinC = VectorOps.cosineFrom(col("gn2"), col("gn2"), col("gn2"))
    tagged.filter(col("split") === "val").select(col("vec_id"))
      .join(groups.withColumnRenamed("doc_id", "vec_id"), "vec_id")
      .join(groupFlags, "rep_id")
      .join(perGroupCross.withColumnRenamed("g", "rep_id"), Seq("rep_id"), "left_outer")
      .select(col("vec_id"),
        (coalesce(col("n_cross"), lit(0L)) +
          when(col("gn2") > 0, col("n_train")).otherwise(lit(0L))).as("n_near_train"),
        coalesce(greatest(col("max_cross"),
          when(col("gn2") > 0 && col("n_train") > 0, withinC)), lit(-2.0)).as("max_cos"))
      .withColumn("contaminated", col("n_near_train") > 0)
      .orderBy(col("vec_id"))
  }

  /** Dup-cluster resolution: the step after pair detection — connect the
    * near-dup pairs into clusters and elect a canonical doc (min id) per
    * cluster, so a pipeline can keep one representative. Hybrid solver:
    * the verified pair list is tiny relative to the corpus (dup rate x
    * cluster size), so below [[DriverCcThreshold]] pairs the connected
    * components run as driver-side union-find on the collected edges
    * (collecting PAIRS, not data — the same small-side rule as a
    * broadcast dim); above it, distributed iterative min-label
    * propagation (converges in diameter rounds, each one
    * partial-aggregable join+min). DedupSpec runs both paths and asserts
    * identical output. Docs outside any pair map to themselves. */
  def q45DupClusters(s: SparkSession, dir: String): DataFrame =
    dupClusters(s, dir, DriverCcThreshold)

  val DriverCcThreshold = 1000000L

  private[graft] def dupClusters(s: SparkSession, dir: String,
      driverThreshold: Long, checkpointEvery: Int = 5): DataFrame = {
    val pairs = graft.FrameCache.persisted(s, s"q45pairs:$dir")(
      q42DedupMinhashLsh(s, dir).select(col("id_a"), col("id_b")))
    val nPairs = pairs.count()
    val labels =
      if (nPairs <= driverThreshold) {
        // driver-side union-find over the edge list
        import s.implicits._
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        pairs.collect().foreach { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val resolved = parent.keys.map(k => (k, find(k))).toSeq
        resolved.toDF("doc_id", "canonical_id")
      } else {
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        var labels = edges.select(col("src").as("doc_id")).distinct()
          .withColumn("lbl", col("doc_id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        var converged = false
        var rounds = 0
        while (!converged && rounds < 20) {
          val prop = edges
            .join(labels.withColumnRenamed("doc_id", "dst_id"),
              col("dst") === col("dst_id"))
            .groupBy(col("src")).agg(min(col("lbl")).as("nl"))
          val next = labels.join(prop, col("doc_id") === col("src"), "left")
            .select(col("doc_id"),
              least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          converged = next.join(labels.withColumnRenamed("lbl", "old"), "doc_id")
            .filter(col("lbl") =!= col("old")).isEmpty
          // the convergence check materialized `next`; the superseded
          // frame's cache is dead weight from here — drop it so the loop
          // holds TWO label snapshots at peak, not `rounds` of them
          labels.unpersist(false)
          rounds += 1
          // lineage cap: each round CHAINS two joins onto the plan, so
          // 20 un-truncated rounds hand the analyzer/optimizer a plan
          // whose cost grows with iteration count even when the data
          // fits in cache. Every `checkpointEvery` rounds, cut the plan
          // to a LogicalRDD via localCheckpoint — eager, so it just
          // snapshots the blocks the isEmpty above already materialized.
          labels =
            if (checkpointEvery > 0 && rounds % checkpointEvery == 0) {
              val cp = next.localCheckpoint()
              next.unpersist(false)
              cp
            } else next
        }
        // `labels` is materialized; the doubled edge list only feeds
        // recomputation paths now
        edges.unpersist(false)
        labels.withColumnRenamed("lbl", "canonical_id")
      }
    Tables.documents(s, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .orderBy(col("doc_id"))
  }

  /** Split decontamination: near-dup pairs that CROSS the train/val
    * boundary (the q35 deterministic split) — the documents a training
    * pipeline must evict from one side before evaluation means anything.
    * Composes the LSH near-dup detection with the portable split
    * assignment; both are oracle-reproducible, so the leak list is
    * hash-checked end to end. */
  def q46Contamination(s: SparkSession, dir: String): DataFrame = {
    val h = TextOps.polyHash61(concat(lit("split-salt-"), col("doc_id").cast("string")))
    val split = graft.FrameCache.persisted(s, s"q46split:$dir") {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(pmod(h, lit(100L)) < 80, "train").otherwise("val").as("split"))
    }
    q42DedupMinhashLsh(s, dir)
      .join(split.select(col("doc_id"), col("split").as("split_a")),
        col("id_a") === col("doc_id")).drop("doc_id")
      .join(split.select(col("doc_id"), col("split").as("split_b")),
        col("id_b") === col("doc_id")).drop("doc_id")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("split_a"), col("id_b"), col("split_b"), col("jac"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** (doc_id, split, sh = distinct string shingles) shared by the
    * decontamination tiers q66/q66b.
    *
    * The persist boundary sits on the shingle ARRAYS, not the exploded
    * rows: explode over a live expensive projection triggers
    * InferFiltersFromGenerate, which inlines the whole shingle tree into
    * a pushed-down `size(..)>0 AND isnotnull(..)` Filter — three
    * interpreted evaluations per row at the scan (measured 12.3s for the
    * fused shape vs ~1s staged at sf0.1). Materializing `sh` first makes
    * the generator child a plain column reference, and the q66
    * n_shingles projection reuses the same cache instead of re-running
    * the text pipeline. */
  private def splitShingleBase(s: SparkSession, dir: String): DataFrame =
    graft.FrameCache.persisted(s, s"splitShingleBase:$dir") {
      val h = TextOps.polyHash61(concat(lit("split-salt-"), col("doc_id").cast("string")))
      Tables.documentsBalanced(s, dir)
        .select(col("doc_id"), docTokens.as("tk"),
          when(pmod(h, lit(100L)) < 80, "train").otherwise("val").as("split"))
        .select(col("doc_id"), col("split"), TextOps.shingles3(col("tk")).as("shRaw"))
        .select(col("doc_id"), col("split"), array_distinct(col("shRaw")).as("sh"))
    }

  /** Exact n-gram overlap decontamination — the complementary check to
    * q46's near-dup crossing: instead of whole-document similarity, flag
    * every VAL document whose word 3-grams also occur ANYWHERE in the
    * train split (the GPT-3/PaLM-style "remove eval examples sharing
    * 13-grams with training data" rule, on the 3-gram scale this corpus
    * supports). A benchmark answer copied into one training doc leaks
    * through q46 only if the whole documents are near-dups; it always
    * leaks through the n-gram check.
    *
    * Shape at 100 TB: everything is keyed by shingle — one distinct over
    * the train side's exploded shingles, one semi-join from the val
    * side — so the work is two shingle-keyed exchanges, no pair join at
    * all (output is per-val-doc, not per-pair). The train-side distinct
    * is the big relation; the bloom tier q66b is the map-side swap a
    * real deployment makes once it stops fitting a shuffle. Docs with no
    * shingles (< 3 tokens) have an undefined overlap fraction and are
    * excluded in both engines. */
  def q66NgramDecontam(s: SparkSession, dir: String): DataFrame = {
    val base = splitShingleBase(s, dir)
    val ex = base.select(col("doc_id"), col("split"), explode(col("sh")).as("g"))
    val trainG = ex.filter(col("split") === "train").select(col("g")).distinct()
    val hits = ex.filter(col("split") === "val")
      .join(trainG, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    base.filter(col("split") === "val").filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
      .withColumn("contaminated", col("overlap_frac") >= 0.5)
      .orderBy(col("doc_id"))
  }

  /** Bloom-filter decontamination — q66's 100 TB tier. The exact check
    * shuffles the train side's distinct shingles and semi-joins the val
    * side against them; once the train corpus is the 100 TB relation,
    * that exchange is the cost. The deployment-scale move is one compact
    * bloom filter over the train shingles, broadcast to every executor,
    * and a MAP-SIDE membership probe on the val side — zero join, zero
    * val-side exchange beyond the final per-doc count.
    *
    * Built on Spark's own BloomFilterAggregate/BloomFilterMightContain
    * (the runtime-filter machinery, reached through the expression
    * bridge since 4.x registers no SQL alias). The aggregated filter is
    * one bounded binary (1 MiB here; a deployment sizes items/bits to
    * the train corpus and pays hundreds of MiB of broadcast, still flat
    * per executor), collected once driver-side exactly like a broadcast
    * hash relation, then shipped as a literal into the codegen'd probe.
    *
    * Bloom semantics: NO false negatives — every truly contaminated doc
    * is flagged (n_maybe_overlap >= q66's n_overlap per doc, asserted in
    * DedupSpec); false positives inflate the overlap fraction by the
    * configured FPP, so `flagged` is a SUPERSET audit list a pipeline
    * either accepts (decontamination over-removal is cheap) or rescreens
    * with the exact tier. Rows-only gate: the filter's bit pattern is
    * engine-specific, so no DuckDB oracle exists by design. */
  /** The aggregated train-shingle bloom filter as one bounded binary
    * (built once, broadcast to every probe site — q66b here, the s9
    * streaming ingest gate in [[graft.streaming.Streams]]). */
  def trainShingleBloom(s: SparkSession, dir: String): Array[Byte] = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    splitShingleBase(s, dir)
      .filter(col("split") === "train")
      .select(explode(col("sh")).as("g"))
      .agg(toColumn(new BloomFilterAggregate(
        toExpression(xxhash64(col("g"))),
        Literal(1000000L), Literal(8388608L)).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** Map-side membership probe against an aggregated bloom binary. */
  def bloomMaybe(bloomBytes: Array[Byte], hashed: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.GraftSqlBridge.toExpression(lit(bloomBytes)),
        org.apache.spark.sql.GraftSqlBridge.toExpression(hashed)))

  def q66bDecontamBloom(s: SparkSession, dir: String): DataFrame = {
    val base = splitShingleBase(s, dir)
    val ex = base.select(col("doc_id"), col("split"), explode(col("sh")).as("g"))
    val maybe = bloomMaybe(trainShingleBloom(s, dir), xxhash64(col("g")))
    ex.filter(col("split") === "val")
      .select(col("doc_id"), maybe.as("maybe"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("maybe"), 1)).as("n_maybe_overlap"))
      .withColumn("overlap_frac_ub",
        col("n_maybe_overlap").cast("double") / col("n_shingles"))
      .withColumn("flagged", col("overlap_frac_ub") >= 0.5)
      .orderBy(col("doc_id"))
  }

  /** Exact duplicated-SPAN analysis (Lee et al., ACL'22 "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * regime): for every document, the fraction of its tokens covered by
    * some word 5-gram that occurs MORE THAN ONCE anywhere in the corpus
    * (other docs or a repeat inside the same doc). Whole-doc dedup
    * (q40) and near-dup (q41-q44) miss copied PASSAGES inside otherwise
    * distinct docs; this is the span-level audit that catches them —
    * the per-doc number a pipeline thresholds to cut boilerplate and
    * quoted duplication.
    *
    * Shape at 100 TB: positional 5-gram shingles (one explode), a
    * shingle-hash-keyed occurrence count (one partial-aggregable
    * shuffle), then per-doc interval-union coverage computed by ONE
    * doc-keyed window over the duplicated span starts — contribution of
    * each span is min(w, gap to previous start), the classic sorted
    * interval-union telescope, so coverage needs no per-doc set
    * materialization and no pair join anywhere. Oracle-exact: both
    * engines run the identical window arithmetic on integers. */
  def q91DupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpansFrom(Tables.documentsBalanced(s, dir))

  private[graft] def dupSpansFrom(docs: DataFrame): DataFrame = {
    val w = 5
    val base = docs
      .select(col("doc_id"), docTokens.as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // string shingles, not hashes: the occurrence count must GROUP
    // identically in both engines, and the oracle has no xxhash64 —
    // the ~30-byte keys are the price of exactness here (q41's index,
    // which needs no oracle-side grouping, keeps the hashed keys)
    // size guard, not greatest(.., 0): Spark's sequence(1, 0) generates
    // DESCENDING [1, 0], so short docs need an explicit empty branch
    val spanArr = when(size(col("tk")) >= w,
      transform(sequence(lit(1), size(col("tk")) - (w - 1)),
        i => concat_ws(" ", slice(col("tk"), i, lit(w)))))
      .otherwise(array().cast("array<string>"))
    val spans = base
      .select(col("doc_id"), posexplode(spanArr).as(Seq("pos", "g")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("start"), col("g"))
    val dupG = spans.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select(col("g"))
    val dupSpans = spans.join(dupG, Seq("g"), "left_semi")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start"))
    val covered = dupSpans
      .withColumn("prev", lag(col("start"), 1).over(win))
      .select(col("doc_id"),
        when(col("prev").isNull, lit(w.toLong))
          .otherwise(least(lit(w.toLong), col("start") - col("prev"))).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("c")).as("covered_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_frac",
        col("covered_tokens").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Cross-source contamination matrix — the "which corpora mirror each
    * other" audit web-scale curation runs before mixing sources (CC vs
    * C4 vs refined crawls share enormous verbatim overlap; double-
    * counting a mirrored source silently re-weights the mixture and
    * double-spends the dedup budget). For every source pair: how many
    * DISTINCT exact contents (q40's md5 digest rule) both carry, plus
    * each side's distinct-content total so downstream can form
    * containment/Jaccard. The matrix is DENSE upper triangle
    * (source_a < source_b) — a clean pair reports an explicit 0, which
    * is the audit's actual claim ("we CHECKED, they share nothing"),
    * not an absence.
    *
    * Shape: one scan → (digest, source) distinct (the only data-sized
    * shuffle, digest-keyed); the self-join runs on the DEDUPLICATED
    * (digest, source) frame — at worst |sources| rows per digest, so
    * candidate volume is bounded by duplication across sources, never
    * n² — then one low-cardinality pair rollup joined onto the
    * |sources|²-row broadcast pair axis. Oracle-exact. */
  def q97SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // persisted: ds feeds four consumers (both total sides, both join
    // sides) — without it the corpus is scanned and md5-hashed 4x
    val ds = graft.FrameCache.persisted(s, s"q97digests:$dir") {
      Tables.documents(s, dir)
        .select(md5(col("text")).as("h"), col("source")).distinct()
    }
    val totals = ds.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairAxis = totals.select(col("source").as("source_a"), col("n").as("n_a"))
      .join(totals.select(col("source").as("source_b"), col("n").as("n_b")),
        col("source_a") < col("source_b"))
    val shared = ds.as("a").join(ds.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    // broadcast the aggregated pair counts (right side of the outer
    // join — a left-side hint on LEFT OUTER is unsupported and ignored)
    pairAxis.join(broadcast(shared), Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("shared"), lit(0L)).as("shared_contents"),
        col("n_a"), col("n_b"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---- oracle SQL ----

  private val sqlToks = "string_split(lower(text), ' ')"
  private def sqlShingleSets =
    s"""SELECT doc_id, list_distinct(${TextOps.sqlShingles3("ws")}) AS sh
       |FROM (SELECT doc_id, $sqlToks AS ws FROM documents) t""".stripMargin

  private val jaccardPairsSql =
    s"""WITH sh AS ($sqlShingleSets),
       |p AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jac FROM p WHERE jac >= $jacT ORDER BY id_a, id_b""".stripMargin

  private val simhashSql: String = {
    val th = TextOps.sqlTokenHashes64(sqlToks)
    // b = 63 never fires on real docs (tokenHashes64 keeps bit 63 clear,
    // so its +/-1 sum is -n < 0 for any non-empty token list), but the
    // term stays for exactness — spelled as (min+0) arithmetic because
    // DuckDB raises on the 1<<63 overflow even inside a dead branch.
    // Empty token lists: list_sum(empty) is NULL, so no CASE term fires
    // and sim = 0 — which [[graft.functions.SimhashBits]] now matches
    // explicitly (empty input => 0) instead of the vacuous-truth
    // all-bits-set reading, so the two engines agree on every input,
    // not just non-degenerate corpora.
    val terms = (0 until 64).map { b =>
      val bitVal =
        if (b == 63) "(CAST(-9223372036854775807 AS BIGINT) - 1)"
        else s"(CAST(1 AS BIGINT) << $b)"
      s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 " +
        s"THEN $bitVal ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $th AS th FROM documents),
       |s AS (SELECT doc_id, $terms AS sim FROM t)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q40_dedup_exact" -> (q40DedupExact _),
    "q41_dedup_ngram_jaccard" -> (q41DedupNgramJaccard _),
    "q42_dedup_minhash_lsh" -> (q42DedupMinhashLsh _),
    "q43_dedup_simhash" -> (q43DedupSimhash _),
    "q44_dedup_embedding" -> (q44DedupEmbedding _),
    "q44b_dedup_embedding_lsh" -> (q44bDedupEmbeddingLsh _),
    "q87_semantic_decontam" -> (q87SemanticDecontam _),
    "q87b_semantic_decontam_lsh" -> (q87bSemanticDecontamLsh _),
    "q45_dup_clusters" -> (q45DupClusters _),
    "q46_contamination" -> (q46Contamination _),
    "q66_ngram_decontam" -> (q66NgramDecontam _),
    "q66b_decontam_bloom" -> (q66bDecontamBloom _),
    "q69_incremental_neardup" -> (q69IncrementalNeardup _),
    "q91_dup_spans" -> (q91DupSpans _),
    "q97_source_overlap" -> (q97SourceOverlap _))

  val oracleSql: Map[String, String] = Map(
    "q97_source_overlap" ->
      """WITH ds AS (SELECT DISTINCT md5(text) AS h, source FROM documents),
        |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY source),
        |axis AS (
        |  SELECT ta.source AS source_a, tb.source AS source_b,
        |    ta.n AS n_a, tb.n AS n_b
        |  FROM t ta JOIN t tb ON ta.source < tb.source),
        |sh AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT axis.source_a, axis.source_b,
        |  coalesce(sh.shared, 0) AS shared_contents, n_a, n_b
        |FROM axis LEFT JOIN sh USING (source_a, source_b)
        |ORDER BY 1, 2""".stripMargin,
    "q40_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents) t
        |GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q41_dedup_ngram_jaccard" -> jaccardPairsSql,
    "q42_dedup_minhash_lsh" -> jaccardPairsSql,
    "q91_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |b AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens
         |  FROM t WHERE len(tk) > 0),
         |sp AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS start,
         |    array_to_string(array_slice(tk, CAST(i AS BIGINT), CAST(i + 4 AS BIGINT)), ' ') AS g
         |  FROM b, unnest(range(1, CASE WHEN len(tk) >= 5
         |    THEN len(tk) - 3 ELSE 1 END)) AS r(i)),
         |dup AS (SELECT g FROM sp GROUP BY g HAVING count(*) > 1),
         |ds AS (SELECT sp.doc_id, sp.start FROM sp JOIN dup USING (g)),
         |cov AS (
         |  SELECT doc_id, count(*) AS n_dup_spans,
         |    sum(CASE WHEN prev IS NULL THEN 5
         |      ELSE least(5, start - prev) END) AS covered
         |  FROM (SELECT doc_id, start,
         |      lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
         |    FROM ds) x
         |  GROUP BY doc_id)
         |SELECT b.doc_id, b.n_tokens,
         |  CAST(coalesce(c.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
         |  CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
         |  CAST(coalesce(c.covered, 0) AS DOUBLE) / b.n_tokens AS dup_frac
         |FROM b LEFT JOIN cov c USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,
    "q69_incremental_neardup" ->
      s"""WITH sh AS ($sqlShingleSets),
         |p AS (
         |  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
         |  FROM sh a JOIN sh b
         |    ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
         |SELECT new_id, corpus_id, jac FROM p WHERE jac >= $jacT
         |ORDER BY new_id, corpus_id""".stripMargin,
    "q45_dup_clusters" ->
      s"""WITH RECURSIVE sh AS ($sqlShingleSets),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $jacT),
         |edges(a, b) AS (
         |  SELECT id_a, id_b FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(s, t) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.s, e.b FROM reach r JOIN edges e ON r.t = e.a),
         |lbl AS (SELECT s AS doc_id, min(t) AS mn FROM reach GROUP BY 1)
         |SELECT d.doc_id,
         |  least(d.doc_id, coalesce(l.mn, d.doc_id)) AS canonical_id
         |FROM documents d LEFT JOIN lbl l USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "q43_dedup_simhash" -> simhashSql,
    "q46_contamination" -> {
      val h = TextOps.sqlPolyHash61("'split-salt-' || CAST(doc_id AS VARCHAR)")
      s"""WITH sh AS ($sqlShingleSets),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN $h % 100 < 80 THEN 'train' ELSE 'val' END AS split
         |  FROM documents)
         |SELECT id_a, sa.split AS split_a, id_b, sb.split AS split_b, jac
         |FROM p
         |JOIN sp sa ON p.id_a = sa.doc_id
         |JOIN sp sb ON p.id_b = sb.doc_id
         |WHERE jac >= $jacT AND sa.split <> sb.split
         |ORDER BY id_a, id_b""".stripMargin
    },
    "q66_ngram_decontam" -> {
      val h = TextOps.sqlPolyHash61("'split-salt-' || CAST(doc_id AS VARCHAR)")
      s"""WITH sh AS ($sqlShingleSets),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN $h % 100 < 80 THEN 'train' ELSE 'val' END AS split
         |  FROM documents),
         |ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         |tr AS (
         |  SELECT DISTINCT g FROM ex JOIN sp USING (doc_id)
         |  WHERE split = 'train'),
         |hits AS (
         |  SELECT ex.doc_id, count(*) AS n_overlap
         |  FROM ex JOIN sp USING (doc_id)
         |  WHERE sp.split = 'val' AND ex.g IN (SELECT g FROM tr)
         |  GROUP BY 1)
         |SELECT sh.doc_id, CAST(len(sh.sh) AS BIGINT) AS n_shingles,
         |  CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / len(sh.sh) AS overlap_frac,
         |  CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / len(sh.sh) >= 0.5
         |    AS contaminated
         |FROM sh JOIN sp USING (doc_id) LEFT JOIN hits h ON sh.doc_id = h.doc_id
         |WHERE sp.split = 'val' AND len(sh.sh) > 0
         |ORDER BY sh.doc_id""".stripMargin
    },
    "q44_dedup_embedding" -> {
      val V = VectorOps
      s"""WITH v AS (
         |  SELECT vec_id, ${V.sqlAsDouble("embedding")} AS e,
         |    ${V.sqlNorm2(V.sqlAsDouble("embedding"))} AS n2
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${V.sqlDot("a.e", "b.e")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos
         |  FROM v a JOIN v b
         |    ON a.vec_id < b.vec_id AND a.n2 > 0 AND b.n2 > 0)
         |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
    },
    "q87_semantic_decontam" -> {
      val V = VectorOps
      val h = TextOps.sqlPolyHash61("'semsplit-' || CAST(vec_id AS VARCHAR)")
      s"""WITH v AS (
         |  SELECT vec_id, ${V.sqlAsDouble("embedding")} AS e,
         |    ${V.sqlNorm2(V.sqlAsDouble("embedding"))} AS n2,
         |    CASE WHEN $h % 100 < 80 THEN 'train' ELSE 'val' END AS split
         |  FROM embeddings),
         |p AS (
         |  SELECT va.vec_id, ${V.sqlDot("va.e", "t.e")}
         |      / (sqrt(va.n2) * sqrt(t.n2)) AS cos
         |  FROM v va JOIN v t
         |    ON va.split = 'val' AND t.split = 'train'
         |    AND va.n2 > 0 AND t.n2 > 0),
         |hits AS (SELECT vec_id, cos FROM p WHERE cos >= 0.4)
         |SELECT va.vec_id,
         |  CAST(count(h.cos) AS BIGINT) AS n_near_train,
         |  coalesce(max(h.cos), CAST(-2.0 AS DOUBLE)) AS max_cos,
         |  count(h.cos) > 0 AS contaminated
         |FROM v va LEFT JOIN hits h ON va.vec_id = h.vec_id
         |WHERE va.split = 'val'
         |GROUP BY va.vec_id ORDER BY va.vec_id""".stripMargin
    })
}
