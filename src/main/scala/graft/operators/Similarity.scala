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

  /** (vec_id, label, e: array<double>, n2). Persisted: every §2.E query
    * reuses the decoded vectors several times (query side, candidate
    * side, rescoring); Spark's CacheManager dedupes the identical plans
    * into one cache entry. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("e"))
      .withColumn("n2", norm2(col("e")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).filter(col("vec_id") === 0)
      .select(col("e").as("qe"), col("n2").as("qn2"))

  def q50KnnBrute(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)

  // 12 LSH tables x 6 sign bits; fixed gaussian hyperplanes (seed 7).
  private val Hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(72)(Array.fill(64)(rnd.nextGaussian()))
  }

  /** 12 LSH codes per vector via the native [[graft.functions.HyperplaneCodes]]
    * expression (the builtin composition needs ~4600 literal nodes and
    * falls out of codegen). Join key = (array position, code). */
  private def lshCodes(e: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.HyperplaneCodes(
        org.apache.spark.sql.GraftSqlBridge.toExpression(e), Hyperplanes, 6))

  /** ANN: candidates share an LSH code with the query in >= 1 table; exact
    * cosine only on candidates (~17% of vectors for near-orthogonal data).
    * Rows-only: recall is probabilistic, spec-checked against q50.
    *
    * Recall regime note: the driver's embeddings are near-orthogonal
    * noise (best cos ~0.37), the worst case for any angular LSH —
    * measured recall@10 here is ~0.2. At the similarity levels ANN is
    * actually deployed for (near-dup, cos >= 0.8) this same 12x6
    * configuration retrieves with p ~ 0.97 per neighbor
    * (1 - (1 - 0.795^6)^12). */
  def q51KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val codes = v.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), posexplode(lshCodes(col("e"))).as(Seq("t", "code")))
    val qCodes = queryVec(s, dir)
      .select(posexplode(lshCodes(col("qe"))).as(Seq("qt", "qcode")))
    val candIds = codes.join(broadcast(qCodes),
        col("t") === col("qt") && col("code") === col("qcode"))
      .select(col("vec_id")).distinct()
    v.join(candIds, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** Per-label top-3 most-similar pairs. Pair identity is encoded as
    * (id_a << 31) | id_b for the bounded top-k aggregate — exact for any
    * vec_id below 2^31 (vs the previous *1e6 packing, which silently
    * decoded to wrong ids past 1e6 rows), and its numeric order is the
    * (id_a, id_b) lexicographic order, so the tie-break is unchanged. */
  def q52PairwiseTopk(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val topk = udaf(new TopKByScore(3))
    val pairs = v.as("a").join(v.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        (shiftleft(col("a.vec_id").cast("long"), 31)
          .bitwiseOR(col("b.vec_id").cast("long"))).as("pk"),
        cosineFrom(dot(col("a.e"), col("b.e")), col("a.n2"), col("b.n2")).as("cos"))
    pairs.groupBy(col("label"))
      .agg(topk(col("cos"), col("pk")).as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("label"), (col("pos") + 1).cast("long").as("rk"),
        shiftright(col("t.key"), 31).cast("long").as("id_a"),
        col("t.key").bitwiseAND(lit((1L << 31) - 1)).cast("long").as("id_b"),
        col("t.score").as("cos"))
      .orderBy(col("label"), col("rk"))
  }

  /** IVF centroid probe: midrange centroid per label cell, query probes
    * the 2 nearest cells, exact top-10 within them. Midrange (not mean)
    * keeps the centroid order-independent → bit-exact across engines. */
  def q53CentroidSearch(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cent = v.select(col("label"), posexplode(col("e")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(((min(col("val")) + max(col("val"))) / 2.0).as("mid"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mid")))).as("pm"))
      .select(col("label").as("c_label"),
        transform(col("pm"), x => x.getField("mid")).as("c"))
      .withColumn("cn2", norm2(col("c")))
    val top2 = cent.crossJoin(broadcast(queryVec(s, dir)))
      .select(col("c_label"),
        cosineFrom(dot(col("c"), col("qe")), col("cn2"), col("qn2")).as("ccos"))
      .orderBy(col("ccos").desc, col("c_label"))
      .limit(2)
    v.filter(col("vec_id") =!= 0)
      .join(broadcast(top2), col("label") === col("c_label"), "left_semi")
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), col("label"),
        cosineFrom(dot(col("e"), col("qe")), col("n2"), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  // ---- oracle SQL ----

  private val V = VectorOps
  private val vSql =
    s"""SELECT vec_id, label, ${V.sqlAsDouble("embedding")} AS e,
       |  ${V.sqlNorm2(V.sqlAsDouble("embedding"))} AS n2
       |FROM embeddings""".stripMargin
  private val qSql =
    s"SELECT e AS qe, n2 AS qn2 FROM ($vSql) WHERE vec_id = 0"

  val queries: Map[String, Q] = Map(
    "q50_knn_brute" -> (q50KnnBrute _),
    "q51_knn_lsh" -> (q51KnnLsh _),
    "q52_pairwise_topk" -> (q52PairwiseTopk _),
    "q53_centroid_search" -> (q53CentroidSearch _))

  val oracleSql: Map[String, String] = Map(
    "q50_knn_brute" ->
      s"""WITH v AS ($vSql), q AS ($qSql)
         |SELECT vec_id, ${V.sqlDot("v.e", "q.qe")} / (sqrt(v.n2) * sqrt(q.qn2)) AS cos
         |FROM v CROSS JOIN q WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    // q51 intentionally has no oracle (probabilistic recall; spec-checked)
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
