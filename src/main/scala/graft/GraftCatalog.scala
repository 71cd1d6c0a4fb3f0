package graft

import graft.sources.{AnnIndexStore, InvertedIndexStore, VersionedStore}
import org.apache.spark.sql.SparkSession

/** The `spark.sql()` surface over the engine — the analyst-facing tier
  * the reference ships as plain Impala SQL files
  * (`/root/reference/impala/ny_taxi/bi_*.impala`: an analyst edits SQL,
  * never Scala). graft's operators are Scala functions and its sketch
  * vocabulary is already SQL-registered ([[GraftExtensions]]); this
  * registers the DATA — base tables and the persisted store RELATIONS —
  * as temp views, so the reference's workflow ("type SQL against the
  * warehouse") runs against graft stores unchanged:
  *
  *  - every base table under the data dir (`lineitem`, `orders`, …) by
  *    its own name;
  *  - `graft_postings` / `graft_index_stats` — the inverted index's
  *    posting + corpus-stats relations (q86b's storage);
  *  - `graft_ivf_cells` / `graft_ivf_centroids` / `graft_vectors` /
  *    `graft_quant_codes` — the ANN serving relations;
  *  - `graft_orders_v<N>` — one as-of view per committed version of the
  *    versioned store, each listing EXACTLY that version's manifest
  *    files (time travel as a FROM clause);
  *  - `graft_knn_edges` / `graft_dim_history` — the persisted kNN graph
  *    (src, dst, deg) and the SCD2 dimension history.
  *
  * Views are lazy logical plans over parquet scans, so Catalyst
  * pushdown/pruning reach the files exactly as the Scala operators'
  * reads do; [[probeView]] additionally applies the index manifest's
  * file skip BEFORE registration, giving a SQL query the same pruned
  * read as the q86b probe. The equivalence contract (q2 / q86b / q109
  * semantics as SQL strings ≡ the operator results) is spec-asserted
  * in GraftCatalogSpec.
  */
object GraftCatalog {

  /** Register base tables and persisted store relations for `dir`.
    * Builds the stores on first use (the per-JVM store-cache contract);
    * registration itself runs no jobs beyond those builds. */
  def register(s: SparkSession, dir: String): Unit = {
    Tables.names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
    val ip = InvertedIndexStore.store(s, dir)
    s.read.parquet(ip).createOrReplaceTempView("graft_postings")
    s.read.parquet(InvertedIndexStore.statsPath(ip))
      .createOrReplaceTempView("graft_index_stats")
    val ap = AnnIndexStore.store(s, dir)
    s.read.parquet(AnnIndexStore.cellsPath(ap))
      .createOrReplaceTempView("graft_ivf_cells")
    s.read.parquet(AnnIndexStore.centroidsPath(ap))
      .createOrReplaceTempView("graft_ivf_centroids")
    s.read.parquet(AnnIndexStore.vectorsPath(ap))
      .createOrReplaceTempView("graft_vectors")
    s.read.parquet(AnnIndexStore.quantPath(ap))
      .createOrReplaceTempView("graft_quant_codes")
    val vp = VersionedStore.store(s, dir)
    VersionedStore.versions(s, vp).foreach { v =>
      VersionedStore.readVersion(s, vp, v)
        .createOrReplaceTempView(s"graft_orders_v$v")
    }
    s.read.parquet(sources.KnnGraphStore.store(s, dir))
      .createOrReplaceTempView("graft_knn_edges")
    s.read.parquet(sources.Scd2Store.store(s, dir))
      .createOrReplaceTempView("graft_dim_history")
  }

  /** Register `name` as a PRUNED view of the inverted index: only the
    * posting files whose term range can contain one of `terms`, per the
    * store manifest — the q86b file skip, surfaced to SQL (a view over
    * `graft_postings` would be correct but would open every file's
    * footer; at 100 TB the manifest skip is what makes a point query
    * interactive). The view still carries the term filter's row-group
    * skip inside each opened file via ordinary pushdown. */
  def probeView(s: SparkSession, dir: String, name: String,
      terms: Seq[String]): Unit = {
    val path = InvertedIndexStore.store(s, dir)
    val files = InvertedIndexStore.filesFor(
      s.read.parquet(InvertedIndexStore.manifestPath(path)), terms)
    require(files.nonEmpty, s"manifest selected no posting files for $terms")
    s.read.parquet(files: _*).createOrReplaceTempView(name)
  }

  /** The q86 BM25 scoring statement as ONE SQL string over the
    * registered views — what an analyst types. Parameterized on the
    * postings view so it runs against either the full relation or a
    * [[probeView]]; the arithmetic mirrors
    * [[graft.operators.Text.bm25Score]] operation for operation, and
    * GraftCatalogSpec asserts bit-identical results to the q86b
    * operator path. */
  def bm25Sql(postingsView: String, terms: Seq[String],
      k1: Double, b: Double): String = {
    // SQL-literal escaping: a term containing a single quote must not
    // break (or inject into) the analyst-facing statement
    def lit(t: String): String = "'" + t.replace("'", "''") + "'"
    val termList = terms.map(lit).mkString(", ")
    val pivots = terms.indices
      .map(i => s"max(CASE WHEN term = ${lit(terms(i))} THEN w END) AS w_$i")
      .mkString(",\n    ")
    val score = terms.indices.map(i => s"coalesce(w_$i, 0.0d)")
      .mkString(" + ")
    s"""WITH tf AS (
       |  SELECT doc_id, dl, term, tf FROM $postingsView
       |  WHERE term IN ($termList)),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |w AS (
       |  SELECT tf.doc_id, tf.term,
       |    ((st.n_docs - df.df + 0.5d) / (df.df + 0.5d))
       |      * (tf.tf * ${k1 + 1.0}d)
       |      / (tf.tf + ${k1}d * (${1.0 - b}d + ${b}d
       |        * (CAST(tf.dl AS DOUBLE) * st.n_docs / st.tot_tokens))) AS w
       |  FROM tf JOIN df ON tf.term = df.term
       |  CROSS JOIN graft_index_stats st),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_hit_terms,
       |    $pivots
       |  FROM w GROUP BY doc_id)
       |SELECT doc_id, n_hit_terms, $score AS score
       |FROM agg
       |ORDER BY score DESC, doc_id
       |LIMIT 20""".stripMargin
  }
}
