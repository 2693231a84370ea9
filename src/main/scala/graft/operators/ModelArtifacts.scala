package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-guarded persisted MODEL ARTIFACTS — the general form
  * of the q115 text-index device: expensive trained/derived frames
  * (PCA axes, k-means centroids, PQ codebooks, inverted indexes)
  * are built ONCE per (name, input-content) pair, persisted as a
  * parquet-backed table, and served from the table by every
  * subsequent caller in the session (or a later JVM over the same
  * warehouse, via the orphan-location rebuild).
  *
  * Why this exists: a query registry where three queries each
  * retrain the identical model (the r8 q198/q216/q217 family —
  * covariance + first axis recomputed three times, ~33 s quiet at
  * sf0.1) is not the deployment shape; production pipelines train
  * once and serve many. The cache key embeds a CONTENT fingerprint
  * of the inputs, so a regenerated corpus can never silently serve
  * a stale model — the stale table is simply never looked up again
  * (same staleness discipline as the reference's content-addressed
  * chunk ids, `utils/hash_utils.py`).
  *
  * Concurrency: the in-memory catalog cannot arbitrate concurrent
  * builders; the orphan delete is scoped to immediately before the
  * rebuild of that exact table (the [[TextIndex]] contract).
  */
object ModelArtifacts {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Metadata-only content fingerprint of dataset inputs: every LEAF
    * file's path + length + mtime under `dir`/`input`, sorted. Leaf
    * statuses (not directory statuses) because object stores return
    * synthetic len-0/mtime-0 for "directories" — a regenerated
    * corpus must change the fingerprint everywhere. Costs one FS
    * listing, no data scan. */
  def contentFingerprint(spark: SparkSession, dir: String,
      inputs: Seq[String]): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    inputs.flatMap { f =>
      val p = new org.apache.hadoop.fs.Path(dir, f)
      val fs = p.getFileSystem(hconf)
      val it = fs.listFiles(p, true)
      val leaves = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        leaves += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      leaves.sorted
    }.mkString(s"$dir|", "|", "")
  }

  /** A table absent from THIS session's in-memory catalog whose
    * warehouse location survived a previous process would fail
    * saveAsTable with LOCATION_ALREADY_EXISTS — delete the orphan
    * immediately before the rebuild (and only then). */
  private def clearOrphanLocation(spark: SparkSession,
      t: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    if (!spark.catalog.tableExists(t)) {
      val p = new org.apache.hadoop.fs.Path(wh, t.toLowerCase)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Build-once/serve-many: returns the persisted artifact table for
    * (`name`, `fingerprint`), building it with `build` exactly when
    * no current table exists. `name` must be a lowercase identifier;
    * table identity is `graft_art_<name>_<md5(fingerprint)₃₂>`, so a
    * changed input gets a NEW table and staleness is structurally
    * impossible; STALE tables of the same name (a differing hash no
    * caller has served this session) are dropped at rebuild time so
    * regenerated corpora never leak parquet in the warehouse, while
    * fingerprints that are live in this session (two datasets
    * alternating under one name) are never dropped out from under
    * their readers. The parquet round-trip is value-exact for every
    * Spark SQL type (doubles bit-preserved), so serving from the
    * artifact is indistinguishable from re-running `build`.
    *
    * `version` is the builder's SEMANTICS version, folded into the
    * table hash alongside the data fingerprint: content fingerprints
    * track DATA only, so an arithmetic change in `build` MUST bump
    * the version or a warehouse populated by the previous code
    * serves stale values (the r11 covariance rewrite exposed this;
    * versioning at this layer replaces ad-hoc name rotation). */
  def cached(spark: SparkSession, name: String, fingerprint: String,
      version: String = "1")
      (build: => DataFrame): DataFrame = {
    require(name.matches("[a-z0-9_]+"),
      s"artifact name must be a lowercase identifier ($name)")
    val table = s"graft_art_${name}_" +
      md5hex(s"$version|$fingerprint").take(8)
    if (!spark.catalog.tableExists(table)) {
      // A regenerated corpus gets a NEW hash suffix; superseded
      // graft_art_<name>_<oldhash> tables would leak parquet in the
      // warehouse indefinitely — drop them before the rebuild. Two
      // guards keep the drop from destroying LIVE tables:
      //   - the sibling pattern anchors to this exact name + an
      //     8-hex hash (underscores are legal in names, so a bare
      //     startsWith("graft_art_pca_") would also eat pca_axes);
      //   - tables this session has SERVED stay alive (two datasets
      //     alternating fingerprints under one name must not thrash
      //     each other's builds; only hashes no caller has touched
      //     this session — true cross-session staleness — drop);
      //   - an AGE LEASE (newest data file under the table location
      //     older than spark.graft.artifactDropAgeMs, default 24 h):
      //     the servedTables guard is process-local, so in a SHARED
      //     warehouse a concurrent session's just-built artifact
      //     (different fingerprint, same name) would otherwise drop
      //     out from under its readers. A freshly written table is
      //     never old enough to drop; single-session deployments can
      //     set the age to 0 to reclaim space eagerly.
      val dropAgeMs = spark.conf.getOption(
        "spark.graft.artifactDropAgeMs").map(_.toLong)
        .getOrElse(24L * 3600 * 1000)
      val sibling = s"graft_art_${name}_[0-9a-f]{8}".r
      val now = System.currentTimeMillis()
      spark.catalog.listTables().collect()
        .map(_.name)
        .filter(t => sibling.matches(t) && t != table &&
          !servedTables.contains(t) &&
          now - newestFileMtime(spark, t) > dropAgeMs)
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      clearOrphanLocation(spark, table)
      build.write.format("parquet").saveAsTable(table)
    }
    servedTables.add(table)
    spark.table(table)
  }

  /** Newest data-file mtime under a sibling table's warehouse
    * location — the age-lease input for the [[cached]] cleanup.
    * Leaf files, not the directory status (object stores return
    * synthetic directory mtimes). FAIL-CLOSED (r11 review): a
    * listing error or a location the warehouse-path guess cannot
    * find reports Long.MaxValue (= never old enough to drop) — the
    * lease exists to protect a concurrent session's live table, so
    * uncertainty must KEEP the table, not doom it. Only a location
    * that demonstrably exists and holds no data files reports 0
    * (it serves nobody; dropping it is safe). */
  private def newestFileMtime(spark: SparkSession,
      t: String): Long = {
    try {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(wh, t.toLowerCase)
      val fs = p.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Long.MaxValue
      else {
        val it = fs.listFiles(p, true)
        var newest = 0L
        while (it.hasNext) {
          val st = it.next()
          if (st.getModificationTime > newest)
            newest = st.getModificationTime
        }
        newest
      }
    } catch { case _: Throwable => Long.MaxValue }
  }

  /** Artifact tables served by THIS session (JVM) — never dropped
    * by the sibling cleanup; see [[cached]]. */
  private val servedTables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
