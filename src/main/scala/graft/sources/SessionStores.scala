package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared scaffolding for the session-scoped derived stores (the
  * persisted index, the co-located bucketed tables, the z-ordered
  * rewrite): ONE per-process scope id, the build-once-per-(process,
  * target) discipline, the metastore staleness guard for catalog
  * tables, and end-of-process cleanup.
  *
  * PROCESS SCOPING: store files live under a per-process UUID directory
  * so two concurrent JVMs (each overwriting on build) can never race
  * each other's files.
  *
  * STALENESS GUARD (catalog tables): with a PERSISTENT metastore, a new
  * JVM can see `tableExists = true` for a table whose files live under
  * a PREVIOUS process's scope directory (possibly already deleted) —
  * serving it would fail or read another process's files. A table whose
  * location is not under THIS process's scope is dropped and rebuilt.
  * The `verified` set caches the check so the DESCRIBE round-trip is
  * paid at most once per table per process.
  *
  * CLEANUP: every scope directory handed out is registered with a JVM
  * shutdown hook that deletes it — the UUID guarantees the hook can
  * only ever delete THIS process's copies, and without it every run
  * leaves table-sized garbage (a full z-ordered lineitem copy, bucketed
  * lineitem+orders) accumulating in the temp dir.
  */
private[graft] object SessionStores {

  val processScope: String = java.util.UUID.randomUUID().toString.take(8)

  // PER-TARGET build locks: two threads building the SAME store
  // serialize (second one finds it verified), but a multi-minute index
  // build must not block an already-built layout store's fast-path
  // serve — one global monitor would
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)
  private val verified = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val scopeDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scopeDirs.forEach { d =>
        try deleteRecursively(new java.io.File(d))
        catch { case _: Exception => } // best effort — process is dying
      }
    }, "graft-session-store-cleanup"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  /** md5 tag of the RAW dir string: two distinct corpus dirs that
    * sanitize identically (`/a/b` vs `/a_b`) must not collide on one
    * table name and serve data from the wrong corpus.
    */
  def tagOf(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Target path for one store under this process's scope directory of
    * `family` (e.g. `graft_index`); the scope dir is registered for
    * end-of-process deletion.
    */
  def scopedPath(family: String, name: String): String = {
    val d = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/$family/$processScope"
    scopeDirs.add(d)
    s"$d/$name"
  }

  /** Serve catalog table `tbl`, running `build` (which must create the
    * table over `path`) at most once per process — with the staleness
    * guard above.
    */
  def servedTable(spark: SparkSession, tbl: String, path: String)(build: => Unit): DataFrame = {
    lockFor(tbl).synchronized {
      if (!verified.contains(tbl)) {
        val stale = spark.catalog.tableExists(tbl) &&
          !spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
            .filter(col("col_name") === "Location")
            .collect().headOption.exists(_.getString(1).contains(s"/$processScope/"))
        if (stale) spark.sql(s"DROP TABLE IF EXISTS $tbl")
        if (stale || !spark.catalog.tableExists(tbl)) build
        verified.add(tbl): Unit
      }
    }
    spark.table(tbl)
  }

  /** Serve a plain parquet path store, running `build` (which must write
    * `path`) at most once per process. No catalog involved, so no
    * staleness guard is needed: the path embeds the process scope.
    */
  def servedPath(spark: SparkSession, path: String)(build: => Unit): DataFrame = {
    lockFor(path).synchronized {
      if (!verified.contains(path)) {
        build
        verified.add(path): Unit
      }
    }
    spark.read.parquet(path)
  }
}
