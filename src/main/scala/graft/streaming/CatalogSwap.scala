package graft.streaming

import org.apache.spark.sql.SparkSession

/** The ONE copy of the standing-table compaction swap and its path
  * hygiene, shared by [[CcStream.compact]], [[HbStream.compact]], and
  * [[IncrementalIngest.compactIndex]] so the freshness guard and the
  * DROP/RENAME recovery discipline cannot drift between table
  * families. */
private[streaming] object CatalogSwap {

  /** Comparable form of a local path or location URI. File.toURI
    * appends a trailing slash when the directory EXISTS — exactly the
    * dangerous case for a freshness compare — so strip it. */
  def normalize(path: String): String =
    new org.apache.hadoop.fs.Path(new java.io.File(path).toURI)
      .toUri.getPath.stripSuffix("/")

  /** The live table's current location, normalized like [[normalize]].
    * The name is PARSED (`db.tbl` resolves the database), not wrapped. */
  def tableLocation(spark: SparkSession, table: String): String =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
      .toUri.getPath.stripSuffix("/")

  /** Smallest generation >= `from` whose path does NOT collide with the
    * live table's current location. Generation counters are in-memory
    * (they reset when a streaming query restarts), so the first
    * post-restart compaction could otherwise target the very path the
    * live table occupies and trip the freshness guard; earlier
    * generations' stale paths are dead files (their tables were
    * dropped) and overwriting them is harmless. */
  def freshGeneration(spark: SparkSession, liveTable: String,
                      pathFor: Long => String, from: Long): Long = {
    val live = tableLocation(spark, liveTable)
    var g = from
    while (normalize(pathFor(g)) == live) g += 1
    g
  }

  /** True when a [[swapIn]] died between its DROP and RENAME: the live
    * table is gone and the completed `_compacting` twin is waiting. */
  def needsRecovery(spark: SparkSession, live: String): Boolean =
    !spark.catalog.tableExists(live) &&
      spark.catalog.tableExists(live + "_compacting")

  /** Complete a crashed swap — the tmp table only exists once fully
    * written, so finishing the rename is all the recovery there is. */
  def recover(spark: SparkSession, live: String): Unit =
    spark.sql(s"ALTER TABLE ${live}_compacting RENAME TO $live")

  /** Build the rewrite in `live + "_compacting"` at a FRESH path
    * (enforced against the catalog — overwriting the live location
    * would delete the files the lazy rewrite reads), then DROP +
    * RENAME. A crash between the DROP and the RENAME is the one
    * dangerous window; callers recover it on entry by completing the
    * rename (the tmp table only exists once fully written). */
  def swapIn(spark: SparkSession, live: String, newPath: String)
            (write: (String, String) => Unit): Unit = {
    val liveLoc = tableLocation(spark, live)
    val newLoc = normalize(newPath)
    require(newLoc != liveLoc,
      s"compact() needs a FRESH path: $newPath is $live's current " +
        s"location ($liveLoc) — overwriting it would delete the files " +
        "the rewrite is reading")
    val tmp = live + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    write(tmp, newPath)
    spark.sql(s"DROP TABLE IF EXISTS $live")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $live")
    spark.catalog.refreshTable(live)
  }
}
