package graft

import org.apache.spark.sql.SparkSession

/** Build-once / restore-per-run fixture snapshots for the steady-state
  * ingest bench entries (r10 verdict #3): the timed query must measure
  * the DAILY marginal cost of an ingest gate — shard → gate → index
  * append → landing — not the corpus-index construction, which is a
  * one-off build a real corpus owner amortizes over months. The first
  * call (or Bench's untimed prepare pass) builds the fixture and
  * snapshots the pristine on-disk state; every later call restores the
  * snapshot (a fixture-sized local file copy, milliseconds) so each
  * timed run sees the identical pre-append index — deterministic AND
  * steady-state. The stamp carries the data dir: a JVM switching scale
  * factors rebuilds instead of restoring a mismatched fixture.
  * Catalog-registered bucketed tables are refreshed after a restore
  * (their file listings changed under the registered path). */
object FixtureSnapshot {
  def ensure(spark: SparkSession, base: java.io.File, stamp: String,
             tables: Seq[String], dirs: Seq[String])(build: => Unit): Unit = {
    import org.apache.commons.io.FileUtils
    val bakRoot = new java.io.File(base, "bak")
    val marker = new java.io.File(bakRoot, "_GRAFT_FIXTURE_STAMP")
    val valid = marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim == stamp &&
      tables.forall(spark.catalog.tableExists) &&
      dirs.forall(d => new java.io.File(bakRoot, d).isDirectory)
    val restoredOk = valid && {
      dirs.foreach { d =>
        val live = new java.io.File(base, d)
        FileUtils.deleteDirectory(live)
        FileUtils.copyDirectory(new java.io.File(bakRoot, d), live)
      }
      tables.foreach(spark.catalog.refreshTable)
      // a generation-moving rewrite (retraction, compaction) may have
      // pointed a catalog table at a __genN sibling the restore just
      // deleted — the snapshot predates the move, so the table must be
      // re-registered by a rebuild, not trusted
      tables.forall { t =>
        new java.io.File(java.net.URI.create(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
            .location.toString)).isDirectory
      }
    }
    if (!restoredOk) {
      dirs.foreach(d => FileUtils.deleteDirectory(new java.io.File(base, d)))
      build
      FileUtils.deleteDirectory(bakRoot)
      dirs.foreach(d => FileUtils.copyDirectory(
        new java.io.File(base, d), new java.io.File(bakRoot, d)))
      java.nio.file.Files.write(marker.toPath,
        (stamp + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }
}
