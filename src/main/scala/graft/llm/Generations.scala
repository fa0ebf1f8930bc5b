package graft.llm

/** Generation-directory machinery shared by the online-safe compaction
  * paths (r10 verdict #6): a persisted path-based index keeps its live
  * data in either the flat layout (generation 0) or a `gen-N`
  * subdirectory named by a tiny manifest file; compaction writes the
  * next generation beside the live one and installs it with an ATOMIC
  * manifest replace, so a reader that resolved its root pre-flip keeps
  * reading intact files (the replaced generation survives until the
  * NEXT compaction retires it). Used with manifest name `MANIFEST` by
  * [[Ivf]] (data lives in subdirectories, no reader lists the root) and
  * `_MANIFEST` by [[Similarity]]'s quantized corpus (the flat layout IS
  * a parquet directory, so the manifest must be underscore-prefixed for
  * parquet readers to ignore it). */
private[graft] object Generations {
  def current(spark: org.apache.spark.sql.SparkSession, path: String,
              manifest: String): Int = {
    val m = new org.apache.hadoop.fs.Path(s"$path/$manifest")
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(m)) 0
    else {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  /** The LIVE generation root: `path` itself for generation 0 (flat,
    * pre-manifest), `path/gen-N` afterwards. */
  def resolve(spark: org.apache.spark.sql.SparkSession, path: String,
              manifest: String): String = {
    val g = current(spark, path, manifest)
    if (g == 0) path else s"$path/gen-$g"
  }

  /** Install generation `gen` as live: write a sibling tmp file, then
    * an OVERWRITE rename through [[org.apache.hadoop.fs.FileContext]] —
    * atomic on HDFS and POSIX local filesystems, so a concurrent
    * [[resolve]] sees either the old or the new generation, never a
    * missing manifest. */
  def flip(spark: org.apache.spark.sql.SparkSession, path: String,
           manifest: String, gen: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = new org.apache.hadoop.fs.Path(s"$path/${manifest}__tmp")
    val dst = new org.apache.hadoop.fs.Path(s"$path/$manifest")
    val fs = dst.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(s"$gen\n".getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Delete the manifest AND any generation directories so the flat
    * layout is live again — a full rebuild resets the chain (rebuilds
    * overwrite the flat layout in place, so they are inherently
    * exclusive with everything; stale generations would otherwise leak
    * disk forever). */
  def reset(spark: org.apache.spark.sql.SparkSession, path: String,
            manifest: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/$manifest"), false)
    if (fs.exists(p))
      fs.listStatus(p).filter(_.getPath.getName.matches("gen-\\d+"))
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** Run `body` holding the path's compaction lock: compactions are
    * exclusive with each other (two racing rewrites would both target
    * gen-N+1) and with writers — this enforces the first and gives the
    * second a visible artifact. The lock is an atomically-created file
    * (`create(overwrite = false)`); a crashed compaction leaves it
    * behind, and the error says which file to delete after confirming
    * nothing is running. */
  def withCompactionLock[T](spark: org.apache.spark.sql.SparkSession,
                            lockFile: String)(body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(lockFile)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try fs.create(lock, false)
      catch { case _: java.io.IOException =>
        throw new IllegalStateException(
          s"another compaction holds $lock (or a crashed one left it " +
            s"behind) — verify nothing is running, then delete it to " +
            s"proceed")
      }
    try out.write(s"${java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName}\n".getBytes("UTF-8")) finally out.close()
    try body finally fs.delete(lock, false)
  }
}
