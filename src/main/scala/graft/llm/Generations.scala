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

  /** Delete the manifest so the flat layout is live again — a full
    * rebuild resets the generation chain. */
  def reset(spark: org.apache.spark.sql.SparkSession, path: String,
            manifest: String): Unit = {
    val m = new org.apache.hadoop.fs.Path(s"$path/$manifest")
    m.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(m, false)
  }
}
