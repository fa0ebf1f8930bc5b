package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the coarse-quantizer alternative to
  * hyperplane LSH (Similarity.lshBucket): deterministic seed centroids,
  * a few Lloyd refinements, then search only the `nprobe` nearest cells.
  *
  * Everything is DataFrame ops: centroids are a small frame (broadcast),
  * assignment is a blockwise argmin over the broadcast list, refinement
  * is one groupBy per iteration. At 100 TB: train on a sample, assign
  * blockwise (no shuffle), store `cell` as a partition column so a query
  * prunes to nprobe cells at the scan.
  */
object Ivf {

  private def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic centroids: every (n/nCells)-th vector by id seeds a
    * cell, refined with `iters` Lloyd steps. Returns (cell, centroid). */
  def train(embeddings: DataFrame, idCol: String, vecCol: String,
            nCells: Int, iters: Int = 2): DataFrame = {
    val n = embeddings.count()
    val step = math.max(1L, n / nCells)
    var centroids = embeddings
      .filter(pmod(col(idCol), lit(step)) === 0)
      .orderBy(col(idCol)).limit(nCells)
      .select((col(idCol) / step).cast("int").as("cell"),
        col(vecCol).cast("array<double>").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(embeddings, idCol, vecCol, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
    }
    centroids
  }

  /** Blockwise cell assignment: argmin squared-distance over the
    * broadcast centroid list — no shuffle of the vectors. */
  def assign(embeddings: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val cl = broadcast(centroids.agg(
      collect_list(struct(col("cell"), col("centroid"))).as("cs")))
    embeddings.crossJoin(cl)
      .withColumn("cell",
        aggregate(col("cs"),
          struct(lit(-1).as("cell"), lit(Double.MaxValue).as("d")),
          (best, c) => {
            val d = sqDist(col(vecCol), c.getField("centroid"))
            when(d < best.getField("d"),
              struct(c.getField("cell").as("cell"), d.as("d"))).otherwise(best)
          },
          best => best.getField("cell")))
      .drop("cs")
  }

  /** ANN top-k: probe the `nprobe` cells nearest the query vector, exact
    * cosine rank inside them. */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              centroids: DataFrame, queryId: Long, k: Int,
              nprobe: Int = 2): DataFrame = {
    val assigned = assign(embeddings, idCol, vecCol, centroids).cache()
    val q = assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv__"))
    val probeCells = centroids.crossJoin(broadcast(q))
      .withColumn("d", sqDist(col("centroid"), col("__qv__")))
      .orderBy(col("d").asc).limit(nprobe)
      .select(col("cell"))
    assigned.join(broadcast(probeCells), Seq("cell"))
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", Similarity.cosine(col(vecCol), col("__qv__")))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
