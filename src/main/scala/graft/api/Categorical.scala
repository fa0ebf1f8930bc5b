package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Categorical-accessor emulation (reference `_categorical.py:14-129`).
  *
  * Spark has no categorical dtype (SURVEY §2.3), so the category
  * dictionary is an explicit DataFrame `[value, __code__]` instead of
  * dtype metadata. The reference's split between eager metadata
  * (`categories`, `ordered`) and lazy data (`codes`) maps onto: the
  * dictionary frame is tiny and cheap to materialize; `codes` stays a
  * lazy broadcast join over the full data.
  *
  * Scale: dictionary cardinality is assumed small (that is what makes a
  * column categorical), so the single-task `row_number` window runs over
  * the *distinct values only* — the distinct itself is a normal
  * partial/final hash aggregate over the data, and `codes` is a
  * broadcast join, never a shuffle of the fact table.
  */
final case class GraftCategorical(
    df: DataFrame, column: String, dict: Option[DataFrame] = None) {

  /** Whether the categories are known (reference `known`). */
  def known: Boolean = dict.nonEmpty

  /** Materialize the dictionary: sorted distinct non-null values get
    * dense codes 0..n-1 (pandas category order semantics; reference
    * `as_known` computes `.categories.unique()`). */
  def asKnown: GraftCategorical =
    if (known) this
    else copy(dict = Some(
      df.select(col(column).as("__cat__")).na.drop().distinct()
        .withColumn("__code__",
          (row_number().over(Window.orderBy(col("__cat__"))) - 1)
            .cast(IntegerType))))

  /** Drop the dictionary (reference `as_unknown`). */
  def asUnknown: GraftCategorical = copy(dict = None)

  private def requireKnown(what: String): DataFrame =
    dict.getOrElse(throw new IllegalStateException(
      s"cat.$what with unknown categories; call asKnown first " +
        "(reference raises AttributeNotImplementedError the same way)"))

  /** The category dictionary `[__cat__, __code__]` (reference
    * `categories`). */
  def categories: DataFrame = requireKnown("categories")

  /** Append the dense code column `<column>_code` to the frame
    * (reference `codes`); unseen / null values code as -1, as pandas. */
  def codes: DataFrame = {
    val d = requireKnown("codes")
    df.join(broadcast(d), df(column) === d("__cat__"), "left")
      .withColumn(s"${column}_code", coalesce(col("__code__"), lit(-1)))
      .drop("__cat__", "__code__")
  }

  /** New categories appended after the existing ones with the next codes
    * (reference `add_categories`). Next code is max(code)+1, not the
    * dictionary size — after removals those differ, and size-based codes
    * would collide with surviving entries. */
  def addCategories(cats: Seq[Any]): GraftCategorical = {
    val d = requireKnown("add_categories")
    val spark = df.sparkSession
    val start = d.agg(coalesce(max(col("__code__")), lit(-1)))
      .head().getInt(0) + 1
    import scala.jdk.CollectionConverters._
    val extra = spark.createDataFrame(
      cats.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(c, start + i)
      }.asJava, d.schema)
    copy(dict = Some(d.unionByName(extra)))
  }

  /** Remove categories; their rows code as -1 afterwards (pandas turns
    * them into NaN). Remaining codes are renumbered densely preserving
    * order, as pandas `remove_categories` does. */
  def removeCategories(cats: Seq[Any]): GraftCategorical = {
    val d = requireKnown("remove_categories")
    copy(dict = Some(d.filter(!col("__cat__").isin(cats: _*))
      .withColumn("__code__",
        (row_number().over(Window.orderBy(col("__code__"))) - 1)
          .cast(IntegerType))))
  }

  /** Rename categories by map; codes keep their positions (reference
    * `rename_categories`). */
  def renameCategories(mapping: Map[String, String]): GraftCategorical = {
    val d = requireKnown("rename_categories")
    val m = typedLit(mapping)
    copy(dict = Some(d.withColumn("__cat__",
      coalesce(element_at(m, col("__cat__")), col("__cat__")))))
  }

  /** Explicit category order: codes follow the given sequence (reference
    * `set_categories` / `reorder_categories`). */
  def setCategories(cats: Seq[Any]): GraftCategorical = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__cat__",
        df.schema(column).dataType),
      org.apache.spark.sql.types.StructField("__code__", IntegerType)))
    copy(dict = Some(spark.createDataFrame(
      cats.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(c, i)
      }.asJava, schema)))
  }
}
