package graft

import org.apache.spark.sql.Row

import graft.api.GraftCategorical

/** Categorical accessor emulation (reference `_categorical.py:14-129`):
  * dictionary lifecycle + dense codes, pandas semantics. */
class CategoricalSpec extends SparkTestBase {

  private def frame = kv(
    (1L, "b", 1.0), (2L, "a", 2.0), (3L, "c", 3.0),
    (4L, "a", 4.0), (5L, "b", 5.0))

  test("asKnown builds sorted dense dictionary") {
    val cat = GraftCategorical(frame, "k").asKnown
    assert(cat.known)
    val d = cat.categories.orderBy("__code__").collect().toSeq
    assert(d.map(r => (r.getString(0), r.getInt(1))) ==
      Seq(("a", 0), ("b", 1), ("c", 2)))
  }

  test("codes broadcast-join assigns dense codes; null/unseen -> -1") {
    val withNull = frame.union(df(kvSchema, Row(6L, null, 6.0)))
    val coded = GraftCategorical(withNull, "k").asKnown.codes
    val r = collectSorted(coded, "id").map(_.getInt(3))
    assert(r == Seq(1, 0, 2, 0, 1, -1))
  }

  test("codes on unknown categories fails loudly like the reference") {
    intercept[IllegalStateException] {
      GraftCategorical(frame, "k").codes
    }
  }

  test("addCategories appends with next codes; removeCategories renumbers") {
    val cat = GraftCategorical(frame, "k").asKnown.addCategories(Seq("z"))
    val d = cat.categories.orderBy("__code__").collect().toSeq
    assert(d.map(r => (r.getString(0), r.getInt(1))).last == ("z", 3))
    // pandas renumbers densely on remove: {a,c,z} -> a=0, c=1, z=2
    val removed = cat.removeCategories(Seq("b"))
    val r = collectSorted(removed.codes, "id").map(_.getInt(3))
    assert(r == Seq(-1, 0, 1, 0, -1))
    // add after remove must not collide with surviving codes
    val readded = removed.addCategories(Seq("w")).categories
      .orderBy("__code__").collect().toSeq
    assert(readded.map(x => (x.getString(0), x.getInt(1))) ==
      Seq(("a", 0), ("c", 1), ("z", 2), ("w", 3)))
  }

  test("renameCategories keeps codes; setCategories reorders") {
    val cat = GraftCategorical(frame, "k").asKnown
      .renameCategories(Map("a" -> "alpha"))
    val d = cat.categories.orderBy("__code__").collect().toSeq
    assert(d.map(r => (r.getString(0), r.getInt(1))) ==
      Seq(("alpha", 0), ("b", 1), ("c", 2)))
    val reordered = GraftCategorical(frame, "k").setCategories(Seq("c", "b", "a"))
    val r = collectSorted(reordered.codes, "id").map(_.getInt(3))
    assert(r == Seq(1, 2, 0, 2, 1))
  }

  test("asUnknown drops the dictionary") {
    assert(!GraftCategorical(frame, "k").asKnown.asUnknown.known)
  }
}
