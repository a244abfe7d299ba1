package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema-aligning outer union — the reference's `db_merge`
  * (hi-csa-db.Rmd:58-73): union two frames on the UNION of their column
  * sets, padding each side's missing columns with NULL, and reordering
  * the result's columns alphabetically (the alphabetical order is
  * observable behavior, Rmd:65,70).
  *
  * Spark-first: `unionByName(allowMissingColumns = true)` already does
  * the pad-with-null alignment (narrow, no shuffle); the sorted
  * projection is a zero-cost `select`.
  */
object SchemaUnion {
  def dbMerge(x: DataFrame, y: DataFrame): DataFrame = {
    val u = x.unionByName(y, allowMissingColumns = true)
    u.select(u.columns.sorted.toIndexedSeq.map(col): _*)
  }

  def dbMergeAll(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(dbMerge)
}
