package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — extension surface
  * (SURVEY.md §2.8: the reference has no windows; this is the standard
  * session-window operator a feature pipeline needs).
  *
  * One shuffle on the key + per-partition sort; the lag/cumsum trick keeps it
  * a single window pass (no self-join), which is the scalable form.
  */
object Sessionize {

  /** Adds a `session_id` column: sessions split when the gap between
    * consecutive events of a key exceeds `gapSeconds`. */
  def byGap(df: DataFrame, key: String, time: String, tiebreak: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time).asc, col(tiebreak).asc)
    // microsecond-exact arithmetic on the raw timestamp (no double rounding)
    val tMicros = unix_micros(col(time))
    val prev = lag(tMicros, 1).over(w)
    val isNew = when(prev.isNull || tMicros - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
