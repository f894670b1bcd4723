package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Oracle-stable rounding.
  *
  * Spark's `round` converts the double to its shortest decimal string
  * (BigDecimal.valueOf) then rounds HALF_UP; DuckDB rounds the raw double.
  * For inputs with exact 2-decimal source values (all money columns in the
  * test tables) an average lands exactly on a half-cent and the two
  * implementations disagree. `half_up` is the same pure-double formula on
  * both sides — the oracle SQL must use floor(x * 10^p + 0.5) / 10^p
  * verbatim — so the results are bit-identical.
  */
object Rnd {
  def halfUp(c: Column, p: Int): Column = {
    val f = math.pow(10, p)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }
  /** DuckDB-side spelling of the same formula. */
  def sql(expr: String, p: Int): String = {
    val f = math.pow(10, p).toLong
    s"floor(($expr) * $f.0 + 0.5) / $f.0"
  }
}
