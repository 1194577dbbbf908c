package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Shared value-range banding used by every banded global-rank /
  * prefix-sum operator (Stats.kruskalWallisH, Stats.nnMatchAtt,
  * Maintenance.balancedWriteSplit, …).
  *
  * band = floor((v − lo) · nBands / (hi − lo + 1)) over the broadcast
  * inclusive domain columns `_lo`/`_hi`. The subtraction AND the
  * multiply run in DECIMAL(38,0): in BIGINT a domain span wider than
  * 2⁶³/nBands — or a lo/hi pair straddling extreme longs, where even
  * (v − lo) itself wraps — silently produces negative/wrong band ids,
  * breaking the band-contiguity guarantee the exact global ranks are
  * built on. DECIMAL(38,0) holds the full (2⁶⁴)·nBands product for any
  * long domain and any nBands ≤ ~10¹⁸, so the band id is exact
  * everywhere. `DIV` on non-negative decimal operands is the same
  * floor division the BIGINT form computed.
  */
object Banding {

  /** Band id in [0, nBands) for long-typed `valueCol`, given broadcast
    * `_lo`/`_hi` columns already cross-joined in. */
  def bandExpr(valueCol: String, nBands: Int): Column = {
    require(nBands > 0, s"nBands must be positive: $nBands")
    expr(
      s"""CAST((CAST($valueCol AS DECIMAL(38,0)) - _lo) * $nBands
         |  DIV (CAST(_hi AS DECIMAL(38,0)) - _lo + 1) AS INT)""".stripMargin)
  }
}
