package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The 16-bit salted md5 id-bucket every deterministic splitter, sampler
  * and experiment-arm assigner keys on. One definition because the
  * expression is correctness-critical for cross-engine parity: its
  * DuckDB twin is
  * `CAST('0x' || substring(md5(CAST(id AS VARCHAR) || '<salt>'), 1, 4)
  * AS INT) % m`, and every Spark copy must mirror that byte-for-byte.
  * Since r17 the Spark side evaluates through the codegen'd
  * [[graft.functions.Md5HexPrefix]] kernel (raw digest bytes, no hex
  * encode / base-16 parse per row), pinned value-for-value against the
  * textual form by Md5DrawsSpec. (CorpusPipeline.splitColumn and
  * Geo.derivedCoord pre-date this helper and carry their own pinned
  * copies with wider hash slices — same kernel underneath since r17.) */
object Hashing {

  /** `md5(id ++ salt)` first 16 bits, mod `mod` — in [0, mod). */
  def md5Bucket(idCol: Column, salt: String, mod: Long): Column = {
    val keyed = if (salt.isEmpty) idCol.cast(StringType)
      else concat(idCol.cast(StringType), lit(salt))
    pmod(graft.functions.Md5Draws24.md5Prefix(keyed, 4), lit(mod))
  }
}
