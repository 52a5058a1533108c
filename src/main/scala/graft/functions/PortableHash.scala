package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic uniform: the first 15 hex digits of
  * md5(key) as an integer over 2^60 → [0, 1). The SINGLE definition the
  * DuckDB oracles mirror as
  * `('0x' || substr(md5(key), 1, 15))::BIGINT / 1152921504606846976.0` —
  * every consumer (sampling, splits, the portable generator) must go
  * through here so the two engines can never drift. */
object PortableHash {
  def md5Uniform(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 15), 16, 10)
      .cast("long").cast("double") / 1152921504606846976.0d
}
