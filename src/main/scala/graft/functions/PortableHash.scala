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
    md5Long60(key).cast("double") / 1152921504606846976.0d

  /** The raw 60-bit integer under [[md5Uniform]] — for consumers that
    * do their own bit slicing (HLL buckets/rank): DuckDB mirror is
    * `('0x' || substr(md5(key), 1, 15))::BIGINT`. */
  def md5Long60(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 15), 16, 10).cast("long")
}
