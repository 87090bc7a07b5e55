package graft.core

/** Shared DuckDB-oracle SQL fragments. */
object OracleSql {

  /** DuckDB-side rebuild of Spark's `conv(substring(md5(...), 1, n), 16, 10)`:
    * DuckDB has no conv(), so the `n` hex chars of column/alias `col`
    * re-assemble positionally via strpos over the hex alphabet. Used by every
    * oracle that replays a Spark md5-prefix integer (sampling priorities,
    * row digests, posting keys). `n = 8` → 32-bit, `n = 12` → 48-bit. */
  def hexPrefixToLong(col: String, n: Int = 8): String =
    (1 to n)
      .map(i => s"(strpos('0123456789abcdef', substr($col, $i, 1)) - 1) * ${1L << ((n - i) * 4)}")
      .mkString(" + ")
}
