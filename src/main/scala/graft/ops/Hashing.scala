package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing: identical values computable
  * in Spark and in the DuckDB oracle (both engines expose md5-hex).
  * hash32(x) = first 8 hex digits of md5(x) as an unsigned 32-bit
  * value in a BIGINT. MinHash permutations are affine maps modulo the
  * Mersenne prime 2^31-1 with constants derived from the hash index
  * (all arithmetic stays < 2^62 — ANSI-overflow-safe).
  */
object Hashing {
  val P: Long = 2147483647L // 2^31 - 1

  def a(i: Int): Long = (2654435761L * (i + 1)) % P | 1L
  def b(i: Int): Long = (40503L * 65537L * (i + 1) + 17L) % P

  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def hash32Sql(e: String): String =
    s"('0x' || substr(md5($e),1,8))::BIGINT"

  /** MinHash permutation i applied to a hash32 column. */
  def minhashPerm(i: Int, h: Column): Column =
    (lit(a(i)) * (h % lit(P)) + lit(b(i))) % lit(P)

  def minhashPermSql(i: Int, e: String): String =
    s"((${a(i)} * ($e % $P)) + ${b(i)}) % $P"
}
