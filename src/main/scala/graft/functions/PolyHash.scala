package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash over the BYTES of a
  * string or binary column — `h = fold(seed, b => (h * mult + b) % 1e9+7)`.
  *
  * This is the library's one shared hashing convention (l33 DSIR bucketing,
  * l35 asset checksums, the l12 stub-codec checksum): one definition, one
  * oracle mirror (DuckDB list_reduce over ord(); identical for the ASCII
  * corpus by construction, and the byte semantics is the contract).
  *
  * Why a custom Expression (SURVEY.md §2.5 ladder): the composable form is
  * `aggregate(transform(sequence(...), i -> ascii(substring(t, i, 1))), ...)`
  * — an interpreted higher-order lambda that materializes a per-row Long
  * array and boxes every element. This expression is one fused byte loop
  * and joins WholeStageCodegen via doGenCode — the hot-path shape when the
  * hash runs once per TOKEN of a 100 TB corpus.
  *
  * Null contract: null input → null. seed/mult must be foldable longs.
  * Parameter contract: the seed is reduced to its canonical non-negative
  * residue mod 1e9+7 before the fold (so any Long — including negative —
  * is safe); mult must stay below ~2^33 or h * mult overflows — the
  * library's registered hashes all use single-byte-scale mults.
  */
case class PolyHash(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  private val MOD = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = {
    val inOk = first.dataType == StringType || first.dataType == BinaryType
    val pOk = second.dataType == LongType && third.dataType == LongType &&
      second.foldable && third.foldable
    if (inOk && pOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects (string|binary, bigint literal, bigint literal), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = LongType
  // seed/mult are foldable but may still be null LITERALS — if nullable
  // ignored them, codegen would skip null tracking and read the null
  // literal's default value as the seed while interpreted eval returns
  // null (silent codegen/interpreted divergence)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any, seed: Any, mult: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    // reduce the seed up front: with a raw near-Long seed the first
    // h * m would overflow before the first % ever ran, silently leaving
    // the documented mod-1e9+7 math. The double-% form is the CANONICAL
    // residue (Java % preserves sign, so a negative seed needs the +MOD
    // fold). After this, 0 <= h < 2^30, so the loop stays overflow-free
    // for any mult below ~2^33 (the library's mults are all < 2^9).
    var h = (seed.asInstanceOf[Long] % MOD + MOD) % MOD
    val m = mult.asInstanceOf[Long]
    var i = 0
    while (i < bytes.length) {
      h = (h * m + (bytes(i) & 0xff)) % MOD
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (in, seed, mult) => {
      // every local ctx.freshName'd — two poly_hash calls in one projection
      // share a codegen scope (see CosineSimilarity's collision note)
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val toBytes =
        if (first.dataType == StringType) s"byte[] $bytes = $in.getBytes();"
        else s"byte[] $bytes = $in;"
      s"""
         |$toBytes
         |long $h = ($seed % ${MOD}L + ${MOD}L) % ${MOD}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * $mult + ($bytes[$i] & 0xff)) % ${MOD}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
