package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE ENCODE over a pre-tokenized word (`array<string>` of
  * initial units) against a trained merge table — the
  * production-vocabulary answer to q135's replace-chain (VERDICT r11
  * item 3): folding merges in as ranked `replace()` plan literals is
  * vocabulary-bounded but MERGE-COUNT-bounded too (a 1k-merge table is
  * 1k chained string scans per word, a 32k vocab is unplannable).
  * This expression applies the whole table in `rounds` compiled
  * passes: per round, ONE left-to-right walk over the token array
  * merging (last, next) whenever the pair is in that round's accepted
  * set (a hash probe) — encode cost O(rounds × word length), linear
  * in tokens, independent of the merge COUNT (merges only size the
  * hash tables).
  *
  * Semantics are exactly the batched trainer's (q117/q138): within a
  * round the accepted pairs are symbol-disjoint, so the single
  * greedy pass equals applying them serially in any order and cannot
  * cascade; across rounds the passes run in training order. A fresh
  * encode therefore reproduces the trainer's own final tokenization
  * byte-for-byte — BpeBigEncodeSpec pins it three ways (native vs
  * in-memory replay vs the training chain's last state).
  *
  * `merges` is the per-ROUND table: `merges(r)` lists round r's
  * accepted pairs as "left right" strings (space-separated — the
  * trainer's own wire form; unit strings never contain spaces because
  * words are split on spaces upstream). The per-round hash sets are
  * built once per expression instance and shipped to generated code
  * via the standard codegen object reference. */
case class BpeEncode(child: Expression, merges: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> initial tokens, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  @transient private lazy val table: Array[java.util.HashSet[String]] =
    BpeEncode.buildTable(merges)

  override def nullSafeEval(t: Any): Any =
    BpeEncode.encode(t.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.BpeEncode.encode($c, $tableRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {

  /** One HashSet of "left right" pair keys per round. */
  def buildTable(merges: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    merges.map { round =>
      val s = new java.util.HashSet[String](math.max(16, round.size * 2))
      round.foreach(s.add)
      s
    }.toArray

  /** Called from generated code — keep the signature stable. Per
    * round: one pass, merging the accumulated last token with the next
    * unit whenever "last next" is in the round's set (the merged form
    * is their concatenation — the trainer's replace(pair, " ", "")).
    * Within-round cascades are impossible by the trainer's
    * symbol-disjointness, so the greedy pass is exact. */
  def encode(init: ArrayData,
      table: Array[java.util.HashSet[String]]): ArrayData = {
    val n = init.numElements()
    if (n == 0) return init
    var toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = init.getUTF8String(i).toString; i += 1 }
    var len = n
    var r = 0
    while (r < table.length && len > 1) {
      val set = table(r)
      if (!set.isEmpty) {
        val out = new Array[String](len)
        var o = 0
        out(0) = toks(0)
        var j = 1
        while (j < len) {
          val x = toks(j)
          if (set.contains(out(o) + " " + x)) out(o) = out(o) + x
          else { o += 1; out(o) = x }
          j += 1
        }
        toks = out
        len = o + 1
      }
      r += 1
    }
    val res = new Array[Any](len)
    var k = 0
    while (k < len) { res(k) = UTF8String.fromString(toks(k)); k += 1 }
    new GenericArrayData(res)
  }
}
