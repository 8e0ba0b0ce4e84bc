package org.apache.spark.sql.graftexpr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization kernel for corpus cleaning.
  *
  * Spark has no built-in NFC normalization (the usual pipeline drops to a
  * Python UDF — a per-row serialization boundary that breaks whole-stage
  * codegen). This expression runs the full canonicalization as ONE
  * narrow codegen'd call per row:
  *
  *   1. Unicode NFC (canonical composition — decomposed "e"+U+0301
  *      becomes the single code point "é", so visually-identical strings
  *      hash identically downstream in the dedup family);
  *   2. every C0 control char (U+0000–U+001F) and DEL (U+007F) becomes a
  *      space;
  *   3. runs of spaces collapse to one;
  *   4. leading/trailing spaces are trimmed.
  *
  * Steps 2–4 fuse into a single pass over the NFC output (no regex, no
  * intermediate strings). The DuckDB-oracle equivalent is
  * `trim(regexp_replace(regexp_replace(nfc_normalize(s),
  * '[\x01-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))` — asserted value-level
  * by the `text_normalize` CORRECTNESS entry. One deliberate divergence:
  * this kernel also maps U+0000 to space (`raw < 0x20` starts at NUL),
  * while the oracle regex must start at `\x01` because a NUL cannot be
  * written into a DuckDB SQL literal — an input the parquet/DuckDB
  * oracle path can never carry, so the contract is identical on every
  * representable input.
  *
  * Scale: narrow, codegen-friendly, no shuffle — normalization belongs
  * in the same scan stage as tokenize/fingerprint kernels so the corpus
  * is read once.
  */
object NormalizeTextKernel {
  def normalize(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n) {
      val raw = nfc.charAt(i)
      val c = if (raw < 0x20 || raw == 0x7f) ' ' else raw
      if (c == ' ') {
        // only pend a separator once real content has started (trim-left);
        // a pend never flushed at end-of-string is trim-right
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** NFC + control-strip + whitespace-collapse (see [[NormalizeTextKernel]]). */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(v: Any): Any =
    NormalizeTextKernel.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftexpr.NormalizeTextKernel.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
