package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** F5 — the reference's one true scalar UDF: SMILES canonicalization
  * + is-canonical check (/root/reference/chembl_to_smile.py:39-48,
  * RDKit `MolToSmiles(canonical=True)`). RDKit has no JVM binding
  * here, so this is a deterministic stand-in that performs one real
  * canonicalization step — ring-closure digits renumbered in order of
  * first appearance — with the property the reference tests: applying
  * it to its own output is a fixpoint. Not perf-critical (SURVEY.md
  * §2.9), so a plain Scala UDF is the right tool; everything hot
  * stays in `functions._`/native expressions.
  */
object ChemFns {

  /** Renumber ring-closure digits (single digits and %nn pairs) in
    * order of first appearance: "C2CC2" -> "C1CC1". Idempotent.
    */
  def canonicalizeRingNumbers(smiles: String): String = {
    if (smiles == null) return null
    val sb = new StringBuilder(smiles.length)
    val remap = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var next = 1
    def mapped(tok: String): String = {
      val n = remap.getOrElseUpdate(tok, { val v = next; next += 1; v })
      if (n < 10) n.toString else s"%$n"
    }
    var i = 0
    while (i < smiles.length) {
      val c = smiles.charAt(i)
      if (c == '%' && i + 2 < smiles.length &&
          smiles.charAt(i + 1).isDigit && smiles.charAt(i + 2).isDigit &&
          !isInBracket(smiles, i)) {
        sb.append(mapped(smiles.substring(i, i + 3)))
        i += 3
      } else if (c.isDigit && !isInBracket(smiles, i)) {
        // outside brackets every digit is its own ring-closure token
        // (isotopes/charges live inside []); each remaps independently,
        // which keeps re-tokenization stable across passes (idempotence)
        sb.append(mapped(c.toString))
        i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def isInBracket(s: String, pos: Int): Boolean = {
    var depth = 0
    var i = 0
    while (i < pos) {
      val c = s.charAt(i)
      if (c == '[') depth += 1
      else if (c == ']') depth -= 1
      i += 1
    }
    depth > 0
  }

  val canonicalSmilesUdf: UserDefinedFunction =
    udf((s: String) => canonicalizeRingNumbers(s))

  def canonicalSmiles(c: Column): Column = canonicalSmilesUdf(c)

  /** The reference's equality check: is the stored SMILES already in
    * canonical form? (/root/reference/chembl_to_smile.py:44-48)
    */
  def isCanonical(c: Column): Column = canonicalSmiles(c) === c
}
