package graft.text

/** Vocab-driven BPE tokenizer APPLY (VERDICT r13 #8 — the one LLM-pipeline
  * operator class previously approximated: l10 counts regex character
  * classes, not subwords; a real pipeline's token accounting applies a
  * TRAINED merge table). This is the Sennrich et al. 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units") apply step: a word
  * starts as its character sequence and each merge rule, in priority
  * order, fuses every left-to-right non-overlapping occurrence of its
  * symbol pair. Training the table is offline (one-time, sample-sized);
  * applying it over a 100 TB corpus is the distributed job, and that is
  * what l49 grades.
  *
  * ENGINE-PORTABLE ENCODING: the symbol sequence is carried as a bracketed
  * string — "spark" ⇒ "(s)(p)(a)(r)(k)" — so one merge rule (a,b) is
  * exactly `replace(s, "(a)(b)", "(ab)")`: the parens delimit symbols
  * completely (no false suffix matches — "(xa)(b)" cannot match "(a)(b)"),
  * and both Spark's and DuckDB's `replace` are left-to-right
  * non-overlapping replace-all, which IS the per-rule BPE fuse. The whole
  * apply is therefore a chain of |merges| scalar string replaces — pure
  * codegen'd expression work, no UDF, no shuffle — identical on both
  * engines, which is what lets the graded l49 carry a full DuckDB oracle.
  * The merge table itself is compiled into the expression as literals (the
  * degenerate "broadcast": a trained table of ~50k merges would ship as a
  * broadcast map feeding a catalyst Expression instead; the dataflow —
  * scan once, per-word scalar chain, partial-agg count — is unchanged).
  *
  * Scale shape: tokenize-count at 100 TB is one corpus scan + one
  * per-doc_id partial aggregation; the merge chain runs inside
  * whole-stage codegen between them. [[applyRef]] is the driver-side
  * reference implementation BpeSpec checks the dataflow against.
  */
object Bpe {

  /** Merge rules in PRIORITY ORDER (earlier fuses first — order is
    * semantics: (i,n) outranks (i,l), so "il" only forms where no "in"
    * was fused). Hand-trained on the fixture vocabulary so the rules
    * genuinely fire: full words (spark, join, batch), productive suffixes
    * (er, in, ar, ow, st/str), and multi-step builds (s+p→sp, sp+ar→spar,
    * spar+k→spark) that exercise merged-symbol recursion.
    */
  val merges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "r", "a" -> "n", "o" -> "w",
    "a" -> "r", "s" -> "p", "sp" -> "ar", "spar" -> "k", "s" -> "t",
    "st" -> "r", "r" -> "ow", "j" -> "o", "jo" -> "in", "i" -> "l", "f" -> "il",
    "w" -> "in", "b" -> "a", "ba" -> "t", "bat" -> "c", "batc" -> "h")

  /** Spark SQL expression: bracket `wordExpr`'s characters —
    * "spark" ⇒ "(s)(p)(a)(r)(k)". */
  def bracketSpark(wordExpr: String): String =
    s"concat('(', array_join(transform(sequence(0, length($wordExpr) - 1), " +
      s"i -> substring($wordExpr, i + 1, 1)), ')('), ')')"

  /** DuckDB expression for the same bracketing. */
  def bracketDuck(wordExpr: String): String =
    s"'(' || array_to_string(list_transform(range(length($wordExpr)), " +
      s"i -> $wordExpr[i+1:i+1]), ')(') || ')'"

  /** The merge chain: |merges| nested replaces, identical text on both
    * engines (replace(str, search, rep) is shared syntax). */
  def mergeChain(inner: String): String =
    merges.foldLeft(inner) { case (e, (a, b)) =>
      s"replace($e, '($a)($b)', '($a$b)')"
    }

  /** Token count of a merged bracketed string: one '(' per symbol. */
  def tokenCount(mergedExpr: String): String =
    s"(length($mergedExpr) - length(replace($mergedExpr, '(', '')))"

  /** Driver-side reference apply (BpeSpec's independent implementation):
    * per rule in priority order, fuse left-to-right non-overlapping pair
    * occurrences — the same function the replace chain computes. */
  def applyRef(word: String): Seq[String] = {
    var syms = word.map(_.toString).toVector
    for ((a, b) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }
}
