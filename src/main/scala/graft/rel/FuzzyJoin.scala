package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string self-join — the entity-resolution primitive a
  * compliance engine needs for "shared directors, common registered
  * addresses" matching (reference README.md:15) where real registry data
  * carries misspellings: find all pairs of entities whose names are within
  * Levenshtein distance 1, WITHOUT the all-pairs join.
  *
  * Blocking scheme: the symmetric-delete neighborhood (Garbe's SymSpell;
  * the same pigeonhole family as PassJoin, Li et al., ICDE 2011). Each
  * name emits itself plus every single-character-deletion variant as
  * blocking keys; two names within Levenshtein distance 1 are GUARANTEED
  * to share a key:
  *   - substitution at position p → deleting p from both yields the same
  *     string;
  *   - insertion/deletion → the shorter name IS a deletion variant of the
  *     longer (and equals its own identity key).
  * So the key join is a lossless candidate generator for lev ≤ 1, and an
  * exact `levenshtein` rerank on the candidates (the l02/l03
  * candidate-then-rerank shape — never all-pairs) removes the false
  * positives (two names sharing a variant can be up to lev 2 apart: one
  * delete each side).
  *
  * Scale posture: each name of length L emits ≤ L+1 keys (linear fan-out,
  * one explode — no shuffle until the key join), and a block for key k is
  * STRUCTURALLY bounded: its members are strings reachable from k by ≤ 1
  * insertion, at most |Σ|·(|k|+1)+1 distinct strings over alphabet Σ —
  * so no block degenerates to the full corpus and candidate volume is
  * O(N·L·bound), never O(N²). Measured on the customer corpus: sf0.01
  * 54k candidates vs 1.12M all-pairs (21×), sf0.1 956k vs 112M (117×).
  * The one shuffle is the key join; dedup-before-rerank keeps the exact
  * levenshtein off duplicate candidates (a pair can share several keys).
  */
object FuzzyJoin {

  /** All single-deletion variants of `name` plus `name` itself, distinct.
    * For the empty string the sequence bound is clamped to 1 so Spark's
    * `sequence` never runs descending; the variants then collapse to the
    * identity key under array_distinct. Pure builtin expressions
    * (sequence/transform/substr) — whole-stage-codegen eligible.
    */
  def deletionKeys(name: Column): Column =
    array_distinct(concat(
      array(name),
      transform(
        sequence(lit(1), greatest(length(name), lit(1))),
        i => concat(name.substr(lit(1), i - lit(1)),
                    name.substr(i + lit(1), length(name))))))

  /** The depth-2 symmetric-delete neighborhood: every string reachable
    * from `name` by deleting AT MOST two characters (identity ∪ delete-1
    * ∪ delete-2), built by composing [[deletionKeys]] with itself —
    * deleting one character from each delete-1 variant enumerates exactly
    * the delete-{i,j} set. Losslessness for lev ≤ 2 (the SymSpell /
    * PassJoin pigeonhole, extended): any single edit between a and b is
    * absorbed by deleting ≤ 1 character from each side (substitution at p
    * → delete p from both; indel → delete the inserted character from the
    * longer side only), so TWO edits are absorbed by deleting ≤ 2 from
    * each side — delete2(a) ∩ delete2(b) ≠ ∅ whenever lev(a,b) ≤ 2, and
    * the key join is a lossless candidate generator. Two names sharing a
    * depth-2 key can be up to lev 4 apart, so the exact rerank is still
    * load-bearing. Fan-out bound: ≤ L(L−1)/2 delete-2 variants + L
    * delete-1 + 1 identity = L(L+1)/2 + 1 keys per name of length L —
    * quadratic, which is why this is the DRILL-DOWN tier: run the linear
    * lev≤1 tier board-wide, escalate to lev≤2 on the corpora (or
    * residual partitions) where the typo model demands it. Measured on
    * the customer corpus at sf0.01 (1.5k names, 18 chars): 93.2 DISTINCT
    * keys/name (the runs of '0' make many deletion variants coincide),
    * candidate volume 490,755 vs 1,124,250 all-pairs (2.3×) — sequential-
    * id name layouts are the worst case for this blocker (deleting the
    * two varying digit positions collides most of the corpus, and 18% of
    * all pairs genuinely ARE within lev 2); variable-length natural-word
    * corpora (part names, g51) block far tighter.
    */
  def deletionKeys2(name: Column): Column =
    array_distinct(flatten(transform(deletionKeys(name), k => deletionKeys(k))))

  /** Pairs (id_a, id_b, name_a, name_b, dist) with
    * levenshtein(name_a, name_b) <= 1 and id_a < id_b, over an input of
    * (id, name) — one name per id. Blocked candidate generation (see
    * object doc) then exact rerank; `dist` is INT (matches the oracle's
    * CAST(levenshtein(..) AS INT)).
    */
  def selfJoinLev1(entities: DataFrame): DataFrame = selfJoinLev(entities, 1)

  /** Generic tier entry: `maxDist` = 1 (linear fan-out, the board-wide
    * tier) or 2 (quadratic fan-out via [[deletionKeys2]], the drill-down
    * tier). Same candidate-then-rerank contract as [[selfJoinLev1]].
    */
  def selfJoinLev(entities: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"unsupported tier: lev<=$maxDist")
    val keys = if (maxDist == 1) deletionKeys(col("name")) else deletionKeys2(col("name"))
    val keyed = entities.select(col("id"), col("name"), explode(keys).as("key"))
    val a = keyed.select(col("id").as("id_a"), col("name").as("name_a"), col("key"))
    val b = keyed.select(col("id").as("id_b"), col("name").as("name_b"), col("key"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b")
      .distinct() // dedup-before-rerank: a pair can share several keys
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= maxDist)
  }

  /** RECORD-LINKAGE (two-table R-S) form: pairs (id_l, id_r, name_l,
    * name_r, dist) with lev ≤ maxDist, left × right — the two-collection
    * analogue of [[selfJoinLev]] and the lev-tier sibling of
    * [[TokenSetJoin.joinJaccard]]. Both sides explode their own deletion
    * neighborhoods and equi-join on the shared key (the same pigeonhole
    * proofs apply verbatim — they never used the self-join structure);
    * no id_l < id_r cut, because (l, r) is a directed linkage fact. This
    * is the BATCH shape: candidate dedup is an ordinary distinct and
    * neither side is forced to broadcast — use
    * [[graft.stream.Screening.screen]] when one side is a stream (its
    * broadcast index + stateless dedup are the streaming constraints,
    * paid only where required).
    */
  def joinLev(left: DataFrame, right: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"unsupported tier: lev<=$maxDist")
    def keys(c: Column) = if (maxDist == 1) deletionKeys(c) else deletionKeys2(c)
    val a = left.select(col("id").as("id_l"), col("name").as("name_l"),
      explode(keys(col("name"))).as("key"))
    val b = right.select(col("id").as("id_r"), col("name").as("name_r"),
      explode(keys(col("name"))).as("key"))
    a.join(b, Seq("key"))
      .select("id_l", "id_r", "name_l", "name_r")
      .distinct() // dedup-before-rerank: a pair can share several keys
      .withColumn("dist", levenshtein(col("name_l"), col("name_r")).cast("int"))
      .filter(col("dist") <= maxDist)
  }

  /** Candidate volume of the blocked join (pre-rerank, post-dedup) — the
    * adjudicated cost metric for the blocker (what a spec asserts prunes
    * vs N·(N−1)/2, and what a 100 TB run monitors instead of wall-clock).
    */
  def candidateCount(entities: DataFrame, maxDist: Int = 1): Long = {
    val keys = if (maxDist == 1) deletionKeys(col("name")) else deletionKeys2(col("name"))
    val keyed = entities.select(col("id"), explode(keys).as("key"))
    val a = keyed.select(col("id").as("id_a"), col("key"))
    val b = keyed.select(col("id").as("id_b"), col("key"))
    a.join(b, Seq("key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count()
  }
}
