package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The k-lowest-ids discipline for every bounded query/seed set
  * (VERDICT r16 item 1, generalizing the r15 kmeans ADVICE fix): the
  * library convention "the 50 lowest-id vectors are the query set /
  * the K lowest-id vectors seed the quantizer" must not be spelled
  * `vec_id < k` outside the declared oracle queries — a user frame
  * whose ids start at 100 would silently produce an EMPTY query/seed
  * set (zero-row retrieval metrics; a div-by-zero null recall row).
  *
  * One bounded driver fetch (TakeOrdered of the `maxK` lowest ids —
  * never a full sort) yields inclusive-cutoff predicates for every k
  * a pipeline needs. On dense 0-based ids (every fixture) the cutoff
  * for k is id k−1, so `id <= cutoff` is value-equal to the declared
  * literal `id < k` — facade≡declared pins hold bit-for-bit there.
  * Frames with fewer than k rows use them all (the declared literal
  * semantics). Empty frames raise loudly instead of propagating an
  * empty set downstream.
  */
private[graft] object BoundedIds {

  /** Inclusive-cutoff predicate factory over `emb`'s `idCol`: returns
    * k => (idCol <= k-th-lowest id). `what` names the facade in the
    * empty-frame error. */
  def cutoffs(emb: DataFrame, idCol: String, maxK: Int,
      what: String): Int => Column = {
    val ids = emb.select(col(idCol).cast("long"))
      .orderBy(col(idCol)).limit(maxK)
      .collect().map(_.getLong(0))
    require(ids.nonEmpty,
      s"$what: input frame is empty — no rows to draw the bounded " +
        "query/seed set from")
    k => col(idCol) <= lit(ids(math.min(k, ids.length) - 1))
  }

  /** The declared-query bound: the literal `idCol < k` the oracles
    * replay — the default every `q_*` query stays on so plans and
    * hashes are bit-stable. */
  def literal(idCol: String): Int => Column =
    k => col(idCol) < k

  /** Inclusive-cutoff predicate for ARBITRARY (data-derived) set
    * sizes — used where k itself scales with the corpus (SemDeDup's
    * K = resolveCells cells, its S super-cells) so a fixed prefetch
    * can't cover it: one bounded TakeOrdered + max action per
    * distinct k. */
  def kthLowest(emb: DataFrame, idCol: String,
      what: String): Long => Column = { k =>
    require(k >= 1L && k <= 65536L, s"$what: set size $k out of range")
    val row = emb.select(col(idCol).cast("long").as("__id"))
      .orderBy(col("__id")).limit(k.toInt)
      .agg(max(col("__id"))).collect().head
    require(!row.isNullAt(0),
      s"$what: input frame is empty — no rows to draw the bounded " +
        "seed set from")
    col(idCol) <= lit(row.getLong(0))
  }
}
