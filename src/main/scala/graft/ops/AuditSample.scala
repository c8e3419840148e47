package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-of-64 md5-shard sampling for the AUDIT-class queries (VERDICT
  * r15 item 4): the exact-truth passes of the blocking audit, the
  * duplication spectrum, and the threshold sweep are tune-time
  * queries whose cost scales with the pair/gram-stream maximum — the
  * honest price of exact truth. At 100× corpus scale an owner runs
  * them on a shard sample instead; this gate is that switch.
  *
  * `spark.graft.audit.sampleShards` = k (1..64, default UNSET = every
  * query exact and oracle-stable; Verify refuses the conf — it
  * changes output). When set, a row survives iff the md5 of its
  * sampling KEY lands in the first k of 64 shards. The key choice is
  * what makes the estimates honest:
  *
  *  - PAIR-keyed streams (blocking audit, threshold sweep) shard on
  *    (da, db), so every blocker and the truth see the SAME sampled
  *    pair population — precision/recall permilles are computed
  *    within it and need no rescaling; raw counts are of the k/64
  *    shard (multiply by 64/k for a corpus estimate).
  *  - GRAM-keyed streams (substring profile/spectrum/cut) shard on
  *    the window hash: all occurrences of one gram share its shard,
  *    so each sampled gram's ≥2-occurrence decision stays EXACT —
  *    sampling thins which windows are audited, never corrupts a
  *    window's verdict. Coverage columns measure the sampled window
  *    shard (≈ k/64 of the corpus figure, modulo interval-union
  *    overlap).
  */
object AuditSample {

  private val Conf = "spark.graft.audit.sampleShards"

  /** Number of sampled shards, if the conf is set. */
  def shards(df: DataFrame): Option[Int] =
    df.sparkSession.conf.getOption(Conf).map { v =>
      val k = v.toInt
      require(k >= 1 && k <= 64, s"$Conf=$k out of range (1..64)")
      k
    }

  /** Filter `df` to the first k of 64 md5 shards of `key` columns —
    * identity when the conf is unset or k = 64. */
  def gate(df: DataFrame, key: Column*): DataFrame =
    shards(df) match {
      case None | Some(64) => df
      case Some(k) =>
        val h = conv(substring(
          md5(concat_ws("_", key.map(_.cast("string")): _*)), 1, 15),
          16, 10).cast("long")
        df.filter(pmod(h, lit(64L)) < k)
    }

  /** Same gate for a column that ALREADY carries a uniform
    * md5-derived integer key (the substring gram hash) — shards on
    * `h mod 64` directly, no second hash. */
  def gateHash(df: DataFrame, h: Column): DataFrame =
    shards(df) match {
      case None | Some(64) => df
      case Some(k) => df.filter(pmod(h, lit(64L)) < k)
    }
}
