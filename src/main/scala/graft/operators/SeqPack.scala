package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to
  * fixed-token-budget bins in a deterministic global order — the
  * concat-then-chunk packing step that turns a curated corpus into
  * training sequences.
  *
  * Built on a scale-safe global running total (the same two-pass
  * partition-offset technique as `RowOps.withSliceId`): range-partition
  * on the order key, collect per-partition totals (#partitions rows on
  * the driver — the only driver data), broadcast the offsets, then each
  * partition computes its local prefix sums independently. No
  * single-partition window anywhere; both shuffles are full-width.
  */
object SeqPack {

  /** Sentinel group key standing in for NULL in [[withRunningTotalBy]]'s
    * string-keyed offset join (a NUL byte cannot appear in the
    * categorical columns — language, domain, source — this is for).
    */
  val NullGroupKey = "\u0000__null_group__"

  /** `out` = exclusive running total of `weightCol` in `orderCol` order
    * (total of all STRICTLY EARLIER rows; first row gets 0).
    * Deterministic up to ties in `orderCol` — use a unique key.
    */
  def withRunningTotal(df: DataFrame, orderCol: String, weightCol: String,
      out: String = "tokens_before"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted: the offsets job and the output job must see the SAME
    // range bounds — RangePartitioner's reservoir sampling is seeded by
    // RDD id, so re-executing the exchange in a second job can shift
    // boundary rows into a different partition than the one their
    // offset was computed for
    val ranged = graft.core.CacheBin.track(df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // a null weight would NPE the totals collect (or worse, silently
    // null the affected rows' running totals and bin ids downstream):
    // fail fast inside the same job, no extra validation pass
    val checkedWeight = when(col(weightCol).isNull,
      raise_error(concat(lit(s"null $weightCol in running-total input at "),
        col(orderCol).cast("string")))).otherwise(col(weightCol))
    val totals = ranged
      .groupBy(col("__pid")).agg(sum(checkedWeight.cast("long")).as("__t"))
      .orderBy(col("__pid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2))
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), "__pid")
      .withColumn(out,
        col("__off") + sum(col(weightCol).cast("long")).over(w) - col(weightCol).cast("long"))
      .drop("__pid", "__off")
  }

  /** Per-GROUP exclusive running total: like [[withRunningTotal]], but
    * the prefix sum restarts at zero for every distinct value of
    * `byCol`, and the order inside a group is given by `orderCols`
    * (which may carry sort directions, e.g. `col("score").desc`; make
    * the combination unique per group — ties are broken by nothing).
    *
    * Same two-pass shape at scale: range-partition on (by, order...) so
    * a group spans a CONTIGUOUS run of partitions, collect one
    * (partition, group, subtotal) row per group-fragment on the driver
    * (#partitions × #groups rows at worst, in practice #partitions +
    * #groups since only boundary partitions split), scanLeft offsets
    * per group, broadcast back. No per-group single-partition window:
    * a 100 TB language shard never funnels through one task.
    *
    * The group key is compared by its string form for the offset
    * join — fine for the categorical columns (language, domain,
    * source) this exists for. A NULL group key forms its own group
    * (sentinel below): a null language/domain must flow through with a
    * correct within-group total, not vanish because the inner offset
    * equi-join can never match a null key.
    */
  def withRunningTotalBy(df: DataFrame, byCol: String, orderCols: Seq[Column],
      weightCol: String, out: String = "weight_before"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = graft.core.CacheBin.track(df
      .repartitionByRange((col(byCol) +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__by", coalesce(col(byCol).cast("string"), lit(NullGroupKey)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val checkedWeight = when(col(weightCol).isNull,
      raise_error(concat(lit(s"null $weightCol in running-total input in group "),
        col("__by")))).otherwise(col(weightCol))
    val totals = ranged
      .groupBy(col("__pid"), col("__by"))
      .agg(sum(checkedWeight.cast("long")).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (by, frags) =>
      val sorted = frags.sortBy(_._1)
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3)).map {
        case (pid, off) => (pid, by, off)
      }
    }
    val offDf = offsets.toDF("__pid", "__by", "__off")
    val w = Window.partitionBy(col("__pid"), col("__by")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), Seq("__pid", "__by"))
      .withColumn(out,
        col("__off") + sum(col(weightCol).cast("long")).over(w) -
          col(weightCol).cast("long"))
      .drop("__pid", "__by", "__off")
  }

  /** Pack rows into `budget`-token bins: bin = floor(tokens_before /
    * budget) — the concat-then-chunk assignment (a document belongs to
    * the bin where its first token lands). Emits the bin id and the
    * document's token offset within its bin.
    */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long): DataFrame =
    withRunningTotal(df, orderCol, weightCol)
      .withColumn("bin_id",
        floor(col("tokens_before").cast("double") / budget.toDouble).cast("long"))
      .withColumn("bin_offset", col("tokens_before") - col("bin_id") * budget)

  /** WHOLE-document packing — no document ever splits across bins (the
    * SFT/instruction-tuning requirement concat-then-chunk violates:
    * [[packByBudget]] truncates whichever document straddles a bin
    * boundary). Harmonic size classes make it fully relational with NO
    * sequential bin state: a document of weight w joins class
    * k = budget div w (the max count of its size that fits a bin), and
    * each bin of class k holds exactly k consecutive class-k documents
    * in deterministic `orderCol` order — so `bin = classBase(k) +
    * rank_in_class div k`, pure arithmetic once per-class ranks exist.
    * Per-class fill is > k/(k+1) of the budget by construction (class-k
    * weights live in (budget/(k+1), budget/k]), the classic harmonic
    * packing bound — the price of never splitting and never needing a
    * first-fit scan's sequential state.
    *
    * Scale shape: ranks ride ONE [[withRunningTotal]] pass over the
    * (class, orderCol) range order (weight 1 — the global rank), and
    * per-class offsets/bases are a #classes-row aggregate (classes ≤
    * distinct weights ≤ budget) broadcast back. No per-class window —
    * the biggest class (short documents) would otherwise funnel one
    * reducer. Documents with weight > budget fail loudly: silently
    * truncating or silently giving them a lone bin both corrupt a
    * training run's sequence-length contract; chunk them first
    * ([[ChunkSplit]]) if splitting is acceptable.
    *
    * Output: input columns + `pack_class`, `bin_id` (dense, 0-based,
    * class-contiguous), `bin_fill` (the bin's total tokens — same
    * value on every row of a bin).
    */
  def packWholeDocs(df: DataFrame, orderCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // the composite range key renders the class in fixed-width decimal;
    // the max class is `budget` itself (weight-1 docs), so the width is
    // the budget's own digit count — 1 M-token (2^20) and larger
    // long-context budgets pack fine, the key just grows a digit
    val classDigits = budget.toString.length
    val spark = df.sparkSession
    import spark.implicits._
    val w = col(weightCol).cast("long")
    // the fixed-width composite range key below would silently
    // mis-rank a negative order key ('-' sorts before digits), so a
    // negative id fails as loudly as a bad weight
    val classed = df.withColumn("pack_class",
      when(w.isNull || w <= 0 || w > budget || col(orderCol) < 0,
        raise_error(concat(
          lit(s"packWholeDocs: weight out of (0, $budget] or negative id at "),
          col(orderCol).cast("string"), lit(" weight="), w.cast("string"))))
        .otherwise(call_function("div", lit(budget), w)).cast("long"))
    // global rank in (class, order) order; class blocks are contiguous,
    // so rank - classStart = rank within the class
    val ranked = withRunningTotal(
      classed.withColumn("__one", lit(1L))
        .withColumn("__ck",
          // composite (class, order) range key as one fixed-width
          // decimal string: lexicographic order == numeric order for
          // the non-negative class (≤ budget, classDigits digits) and
          // id (≤ 20 digits), which is all withRunningTotal's single
          // orderCol can range-partition on
          format_string(s"%0${classDigits}d|%020d",
            col("pack_class"), col(orderCol))),
      "__ck", "__one", out = "__rank")
    // per-class sizes -> exclusive rank starts and bin bases
    val classes = ranked.groupBy(col("pack_class"))
      .agg(count(lit(1)).as("__n"), min(col("__rank")).as("__start"))
      .orderBy(col("pack_class"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val binBases = classes.scanLeft(0L) { case (acc, (k, n, _)) =>
      acc + (n + k - 1) / k // ceil(n / k) bins for class k
    }.init
    val baseDf = classes.zip(binBases).toSeq
      .map { case ((k, _, start), base) => (k, start, base) }
      .toDF("pack_class", "__start", "__base")
    val packed = ranked
      .join(broadcast(baseDf), "pack_class")
      .withColumn("bin_id",
        col("__base") +
          call_function("div", col("__rank") - col("__start"), col("pack_class")))
      .drop("__one", "__ck", "__rank", "__start", "__base")
    // bin_fill: per-bin token total (bounded groups — ≤ budget docs/bin)
    val fills = packed.groupBy(col("bin_id"))
      .agg(sum(w).as("bin_fill"))
    packed.join(fills, "bin_id")
  }
}
