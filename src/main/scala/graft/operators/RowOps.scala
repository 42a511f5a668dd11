package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset row operators (SURVEY §2.2): the reference's driver-side list
  * comprehensions over question records, re-expressed as Catalyst column
  * predicates and joins so they run distributed at any scale.
  */
object RowOps {

  /** The declarative row-filter mini-language
    * (`filter_dataset`, reference `core/data_manage.py:1482-1557`).
    *
    * Grammar (conditions joined by `spliter`, default "."):
    *   `<field>`              field present and truthy (non-null, non-empty)
    *   `<field>-<value>`      string equality
    *   `<field>-<op>-<n>`     numeric compare; op ∈ l,e,m,le,me (<,=,>,<=,>=)
    *   `<field>_length-<op>-<n>`  compare LENGTH(field)  (the reference's
    *                          ques_length/query_length generalized)
    *
    * Compiles to a single `Column` predicate — Catalyst pushes it into
    * the scan, so the "filter" costs a parquet predicate, not a pass.
    */
  def compileFilter(filterBy: String, spliter: String = "."): Column = {
    val conditions = filterBy.split(java.util.regex.Pattern.quote(spliter)).filter(_.nonEmpty)
    val ops: Map[String, (Column, Column) => Column] = Map(
      "l" -> (_ < _), "e" -> (_ === _), "m" -> (_ > _),
      "le" -> (_ <= _), "me" -> (_ >= _))
    val preds = conditions.toSeq.map { cond =>
      // unbounded split, >3 parts rejected — faithful to the reference
      // grammar (core/data_manage.py:1505-1513), which cannot express
      // hyphenated values or negative literals either
      cond.split("-") match {
        case Array(field) =>
          col(field).isNotNull && col(field).cast("string") =!= ""
        case Array(field, value) =>
          col(field).cast("string") === value
        case Array(field, op, value) =>
          val opFn = ops.getOrElse(op,
            throw new IllegalArgumentException(s"Unsupported operator: $op"))
          val lhs =
            if (field.endsWith("_length")) length(col(field.stripSuffix("_length")))
            else col(field)
          opFn(lhs.cast("long"), lit(value.toLong))
        case _ =>
          throw new IllegalArgumentException(s"Invalid filter condition: $cond")
      }
    }
    preds.reduce(_ && _)
  }

  def filterDataset(df: DataFrame, filterBy: String): DataFrame =
    df.filter(compileFilter(filterBy))

  /** Cross-actor dataset merge (`update_dataset`,
    * `core/data_manage.py:363-394`): align by key, other's fields
    * overwrite self's (`r1.update(r2)`), other-only columns appended.
    * Spark version: full outer join + per-column coalesce(right, left),
    * one shuffle on the key.
    */
  def updateDataset(self: DataFrame, other: DataFrame, key: String): DataFrame = {
    val l = self.as("l")
    val r = other.as("r")
    // join on the ALIAS-qualified keys: self(key)/other(key) resolve to
    // the same attribute when both sides share lineage (e.g. two
    // aggregations of one table), which Spark joins correctly but
    // flags with a "trivially true equals predicate" warning per run
    val joined = l.join(r, col(s"l.$key") === col(s"r.$key"), "full_outer")
    val shared = self.columns.toSet.intersect(other.columns.toSet) - key
    val leftOnly = self.columns.filterNot(shared.contains).filterNot(_ == key)
    val rightOnly = other.columns.filterNot(self.columns.toSet.contains)
    val cols =
      Seq(coalesce(col(s"l.$key"), col(s"r.$key")).as(key)) ++
        leftOnly.map(c => col(s"l.$c").as(c)) ++
        self.columns.filter(shared.contains).map(c =>
          coalesce(col(s"r.$c"), col(s"l.$c")).as(c)) ++
        rightOnly.map(c => col(s"r.$c").as(c))
    joined.select(cols: _*)
  }

  /** Deterministic systematic sample: key mod `every` == `offset`.
    * The reference's `random.sample` (`core/data_manage.py:156-162`) is
    * driver-side and unreproducible across engines; hash/key-mod sampling
    * gives the same subset on any engine and any cluster size.
    */
  def systematicSample(df: DataFrame, key: String, every: Int, offset: Int): DataFrame =
    df.filter(pmod(col(key), lit(every)) === offset)

  /** Random sample by fraction (seeded) — the scalable analog of
    * `random_size` fraction sampling.
    */
  def randomSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Deterministic per-stratum sampling (the engine-portable `sampleBy`:
    * reference `random_size` + the reducer's per-turn sampleBy). The
    * draw is multiplicative-hash arithmetic on the key — pure integer
    * ops, so the SAME rows are selected on any engine, any partitioning,
    * any cluster size (unlike `DataFrameStatFunctions.sampleBy`, whose
    * rand() draw is partition-layout-dependent). Strata missing from
    * `fractions` are dropped.
    *
    * The key is reduced mod a prime BEFORE the Knuth multiply: with
    * ANSI mode on, `key * 2654435761` overflow-throws for keys past
    * ~3.5e9 — exactly the id range a 100 TB corpus reaches — and the
    * BIGINT oracle mirror would error the same way.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], keyCol: String): DataFrame = {
    val threshold = fractions.foldLeft(lit(0L)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit((v * 1000000L).toLong)).otherwise(acc)
    }
    df.filter(multiplicativeDraw(col(keyCol)) < threshold)
  }

  /** The engine-wide deterministic draw in [0, 1e6): Knuth multiply of
    * the key reduced mod a prime (overflow-safe under ANSI mode — see
    * [[stratifiedSample]]). ONE definition shared by every sampler,
    * splitter, and shard assigner so the constants cannot drift
    * between sites — its DuckDB mirror is
    * `((key % 1000003) * 2654435761) % 1000000`.
    */
  def multiplicativeDraw(key: Column): Column = pmod(
    pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L),
    lit(1000000L))

  /** Per-source token-budget corpus mixing — the pretraining mixture
    * step: each source contributes documents, in a deterministic
    * pseudo-random order (multiplicative hash of the id — same
    * overflow-safe arithmetic as `stratifiedSample`), until its token
    * budget is exhausted; a document is kept when the running total
    * INCLUDING it still fits (dropped documents still consume budget —
    * the cumsum runs over ALL rows in hash order). Hash order makes the
    * kept set a representative sample rather than an id-prefix, and
    * identical on any engine, partitioning, or cluster size.
    *
    * Scale shape: a mixture names a HANDFUL of sources, so a window
    * partitioned by source would serialize each source's entire corpus
    * through one reducer — the low-key-cardinality funnel. Instead this
    * is the `SeqPack.withRunningTotal` two-pass cumsum applied per
    * source: range-partition on (source, hash, id) so each source's
    * rows are globally ordered ACROSS full-width partitions, collect
    * per-(partition, source) token totals (≤ #partitions + #sources
    * rows — the only driver data), turn them into exclusive offsets,
    * then a single partition-local pass accumulates the running total
    * and keeps rows within budget. No Window node anywhere in the plan;
    * both shuffles are full-width.
    */
  def tokenBudgetSample(df: DataFrame, srcCol: String, tokensCol: String,
      defaultBudget: Long, overrides: Map[String, Long] = Map.empty,
      idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val ord = pmod(
      pmod(col(idCol).cast("long"), lit(1000000007L)) * lit(2654435761L),
      lit(1000000007L))
    // persisted: the offsets job and the output job must see the SAME
    // range bounds (see SeqPack.withRunningTotal)
    val ranged = graft.core.CacheBin.track(df
      .withColumn("__ord", ord)
      .withColumn("__tok", coalesce(col(tokensCol).cast("long"), lit(0L)))
      .repartitionByRange(col(srcCol), col("__ord"), col(idCol))
      .sortWithinPartitions(col(srcCol), col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = ranged
      .groupBy(col("__pid"), col(srcCol).cast("string").as("__src"))
      .agg(sum(col("__tok")).as("__t"))
      .collect()
      .map(r => (r.getInt(0), String.valueOf(r.getString(1)), r.getLong(2)))
    // exclusive running offset of each (partition, source): total of the
    // same source in all earlier partitions
    val offsets: Map[(Int, String), Long] = totals.groupBy(_._2).flatMap {
      case (src, rows) =>
        val sorted = rows.sortBy(_._1)
        sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._3))
          .map { case (pid, off) => (pid, src) -> off }
    }
    val offB = spark.sparkContext.broadcast(offsets)
    val schema = ranged.schema
    val srcIdx = schema.fieldIndex(srcCol)
    val tokIdx = schema.fieldIndex("__tok")
    val pidIdx = schema.fieldIndex("__pid")
    val kept = ranged.mapPartitions { it =>
      // partition-local sequential pass: rows arrive sorted by
      // (source, hash, id); seed each source's accumulator with its
      // exclusive cross-partition offset
      val running = scala.collection.mutable.Map.empty[String, Long]
      it.filter { row =>
        val src = String.valueOf(row.get(srcIdx))
        val pid = row.getInt(pidIdx)
        val cum = running.getOrElse(src,
          offB.value.getOrElse((pid, src), 0L)) + row.getLong(tokIdx)
        running(src) = cum
        cum <= overrides.getOrElse(src, defaultBudget)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    kept.drop("__ord", "__tok", "__pid")
  }

  /** Split a schema/record set into slices of ≤ sliceSize for parallel
    * downstream processing (`parallel_slice_parse`,
    * `core/actor/parser/BaseParse.py:160-217`).
    *
    * Scale-safe global ordering: range-partition on `orderCol`, count
    * rows per partition (one tiny job — #partitions rows on the
    * driver), then global row number = partition offset + within-
    * partition rank. No single-partition window; both shuffles are
    * full-width. Deterministic up to ties in `orderCol` (same as any
    * distributed sort).
    */
  def withSliceId(df: DataFrame, orderCol: String, sliceSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted so the counts job and the output job share one set of
    // range bounds (reservoir-sampled bounds are not stable across
    // re-executions — see SeqPack.withRunningTotal)
    val ranged = graft.core.CacheBin.track(df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = ranged
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__pid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2))
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    ranged
      .join(broadcast(offDf), "__pid")
      .withColumn("slice_id",
        ((col("__off") + row_number().over(w) - 1) / sliceSize).cast("long"))
      .drop("__pid", "__off")
  }

  /** Per-round exponential retention decay
    * (`LinkAlignReduce.py:151-167`): keep `initRate * decayRate^round`
    * of each round's rows.
    *
    * The draw is a deterministic per-row hash of `keyCols` + seed, not
    * `rand(seed)` — `rand` is partition-layout-dependent, so its output
    * changes across cluster sizes, AQE decisions, and task retries. The
    * hash draw is invariant under any repartitioning.
    */
  def retainDecay(df: DataFrame, roundCol: String, initRate: Double,
      decayRate: Double, keyCols: Seq[String], seed: Long = 42L): DataFrame = {
    val fraction = lit(initRate) * pow(lit(decayRate), col(roundCol).cast("double"))
    val draw =
      pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(1000000L)).cast("double") / 1000000.0
    df.filter(draw < fraction)
  }

  /** Deterministic train/validation/test assignment: the same
    * overflow-safe multiplicative-hash draw as `stratifiedSample`,
    * thresholded into labeled splits with exact expected fractions.
    * Every engine, partitioning, and retry assigns each row the same
    * split — the property a reproducible corpus split requires.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val draw = multiplicativeDraw(col(keyCol))
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => (f * 1000000L).toLong)
    val labeled = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): Column) { case ((name, t), acc) =>
        when(draw < t, lit(name)).otherwise(acc)
      }
    df.withColumn("split", labeled)
  }

  /** Dedup by a column subset with a deterministic survivor (smallest
    * `tieBreak`), unlike dropDuplicates' partition-order-dependent pick
    * (`LinkAlignReduce.py:209-212` analog).
    */
  def dedupBy(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Remove LLM-flagged irrelevant (table, column) pairs: left-anti join
    * against the flagged set (`LinkAlignReduce.py:197-201`).
    */
  def antiFilter(df: DataFrame, flagged: DataFrame, keys: Seq[String]): DataFrame =
    df.join(flagged, keys, "left_anti")

  /** Weighted majority vote → argmax group
    * (`LinkAlignReduce.py:202-218`): groupBy + sum(weight), pick the top
    * key with a deterministic tiebreak.
    */
  def majorityVote(df: DataFrame, voteCol: String, weightCol: String): DataFrame =
    df.groupBy(col(voteCol))
      .agg(sum(col(weightCol)).as("total_weight"))
      .orderBy(col("total_weight").desc, col(voteCol))
      .limit(1)
}
