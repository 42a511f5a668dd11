package graft.core

/** Engine configuration (reference `Router`, `core/base.py:7-341` — a
  * flat ~60-field config holder loaded from JSON with a system-level
  * benchmark registry). Spark-native: a typed case class with the same
  * section structure; loading is `fromPairs` over any key→value source
  * (properties file, CLI args, parsed JSON) — no JSON dependency.
  */
final case class GraftConfig(
    // dataset / database
    dataId: String = "",            // "id:sub_id:filter" grammar
    schemaId: String = "",          // "id:sub_id"
    dataRoot: String = "/root/testdata",
    // reducer
    reduceTopK: Int = 0,            // 0 = auto-schedule by db_size
    reduceTurns: Int = 0,
    initRetainRate: Double = 1.0,
    decayRate: Double = 0.8,
    // generation
    generateNum: Int = 3,
    debugTurns: Int = 2,
    // evaluation
    evalTimeoutSec: Int = 60,
    sqlTimeoutSec: Int = 120,
    // engine
    parallelism: Int = 5,
    // optional reference-shaped sys_config.json extending the benchmark
    // registry (reference `Router._sys_config_path`)
    sysConfigPath: String = "") {

  /** "id:sub_id:filter" → (id, subId, filter) (reference identifier
    * grammar, `core/data_manage.py:852-854`).
    */
  def dataIdentifier: (String, String, String) = GraftConfig.splitId(dataId, 3) match {
    case Seq(a, b, c) => (a, b, c)
  }
  def schemaIdentifier: (String, String) = GraftConfig.splitId(schemaId, 2) match {
    case Seq(a, b) => (a, b)
  }
}

object GraftConfig {

  private[core] def splitId(s: String, n: Int): Seq[String] =
    (s.split(":", -1).toSeq ++ Seq.fill(n)("")).take(n)

  /** One registered benchmark (reference `config/sys_config.json`). */
  final case class Benchmark(rootPath: String, dbType: String,
      hasSub: Boolean, subSplits: Seq[String] = Nil)

  /** Benchmark registry: resolvable data sources for the identifier
    * grammar. The TPC-H-ish test corpus registers its scale factors as
    * sub-splits.
    */
  val benchmarks: Map[String, Benchmark] = Map(
    "testdata" -> Benchmark("/root/testdata", "spark", hasSub = true,
      subSplits = Seq("sf0.001", "sf0.01", "sf0.1")),
    "spider" -> Benchmark("benchmarks/spider", "sqlite", hasSub = true,
      subSplits = Seq("dev", "test")),
    "bird" -> Benchmark("benchmarks/bird", "sqlite", hasSub = true,
      subSplits = Seq("dev")),
    "spider2-lite" -> Benchmark("benchmarks/spider2", "big_query", hasSub = false),
    "spider2-snow" -> Benchmark("benchmarks/spider2", "snowflake", hasSub = false))

  /** DB path resolution: `<root>/database` or `<root>/<sub>/database`
    * (reference `core/base.py:467-488`); for the parquet corpus the
    * "database" is the scale-factor directory itself.
    */
  def resolveDbPath(benchmark: String, subId: String,
      registry: Map[String, Benchmark] = benchmarks): Option[String] =
    registry.get(benchmark).map { b =>
      if (b.hasSub && subId.nonEmpty) s"${b.rootPath}/$subId" else b.rootPath
    }

  /** Extend the builtin registry from a reference-shaped
    * `sys_config.json` (`config/sys_config.json`: a `benchmark` array
    * of {id, root_path, db_type, has_sub, sub_data:[{sub_id}]}) — real
    * benchmarks wire in by dropping the reference's own config file
    * next to their data, no recompilation.
    */
  def loadBenchmarks(path: String): Map[String, Benchmark] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    val arr = root.path("benchmark")
    require(arr.isArray, s"sys config $path has no benchmark array")
    val b = Map.newBuilder[String, Benchmark]
    arr.forEach { n =>
      val subs = Option(n.get("sub_data")).filter(_.isArray).map { sd =>
        val s = Seq.newBuilder[String]
        sd.forEach(x => s += x.path("sub_id").asText())
        s.result()
      }.getOrElse(Nil)
      b += n.path("id").asText() -> Benchmark(
        n.path("root_path").asText(), n.path("db_type").asText(),
        n.path("has_sub").asBoolean(false), subs)
    }
    benchmarks ++ b.result()
  }

  /** Load from a flat JSON config file (the reference's
    * `Router(config_path=...)` entry, `startup_run/run.py:11` +
    * `config/sys_config.json` shape): scalar fields become the
    * `fromPairs` key→value source; unknown keys are ignored so a
    * reference config file loads as-is.
    */
  def fromJsonFile(path: String): GraftConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    require(root.isObject, s"config $path is not a JSON object")
    val names = root.fieldNames()
    val b = Map.newBuilder[String, String]
    while (names.hasNext) {
      val k = names.next()
      val v = root.get(k)
      if (v.isValueNode) b += k -> v.asText()
    }
    fromPairs(b.result())
  }

  /** Build from any key→value pairs; unknown keys ignored, types coerced. */
  def fromPairs(pairs: Map[String, String]): GraftConfig = {
    val base = GraftConfig()
    base.copy(
      dataId = pairs.getOrElse("data_id", base.dataId),
      schemaId = pairs.getOrElse("schema_id", base.schemaId),
      dataRoot = pairs.getOrElse("data_root", base.dataRoot),
      reduceTopK = pairs.get("reduce_top_k").map(_.toInt).getOrElse(base.reduceTopK),
      reduceTurns = pairs.get("reduce_turns").map(_.toInt).getOrElse(base.reduceTurns),
      initRetainRate = pairs.get("init_retain_rate").map(_.toDouble).getOrElse(base.initRetainRate),
      decayRate = pairs.get("decay_rate").map(_.toDouble).getOrElse(base.decayRate),
      generateNum = pairs.get("generate_num").map(_.toInt).getOrElse(base.generateNum),
      debugTurns = pairs.get("debug_turns").map(_.toInt).getOrElse(base.debugTurns),
      evalTimeoutSec = pairs.get("eval_timeout_sec").map(_.toInt).getOrElse(base.evalTimeoutSec),
      sqlTimeoutSec = pairs.get("sql_timeout_sec").map(_.toInt).getOrElse(base.sqlTimeoutSec),
      parallelism = pairs.get("parallelism").map(_.toInt).getOrElse(base.parallelism),
      sysConfigPath = pairs.getOrElse("sys_config", base.sysConfigPath))
  }
}
