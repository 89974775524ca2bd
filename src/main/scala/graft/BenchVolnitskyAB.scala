package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.VolnitskySearcher

/** Micro A/B for the Volnitsky substring matcher vs
  * `UTF8String.contains` (what Spark's `LIKE '%x%'` compiles to) —
  * single-threaded, pure JVM, no Spark session. The corpus reproduces
  * the hits generator's URL/Title shape (the strings q21-q24 scan), so
  * ns/row here is the per-row match cost inside those queries' codegen
  * loop. Prints one JSON line; writes target/BENCH_volnitsky_ab.json.
  *
  * Match counts are asserted equal between the two implementations on
  * every (corpus, needle) cell — a disagreement aborts the run. */
object BenchVolnitskyAB {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2000000)
    // deterministic splitmix-ish generator, no java.util.Random state
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def hm(seed: Int, i: Int, m: Long): Long =
      math.floorMod(mix(seed.toLong << 32 | i.toLong), m)

    val urls = new Array[UTF8String](rows)
    val titles = new Array[UTF8String](rows)
    var i = 0
    while (i < rows) {
      val r = hm(12, i, 1000)
      val u =
        if (r < 3) "http://example.ru/"
        else if (r < 11) s"http://example.com/metrika/page${hm(121, i, 10000)}"
        else s"http://example.com/p${hm(122, i, 1000000)}"
      urls(i) = UTF8String.fromString(u)
      val t =
        if (hm(13, i, 1000) < 5) s"Yandex news ${hm(131, i, 1000)}"
        else s"Title ${hm(132, i, 500000)}"
      titles(i) = UTF8String.fromString(t)
      i += 1
    }

    final case class Cell(corpus: String, data: Array[UTF8String], needle: String)
    val cells = Seq(
      Cell("url", urls, "metrika"),
      Cell("url", urls, ".example."),
      Cell("url", urls, "abcd"),
      Cell("title", titles, "Yandex"),
      Cell("title", titles, "500known"))

    def timeNaive(data: Array[UTF8String], needle: UTF8String): (Double, Long) = {
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        if (data(j).contains(needle)) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    def timeVol(data: Array[UTF8String], s: VolnitskySearcher): (Double, Long) = {
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        if (s.contains(data(j))) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }

    // multi-needle: one MultiVolnitsky pass vs k single-needle passes
    // vs k naive contains — the multiSearchAny engine choice
    val multiNeedles = Seq("metrika", ".example.", "page7", "Yandex")
    def timeMultiNaive(data: Array[UTF8String]): (Double, Long) = {
      val ns = multiNeedles.map(UTF8String.fromString).toArray
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        var found = false
        var i = 0
        while (!found && i < ns.length) {
          if (data(j).contains(ns(i))) found = true
          i += 1
        }
        if (found) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    def timeMultiVolK(data: Array[UTF8String]): (Double, Long) = {
      val ss = multiNeedles.map(n =>
        new VolnitskySearcher(UTF8String.fromString(n).getBytes)).toArray
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        var found = false
        var i = 0
        while (!found && i < ss.length) {
          if (ss(i).contains(data(j))) found = true
          i += 1
        }
        if (found) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    def timeMultiOne(data: Array[UTF8String]): (Double, Long) = {
      val s = new graft.functions.MultiVolnitskySearcher(
        multiNeedles.map(n => UTF8String.fromString(n).getBytes).toArray)
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        if (s.containsAny(data(j))) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    // case-insensitive: lower()+contains materialization (what
    // ILIKE '%x%' = Contains(Lower(col), x) costs per row) vs the
    // raw-column case-variant Volnitsky scan
    final case class CiCell(corpus: String, data: Array[UTF8String],
                            needle: String)
    val ciCells = Seq(
      CiCell("url", urls, "METRIKA"),
      CiCell("url", urls, ".Example."),
      CiCell("title", titles, "yandex"))
    def timeCiNaive(data: Array[UTF8String], needleLower: UTF8String): (Double, Long) = {
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        if (data(j).toLowerCase.contains(needleLower)) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    def timeCiVol(data: Array[UTF8String], s: VolnitskySearcher): (Double, Long) = {
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        if (s.contains(data(j))) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    val ciResults = ciCells.map { c =>
      val needleLower = UTF8String.fromString(c.needle.toLowerCase)
      val searcher = new VolnitskySearcher(
        UTF8String.fromString(c.needle.toLowerCase).getBytes,
        caseInsensitive = true)
      timeCiNaive(c.data, needleLower); timeCiVol(c.data, searcher) // warm
      val naive = (0 until 5).map(_ => timeCiNaive(c.data, needleLower)).minBy(_._1)
      val vol = (0 until 5).map(_ => timeCiVol(c.data, searcher)).minBy(_._1)
      require(naive._2 == vol._2,
        s"CI match-count disagreement on ${c.corpus}/${c.needle}: " +
          s"naive=${naive._2} volnitsky=${vol._2}")
      println(f"[vol-ab] ci ${c.corpus}%-6s ${c.needle}%-10s " +
        f"lower+contains=${naive._1}%6.2f ns/row  ci-volnitsky=${vol._1}%6.2f " +
        f"ns/row  speedup=${naive._1 / vol._1}%4.2fx  hits=${naive._2}")
      (c, naive._1, vol._1, naive._2)
    }

    // BATCHED dictionary (hasMoreToSearch shape): a 1200-term list —
    // the PII/quality-word-list scale that exceeds one table's bigram
    // budget (1200 × 10 entries = 12000 > 8192 → 2 groups) — one-pass
    // batched engine vs the r15 fallback of k naive contains scans.
    val dictNeedles: Array[Array[Byte]] =
      ((0 until 1199).map(i => f"badword$i%04d") :+ "metrika/page")
        .map(n => UTF8String.fromString(n).getBytes).toArray
    val batched = new graft.functions.BatchedMultiVolnitsky(dictNeedles)
    def timeDictNaive(data: Array[UTF8String]): (Double, Long) = {
      val ns = dictNeedles.map(UTF8String.fromBytes)
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        var found = false
        var i = 0
        while (!found && i < ns.length) {
          if (data(j).contains(ns(i))) found = true
          i += 1
        }
        if (found) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    def timeDictBatched(data: Array[UTF8String]): (Double, Long) = {
      var hits = 0L
      val t0 = System.nanoTime()
      var j = 0
      while (j < data.length) {
        if (batched.containsAny(data(j))) hits += 1
        j += 1
      }
      ((System.nanoTime() - t0).toDouble / data.length, hits)
    }
    timeDictNaive(urls); timeDictBatched(urls) // warm
    val dn = (0 until 3).map(_ => timeDictNaive(urls)).minBy(_._1)
    val db = (0 until 5).map(_ => timeDictBatched(urls)).minBy(_._1)
    require(dn._2 == db._2,
      s"batched-dict disagreement: naive=${dn._2} batched=${db._2}")
    println(f"[vol-ab] dict(${dictNeedles.length} needles, " +
      f"${batched.groupCount} groups on url): k-naive=${dn._1}%8.2f " +
      f"batched=${db._1}%6.2f ns/row (${dn._1 / db._1}%4.1fx) hits=${dn._2}")

    timeMultiNaive(urls); timeMultiVolK(urls); timeMultiOne(urls) // warm
    val mn = (0 until 5).map(_ => timeMultiNaive(urls)).minBy(_._1)
    val mk = (0 until 5).map(_ => timeMultiVolK(urls)).minBy(_._1)
    val m1 = (0 until 5).map(_ => timeMultiOne(urls)).minBy(_._1)
    require(mn._2 == mk._2 && mn._2 == m1._2,
      s"multi-needle disagreement: naive=${mn._2} kvol=${mk._2} one=${m1._2}")
    println(f"[vol-ab] multi(4 needles on url): naive=${mn._1}%6.2f " +
      f"k-volnitsky=${mk._1}%6.2f one-pass=${m1._1}%6.2f ns/row " +
      f"(one-pass ${mn._1 / m1._1}%4.2fx vs naive, " +
      f"${mk._1 / m1._1}%4.2fx vs k passes) hits=${mn._2}")

    val results = cells.map { c =>
      val needle = UTF8String.fromString(c.needle)
      val searcher = new VolnitskySearcher(needle.getBytes)
      // warm both (JIT), then best-of-5
      timeNaive(c.data, needle); timeVol(c.data, searcher)
      val naive = (0 until 5).map(_ => timeNaive(c.data, needle)).minBy(_._1)
      val vol = (0 until 5).map(_ => timeVol(c.data, searcher)).minBy(_._1)
      require(naive._2 == vol._2,
        s"match-count disagreement on ${c.corpus}/${c.needle}: " +
          s"naive=${naive._2} volnitsky=${vol._2}")
      println(f"[vol-ab] ${c.corpus}%-6s ${c.needle}%-10s " +
        f"naive=${naive._1}%6.2f ns/row  volnitsky=${vol._1}%6.2f ns/row  " +
        f"speedup=${naive._1 / vol._1}%4.2fx  hits=${naive._2}")
      (c, naive._1, vol._1, naive._2)
    }
    val ciJson = ciResults.map { case (c, n, v, h) =>
      s"""{"corpus":"${c.corpus}","needle":"${c.needle}","lower_contains_ns":$n,""" +
        s""""ci_volnitsky_ns":$v,"speedup":${n / v},"hits":$h}"""
    }.mkString("[", ",", "]")
    val json = results.map { case (c, n, v, h) =>
      s"""{"corpus":"${c.corpus}","needle":"${c.needle}","naive_ns":$n,""" +
        s""""volnitsky_ns":$v,"speedup":${n / v},"hits":$h}"""
    }.mkString(s"""{"metric":"volnitsky_ab","rows":$rows,"cells":[""", ",",
      s"""],"ci_cells":$ciJson,""" +
      s""""multi":{"needles":${multiNeedles.length},"naive_ns":${mn._1},""" +
        s""""k_volnitsky_ns":${mk._1},"one_pass_ns":${m1._1},""" +
        s""""hits":${mn._2}},""" +
      s""""batched_dict":{"needles":${dictNeedles.length},""" +
        s""""groups":${batched.groupCount},"k_naive_ns":${dn._1},""" +
        s""""batched_ns":${db._1},"speedup":${dn._1 / db._1},""" +
        s""""hits":${dn._2}}}""")
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/BENCH_volnitsky_ab.json"), json)
    catch { case _: Throwable => () }
  }
}
