package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's final stdout line must survive the recorder's ~2000-char
  * tail capture intact: every recorded round so far arrived truncated
  * (and unparseable) because the full row set overflowed the window.
  * These tests pin the budgeted headline emit: bounded length, valid
  * JSON, graded rows first.
  */
class BenchEmitSpec extends AnyFunSuite {

  // minimal structural JSON check (object nesting + string/number
  // tokens) — no JSON lib on the main classpath, and the driver-side
  // parser is the real gate; this catches unbalanced/malformed output
  private def parseable(s: String): Boolean = {
    var depth = 0
    var inStr = false
    var prev = ' '
    s.foreach { c =>
      if (inStr) { if (c == '"' && prev != '\\') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth < 0) return false
        case _ =>
      }
      prev = c
    }
    depth == 0 && !inStr && s.startsWith("{") && s.endsWith("}")
  }

  private def fullResults: Map[String, Double] =
    (Bench.headlinePriority.zipWithIndex.map { case (k, i) =>
      k -> (i * 1.234567890123 + 0.000123456789)
    } ++ (0 until 90).map(i => s"extra_row_with_a_long_name_$i" -> i * 3.14159))
      .toMap

  test("headline line fits the tail window and parses") {
    val line = Bench.headlineLine(1234.5678901, "/root/testdata/sf0.1", fullResults)
    assert(line.length <= 1810, s"line too long: ${line.length}")
    assert(parseable(line), s"malformed: $line")
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"full\":\"BENCH_FULL.json\""))
  }

  test("graded rows always make the cut, at 5 significant digits") {
    val line = Bench.headlineLine(1.0, "/sf", fullResults)
    Seq("brute_qps", "ivf_10m_p50_ms", "engine_pq_10m_refined_p50_ms",
      "dedup_pipeline_1m_kept", "storm_retries", "load1_max",
      "stream_ingest_rows_per_sec").foreach { k =>
      assert(line.contains("\"" + k + "\":"), s"missing graded row $k")
    }
    // the synthetic values are index-derived; spot-check the rounding
    val idx = Bench.headlinePriority.indexOf("ivf_100k_qps")
    val want = Bench.jnum(idx * 1.234567890123 + 0.000123456789)
    assert(line.contains("\"ivf_100k_qps\":" + want))
  }

  test("jnum: integers stay integral, specials become null") {
    assert(Bench.jnum(885001.0) == "885001")
    assert(Bench.jnum(0.0) == "0")
    assert(Bench.jnum(Double.NaN) == "null")
    assert(Bench.jnum(Double.PositiveInfinity) == "null")
    assert(Bench.jnum(3.14159265358979) == "3.1416")
    assert(Bench.jnum(1491105.423) == "1491100") // plain form, no exponent
    assert(!Bench.jnum(1491105.423).contains("E"))
    assert(!Bench.jnum(0.0001234567).contains("E"))
  }

  test("missing rungs are skipped, never emitted as absent keys") {
    val sparse = Map("brute_qps" -> 5000.0, "zz_other" -> 1.0)
    val line = Bench.headlineLine(2.0, "/sf", sparse)
    assert(parseable(line))
    assert(line.contains("\"brute_qps\":5000"))
    assert(line.contains("\"zz_other\":1"))
    assert(!line.contains("ivf_10m_p50_ms"))
  }

  test("budget floor: even a tiny budget yields valid JSON") {
    val line = Bench.headlineLine(2.0, "/sf", fullResults, budget = 120)
    assert(parseable(line), s"malformed under tight budget: $line")
    assert(line.length <= 130)
  }

  // ---- external-CPU attribution channel ---------------------------

  test("hostBusyJiffies sums busy fields, excluding idle/iowait AND guest/guest_nice") {
    // user nice system idle iowait irq softirq steal guest guest_nice —
    // guest fields are already folded into user/nice per proc(5), so
    // counting them would double-count VM-guest time on a virt host
    val line = "cpu  100 2 30 9999 500 4 6 8 1 1"
    assert(Bench.hostBusyJiffies(line) == 100 + 2 + 30 + 4 + 6 + 8)
    // older kernels: no guest fields
    assert(Bench.hostBusyJiffies("cpu 10 0 5 1000 20 1 2 3") == 21)
  }

  test("selfJiffies parses after the last ')' (comm may contain spaces)") {
    val line = "1234 (my (we)ird comm) S 1 1 1 0 -1 4194304 " +
      "100 0 0 0 777 333 0 0 20 0 64 0 123456 1 2 3"
    assert(Bench.selfJiffies(line) == 777 + 333)
  }

  test("externalCpuFrac: zero on no-proc sample, bounded positive otherwise") {
    val t0 = 0L; val t1 = 1000000000L // 1 s apart
    assert(Bench.externalCpuFrac((0L, 0L, t0), (0L, 0L, t1)) == 0.0)
    val ncpu = Runtime.getRuntime.availableProcessors
    // host burned 100×ncpu jiffies in 1 s (fully busy), we burned half
    val frac = Bench.externalCpuFrac(
      (1000L, 500L, t0), (1000L + 100L * ncpu, 500L + 50L * ncpu, t1))
    assert(math.abs(frac - 0.5) < 1e-9, s"frac=$frac")
    // own work exceeding host delta (rounding skew) clamps to 0
    assert(Bench.externalCpuFrac((0L, 0L, t0), (10L, 50L, t1)) >= 0.0)
  }

  test("iowaitFrac: zero on no-proc sample, normalized by capacity") {
    val t0 = 0L; val t1 = 1000000000L // 1 s apart
    assert(Bench.iowaitFrac((0L, 0L, t0), (0L, 0L, t1)) == 0.0)
    val ncpu = Runtime.getRuntime.availableProcessors
    // half the machine's jiffies spent in iowait over the window
    val frac = Bench.iowaitFrac((100L, 5L, t0), (100L + 50L * ncpu, 5L, t1))
    assert(math.abs(frac - 0.5) < 1e-9, s"frac=$frac")
  }

  test("ownSysFrac: kernel share of own CPU, failed-sample and skew conventions") {
    val t0 = 0L; val t1 = 1000000000L
    // failed first sample (0,0) reads 0 — same convention as the
    // extcpu/steal channels
    assert(Bench.ownSysFrac((0L, 0L, t0), (500L, 300L, t1)) == 0.0)
    // 97% of own CPU in the kernel — the r11 live signature
    val hot = Bench.ownSysFrac((100L, 100L, t0), (103L, 197L, t1)) // du=3, ds=97
    assert(math.abs(hot - 0.97) < 1e-9, s"frac=$hot")
    // no CPU burned at all → 0, never NaN
    assert(Bench.ownSysFrac((100L, 100L, t0), (100L, 100L, t1)) == 0.0)
    // counter skew (negative delta) reads 0, never a garbage fraction
    assert(Bench.ownSysFrac((100L, 100L, t0), (90L, 300L, t1)) == 0.0)
  }

  test("live ownCpuSample is monotone and user-dominated on a compute loop") {
    val a = Bench.ownCpuSample()
    var x = 0L
    (0L until 50000000L).foreach(i => x += i * 31L)
    assert(x != 0)
    val b = Bench.ownCpuSample()
    assert(b._3 > a._3)
    if (a._1 != 0L || a._2 != 0L) { // on Linux
      assert(b._1 >= a._1 && b._2 >= a._2)
      val frac = Bench.ownSysFrac(a, b)
      assert(frac >= 0.0 && frac <= 1.0, s"frac=$frac")
    }
  }

  test("live ioSample reads monotone counters on Linux") {
    val a = Bench.ioSample()
    val b = Bench.ioSample()
    assert(b._3 > a._3)
    if (a._1 != 0L || a._2 != 0L) { // on Linux with /proc/self/io
      assert(b._1 >= a._1)
      assert(b._2 >= a._2)
    }
  }

  test("live cpuSample is monotone and self <= host-busy delta-wise") {
    val a = Bench.cpuSample()
    var x = 0L
    (0L until 20000000L).foreach(i => x += i * 31L) // burn some CPU
    assert(x != 0)
    val b = Bench.cpuSample()
    assert(b._3 > a._3)
    if (a._1 != 0L) { // on Linux
      assert(b._1 >= a._1)
      assert(b._2 >= a._2)
      val frac = Bench.externalCpuFrac(a, b)
      assert(frac >= 0.0 && frac <= 1.5, s"frac=$frac") // sane bound
    }
  }
}
