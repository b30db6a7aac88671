package graft

import graft.functions.RollingFingerprint
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pure-logic property tests (no SparkSession): the session fold that
  * batch and streaming share, and the fingerprint reference.
  */
class PropertySpec extends AnyFunSuite {

  private val GAP = 30L * 60 * 1000000

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val evsGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 60)
    ts <- Gen.listOfN(n, Gen.choose(0L, 6L * 3600 * 1000000))
  } yield ts.zipWithIndex.map { case (t, i) => Ev(1L, i.toLong, t) }
    .sortBy(e => (e.ts_us, e.event_id))

  test("session fold is micro-batch-split invariant (batch == stream)") {
    check(Prop.forAll(evsGen, Gen.choose(0, 60)) { (evs, rawCut) =>
      val (closedAll, openAll) = EventStreams.advance(1L, None, evs)
      val cut = math.min(rawCut, evs.size)
      val (b1, b2) = evs.splitAt(cut)
      val (c1, o1) = EventStreams.advance(1L, None, b1)
      val (c2, o2) = EventStreams.advance(1L, o1, b2)
      c1 ++ c2 == closedAll && o2 == openAll
    })
  }

  private val dayGen: Gen[List[EventStreams.DayFact]] = for {
    n <- Gen.choose(0, 50)
    ds <- Gen.listOfN(n, Gen.choose(0, 120))
  } yield ds.distinct.sorted.map(d =>
    EventStreams.DayFact(1L, "x", d, (d % 5) + 1L))

  test("era fold is micro-batch-split invariant (batch == stream)") {
    check(Prop.forAll(dayGen, Gen.choose(0, 50)) { (days, rawCut) =>
      val (closedAll, openAll) = EventStreams.eraAdvance(1L, "x", None, days)
      val cut = math.min(rawCut, days.size)
      val (b1, b2) = days.splitAt(cut)
      val (c1, o1) = EventStreams.eraAdvance(1L, "x", None, b1)
      val (c2, o2) = EventStreams.eraAdvance(1L, "x", o1, b2)
      c1 ++ c2 == closedAll && o2 == openAll
    })
  }

  test("eras partition active days and split exactly at gaps > 2 days") {
    check(Prop.forAll(dayGen) { days =>
      val (closed, open) = EventStreams.eraAdvance(1L, "x", None, days)
      val nDays = closed.map(_.n_active_days).sum +
        open.map(_.nDays).getOrElse(0L)
      val nFacts = closed.map(_.n_facts).sum +
        open.map(_.nFacts).getOrElse(0L)
      val gaps = days.map(_.epoch_day).sliding(2).count {
        case Seq(a, b) => b - a > graft.operators.Cohort.C44_GAP_DAYS
        case _ => false
      }
      val nEras = closed.size + open.size
      nDays == days.size && nFacts == days.map(_.n_facts).sum &&
        (days.isEmpty || nEras == gaps + 1) &&
        closed.map(_.era_seq) == (1L to closed.size.toLong)
    })
  }

  test("sessions partition the events and split exactly at >30min gaps") {
    check(Prop.forAll(evsGen) { evs =>
      val (closed, open) = EventStreams.advance(1L, None, evs)
      val all = closed ++ open.map(o =>
        EventStreams.Session(1L, o.sessionId, o.nEvents, "", 0.0))
      val counts = all.map(_.n_events).sum == evs.size
      val ids = all.map(_.session_id) == (1L to all.size.toLong)
      val boundary = evs.isEmpty || {
        val gaps = evs.map(_.ts_us).sliding(2).count {
          case Seq(a, b) => b - a > GAP
          case _ => false
        }
        all.size == gaps + 1
      }
      counts && ids && boundary
    })
  }

  test("fingerprint equals the naive min-over-windows polynomial hash") {
    val strGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    check(Prop.forAll(strGen) { s =>
      val w = RollingFingerprint.DefaultWindow
      val b = RollingFingerprint.DefaultBase
      val bytes = s.getBytes("UTF-8")
      def polyHash(chunk: Array[Byte]): Long =
        chunk.foldLeft(0L)((h, x) => h * b + (x & 0xff))
      val naive =
        if (bytes.length <= w) polyHash(bytes)
        else bytes.sliding(w, 1).map(polyHash)
          .reduce((a, c) => if (java.lang.Long.compareUnsigned(c, a) < 0) c else a)
      RollingFingerprint.fingerprint(bytes, w, b) == naive
    })
  }

  // t14's start rule as pure arithmetic (the spec proves the engine
  // matches the rule; this proves the RULE meets its contract for every
  // geometry, not just the defaults the corpus exercises)
  test("chunk start rule: full coverage, tail hit, minimal chunk count") {
    val geo = for {
      len <- Gen.choose(1, 400)
      c <- Gen.choose(1, 64)
      st <- Gen.choose(1, 64).map(math.min(_, c))
    } yield (len, c, st)
    check(Prop.forAll(geo) { case (len, c, st) =>
      val n = (math.max(0, len - c) + st - 1) / st + 1
      val covered = (0 until n)
        .flatMap(i => (i * st) until math.min(i * st + c, len)).toSet
      val coverage = covered == (0 until len).toSet
      val tail = (n - 1) * st < len // last chunk is non-empty
      val minimal = n == 1 || (n - 2) * st + c < len // n-1 would miss the tail
      coverage && tail && minimal
    })
  }

  // st08's membership arithmetic: every instant belongs to exactly the
  // 4 slide-aligned windows the oracle enumerates, and to no others
  test("sliding-window membership is exactly the 4 enumerated windows") {
    val SLIDE = 1800000000L
    val WIN = 4 * SLIDE
    check(Prop.forAll(Gen.choose(0L, 40L * 24 * 3600 * 1000000)) { ts =>
      val enumerated = (0L to 3L).map(k => (ts / SLIDE - k) * SLIDE).toSet
      // no non-negativity guard: the enumerated side deliberately
      // includes negative window starts (ts < 3*SLIDE), so the brute
      // side must enumerate them too for the equality to mean anything
      val brute = ((ts - WIN) / SLIDE - 1 to ts / SLIDE + 1)
        .map(_ * SLIDE)
        .filter(w => w <= ts && ts < w + WIN).toSet
      enumerated == brute
    })
  }

  // c33's ceil/floor hour coverage equals a brute scan of the span
  test("occupancy hour coverage equals brute interval membership") {
    val H = 3600000000L
    val span = for {
      s0 <- Gen.choose(0L, 10L * 24 * 3600 * 1000000)
      d <- Gen.choose(0L, 8L * 3600 * 1000000)
    } yield (s0, s0 + d)
    check(Prop.forAll(span) { case (s0, s1) =>
      val formula = ((s0 + H - 1) / H) to (s1 / H)
      val brute = (s0 / H to s1 / H + 1)
        .filter(h => s0 <= h * H && h * H <= s1)
      formula.toSet == brute.toSet
    })
  }
  // st11's ring-buffer fold: arbitrary chunkings of an ascending hour
  // stream produce identical verdicts, and every verdict matches a
  // brute-force trailing-window recompute
  private val hourStreamGen: Gen[(List[(Long, Long)], Int)] = for {
    n <- Gen.choose(0, 50)
    hs <- Gen.listOfN(n, Gen.choose(0L, 5L)) // hour gaps (0 = same hour)
    counts <- Gen.listOfN(n, Gen.choose(1L, 9L))
    cuts <- Gen.choose(1, 5)
  } yield {
    val hours = hs.scanLeft(100L)(_ + _).tail
    (hours.zip(counts), cuts)
  }

  test("spike fold: chunking-invariant and equal to a brute trailing window") {
    import EventStreams.{HourCount, SpikeEmpty, SpikeVerdict}
    def foldAll(chunks: Seq[Seq[(Long, Long)]]): Seq[SpikeVerdict] =
      chunks.foldLeft((SpikeEmpty, Vector.empty[SpikeVerdict])) {
        case ((st, acc), chunk) =>
          // merge same-hour entries within a chunk like spikeState does
          val hcs = chunk.groupBy(_._1).toSeq
            .map { case (h, g) => HourCount(h, g.map(_._2).sum) }.sortBy(_.h)
          val (st2, out) = EventStreams.spikeAdvance("t", st, hcs)
          (st2, acc ++ out)
      }._2
    check(Prop.forAll(hourStreamGen) { case (stream, cuts) =>
      val oneShot = foldAll(Seq(stream))
      val size = math.max(1, stream.length / cuts)
      val chunked = foldAll(stream.grouped(size).toSeq)
      // per-hour totals collapse identically whatever the chunking
      val collapsed = stream.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (h, g) => (h, g.map(_._2).sum) }
      val brute = collapsed.dropRight(1).zipWithIndex.map { case ((h, n), i) =>
        val trail = collapsed.take(i).filter { case (h2, _) =>
          h2 >= h - 24 && h2 <= h - 1 }
        val (tSum, tN) = (trail.map(_._2).sum, trail.length.toLong)
        SpikeVerdict("t", h, n, tSum, tN,
          if (tN >= 12 && n * tN > 2 * tSum) 1 else 0)
      }
      oneShot == chunked && oneShot == brute
    })
  }

  // c40's rank-arithmetic pairing: control rank k maps to case
  // ceil(k/2) with slot (k+1) % 2 + 1 — every case gets at most two
  // controls, slots 1 and 2, in control-rank order
  test("case-control rank pairing is a 2-to-1 cover in rank order") {
    check(Prop.forAll(Gen.choose(1L, 1000L)) { crk =>
      val rk = ((crk + 1) / 2).toInt
      val slot = ((crk + 1) % 2 + 1).toInt
      val back = 2 * rk - 2 + slot // invert: slot 1 -> 2rk-1, slot 2 -> 2rk
      rk == math.ceil(crk / 2.0).toInt &&
        (slot == 1 || slot == 2) && back == crk
    })
  }
}
