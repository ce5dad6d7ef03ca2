package graft

import org.scalacheck.Gen

/** Property tests for the two newest kernel CLAIMS — checked against
  * brute force on random data, because each operator's spec replay
  * pins the implementation to a policy, and these pin the policy to
  * its optimality/guarantee claim:
  *
  *  - evt_window_funnel takes the GREEDY-EARLIEST chain per anchor and
  *    claims (exchange argument) that greedy attains the maximum
  *    achievable depth over ALL chains within the budget;
  *  - txt_winnowing claims the winnowing guarantee: any shared token
  *    run of ≥ w+k−1 tokens between two documents surfaces at least
  *    one shared fingerprint (Schleimer et al. SIGMOD'03 §3) — the
  *    deterministic property MinHash banding lacks. The in-JVM mirror
  *    here computes the operator's exact selection (same md5-hex
  *    window minima; TextOpsSpec pins the mirror to the query on the
  *    fixture corpus).
  */
class KernelPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    SparkSuite.samples(g, n)

  // ── greedy windowed-funnel optimality ────────────────────────────────

  private def greedyDepth(views: Seq[Long], clicks: Seq[Long],
      buys: Seq[Long], t: Long): Int =
    views.map { v =>
      val c = clicks.sorted.find(_ > v).filter(_ <= v + t)
      val p = c.flatMap(cu => buys.sorted.find(_ > cu).filter(_ <= v + t))
      1 + c.size + p.size
    }.foldLeft(0)(math.max)

  private def bruteDepth(views: Seq[Long], clicks: Seq[Long],
      buys: Seq[Long], t: Long): Int = {
    if (views.isEmpty) 0
    else {
      val d3 = views.exists(v => clicks.exists(c => c > v && c <= v + t &&
        buys.exists(p => p > c && p <= v + t)))
      val d2 = views.exists(v => clicks.exists(c => c > v && c <= v + t))
      if (d3) 3 else if (d2) 2 else 1
    }
  }

  test("windowed funnel: greedy-earliest per anchor attains the " +
      "brute-force maximum depth on random event sets") {
    val gen = for {
      nv <- Gen.choose(0, 5); nc <- Gen.choose(0, 5); np <- Gen.choose(0, 5)
      vs <- Gen.listOfN(nv, Gen.choose(0L, 30L))
      cs <- Gen.listOfN(nc, Gen.choose(0L, 30L))
      ps <- Gen.listOfN(np, Gen.choose(0L, 30L))
      t <- Gen.oneOf(3L, 5L, 10L)
    } yield (vs, cs, ps, t)
    samples(gen, 4000).foreach { case (vs, cs, ps, t) =>
      val g = greedyDepth(vs, cs, ps, t)
      val b = bruteDepth(vs, cs, ps, t)
      assert(g == b,
        s"greedy $g != brute $b for views=$vs clicks=$cs buys=$ps T=$t")
    }
  }

  // ── winnowing guarantee ──────────────────────────────────────────────

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Exact mirror of txt_winnowing's per-doc fingerprint selection
    * (k=4-token grams, window w=4, md5-hex minima, value-deduped). */
  private def fingerprints(toks: Seq[String], k: Int = 4,
      w: Int = 4): Set[String] = {
    if (toks.length < k) Set.empty
    else {
      val hs = toks.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
      val m = hs.length
      (1 to math.max(1, m - (w - 1)))
        .map(j => hs.slice(j - 1, j - 1 + w).min).toSet
    }
  }

  test("winnowing guarantee: ANY shared run of >= w+k-1 tokens yields " +
      "a shared fingerprint, at every offset, on random vocab") {
    val word = Gen.oneOf((0 until 12).map(i => s"w$i"))
    val gen = for {
      runLen <- Gen.choose(7, 12) // >= w+k-1 = 7
      run <- Gen.listOfN(runLen, word)
      aPre <- Gen.choose(0, 8).flatMap(Gen.listOfN(_, word))
      aSuf <- Gen.choose(0, 8).flatMap(Gen.listOfN(_, word))
      bPre <- Gen.choose(0, 8).flatMap(Gen.listOfN(_, word))
      bSuf <- Gen.choose(0, 8).flatMap(Gen.listOfN(_, word))
    } yield (aPre ++ run ++ aSuf, bPre ++ run ++ bSuf)
    samples(gen, 800).foreach { case (a, b) =>
      val shared = fingerprints(a).intersect(fingerprints(b))
      assert(shared.nonEmpty,
        s"guarantee violated:\n a=${a.mkString(" ")}\n b=${b.mkString(" ")}")
    }
  }

  test("winnowing density: selected fingerprints never exceed the gram " +
      "count and thin long documents") {
    val word = Gen.oneOf((0 until 12).map(i => s"w$i"))
    val gen = Gen.choose(4, 80).flatMap(Gen.listOfN(_, word))
    samples(gen, 500).foreach { doc =>
      val m = doc.length - 3
      val f = fingerprints(doc)
      assert(f.nonEmpty && f.size <= m)
      // on long docs the window-min selection genuinely thins: the
      // EXPECTED density is ~2/(w+1); allow generous slack for short
      // docs and unlucky draws, but a full-length doc must not keep
      // every gram
      if (m >= 40) assert(f.size < m, s"no thinning on m=$m")
    }
  }
}
