package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Hand-enumerable pins for connected components: transitivity across
  * chains (the property pair-wise dedup lacks), singletons, and the
  * empty-edge degenerate case. */
class GraphSpec extends SparkSuite {

  /** Planted-clone id offset (scale-derived since r11). */
  private lazy val off = operators.TextOps.cloneOff(spark, SparkSuite.Sf001)

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)],
      maxIter: Int = 50): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    Graph.connectedComponents(
      vs.toDF("id"), es.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses transitively; components stay separate") {
    // 1-2, 2-3, 3-4 is a diameter-3 chain: 4 reaches label 1 only
    // through repeated propagation. 10-11 is a separate pair; 99 is a
    // singleton.
    val got = cc(Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L),
      Seq((2L, 1L), (3L, 2L), (4L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("star method ≡ propagation on a long chain, in O(log n) rounds") {
    val sp = spark
    import sp.implicits._
    // a 64-node path: diameter 63 — propagation pays ~diameter rounds,
    // the star method must close it in O(log n)
    val vs = (1L to 64L)
    val es = (1L until 64L).map(i => (i, i + 1))
    // pointer jumping makes propagation O(log diameter): a diameter-63
    // chain must close well inside 12 rounds, not the 63+ the pure
    // neighbor-min loop would need
    val viaProp = cc(vs, es, maxIter = 12)
    val (starLabels, rounds) = Graph.connectedComponentsStar(
      vs.toDF("id"), es.toDF("src", "dst"))
    val viaStar = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaProp)
    assert(viaStar.values.forall(_ == 1L))
    assert(rounds <= 10, s"star method took $rounds rounds on a 64-chain")
    // under-budgeted propagation must REFUSE, not return wrong labels
    val e = intercept[IllegalStateException] { cc(vs, es, maxIter = 2) }
    assert(e.getMessage.contains("connectedComponentsStar"))
  }

  test("star method refuses non-convergence instead of mid-labels") {
    val sp = spark
    import sp.implicits._
    val vs = (1L to 64L)
    val es = (1L until 64L).map(i => (i, i + 1))
    // one round cannot stabilize a 64-chain's edge set; exiting at
    // maxIter must throw (same contract as propagation), not return
    // whatever the edges pointed at mid-convergence
    val e = intercept[IllegalStateException] {
      Graph.connectedComponentsStar(vs.toDF("id"), es.toDF("src", "dst"),
        maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("star method matches propagation on the dedup candidate graph") {
    val (verts, edges) = Graph.dedupGraph(spark, SparkSuite.Sf0001)
    val prop = Graph.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (starLabels, _) = Graph.connectedComponentsStar(verts, edges)
    val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("both algorithms ≡ brute-force union-find on random graphs") {
    import org.scalacheck.Gen
    val sp = spark
    import sp.implicits._
    val edgeGen = for {
      a <- Gen.choose(1L, 30L); b <- Gen.choose(1L, 30L) if a != b
    } yield (a, b)
    for (trial <- 0 until 3) {
      val es = SparkSuite.samples(edgeGen, 25, seedOffset = trial * 1000L)
      val vs = (1L to 30L)
      // brute-force union-find reference; union-by-min keeps every root
      // the minimum id of its component, so roots ARE the expected labels
      val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
      def find(v: Long): Long =
        if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = vs.map(v => v -> find(v)).toMap
      val prop = cc(vs, es, maxIter = 100)
      val (starDf, _) = Graph.connectedComponentsStar(
        vs.toDF("id"), es.toDF("src", "dst"))
      val star = starDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == expected, s"trial $trial: propagation != union-find")
      assert(star == expected, s"trial $trial: star != union-find")
    }
  }

  test("nearCloneClusters memoizes per (session, dir): same instance, " +
      "persisted") {
    val a = Graph.nearCloneClusters(spark, SparkSuite.Sf0001)
    val b = Graph.nearCloneClusters(spark, SparkSuite.Sf0001)
    assert(a eq b, "second call must return the memoized frame, not " +
      "re-run the iterative CC job")
    assert(a.storageLevel.useMemory, "memoized clusters must be persisted")
    // different dir → a different memo entry (the documents corpus has
    // the same 550 near-clone rows at every sf, so compare identity,
    // not counts)
    val c = Graph.nearCloneClusters(spark, SparkSuite.Sf001)
    assert(!(c eq a))
  }

  test("no edges: every vertex is its own cluster") {
    val got = cc(Seq(5L, 6L), Seq.empty)
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("dedup_cc: clusters cover the corpus and canonicals are minima") {
    val out = SparkEntry.queries("dedup_cc")(spark, SparkSuite.Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every cluster id is itself a member doc marked canonical
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cl, members) =>
      val ids = members.map(_.getLong(0))
      assert(ids.min == cl, s"cluster $cl: min member ${ids.min}")
      assert(members.count(_.getBoolean(2)) == 1,
        s"cluster $cl: exactly one canonical expected")
    }
    // the seeded near-clones (doc_id+off) must share their source's cluster
    val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cloned = m.keys.filter(_ >= off)
    assert(cloned.nonEmpty)
    val joined = cloned.count(c => m(c) == m(c - off))
    assert(joined * 100 >= cloned.size * 80,
      s"only $joined/${cloned.size} near-clones clustered with their source")
  }

  test("kcore: pendant chain peels recursively, clique survives intact") {
    val sp = spark
    import sp.implicits._
    // 5-clique (ids 1-5, every degree 4) with a pendant chain 5-6-7-8:
    // k=3 must peel 8, then 7, then 6 RECURSIVELY (each removal drops
    // the next vertex below k — the cascade a one-shot degree filter
    // misses) and leave the clique with its in-core degrees intact
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val got = Graph.kcore((clique ++ chain).toDF("src", "dst"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
    // an empty core converges cleanly (everything peels)
    val empty = Graph.kcore(chain.toDF("src", "dst"), k = 3).collect()
    assert(empty.isEmpty)
    // under-budgeted peel refuses instead of returning a mid-peel state
    val long = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      Graph.kcore(long.toDF("src", "dst"), k = 2, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("kcore"))
  }

  test("graph_kcore ≡ brute-force peel on sf0.001") {
    val out = SparkEntry.queries("graph_kcore")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: sequential peel over the same co-purchase edge set
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).distinct.toList
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    var adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var changed = true
    while (changed) {
      val bad = adj.collect { case (v, nb) if nb.size < 16 => v }.toSet
      changed = bad.nonEmpty
      adj = adj.collect { case (v, nb) if !bad(v) => v -> (nb -- bad) }
    }
    val want = adj.map { case (v, nb) => v -> nb.size.toLong }
    assert(out == want, s"got ${out.size} core nodes, want ${want.size}")
  }

  test("ktruss: support cascade peels the bridge edge, K5 survives") {
    val sp = spark
    import sp.implicits._
    // K5 (ids 1-5, every edge in 3 triangles) + two triangles sharing
    // edge (6,7): round 1 of k=4 peels the four sup-1 edges, which
    // strips BOTH triangles off (6,7) — it only falls in round 2 (the
    // cascade a one-shot support filter misses). K5 must survive with
    // in-truss supports intact.
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val tris = Seq((5L, 6L), (5L, 7L), (6L, 7L), (6L, 8L), (7L, 8L))
    val got = Graph.ktruss((k5 ++ tris).toDF("src", "dst"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == k5.map(_ -> 3L).toMap)
    // a triangle-free remainder converges to the empty truss
    val empty = Graph.ktruss(tris.toDF("src", "dst"), k = 5).collect()
    assert(empty.isEmpty)
    // under-budgeted peel refuses instead of returning a mid-peel state
    val ladder = (1L to 10L).flatMap(i => Seq((i, i + 1), (i, i + 2)))
      .filter(_._2 <= 12L)
    val err = intercept[IllegalStateException] {
      Graph.ktruss(ladder.toDF("src", "dst"), k = 4, maxIter = 2).collect()
    }
    assert(err.getMessage.contains("ktruss"))
  }

  test("graph_ktruss ≡ brute-force peel on sf0.001") {
    val out = SparkEntry.queries("graph_ktruss")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    var edges = li.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).distinct.toList
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    def sup(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      es.map(e => e ->
        (adj(e._1) & adj(e._2)).size.toLong).toMap
    }
    var changed = true
    while (changed) {
      val s = sup(edges)
      val next = edges.filter(s(_) >= 3L)
      changed = next.size != edges.size
      edges = next
    }
    val want = sup(edges)
    assert(out == want, s"got ${out.size} edges, want ${want.size}")
  }

  test("graph_jaccard_neighbors ≡ brute-force neighbor sets on sf0.001") {
    val out = SparkEntry.queries("graph_jaccard_neighbors")(
      spark, SparkSuite.Sf0001).collect()
    assert(out.nonEmpty)
    // independent in-JVM reference: materialize the co-purchase edge
    // set, build adjacency maps, enumerate common-neighbor pairs
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = li.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).distinct.toList
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = (for {
      (a, na) <- adj.toSeq; (b, nb) <- adj.toSeq if a < b
      common = (na & nb).size if common > 0
    } yield (a, b) -> (common.toLong, na.size.toLong, nb.size.toLong,
      100L * common / (na.size + nb.size - common),
      if (edges((a, b))) 1 else 0)).toMap
    val got = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("graph_reach ≡ brute-force BFS on sf0.001, and adjacent " +
      "distances never differ by more than one hop") {
    val out = SparkEntry.queries("graph_reach")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    // independent reference: weighted co-purchase edges (≥ 2 distinct
    // orders), then a queue BFS from the same seed set
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w = li.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).distinct.toList
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    // NOT `w.collect { case (e, n) if n >= 2 => e }.toSet`: collect on
    // a Map whose result elements are pairs rebuilds a MAP, silently
    // collapsing all edges that share a first endpoint
    val edges: Set[(Long, Long)] = w.filter(_._2 >= 2).keySet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ < 20)
    val dist = scala.collection.mutable.Map(seeds.toSeq.map(_ -> 0): _*)
    var frontier = seeds
    var hop = 0
    while (frontier.nonEmpty && hop < 8) {
      hop += 1
      frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
      frontier.foreach(dist(_) = hop)
    }
    assert(out == dist.toMap, s"got ${out.size} nodes, want ${dist.size}")
    // BFS distance is a metric on the reached set: across any edge the
    // ring index moves by at most 1
    edges.foreach { case (a, b) =>
      (out.get(a), out.get(b)) match {
        case (Some(da), Some(db)) => assert(math.abs(da - db) <= 1,
          s"edge ($a,$b): dist $da vs $db")
        case _ => ()
      }
    }
  }

  test("graph_lpa ≡ in-JVM synchronous LPA replay on sf0.001") {
    val got = SparkEntry.queries("graph_lpa")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the ≥2-co-occurrence graph and run 4 synchronous rounds
    // sequentially: most-frequent neighbor label, ties to the smallest
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val vs = li.map(_._2).distinct.sorted
    val pairOrders = li.groupBy(_._1).values.flatMap { basket =>
      basket.map(_._2).distinct.sorted.combinations(2).map(s => (s(0), s(1)))
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.length }
    val edges = pairOrders.filter(_._2 >= 2).keys.toSeq
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var label = vs.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      label = vs.map { v =>
        nbrs.get(v) match {
          case None => v -> label(v) // isolated: keeps its own id
          case Some(ns) =>
            val votes = ns.map(label).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    assert(got == label)
    // the fixture must exercise the vote: at least one multi-member
    // community (otherwise the argmax never fires)
    assert(got.groupBy(_._2).values.exists(_.size >= 2),
      "LPA fixture degenerated to all-singletons")
  }

  test("graph_modularity ≡ exact integer ledger replay; handshake and " +
      "membership conservation hold") {
    val rows = SparkEntry.queries("graph_modularity")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // rebuild graph + labels exactly like the LPA replay test
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val vs = li.map(_._2).distinct.sorted
    val pairOrders = li.groupBy(_._1).values.flatMap { basket =>
      basket.map(_._2).distinct.sorted.combinations(2).map(s => (s(0), s(1)))
    }.toSeq.groupBy(identity).map { case (k, xs) => k -> xs.length }
    val edges = pairOrders.filter(_._2 >= 2).keys.toSeq
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var label = vs.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      label = vs.map { v =>
        nbrs.get(v) match {
          case None => v -> label(v)
          case Some(ns) =>
            val votes = ns.map(label).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    val m = edges.length.toLong
    val want = label.groupBy(_._2).map { case (c, members) =>
      val ids = members.keySet
      val intra = edges.count { case (a, b) => ids(a) && ids(b) &&
        label(a) == c && label(b) == c }.toLong
      val deg = members.keys.toSeq.map(v =>
        nbrs.get(v).map(_.size).getOrElse(0)).sum.toLong
      val num = 4L * m * intra - deg * deg
      (c, members.size.toLong, intra, deg,
        if (num < 0) -1 else 1, math.abs(num) * 1000000L / (4L * m * m))
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq.sortBy(_._1) == want)
    // conservation: members cover the vertex set; Σdeg = 2m; Σintra ≤ m
    assert(rows.map(_._2).sum == vs.length.toLong)
    assert(rows.map(_._4).sum == 2 * m)
    assert(rows.map(_._3).sum <= m)
    // Q itself stays in Newman's range (−0.5, 1]
    val q = rows.map(t => t._5 * t._6).sum / 1e6
    assert(q > -0.5 && q <= 1.0, s"Q=$q out of range")
  }

  test("dedup_cc_quality: counters replay from the cluster assignment; " +
      "CC can only merge, so recall is exactly 100%") {
    val r = SparkEntry.queries("dedup_cc_quality")(
      spark, SparkSuite.Sf001).collect().head
    val (np, npred, tp, rec, prec) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val labels = SparkEntry.queries("dedup_cc")(spark, SparkSuite.Sf001)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val wantPred = labels.groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(npred == wantPred, "predicted-pair volume != sigma C(n,2)")
    val planted = labels.keys.filter(k => k < off && k % 10 == 0)
      .map(i => (i, i + off)).toSeq
    assert(np == planted.size)
    assert(tp == planted.count { case (a, b) =>
      labels.get(a).isDefined && labels.get(a) == labels.get(b) })
    assert(rec == tp * 1000000L / np)
    assert(prec == tp * 1000000L / npred)
    // banding caught every planted pair (dedup_minhash_recall floor is
    // 80%; on this fixture it is 100%) and CC never splits a candidate
    // edge — so cluster recall is exactly 10⁶ ppm, while transitive
    // merging keeps precision far below it (the gate the Jaccard
    // re-rank exists to close)
    assert(rec == 1000000L, s"cluster recall $rec ppm")
    assert(prec < rec, "precision >= recall — fixture degenerate")
  }

  test("graph_triangles_deg ≡ graph_triangles (algorithm independence); " +
      "oriented out-degree obeys the sqrt(2|E|) bound") {
    def rows(n: String) = SparkEntry.queries(n)(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows("graph_triangles_deg") == rows("graph_triangles"))
    // replay the orientation in-JVM and pin the fan-out bound the
    // variant exists for
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      basket.map(_._2).distinct.sorted.combinations(2).map(s => (s(0), s(1)))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size }
    val ord = implicitly[Ordering[(Int, Long)]]
    val outDeg = edges.toSeq
      .map { case (a, b) =>
        if (ord.lt((deg(a), a), (deg(b), b))) a else b
      }
      .groupBy(v => v).map(_._2.size)
    val bound = math.ceil(math.sqrt(2.0 * edges.size)).toLong + 1
    assert(outDeg.max <= bound,
      s"oriented out-degree ${outDeg.max} exceeds sqrt bound $bound")
    // the orientation genuinely rebalances: max out-degree must be
    // strictly below the raw max degree on this fixture
    assert(outDeg.max < deg.values.max, "orientation did not rebalance")
  }

  test("graph_clustering ≡ 3T/W over graph_triangles' own ledger and " +
      "an independent wedge count; 0 ≤ C ≤ 1") {
    val Array(row) = SparkEntry.queries("graph_clustering")(
      spark, SparkSuite.Sf0001).collect()
    val (nN, nE, nT, nW, cc) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    // per-node triangle ledger sums to 3T (each triangle at 3 corners)
    val perNode = SparkEntry.queries("graph_triangles")(
      spark, SparkSuite.Sf0001).collect().map(_.getLong(1)).sum
    assert(perNode == 3 * nT, s"corner sum $perNode vs 3T=${3 * nT}")
    // independent wedge count from the raw degree sequence
    val li = Tables.lineitem(spark, SparkSuite.Sf0001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(nN == deg.size.toLong && nE == edges.size.toLong)
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    assert(nW == wedges, s"wedges $nW vs replay $wedges")
    assert(cc == (3 * nT).toDouble / nW, "coefficient identity")
    assert(cc >= 0.0 && cc <= 1.0, s"C out of range: $cc")
  }

  test("graph_ppr ≡ exact BigInt replay; mass stays on the seed side " +
      "of reachability") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("graph_ppr")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // rebuild the weighted graph in-JVM
    val li = Tables.lineitem(spark, SparkSuite.Sf001)
      .filter(col("l_partkey") < 400)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val wts = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val sym = wts.toSeq.flatMap { case ((a, b), w) =>
      Seq((a, b, w), (b, a, w)) }
    val v = sym.map(_._1).distinct
    val strength = sym.groupBy(_._1).map { case (s0, es) =>
      s0 -> es.map(_._3).sum }
    var r = v.map(id =>
      id -> (if (id % 50 == 0) BigInt("1000000000000") else BigInt(0))).toMap
    (1 to 4).foreach { _ =>
      val in = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) * e._3 / strength(e._1)).sum
      }
      r = v.map(id =>
        id -> ((if (id % 50 == 0) BigInt("150000000000") else BigInt(0)) +
          BigInt(85) * in.getOrElse(id, BigInt(0)) / 100)).toMap
    }
    val want = r.filter(_._2 > 0).map { case (k, x) => k -> x.toLong }
    assert(got == want, s"ppr diverges: got ${got.size} want ${want.size}")
    // every seed present in the graph carries at least the base mass
    v.filter(_ % 50 == 0).foreach(sd =>
      assert(got(sd) >= 150000000000L, s"seed $sd below base"))
  }

  test("graph_walk_sample ≡ exact hash-coin replay; every hop is a " +
      "real edge and every start walks the full 4 steps") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("graph_walk_sample")(
      spark, SparkSuite.Sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // rebuild the ranked adjacency in-JVM
    val li = Tables.lineitem(spark, SparkSuite.Sf001)
      .filter(col("l_partkey") < 400)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val wts = byOrder.flatMap(ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val adj = (wts.toSeq.map { case ((a, b), w) => (a, b, w) } ++
      wts.toSeq.map { case ((a, b), w) => (b, a, w) })
      .groupBy(_._1).map { case (src, es) =>
        src -> es.sortBy(e => (-e._3, e._2)).map(_._2).toIndexedSeq
      }
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = adj.keySet.filter(_ % 7 == 0).toSeq.flatMap { start =>
      var cur = start
      (start, 0, start) +: (1 to 4).map { t =>
        val h = java.lang.Long.parseLong(
          md5hex(s"walk$t#$cur").take(8), 16)
        cur = adj(cur)((h % adj(cur).size).toInt)
        (start, t, cur)
      }
    }
    assert(rows.sorted.toSeq == want.sorted.toSeq,
      s"walk ledger diverges: got ${rows.length} want ${want.length}")
    // structural laws: 5 rows per start, every hop a real edge
    rows.groupBy(_._1).foreach { case (st, g) =>
      assert(g.length == 5, s"start $st has ${g.length} rows") }
  }

  test("graph_coreness ≡ exact peel replay; consistent with the fixed-k " +
      "core (coreness ≥ 16 is exactly graph_kcore's survivor set)") {
    val got = SparkEntry.queries("graph_coreness")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact coreness by the textbook peel: repeatedly remove a
    // minimum-degree vertex; its core number is the running maximum of
    // the minimum degree seen when it is removed
    val li = Tables.lineitem(spark, SparkSuite.Sf001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val want = scala.collection.mutable.Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val (v, ns) = adj.minBy { case (v, ns) => (ns.size, v) }
      k = math.max(k, ns.size.toLong)
      want(v) = k
      ns.foreach(u => adj(u) -= v)
      adj -= v
    }
    assert(got == want.toMap, "coreness peel replay diverges")
    // cross-query law: the 16-core's membership is exactly the
    // coreness ≥ 16 level set
    val kc = SparkEntry.queries("graph_kcore")(spark, SparkSuite.Sf001)
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 >= 16).keySet == kc, "coreness vs kcore-16")
    // the decomposition is non-trivial on this fixture
    assert(got.values.toSet.size > 2, "degenerate coreness spectrum")
  }

  test("graph_label_spread ≡ exact 3-round synchronous replay; seeds " +
      "clamped; spreading beats the seed floor on this fixture") {
    val got = SparkEntry.queries("graph_label_spread")(spark, SparkSuite.Sf001)
      .collect().map { r =>
        r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2),
          r.getBoolean(3))
      }.toMap
    val li = Tables.lineitem(spark, SparkSuite.Sf001)
      .filter(col("l_partkey") < 400)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) {
        adj.getOrElseUpdate(ps(i), scala.collection.mutable.Set.empty) += ps(j)
        adj.getOrElseUpdate(ps(j), scala.collection.mutable.Set.empty) += ps(i)
      }
    }
    val brand = Tables.part(spark, SparkSuite.Sf001)
      .filter(col("p_partkey") < 400)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seeds = brand.filter(_._1 % 3 == 0)
    var labels: Map[Long, String] = seeds
    for (_ <- 1 to 3) {
      val spread = adj.keys.filterNot(seeds.contains).flatMap { v =>
        val votes = adj(v).toSeq.flatMap(labels.get)
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        if (votes.isEmpty) None
        else Some(v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
      labels = seeds ++ spread
    }
    brand.foreach { case (id, b) =>
      val (gb, gpred, gseed) = got(id)
      assert(gb == b && gseed == (id % 3 == 0), s"part $id meta")
      assert(Option(gpred) == labels.get(id), s"part $id pred")
    }
    // seeds clamped and the spread is non-trivial: strictly more
    // correct predictions than seeds alone
    seeds.foreach { case (id, b) => assert(got(id)._2 == b, s"seed $id") }
    val correctSpread = got.count { case (id, (b, p, seed)) =>
      !seed && p != null && p == b }
    assert(correctSpread > 0, "label spreading predicted nothing right")
  }

  test("dedup_soft_weight: weights are exact 1e6 div |cluster|, agree " +
      "with dedup_cc's clustering, and conserve the effective corpus") {
    val sw = SparkEntry.queries("dedup_soft_weight")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val cc = SparkEntry.queries("dedup_cc")(spark, SparkSuite.Sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sw.length == cc.size, "row count vs dedup_cc")
    val sizes = cc.values.groupBy(identity).view.mapValues(_.size.toLong)
    sw.foreach { case (doc, cluster, n, w) =>
      assert(cluster == cc(doc), s"doc $doc cluster")
      assert(n == sizes(cluster), s"doc $doc size")
      assert(w == 1000000L / n, s"doc $doc weight")
    }
    // effective corpus: Σ weights ∈ (1e6·(C−1), 1e6·C] where C = number
    // of clusters (each cluster contributes 1e6 minus a floor loss < 1e6)
    val c = sizes.size.toLong
    val tot = sw.map(_._4).sum
    assert(tot <= 1000000L * c && tot > 1000000L * (c - 1), s"Σw=$tot C=$c")
    // non-vacuous: some cluster is non-trivial
    assert(sw.exists(_._3 > 1), "no non-singleton cluster — vacuous")
  }
}
