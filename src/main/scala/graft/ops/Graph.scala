package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** X28 — PageRank centrality over an edge list, the graph-quality
  * signal web-scale curation pipelines attach to documents (rank the
  * source graph, weight or gate documents by their host's rank).
  *
  * EXACT FIXED-POINT formulation: ranks are integers in units of
  * 10^-12 (rank0 = SCALE div N; each round
  * rank' = (15*SCALE div (100*N)) + Σ floor(rank_src * 85 / (100*outdeg))),
  * so every iteration is pure BIGINT arithmetic — no float-addition
  * order sensitivity, and a SQL oracle reproduces every rank
  * bit-for-bit by unrolling the same iterations. (Float PageRank sums
  * contributions in shuffle arrival order; two runs can legitimately
  * differ in the last ulp. Fixed-point is how you make an iterative
  * graph kernel oracle-checkable.)
  *
  * Dangling nodes (out-degree 0) are handled the standard way: their
  * rank mass is summed each round and redistributed uniformly —
  * `floor(dangling_mass * 85 / (100*N))` added to every node. The
  * dangling branch is only planned when the graph actually has dangling
  * nodes (one cheap anti-join count at setup), so bidirectional graphs
  * pay nothing for it.
  *
  * Shape at 100 TB: the classic iterative join — each round shuffles
  * the current rank vector (one BIGINT per node) into the
  * edge-partitioned join and re-aggregates per destination with
  * map-side combine. The edge⨝outdeg side is joined ONCE, pinned, and
  * reused every round, so per-round work is rank-vector-sized, not
  * edge-list-rebuild-sized. Every intermediate pin is a LAZY
  * `localCheckpoint(false)` — checkpoint TRUNCATES the logical plan to
  * an RDD leaf at plan time, so each round's query tree stays
  * constant-size (the r21 lesson: persist-based pins kept full lineage
  * and the driver spent multiples of the execution time canonicalizing
  * the growing tree against the cache), while LAZY pins skip the extra
  * full-materialization job the r21 EAGER variant paid per round (the
  * r21 regression: x28 1.80→3.24 s in the driver's own artifact).
  * Under AQE a lazy pin still materializes its shuffle map stages at
  * plan time; the round's result rows are computed exactly once, by
  * the first downstream consumer, and cached at the pin. ONE final
  * `persist + count` forces the whole chain, then every superseded and
  * setup pin is explicitly released ([[Pins.release]] — RDD-level,
  * because `Dataset.unpersist` is a no-op on checkpoint leaves), so the
  * ONLY retained blocks are the returned rank vector itself (the
  * GraphSpec block-release contract, the r6 leak regression). The
  * durability trade (released pins forgo lineage-based recompute on
  * block loss; the deterministic rebuild is one rerun from the source)
  * is the documented one. Convergence work bounds: fixed iteration
  * count (curation pipelines run PageRank for a fixed budget, not to
  * convergence).
  */
object Graph {

  val Scale: Long = FixedPoint.Scale // 10^12 fixed-point rank mass

  /** Fixed-point PageRank over directed `edges` (columns src, dst),
    * `iters` rounds, damping 0.85. Dangling-node mass is redistributed
    * uniformly; an empty edge list yields an empty result. Returns
    * (node, rank) — eagerly materialized and persisted (rank-vector
    * sized); callers done with the result may `.unpersist()` it.
    */
  /** X75 — HITS hubs & authorities (Kleinberg 1999) over directed
    * `edges` (src, dst), `iters` rounds, in the same exact-BIGINT
    * fixed-point discipline as [[pageRank]]: scores are integers in
    * units of 10^-12 and each half-round L1-normalizes to SCALE via one
    * integral division per node —
    *   auth'(v) = Σ_{u→v} hub(u), then auth(v) = auth'(v)·SCALE div Σauth';
    *   hub'(u)  = Σ_{u→v} auth(v), then hub(u) = hub'(u)·SCALE div Σhub'.
    * (The textbook L2 normalization needs a square root; the L1 variant
    * is the standard rational alternative — the argsort is what HITS
    * consumers read, and it is normalization-invariant.) The
    * `raw·SCALE` product can exceed 2^63, so the division runs in
    * DECIMAL(38,0) and re-seats in BIGINT — the x55/x58 reseat.
    *
    * Shape at 100 TB: per round, the score vector (one BIGINT per node)
    * shuffles into the pinned edge topology and re-aggregates with
    * map-side combine — rank-vector-sized traffic, edge list scanned in
    * place; the L1 total is a 1-row driver read off the pinned raw
    * vector. Two pinned copies of the edge list (src- and
    * dst-partitioned) keep BOTH half-rounds co-located. Unlike
    * [[pageRank]]'s persist pins, every pin here is an EAGER
    * localCheckpoint: HITS pins each half-round (the L1 total forces
    * materialization anyway), and 2·iters retained full-lineage cache
    * entries made driver-side plan canonicalization the bottleneck —
    * checkpointing keeps every round's query tree constant-size at the
    * price of losing lineage-based recompute on block loss (acceptable:
    * the deterministic rebuild is one rerun from the pinned edges).
    * Fixed iteration budget, as [[pageRank]].
    *
    * Returns (node, hub, auth); empty edges yield an empty frame.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0L) {
      // derive the empty frame from the INPUT plan (not the released pin)
      // so the node column keeps its actual type
      val empty = edges.select(col("src").as("node"))
        .withColumn("hub", lit(0L)).withColumn("auth", lit(0L)).limit(0)
      Pins.release(nodes)
      return empty
    }
    // Edge topology and every half-round's RAW score vector pin via
    // EAGER localCheckpoint: checkpoint TRUNCATES the logical plan to an
    // RDD leaf, so each half-round's query tree stays constant-size (the
    // persist-based variant kept full lineage: by round 3 the driver
    // spent 10× longer canonicalizing/matching the ever-growing tree
    // against the cache than executing it — measured, not theoretical).
    // EAGER, not lazy: a lazy pin's `toRdd` still pays AQE planning and
    // serial stage materialization per call, and the half-rounds
    // alternate join keys (src/dst) so no two consecutive pins share a
    // job anyway — measured this round, lazy pins made x75 ~40% slower.
    // Every pin is tracked and explicitly released once the final output
    // is materialized — only the returned (node, hub, auth) frame stays
    // pinned (Dataset.unpersist is a no-op on checkpoints, hence
    // [[Pins.release]]); the durability trade is documented on
    // [[pageRank]].
    val bySrc = edges.repartition(col("src")).localCheckpoint()
    val byDst = edges.repartition(col("dst")).localCheckpoint()
    val pins = scala.collection.mutable.ArrayBuffer(nodes, bySrc, byDst)

    // L1 total joined back IN-PLAN as a broadcast 1-row aggregate over
    // the pinned raw vector (not a separate driver collect: the collect
    // was one extra job per half-round — round-21 measurement halved
    // x75's per-round job count by folding it into the consumer's plan),
    // then one scan-side exact division against it. The normalized form
    // stays LAZY: its whole tree is two node-sized joins off the raw
    // checkpoint leaf, so the next half-round's pin (or the final join)
    // evaluates it without tree growth.
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val pinned = raw.localCheckpoint()
      pins += pinned
      val total = pinned.agg(
        coalesce(sum(col("raw")), lit(0L)).as("l1"))
      nodes.join(pinned, Seq("node"), "left")
        .crossJoin(broadcast(total))
        .select(col("node"),
          when(col("l1") > 0L,
            expr(s"CAST(CAST(coalesce(raw, 0L) AS DECIMAL(38,0)) " +
              s"* ${Scale}L div l1 AS BIGINT)"))
            .otherwise(lit(0L)).as(outCol))
    }

    // iters = 0 returns the initial state (uniform hubs, zero auths) —
    // the pageRank degrade-gracefully contract
    var hubs = nodes.withColumn("hub", lit(Scale / n))
    var auths: DataFrame = nodes.withColumn("auth", lit(0L))
    for (_ <- 1 to iters) {
      val authRaw = bySrc // join key is src: co-located with the src pin
        .join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("raw"))
      auths = normalized(authRaw, "auth")
      val hubRaw = byDst // join key is dst: co-located with the dst pin
        .join(auths.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("raw"))
      hubs = normalized(hubRaw, "hub")
    }
    // one node-sized join of the two final vectors, eagerly materialized
    // into a caller-releasable persist pin (cacheManager-registered, so
    // `.unpersist()` works); the count is the ONE action that computes
    // the whole chain, after which every intermediate pin is released
    val out = hubs.join(auths, Seq("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    pins.foreach(Pins.release)
    out
  }

  /** X84 — community detection by LABEL PROPAGATION (Raghavan, Albert &
    * Kumara 2007), the third iterative kernel: x9's connected
    * components find REACHABILITY islands; LPA finds DENSITY
    * communities inside them — the granularity web-curation pipelines
    * group hosts by (mirror farms, topic hubs) before sampling.
    *
    * Deterministic synchronous variant: every node starts labeled with
    * its own id; each round, every node adopts the label held by the
    * MOST of its in-neighbors, ties to the numerically smaller label
    * (the repo argmax convention — classic LPA breaks ties randomly,
    * which no oracle could replay). Isolated nodes keep their label.
    * All arithmetic is integer counting, so the oracle unrolls the
    * identical rounds (x28/x75 discipline). Undirected graphs: feed
    * both edge directions, as [[pageRank]].
    *
    * Shape at 100 TB: per round, the label vector (one BIGINT per
    * node) joins the pinned src-partitioned edge list, per-(node,
    * label) counts map-side combine, and the argmax is a rank-1 window
    * that plans as WindowGroupLimit (map-side top-1). Every round's
    * label vector pins via eager localCheckpoint — the x75 lesson:
    * per-round pins want plan truncation, not caching. Fixed iteration
    * budget.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    if (nodes.isEmpty) {
      val empty = edges.select(col("src").as("node"))
        .withColumn("community", lit(0L)).limit(0)
      Pins.release(nodes)
      return empty
    }
    val bySrc = edges.repartition(col("src")).localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    var pinned: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val counts = bySrc
        .join(labels.select(col("node").as("src"), col("label").as("nl")), "src")
        .groupBy(col("dst").as("node"), col("nl"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("nl"))
      val adopted = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("node"), col("nl"))
      val next = labels.join(adopted, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("label")).as("label"))
      // eager pin per TWO rounds + explicit release of the superseded
      // pin — the pageRank cadence (constant-size tree, half the
      // materialization jobs of the r21 per-round pins)
      if (i % 2 == 0 && i < iters) {
        val ck = next.localCheckpoint()
        pinned.foreach(Pins.release)
        pinned = Some(ck)
        labels = ck
      } else labels = next
    }
    // final materialization as a caller-releasable persist pin, then
    // release every remaining checkpoint pin — see [[pageRank]]
    val out = labels.select(col("node"), col("label").as("community"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    pinned.foreach(Pins.release)
    Pins.release(bySrc)
    Pins.release(nodes)
    out
  }

  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    // Pin mechanics, settled across three rounds (3 iterations,
    // node-sized vectors): EAGER localCheckpoint pins on the
    // every-2nd-round cadence + explicit release. Checkpoint (not
    // persist) because the checkpoint truncates the analyzed plan to an
    // RDD leaf — the r20 persist pins kept full lineage and every
    // invocation's tree embedded the whole edge construction per round
    // (the 1763-line x28 before-plan of round 21); every-2nd-round (not
    // r21's every-round) because each eager pin is one materialization
    // job and halving the job count is where r21's x28 regression
    // (1.80 → 3.24 s in the driver's artifact) came from. The lineage
    // between pins is two joins over checkpoint leaves — flat enough.
    // Superseded and setup pins are explicitly released
    // ([[Pins.release]] — Dataset.unpersist is a no-op on checkpoint
    // leaves); the returned vector is a PERSIST pin
    // (cacheManager-registered) so callers release it with
    // `.unpersist()` — only it stays pinned (the GraphSpec
    // block-release contract, the r6 leak regression). Durability
    // trade: released checkpoints forgo lineage recompute on block
    // loss; the deterministic rebuild is one rerun from the source.
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0L) {
      // derive the empty frame from the INPUT plan (not the released
      // pin) so the node column keeps its actual type (int/string ids
      // work, not just bigint)
      val empty = edges.select(col("src").as("node"))
        .withColumn("rank", lit(0L)).limit(0)
      Pins.release(nodes)
      return empty
    }
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // edge topology joined to out-degrees once, reused every round;
    // explicitly re-partitioned on src BEFORE the pin so the
    // checkpointed blocks advertise clean hashpartitioning(src)
    // (localCheckpoint preserves the child's output partitioning) —
    // AQE-coalesced join output would read back as unknown partitioning
    // and every round's rank join would re-shuffle the (large) edge
    // side as well as the (small) rank vector
    val eo = edges.join(outdeg, "src")
      .repartition(col("src"))
      .localCheckpoint()
    // nodes with no out-edges; their mass is redistributed uniformly
    val dangling = nodes
      .join(eo.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .localCheckpoint()
    val nDangling = dangling.count()
    val base = (15L * Scale) / (100L * n)
    var ranks = nodes.withColumn("rank", lit(Scale / n))
    var pinned: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contribs = eo
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank * 85L div (outdeg * 100L)").as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("inflow"))
      var next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank"))
      if (nDangling > 0L) {
        val dmass = ranks.join(dangling, "node")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
        next = next.crossJoin(broadcast(dmass))
          .select(col("node"),
            (col("rank") + expr(s"dmass * 85L div ${100L * n}L")).as("rank"))
      }
      if (i % 2 == 0 && i < iters) {
        // eager pin per TWO rounds: one materialization job covers both,
        // the tree stays constant-size, and the superseded pin releases
        // as soon as its successor is materialized
        val ck = next.localCheckpoint()
        pinned.foreach(Pins.release)
        pinned = Some(ck)
        ranks = ck
      } else ranks = next
    }
    // final materialization as a caller-releasable persist pin: its plan
    // is at most two rounds of joins over checkpoint leaves
    val out = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    pinned.foreach(Pins.release)
    Pins.release(dangling)
    Pins.release(eo)
    Pins.release(nodes)
    out
  }

  /** X93 — exact triangle counting by the degree-ordered node-iterator
    * (Schank & Wagner 2005; the MapReduce formulation of Suri &
    * Vassilvitskii, WWW 2011): per node, its degree and the number of
    * triangles through it — the local-clustering signal that grades
    * community cohesion (a near-dup cluster or co-purchase
    * neighborhood with high triangle density is a real community; a
    * hub with none is a star).
    *
    * THE DEGREE ORDERING IS THE SCALE DESIGN: every edge is oriented
    * from its lower-(degree, id) endpoint, wedges are enumerated only
    * at each edge's LOW-degree side, and each triangle is generated
    * exactly once (at its minimum vertex, with the other two in order,
    * closed by one semi-join against the oriented edges). That bounds
    * total wedge work by O(m^1.5) regardless of hub degree — a
    * mega-hub contributes wedges only through the neighbors BELOW it
    * in the order — where the naive per-node wedge join is quadratic
    * in the hub's degree. The (degree, id) pair is a TOTAL order
    * (ids are distinct), so orientation, wedge canonicalization, and
    * therefore the whole count are deterministic, engine-independent
    * integer facts the oracle re-derives relationally.
    *
    * THE INTERSECTION FORM IS THE COST DESIGN (round 17; the
    * edge-iterator of Schank & Wagner's forward algorithm): the
    * oriented out-neighborhoods are collected into per-node arrays
    * once, and each edge (u, v) closes its triangles ROW-LOCALLY as
    * `array_intersect(adj(u), adj(v))` — the O(m^1.5) wedge work
    * happens inside a codegen'd array intersection instead of
    * materializing every wedge as a row through a shuffle + semi-join
    * (at sf0.1 co-purchase: 41M wedge rows collapsed to 1.2M edge rows
    * carrying 1.9M exploded triangles — the wedge:triangle ratio is
    * pure shuffle waste in the row form). The adjacency table is
    * node-grain (out-degree is bounded by O(sqrt m) under the degree
    * order, so arrays stay small even at hub nodes); its two joins
    * back to the edge table are key-partitioned, never broadcast by
    * hint — AQE broadcasts the node-grain side when it fits.
    *
    * Input: (u, v) pairs in any orientation; self-loops and duplicate
    * edges are dropped. Output: (node, deg, tri) for every node. The
    * oriented edge table is pinned once and feeds all three of its
    * consumers (the adjacency build + the two endpoint joins).
    */
  def triangles(pairs: DataFrame): DataFrame = {
    val und = pairs.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val ord = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"))
      .localCheckpoint(false)
    // out-neighborhoods under the total (degree, id) order; a triangle
    // a<b<c (in that order) is found exactly once, at edge (a, b), as
    // c ∈ adj(a) ∩ adj(b) — adj(c) holds only nodes ABOVE c, so the
    // other two edges of the triangle close nothing
    val adj = ord.groupBy(col("src")).agg(collect_list(col("dst")).as("ns"))
    val tri = ord
      .join(adj.select(col("src"), col("ns").as("nu")), Seq("src"))
      // inner: a sink dst has no out-list and closes no triangles
      .join(adj.select(col("src").as("dst"), col("ns").as("nv")),
        Seq("dst"))
      .select(col("src").as("a1"), col("dst").as("a2"),
        explode(array_intersect(col("nu"), col("nv"))).as("a3"))
    val per = tri.select(col("a1").as("node"))
      .unionAll(tri.select(col("a2").as("node")))
      .unionAll(tri.select(col("a3").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    val out = deg.join(per, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
    out
  }
}
