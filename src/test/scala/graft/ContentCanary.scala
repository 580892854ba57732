package graft

/** Pinned sf0.001 content signatures for the value-level corpus
  * canary in [[SchemaDriftSuite]]: per table, (row count, per-column
  * `bit_xor(xxhash64(col))`). Regenerate by running the canary test —
  * on drift it prints this map's replacement verbatim. Kept in its own
  * file so a corpus regeneration is a one-file re-pin with an obvious
  * diff.
  */
object ContentCanary {

  /** Row counts of the LARGER scale factors (footer reads — cheap),
    * pinned alongside the sf0.001 checksums: the driver may
    * regenerate one SF without the others, and the sf0.1 counts are
    * what the GoldenSuite goldens and BASELINE ratios assume. Keyed by
    * sf NAME only — the consuming test resolves each as a sibling of
    * the suite's `sf` dir, so no absolute path is baked in here. */
  val pinnedCounts: Map[String, Map[String, Long]] = Map(
    "sf0.01" -> Map(
      "lineitem" -> 60000L, "orders" -> 15000L, "customer" -> 1500L,
      "supplier" -> 100L, "part" -> 2000L, "nation" -> 25L,
      "region" -> 5L, "documents" -> 500L, "embeddings" -> 500L,
      "events" -> 10000L),
    "sf0.1" -> Map(
      "lineitem" -> 600000L, "orders" -> 150000L, "customer" -> 15000L,
      "supplier" -> 1000L, "part" -> 20000L, "nation" -> 25L,
      "region" -> 5L, "documents" -> 5000L, "embeddings" -> 2000L,
      "events" -> 100000L))
  // Pinned 2026-08-13 (round 11) against the round-10/11 corpus
  // generation. l_returnflag XORs to 0 because each of its 3 distinct
  // values happens to appear an even number of times — legal; the
  // other 5 lineitem columns carry the drift signal.
  val pinned: Map[String, (Long, Seq[(String, Long)])] = Map(
    "lineitem" -> (6000L, Seq("l_orderkey" -> 3796931330684669918L, "l_quantity" -> 7024670303695951944L, "l_extendedprice" -> 5330258286759378905L, "l_discount" -> -8319290770901717815L, "l_returnflag" -> 0L, "l_shipdate" -> 4183297902385193906L)),
    "orders" -> (1500L, Seq("o_orderkey" -> -4842476892381857631L, "o_custkey" -> -7052788785589964613L, "o_totalprice" -> 6924951619586507821L, "o_orderdate" -> -6620928308536060856L)),
    "customer" -> (150L, Seq("c_custkey" -> -3230816186985085973L, "c_nationkey" -> 2650156809612264394L, "c_acctbal" -> 2509390430783589729L, "c_mktsegment" -> -949216291933037392L)),
    "supplier" -> (10L, Seq("s_suppkey" -> 5307719104970340434L, "s_acctbal" -> -4448686686718540505L)),
    "part" -> (200L, Seq("p_partkey" -> 9161525766953777969L, "p_retailprice" -> -794197067667059974L)),
    "nation" -> (25L, Seq("n_nationkey" -> 1442137967996704455L, "n_name" -> 6886818372989610864L)),
    "region" -> (5L, Seq("r_regionkey" -> 4544877527460605227L, "r_name" -> 7693313425868697832L)),
    "documents" -> (500L, Seq("doc_id" -> 3568460861754722574L, "text" -> 2924637719477054298L, "lang" -> 683650880119478838L, "n_chars" -> 8776853318014465885L)),
    "embeddings" -> (500L, Seq("vec_id" -> 3568460861754722574L, "label" -> 3118098183267369367L)),
    "events" -> (1000L, Seq("event_id" -> 5272617657988570486L, "ts" -> 2882570639643037983L, "user_id" -> 616840374346591593L, "event_type" -> -6563888770886245892L, "value" -> 5455898481141827764L))
  )
}
