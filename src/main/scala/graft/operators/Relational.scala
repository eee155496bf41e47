package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Core relational operators (SURVEY.md §2.1–§2.7), each instantiated over
  * the TPC-H-ish testdata with a DuckDB oracle.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *   - every query ends in a total-order `orderBy` (reference queries had no
  *     ORDER BY — order was never part of its semantics, SURVEY.md §2.6);
  *   - sums over doubles go through exact DECIMAL accumulation and a single
  *     final cast to double, so partition-order float drift can't change the
  *     result vs a single-threaded oracle;
  *   - timestamps are emitted as DATE or epoch-micros BIGINT, never raw
  *     TIMESTAMP (parquet tz-annotation differences would break the compare).
  *
  * Scale posture: filters sit directly on scans (predicate pushdown), small
  * dimension sides are `broadcast()` hinted, and aggregations are plain
  * `groupBy` (map-side partial aggregation for free).
  */
object Relational {

  /** Exact money sum: accumulate as DECIMAL (associative, partition-order
    * independent), surface as double via one deterministic cast. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // ── P1: nested-path projection (cve.CVE_data_meta.ID-style flattening) ──
    QueryDef(
      "q01_project_nested",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        // Round-trip through a nested struct, then project by nested path —
        // the CVE flattener's shape (SURVEY.md §2.2 P1). Catalyst collapses
        // the struct creation + field access to a plain projection.
        li.select(
            struct(
              col("l_orderkey").as("id"),
              struct(col("l_quantity").as("qty"), col("l_extendedprice").as("price")).as("m")
            ).as("rec"),
            col("l_linenumber"))
          .select(
            col("rec.id").as("orderkey"), col("l_linenumber").as("linenumber"),
            col("rec.m.qty").as("qty"), col("rec.m.price").as("price"))
          // (l_orderkey, l_linenumber) is NOT unique in the testdata — sort
          // on every emitted column so tie order can't differ from the oracle.
          .orderBy("orderkey", "linenumber", "qty", "price")
      },
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             |       l_quantity AS qty, l_extendedprice AS price
             |FROM lineitem ORDER BY orderkey, linenumber, qty, price""".stripMargin)),

    // ── P2: null-cascade on absent branches (try/except → coalesce chain) ──
    QueryDef(
      "q02_null_cascade",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"),
            coalesce(
              nullif(col("o_orderpriority"), lit("5-LOW")),
              nullif(col("o_orderstatus"), lit("P")),
              lit("fallback")).as("resolved"),
            nullif(col("o_orderstatus"), lit("O")).as("status_or_null"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |       coalesce(nullif(o_orderpriority, '5-LOW'),
             |                nullif(o_orderstatus, 'P'), 'fallback') AS resolved,
             |       nullif(o_orderstatus, 'O') AS status_or_null
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ── P3 + X1: description assembly (array fold) + whitespace scrub ──
    QueryDef(
      "q03_concat_scrub",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            // concat() (NULL-propagating) — same null semantics as the
            // oracle's `||`; concat_ws would silently skip NULL args.
            concat(col("lang"), lit(":"), regexp_replace(col("text"), "[\\r\\n\\t]", " ")).as("scrubbed"),
            array_join(split(trim(col("text")), " "), " ").as("normtext"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |       lang || ':' || regexp_replace(text, '[\r\n\t]', ' ', 'g') AS scrubbed,
             |       array_to_string(string_split(trim(text), ' '), ' ') AS normtext
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── F1: substring match (cve LIKE '%arg%') ──
    QueryDef(
      "q04_filter_like",
      (s, dir) => {
        Tables.load(s, dir, "customer")
          .filter(col("c_name").contains("0001"))
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, c_mktsegment
             |FROM customer WHERE c_name LIKE '%0001%' ORDER BY c_custkey""".stripMargin)),

    // ── F2: inclusive disjunctive threshold (v3 score OR v2 score >= s) ──
    QueryDef(
      "q05_threshold_or",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .filter(col("l_extendedprice") >= 90000 || col("l_quantity") >= 49)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_extendedprice >= 90000 OR l_quantity >= 49
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin)),

    // ── F3 + X5: date floor (published_date >= '<d>'::date) ──
    QueryDef(
      "q06_date_floor",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate, o_totalprice
             |FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    // ── F4 + P4: flag filter (vulnerable='True') + bool→'True'/'False' text ──
    QueryDef(
      "q07_flag_filter",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            when(col("l_quantity") > 25, "True").otherwise("False").as("bulky"))
          .orderBy("l_orderkey", "l_linenumber", "bulky")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag,
             |       CASE WHEN l_quantity > 25 THEN 'True' ELSE 'False' END AS bulky
             |FROM lineitem WHERE l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber, bulky""".stripMargin)),

    // ── F6 + O1: key lookup + first-row fetch (cur.fetchone) ──
    QueryDef(
      "q08_point_lookup",
      (s, dir) => {
        // orderBy before limit(1): the key matches ≤1 row in this data, but
        // the oracle contract shouldn't depend on that.
        Tables.load(s, dir, "part")
          .filter(col("p_partkey") === 42)
          .select("p_partkey", "p_name", "p_brand", "p_retailprice")
          .orderBy("p_partkey", "p_name")
          .limit(1)
      },
      Some("""SELECT p_partkey, p_name, p_brand, p_retailprice
             |FROM part WHERE p_partkey = 42 ORDER BY p_partkey, p_name LIMIT 1""".stripMargin)),

    // ── J1/J3: the cvss_vs_cpes view + pushed-down filters (EP3 flagship) ──
    QueryDef("q09_join_view", (s, dir) => joinView(s, dir),
      Some("""SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice,
             |       CAST(o_orderdate AS DATE) AS odate
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus = 'F' AND c_mktsegment LIKE '%MACH%'
             |  AND (o_totalprice >= 200000 OR o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
             |ORDER BY o_orderkey""".stripMargin)),

    // ── J2: left-outer lookup join with char-set-strip key transform ──
    QueryDef(
      "q10_lookup_join",
      (s, dir) => {
        // Mirrors the reference's CWE-name lookup: lstrip('CWE-') is a
        // *character-set* strip (regexp ^[CWE-]+), digits-only test, int
        // cast, left join to the dimension, fall back to the raw label
        // (cve_manager.py:411-423; SURVEY.md §7.4(3)). The dimension is
        // broadcast — the reference's N+1 round-trips collapse into one
        // broadcast-hash join.
        val part = Tables.load(s, dir, "part")
        val sup = Tables.load(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        part
          .withColumn("stripped", regexp_replace(col("p_brand"), "^[Brand#]+", ""))
          .withColumn("bkey", when(col("stripped").rlike("^[0-9]+$"), col("stripped").cast("int")))
          .join(broadcast(sup), col("bkey") === col("s_suppkey"), "left")
          .select(col("p_partkey"), col("p_brand"), coalesce(col("s_name"), col("p_brand")).as("resolved"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_brand, coalesce(s_name, p_brand) AS resolved
             |FROM part LEFT JOIN supplier
             |  ON (CASE WHEN regexp_matches(regexp_replace(p_brand, '^[Brand#]+', ''), '^[0-9]+$')
             |           THEN CAST(regexp_replace(p_brand, '^[Brand#]+', '') AS INT) END) = s_suppkey
             |ORDER BY p_partkey""".stripMargin)),

    // ── Aggregation (engine extension; reference has none, SURVEY.md §2.4) ──
    QueryDef(
      "q11_agg_groupby",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
              .cast(DecimalType(18, 4))).cast("double").as("sum_disc"),
            count(lit(1)).as("n"))
          .withColumn("avg_qty", col("sum_qty") / col("n"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
             |  count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── S6/§2.7: union-all accumulation ──
    QueryDef(
      "q12_union",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val a = part.filter(col("p_type") === "ECONOMY")
          .select(col("p_partkey"), col("p_name"), lit("econ").as("src"))
        val b = part.filter(col("p_type") === "PROMO")
          .select(col("p_partkey"), col("p_name"), lit("promo").as("src"))
        a.unionByName(b).orderBy("src", "p_partkey")
      },
      Some("""SELECT p_partkey, p_name, 'econ' AS src FROM part WHERE p_type = 'ECONOMY'
             |UNION ALL
             |SELECT p_partkey, p_name, 'promo' AS src FROM part WHERE p_type = 'PROMO'
             |ORDER BY src, p_partkey""".stripMargin)),

    // ── G1: generator/explode (problemtype_data[].description[] flatten) ──
    QueryDef(
      "q13_explode",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("word"))
          .filter(col("word") =!= "")
          .orderBy("doc_id", "word")
      },
      Some("""SELECT doc_id, word
             |FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word FROM documents)
             |WHERE word <> '' ORDER BY doc_id, word""".stripMargin)),

    // ── G2: direct ∪ children explode pipelines (CPE config flatten shape) ──
    QueryDef(
      "q14_explode_union",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val direct = part.select(
          col("p_partkey"), lit("direct").as("src"),
          explode(split(col("p_name"), " ")).as("word"))
        val child = part.select(
          col("p_partkey"), lit("child").as("src"),
          explode(split(col("p_type"), " ")).as("word"))
        direct.unionByName(child).orderBy("p_partkey", "src", "word")
      },
      Some("""SELECT p_partkey, src, word FROM (
             |  SELECT p_partkey, 'direct' AS src, unnest(string_split(p_name, ' ')) AS word FROM part
             |  UNION ALL
             |  SELECT p_partkey, 'child' AS src, unnest(string_split(p_type, ' ')) AS word FROM part
             |) ORDER BY p_partkey, src, word""".stripMargin)),

    // ── Top-k (engine extension; TakeOrderedAndProject, no full sort) ──
    QueryDef(
      "q15_topk",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ── Window functions (engine extension, SURVEY.md §2.5) ──
    QueryDef(
      "q16_window",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
             |FROM orders ORDER BY o_custkey, rn""".stripMargin)),

    // ── DISTINCT (engine extension) ──
    QueryDef(
      "q17_distinct",
      (s, dir) => {
        Tables.load(s, dir, "customer")
          .select("c_mktsegment", "c_nationkey").distinct()
          .orderBy("c_mktsegment", "c_nationkey")
      },
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey
             |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin)),

    // ── Semi join (EXISTS) ──
    QueryDef(
      "q18_semi_join",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
        val big = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 300000)
        cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // ── Anti join (NOT EXISTS) ──
    QueryDef(
      "q19_anti_join",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
        val orders = Tables.load(s, dir, "orders")
        cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ── INTERSECT (set semantics; plans as an aggregate + left-semi) ──
    QueryDef(
      "q68_intersect",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") > 5000).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 5000).select(col("s_nationkey").as("nationkey"))
        c.intersect(sup).orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
             |INTERSECT
             |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
             |ORDER BY nationkey""".stripMargin)),

    // ── EXCEPT (set semantics; plans as an aggregate + left-anti) ──
    QueryDef(
      "q69_except",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") > 5000).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.load(s, dir, "supplier")
          .filter(col("s_acctbal") > 9000).select(col("s_nationkey").as("nationkey"))
        c.except(sup).orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
             |EXCEPT
             |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
             |ORDER BY nationkey""".stripMargin)),

    // ── FULL OUTER join (aggregated sides; nulls coalesced to 0 so the
    //    compare never crosses the nullable-int → float64 pandas boundary) ──
    QueryDef(
      "q70_full_outer",
      (s, dir) => {
        val nc = Tables.load(s, dir, "customer")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
          .filter(col("n_cust") > 20)
        val ns = Tables.load(s, dir, "supplier")
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        nc.join(ns, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""WITH nc AS (
             |  SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |  FROM customer GROUP BY 1 HAVING count(*) > 20),
             |ns AS (
             |  SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |  FROM supplier GROUP BY 1)
             |SELECT coalesce(nc.nationkey, ns.nationkey) AS nationkey,
             |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
             |FROM nc FULL OUTER JOIN ns ON nc.nationkey = ns.nationkey
             |ORDER BY nationkey""".stripMargin)),

    // ── Correlated scalar subqueries through the SQL entry point ──
    QueryDef(
      "q71_scalar_subquery",
      (s, dir) => {
        // The spark.sql(...) surface with TWO correlated scalar subqueries
        // — Catalyst de-correlates each into an aggregate + join, so the
        // plan is the same shuffled-aggregate shape as the hand-written
        // DataFrame version (no per-row re-execution anywhere). The
        // comparison is multiplied out (price * cnt > 2 * total) because
        // a correlated AVG would hit engine-divergent average typing
        // (Spark decimal avg vs DuckDB double avg); the exact
        // DECIMAL-sum-cast-double is the established portable form.
        Tables.load(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders_v o
          WHERE o_totalprice *
                (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
              > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders o
             |WHERE o_totalprice *
             |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             |    > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // ── ROLLUP grouping sets (engine extension; single shuffle, the
    //    higher levels aggregate the partials of the lower) ──
    QueryDef(
      "q45_rollup",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            grouping_id(col("l_returnflag"), col("l_linestatus")).as("lvl"))
          .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  GROUPING(l_returnflag, l_linestatus) AS lvl
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY lvl, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ── Cube = all 4 grouping sets in one pass (engine extension) ──
    QueryDef(
      "q64_cube",
      (s, dir) => {
        // Same partial+final aggregation shape as rollup, one more grouping
        // set: Spark expands the cube map-side, so the corpus is still read
        // once and shuffled once on the expanded grouping keys.
        Tables.load(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
            grouping_id(col("l_returnflag"), col("l_linestatus")).as("lvl"))
          .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  GROUPING(l_returnflag, l_linestatus) AS lvl
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY lvl, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ── Pivot = conditional aggregation (engine extension) ──
    QueryDef(
      "q46_pivot",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
             |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
             |  count(*) FILTER (o_orderstatus = 'P') AS n_p
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── Table profile: the DESCRIBE/ANALYZE summary every warehouse ships ──
    QueryDef(
      "q126_table_profile",
      (s, dir) => {
        // Column-level profiling of `documents` in ONE pass: per column —
        // null count, exact distinct count, and for the numeric column
        // min/max/sum. The first thing a data engineer runs on an unknown
        // table, and the freshness/health row a catalog UI shows. Exact
        // distincts expand to the standard two-phase count-distinct; all
        // other measures ride the same partial+final aggregate. Output is
        // ONE row — nothing corpus-sized ever returns.
        Tables.load(s, dir, "documents")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
            countDistinct(col("lang")).as("d_lang"),
            countDistinct(col("source")).as("d_source"),
            countDistinct(col("doc_id")).as("d_doc_id"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("sum_chars"))
          .withColumn("pk_unique",
            when(col("d_doc_id") === col("n_rows"), 1).otherwise(0))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
             |       CAST(count(DISTINCT lang) AS BIGINT) AS d_lang,
             |       CAST(count(DISTINCT source) AS BIGINT) AS d_source,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS d_doc_id,
             |       CAST(min(n_chars) AS BIGINT) AS min_chars,
             |       CAST(max(n_chars) AS BIGINT) AS max_chars,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       CASE WHEN count(DISTINCT doc_id) = count(*) THEN 1 ELSE 0 END AS pk_unique
             |FROM documents""".stripMargin))
  )

  /** EP3 flagship: inner equi-join view + pushed-down substring/threshold/
    * date filters (cvss_vs_cpes analog, cve_manager.py:79-90,475-504).
    * Customer (dimension) side is broadcast. */
  def joinView(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    val cust = Tables.load(s, dir, "customer")
    orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .filter(col("c_mktsegment").contains("MACH") &&
        (col("o_totalprice") >= 200000 ||
          col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00"))))
      .select(
        col("o_orderkey"), col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("odate"))
      .orderBy("o_orderkey")
  }
}
