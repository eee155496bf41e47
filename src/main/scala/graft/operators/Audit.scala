package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Corpus-audit operators: mergeable-sketch cardinality (HLL), PII density,
  * and token-budget allocation — the bookkeeping layer a 100 TB curation
  * pipeline runs continuously, so every operator here collapses the corpus
  * in one (or, for a sketch-vs-exact audit, two) linear passes into a
  * catalog-sized frame and does ALL further math on that frame.
  *
  * Portability discipline (the repo-wide rules): md5 + integer arithmetic
  * only on anything hash-compared; doubles appear solely as single
  * final-division expressions written identically in both engines; no
  * libm (ln/pow) anywhere — the HLL fold is exact dyadic-integer
  * arithmetic, and the estimator constant is a literal product.
  */
object Audit {

  // ── q160 HyperLogLog parameters ──────────────────────────────────────
  /** Register-index bits: m = 2^HllP = 512 registers per group keeps the
    * standard error ~1.04/√m ≈ 4.6% with aggregation state bounded at
    * langs × 512 rows AT ANY corpus size (the q76/q159 bounded-state
    * discipline, here for COUNT DISTINCT — whose exact form is the
    * classic scale killer: a corpus-wide shuffle of every distinct
    * value). Flajolet et al. 2007's α_m correction applies from m ≥ 128. */
  val HllP = 9
  val HllM = 512

  /** The counted value is the HllN-gram, not the single token: the
    * operator sizes gram machinery (the q148/q151 gram index, df-cap
    * policy, dedup blocking fan-in), and gram cardinality keeps every
    * lang group ≥ 2.5·m distinct values at every test sf — the regime
    * where the RAW estimator (the operator's libm-free definition; see
    * hllEstSql) is unbiased. Token cardinality on this synthetic corpus
    * is ~31 — deep in the small-range regime where raw HLL reads high
    * by design and the standard fix (linear counting) needs ln(). */
  val HllN = 5

  /** ρ cap: the hash contributes 60 bits (15 md5 hex digits — the portable
    * md5→bigint fold), 9 go to the register index, so the suffix has 51
    * bits and ρ ∈ [1, 51]; 52 marks the (probability 2⁻⁵¹) all-zero
    * suffix. Terms 2^(RhoCap−ρ) then sum EXACTLY in bigint: at most
    * m·2^52 = 2^61 < 2^63. */
  val RhoCap = 52

  // ── q163 PII patterns (the Java/RE2 ∩ DuckDB regex subset, like q61) ──
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  // ── q164 waterfilling: budget = floor(total_tokens · 19 / 20) — the
  // "rebalance by trimming the oversized tail" regime; on the near-uniform
  // test sources this still splits the frame into BOTH a fully-allocated
  // and a capped band at every sf (a tighter budget caps everything and
  // exercises only one branch). ──
  val WfNum = 19L
  val WfDen = 20L

  /** Portable md5-hex→bigint (15 hex digits = 60 bits) — SQL text valid in
    * Spark; the DuckDB twin is the nibble fold below (bit-identical, the
    * q79 idiom). */
  private def h60Spark(c: String): String =
    s"cast(conv(substr(md5($c), 1, 15), 16, 10) AS bigint)"
  private def h60Duck(c: String): String =
    s"list_reduce([(strpos('0123456789abcdef', substr(md5($c), i, 1)) - 1)::BIGINT for i in range(1, 16)], (a, b) -> a * 16 + b)"

  /** The raw-HLL estimator as a SQL expression over the exact integer
    * register fold `s` = Σ_j 2^(RhoCap − ρ_j) (empty registers ρ = 0):
    * E = α_m · m² · 2^RhoCap / s, with α_m = 0.7213/(1 + 1.079/m). Every
    * factor is an exact literal (2^52 = 4.503599627370496e15 exactly),
    * the chain evaluates left-to-right in both engines, and the one
    * inexact step is the final division — deterministic IEEE. The
    * operator's DEFINITION is the raw estimator: no small-range linear
    * counting (it needs ln()), the audit emits `used` registers so a
    * reader can see saturation directly. */
  private def hllEstSql(s: String): String =
    "7.213e-1 / (1.0e0 + 1.079e0 / 5.12e2) * 2.62144e5 * 4.503599627370496e15" +
      s" / CAST($s AS DOUBLE)"

  /** (lang, g) HllN-gram stream — the q103 gram-enumeration idiom. */
  def gram5(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= HllN)
      .select(col("lang"), explode(expr(
        s"transform(sequence(0, size(w) - $HllN), i -> concat_ws(' ', slice(w, i + 1, $HllN)))"))
        .as("g"))

  /** (grp, v) → per-occurrence (grp, idx, rho) rows — ρ via the
    * least-significant-set-bit trick: `z & -z` isolates the lowest set
    * bit, `length(bin(·))` reads its position (both engines print
    * minimal binary strings). Pure narrow projection (stream-safe): the
    * batch path aggregates it below, the streaming twin folds it into
    * grid-bounded register state instead. */
  def hllRows(items: DataFrame, grp: String, v: String): DataFrame =
    items
      .withColumn("h", expr(h60Spark(v)))
      .withColumn("idx", expr(s"h % $HllM"))
      .withColumn("z", expr(s"h div $HllM"))
      .select(col(grp).as("grp"), col("idx"), expr(
        s"CASE WHEN z = 0 THEN $RhoCap ELSE length(bin(z & -z)) END")
        .cast("long").as("rho"))

  /** (grp, v) → (grp, idx, r) HLL register frame. No distinct, no libm:
    * max(ρ) over raw occurrences equals max over distinct values by
    * construction. Public so AuditSpec and the streaming twin can pin
    * state bounds against it. */
  def hllRegisters(items: DataFrame, grp: String, v: String): DataFrame =
    hllRows(items, grp, v)
      .groupBy("grp", "idx")
      .agg(max("rho").as("r"))

  /** (grp, idx, r) registers → (grp, used, est): the exact dyadic fold +
    * estimator. Input may be any register frame (per-group, merged,
    * streaming state) — merge-then-estimate and estimate-per-group
    * commute with MAX, which is the whole point of the sketch. */
  def hllEstimate(registers: DataFrame): DataFrame =
    registers.groupBy("grp")
      .agg(count(lit(1)).as("used"),
        sum(expr(s"shiftleft(cast(1 AS bigint), cast($RhoCap - r AS int))")).as("sp"))
      .withColumn("s",
        col("sp") + (lit(HllM.toLong) - col("used")) * lit(1L << RhoCap))
      .select(col("grp"), col("used"), expr(hllEstSql("s")).as("est"))

  val defs: Seq[QueryDef] = Seq(

    // ── Mergeable distinct-gram cardinality: HLL sketch + exact verify ──
    QueryDef(
      "q160_hll_distinct",
      (s, dir) => {
        // Per-language distinct 5-gram cardinality from a 512-register
        // HLL sketch, PLUS the merged corpus-wide row ('__all__')
        // computed by MAX-merging the per-lang registers — the
        // mergeability a 1000-executor deployment actually relies on
        // (per-partition partial registers combine associatively; here
        // the same algebra is exercised across groups). This is the
        // number that sizes gram machinery before building it: the
        // q148/q151 gram index row count, MaxDf policy, blocking fan-in.
        // The exact countDistinct runs beside it as the audit's verify
        // pass (the q159 sketch+verify discipline) with rel_err
        // materialized per row.
        //
        // 100 TB shape: the sketch side is ONE gram scan collapsing into
        // a (lang, idx) max-aggregate — state ≤ langs × 512 rows,
        // map-side combined; the '__all__' merge and the estimator fold
        // run on that bounded frame. The exact side (rollup
        // countDistinct) is the one corpus-sized shuffle — it exists to
        // GRADE the sketch and is what the sketch replaces in production.
        val g = gram5(Tables.load(s, dir, "documents"))
        val reg = hllRegisters(g, "lang", "g")
        val all = reg.groupBy("idx").agg(max("r").as("r"))
          .select(lit("__all__").as("grp"), col("idx"), col("r"))
        val est = hllEstimate(reg.unionByName(all))
        val exact = g
          .rollup("lang")
          .agg(countDistinct("g").as("n_exact"))
          .select(coalesce(col("lang"), lit("__all__")).as("grp"),
            col("n_exact"))
        est.join(exact, Seq("grp"))
          .select(col("grp").as("lang"), col("used"), col("est"),
            col("n_exact"),
            expr("(est - CAST(n_exact AS double)) / CAST(n_exact AS double)")
              .as("rel_err"))
          .orderBy("lang")
      },
      Some(s"""WITH wt AS (SELECT lang, string_split(trim(text), ' ') AS w FROM documents),
              |gr AS (
              |  SELECT lang, concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]) AS g
              |  FROM (SELECT lang, w, unnest(range(1, len(w) - ${HllN - 2})) AS i
              |        FROM wt WHERE len(w) >= $HllN)),
              |hh AS (
              |  SELECT lang, h % $HllM AS idx, h // $HllM AS z
              |  FROM (SELECT lang, ${h60Duck("g")} AS h FROM gr)),
              |rr AS (
              |  SELECT lang, idx,
              |         max(CASE WHEN z = 0 THEN $RhoCap ELSE length(bin(z & -z)) END)::BIGINT AS r
              |  FROM hh GROUP BY lang, idx),
              |ru AS (
              |  SELECT lang, idx, r FROM rr
              |  UNION ALL
              |  SELECT '__all__' AS lang, idx, max(r) AS r FROM rr GROUP BY idx),
              |ss AS (
              |  SELECT lang, CAST(count(*) AS BIGINT) AS used,
              |         CAST(CAST(sum(1::BIGINT << ($RhoCap - r)) AS BIGINT)
              |              + ($HllM - count(*)) * (1::BIGINT << $RhoCap) AS BIGINT) AS s
              |  FROM ru GROUP BY lang),
              |ex AS (
              |  SELECT coalesce(lang, '__all__') AS lang,
              |         CAST(count(DISTINCT g) AS BIGINT) AS n_exact
              |  FROM gr GROUP BY ROLLUP(lang))
              |SELECT lang, used, ${hllEstSql("s")} AS est, n_exact,
              |       (${hllEstSql("s")} - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
              |FROM ss JOIN ex USING (lang)
              |ORDER BY lang""".stripMargin)),

    // ── Per-source PII density audit (detection counts, not redaction) ──
    QueryDef(
      "q163_pii_audit",
      (s, dir) => {
        // q61 redacts; this AUDITS — the per-source PII density table a
        // release review reads before any redaction decision: emails, IPv4
        // literals, long digit runs, the fraction of documents carrying
        // any of them, and hits per 1k words. The corpus text is synthetic
        // and PII-free, so the harness query deterministically injects a
        // varying mix (email on doc_id ≡ 0 mod 3, IP on ≡ 0 mod 7, a
        // numeric ref on ≡ 0 mod 9 — all coprime to the source stride, so
        // densities vary WITHIN every source) — the OPERATOR is the ordered count/redact
        // cascade: emails counted on raw text, then redacted; IPs counted
        // on the email-clean text, then redacted; digit runs counted last
        // (so an email's digits or an IP's octets are never double-counted
        // as a numeric ID). Same pass order as q61, extended by one stage.
        //
        // 100 TB shape: three codegen'd regexp passes in ONE narrow scan,
        // collapsed by a single partial+final source-keyed aggregate to
        // |sources| rows. Nothing else moves.
        val raw = concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
              lit(".3."), (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
          when(col("doc_id") % 9 === 0,
            concat(lit(" ref "),
              (col("doc_id") * 7919 + 1000000).cast("string"))).otherwise(lit("")))
        val d = Tables.load(s, dir, "documents")
          .withColumn("raw", raw)
          .withColumn("n_words", size(split(trim(col("raw")), " ")).cast("long"))
          .withColumn("n_email",
            size(regexp_extract_all(col("raw"), lit(TextOps.EmailRe), lit(0))).cast("long"))
          .withColumn("r1", regexp_replace(col("raw"), TextOps.EmailRe, "<EMAIL>"))
          .withColumn("n_ip",
            size(regexp_extract_all(col("r1"), lit(IpRe), lit(0))).cast("long"))
          .withColumn("r2", regexp_replace(col("r1"), IpRe, "<IP>"))
          .withColumn("n_num",
            size(regexp_extract_all(col("r2"), lit(TextOps.NumRe), lit(0))).cast("long"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_words").as("n_words"),
            sum("n_email").as("n_email"),
            sum("n_ip").as("n_ip"),
            sum("n_num").as("n_num"),
            sum(when(col("n_email") + col("n_ip") + col("n_num") > 0, 1L)
              .otherwise(0L)).as("docs_with_pii"))
          .withColumn("pii_per_kword",
            expr("(n_email + n_ip + n_num) * 1.0e3 / n_words"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (
              |  SELECT source,
              |         len(string_split(trim(raw), ' '))::BIGINT AS n_words,
              |         len(regexp_extract_all(raw, '${TextOps.EmailRe}'))::BIGINT AS n_email,
              |         len(regexp_extract_all(r1, '$IpRe'))::BIGINT AS n_ip,
              |         len(regexp_extract_all(regexp_replace(r1, '$IpRe', '<IP>', 'g'), '${TextOps.NumRe}'))::BIGINT AS n_num
              |  FROM (
              |    SELECT source, raw, regexp_replace(raw, '${TextOps.EmailRe}', '<EMAIL>', 'g') AS r1
              |    FROM (
              |      SELECT source,
              |             text
              |               || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
              |               || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || (doc_id % 200) || '.3.' || (doc_id % 250) ELSE '' END
              |               || CASE WHEN doc_id % 9 = 0 THEN ' ref ' || (doc_id * 7919 + 1000000) ELSE '' END AS raw
              |      FROM documents)))
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(n_words) AS BIGINT) AS n_words,
              |       CAST(sum(n_email) AS BIGINT) AS n_email,
              |       CAST(sum(n_ip) AS BIGINT) AS n_ip,
              |       CAST(sum(n_num) AS BIGINT) AS n_num,
              |       CAST(sum(CASE WHEN n_email + n_ip + n_num > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
              |       (CAST(sum(n_email) AS BIGINT) + CAST(sum(n_ip) AS BIGINT) + CAST(sum(n_num) AS BIGINT)) * 1.0e3
              |         / CAST(sum(n_words) AS BIGINT) AS pii_per_kword
              |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    // ── Token-budget waterfilling across sources (closed form, no loop) ──
    QueryDef(
      "q164_budget_waterfill",
      (s, dir) => {
        // Balanced mixture under a global token budget B: give every
        // source min(T_s, c) tokens where the water line c is chosen so
        // the total just fits — the allocation that maximizes the minimum
        // source share (q150 cuts by QUALITY within a budget; this
        // allocates by SOURCE BALANCE; q63/q99 reweight without a hard
        // budget). The water line has a CLOSED FORM over the sources
        // sorted by size: walking ascending, a source fits fully iff
        // cum_before + T_i·(remaining) ≤ B, and the FIRST non-full row
        // fixes c = (B − cum_before) div remaining (later non-full rows'
        // candidates are strictly smaller, so max() over the column reads
        // exactly the first — no iteration, no driver loop). Allocations
        // are floored integers: Σ alloc ≤ B with slack < |sources|,
        // documented rather than remainder-distributed.
        //
        // 100 TB shape: ONE corpus aggregate to |sources| rows; every
        // window (rank, prefix sum, the max) runs over that catalog-sized
        // frame. Pure bigint arithmetic — hash-exact by construction.
        val t = Tables.load(s, dir, "documents")
          .withColumn("nw", size(split(trim(col("text")), " ")).cast("long"))
          .groupBy("source").agg(sum("nw").as("tokens"))
        val wAll = Window.partitionBy(lit(1))
        val wOrd = Window.partitionBy(lit(1)).orderBy("tokens", "source")
        val f = t
          .withColumn("tot", sum("tokens").over(wAll))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("budget", expr(s"tot * $WfNum div $WfDen"))
          .withColumn("i", row_number().over(wOrd).cast("long"))
          .withColumn("cum_before", coalesce(
            sum("tokens").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .withColumn("rem", col("n") - col("i") + 1L)
          .withColumn("full",
            (col("cum_before") + col("tokens") * col("rem")) <= col("budget"))
          .withColumn("cand",
            when(!col("full"), expr("(budget - cum_before) div rem")))
        f.withColumn("cap", max("cand").over(wAll))
          .select(col("source"), col("tokens"), col("budget"), col("cap"),
            when(col("full"), col("tokens")).otherwise(col("cap")).as("alloc"),
            when(col("full"), 0L).otherwise(1L).as("capped"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT source, CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS tokens
              |  FROM documents GROUP BY source),
              |f AS (
              |  SELECT source, tokens,
              |         CAST(sum(tokens) OVER () AS BIGINT) AS tot,
              |         CAST(count(*) OVER () AS BIGINT) AS n,
              |         CAST(sum(tokens) OVER () AS BIGINT) * $WfNum // $WfDen AS budget,
              |         CAST(row_number() OVER (ORDER BY tokens, source) AS BIGINT) AS i,
              |         CAST(coalesce(sum(tokens) OVER (ORDER BY tokens, source
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
              |  FROM t),
              |g AS (
              |  SELECT source, tokens, budget,
              |         cum_before + tokens * (n - i + 1) <= budget AS is_full,
              |         CASE WHEN NOT (cum_before + tokens * (n - i + 1) <= budget)
              |              THEN (budget - cum_before) // (n - i + 1) END AS cand
              |  FROM f)
              |SELECT source, tokens, budget, CAST(max(cand) OVER () AS BIGINT) AS cap,
              |       CAST(CASE WHEN is_full THEN tokens ELSE max(cand) OVER () END AS BIGINT) AS alloc,
              |       CAST(CASE WHEN is_full THEN 0 ELSE 1 END AS BIGINT) AS capped
              |FROM g ORDER BY source""".stripMargin)))
}
