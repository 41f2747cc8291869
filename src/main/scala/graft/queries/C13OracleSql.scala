package graft.queries

/** DuckDB oracle for c13_token_budget: replays token-budget mixture
  * selection (graft.operators.Corpus.tokenBudgetMixture) as the NAIVE
  * single global window per domain — cumulative token count in signed-
  * draw order, keep while the document still fits its domain's budget.
  * The operator computes the same running count as an order-preserving
  * STRIPED prefix sum (per-draw-range-bucket windows + driver-prefix-
  * summed bucket offsets), so this oracle is precisely the proof that
  * the distributed mechanism equals the sequential semantics — all
  * integer arithmetic, no float anywhere. Domains reuse the skewed c12
  * tiers so the head/mid budgets genuinely bind while tail rides the
  * uncapped default.
  */
object C13OracleSql {

  // keep in sync with QueryCatalog.c13TokenBudget
  val budgets: Map[String, Long] = Map("head" -> 8000L, "mid" -> 4000L)
  val seed = 13L

  val sql: String = {
    val cases = budgets.toSeq.sortBy(_._1)
      .map { case (d, b) => s"WHEN '$d' THEN $b" }.mkString(" ")
    s"""WITH docs2 AS (SELECT doc_id, ${C12OracleSql.domainCase} AS domain, text
       |    FROM documents),
       |${SplitmixSql.signedCtes(
         graft.operators.Corpus.budgetDrawSeed(seed), "doc_id, domain, text", "docs2")},
       |tk AS (SELECT doc_id, domain, b,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |    FROM m3),
       |c AS (SELECT doc_id, domain, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (PARTITION BY domain ORDER BY b, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
       |    FROM tk)
       |SELECT doc_id, domain, n_tokens, CAST(tok_start AS BIGINT) AS tok_start
       |FROM c
       |WHERE tok_start + n_tokens <= CASE domain $cases
       |  ELSE 9223372036854775807 END
       |ORDER BY doc_id""".stripMargin
  }
}
