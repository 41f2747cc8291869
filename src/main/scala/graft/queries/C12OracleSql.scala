package graft.queries

/** DuckDB oracle for c12_temperature_mixture: recomputes the ENTIRE
  * operator from scratch — per-domain counts, the temperature-α keep
  * rate (n_min/n)^(1−α) anchored at the smallest domain, the ⌊rate·2²⁴⌋
  * threshold, and the splitmix64 keep draw under the TEMPER hash family.
  * Unlike the c3 oracle (whose caller-supplied weights route through the
  * shared Scala threshold helper), nothing here is shared with the
  * operator but the definition: the query pins α = 0.5 precisely so the
  * rate arithmetic is sqrt∘division — correctly-rounded IEEE ops in both
  * engines, hence bit-identical thresholds computed independently.
  *
  * The corpus's `source` values are deliberately uniform (the driver
  * writes ~N/20 docs per src0..src19), which would make every rate 1 and
  * the oracle vacuous — so the query first folds sources into three
  * SKEWED tiers by name (head=src0-13, mid=src14-17, tail=everything
  * else, ~7:2:1), making the head/mid rates genuinely fractional at any
  * corpus size or seed.
  */
object C12OracleSql {

  // keep in sync with QueryCatalog.c12TemperatureMixture
  val alpha = 0.5
  val seed = 11L
  require(alpha == 0.5,
    "the c12 oracle replays the rate as sqrt(nmin/n) — only exact at alpha = 0.5")

  val headSrcs: Seq[String] = (0 to 13).map(i => s"src$i")
  val midSrcs: Seq[String] = (14 to 17).map(i => s"src$i")

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  val domainCase: String =
    s"""CASE WHEN source IN ${inList(headSrcs)} THEN 'head'
       |         WHEN source IN ${inList(midSrcs)} THEN 'mid'
       |         ELSE 'tail' END""".stripMargin

  val sql: String =
    s"""WITH docs2 AS (SELECT doc_id, $domainCase AS domain
       |    FROM documents),
       |cnt AS (SELECT domain, CAST(count(*) AS BIGINT) AS n
       |    FROM docs2 GROUP BY domain),
       |mn AS (SELECT min(n) AS nmin FROM cnt),
       |th AS (SELECT domain,
       |    CAST(floor(sqrt(CAST((SELECT nmin FROM mn) AS DOUBLE)
       |                    / CAST(n AS DOUBLE)) * 16777216) AS BIGINT) AS th
       |    FROM cnt),
       |${SplitmixSql.drawCtes(
         graft.operators.Corpus.temperDrawSeed(seed), "doc_id, domain", "docs2")}
       |SELECT m3.doc_id, m3.domain FROM m3 JOIN th USING (domain)
       |WHERE u < th ORDER BY doc_id""".stripMargin
}
