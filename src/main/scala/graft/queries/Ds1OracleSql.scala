package graft.queries

/** DuckDB oracle for ds1_load_iris: replays graft.ml.Datasets' iris fixture
  * generator — u(seed,i,j) = splitmix-mix(mix(1,i), j) scaled to [0,1),
  * g = Σ₄u − 2, value = classMean + 0.25·g, float32 cast — in pure SQL.
  * Same HUGEINT mod-2⁶⁴ limb arithmetic as Mm1OracleSql; every double step
  * (dyadic u, left-assoc sum, one fused mean+scale add) is IEEE-identical
  * to the JVM evaluation, so the float32 results hash-match exactly.
  */
object Ds1OracleSql {

  /** (a * c) mod 2^64 with a < 2^64 and c a 64-bit literal, via 32-bit limbs. */
  private def mul(a: String, c: String): String =
    s"(((($a) >> 32) * ($c & 4294967295::HUGEINT) + (($a) & 4294967295::HUGEINT) * ($c >> 32)) " +
      s"% 4294967296::HUGEINT * 4294967296::HUGEINT " +
      s"+ (($a) & 4294967295::HUGEINT) * ($c & 4294967295::HUGEINT)) % 18446744073709551616::HUGEINT"

  private val A = "11400714819323198485::HUGEINT" // 0x9e3779b97f4a7c15 (mix seed mult)
  private val C1 = "13787848793156543929::HUGEINT" // 0xbf58476d1ce4e5b9
  private val C2 = "10723151780598845931::HUGEINT" // 0x94d049bb133111eb

  private val classMean = // means(i%3)(j), Datasets.iris
    """CAST(CASE i % 3
      |  WHEN 0 THEN CASE j WHEN 0 THEN 5.0 WHEN 1 THEN 3.4 WHEN 2 THEN 1.5 ELSE 0.25 END
      |  WHEN 1 THEN CASE j WHEN 0 THEN 5.9 WHEN 1 THEN 2.8 WHEN 2 THEN 4.3 ELSE 1.3 END
      |  ELSE       CASE j WHEN 0 THEN 6.6 WHEN 1 THEN 3.0 WHEN 2 THEN 5.5 ELSE 2.0 END
      |END AS DOUBLE)""".stripMargin

  val sql: String =
    s"""WITH grid AS (
       |  SELECT ti.i, tj.j, tk.k FROM
       |    (SELECT range AS i FROM range(150)) ti CROSS JOIN
       |    (SELECT range AS j FROM range(4)) tj CROSS JOIN
       |    (SELECT range AS k FROM range(4)) tk),
       |a0 AS (SELECT i, j, k, xor(1::HUGEINT, ${mul("i::HUGEINT", A)}) AS z FROM grid),
       |a1 AS (SELECT i, j, k, ${mul("xor(z, z >> 30)", C1)} AS z FROM a0),
       |a2 AS (SELECT i, j, k, ${mul("xor(z, z >> 27)", C2)} AS z FROM a1),
       |a3 AS (SELECT i, j, k, xor(z, z >> 31) AS z FROM a2),
       |b0 AS (SELECT i, j, k, xor(z, ${mul("(j * 64 + k)::HUGEINT", A)}) AS z FROM a3),
       |b1 AS (SELECT i, j, k, ${mul("xor(z, z >> 30)", C1)} AS z FROM b0),
       |b2 AS (SELECT i, j, k, ${mul("xor(z, z >> 27)", C2)} AS z FROM b1),
       |b3 AS (SELECT i, j, k, xor(z, z >> 31) AS z FROM b2),
       |uu AS (SELECT i, j, k, CAST(z >> 11 AS DOUBLE) / 9007199254740992 AS u FROM b3),
       |gg AS (SELECT i, j,
       |    max(CASE WHEN k = 0 THEN u END) + max(CASE WHEN k = 1 THEN u END)
       |  + max(CASE WHEN k = 2 THEN u END) + max(CASE WHEN k = 3 THEN u END)
       |  - 2::DOUBLE AS g FROM uu GROUP BY i, j),
       |vals AS (SELECT i, j, CAST($classMean + 0.25::DOUBLE * g AS FLOAT) AS v FROM gg),
       |rows_ AS (SELECT i,
       |    max(CASE WHEN j = 0 THEN v END) AS sepal_length,
       |    max(CASE WHEN j = 1 THEN v END) AS sepal_width,
       |    max(CASE WHEN j = 2 THEN v END) AS petal_length,
       |    max(CASE WHEN j = 3 THEN v END) AS petal_width,
       |    CAST(i % 3 AS INTEGER) AS target
       |  FROM vals GROUP BY i)
       |SELECT sepal_length, sepal_width, petal_length, petal_width, target
       |FROM rows_
       |ORDER BY sepal_length, sepal_width, petal_length, petal_width, target""".stripMargin
}
