package graft.operators

/** Corpus-adaptive SAX blocking for time-series similarity
  * (q_ts_similarity) — the de-cliffing of the fixed 6-symbol/3-letter
  * word flagged in rounds 9/10.
  *
  * Two cooperating keys keep expected block size bounded (~64 users)
  * at ANY corpus size, so candidate pairs grow linearly with users
  * instead of O(n^2 / 729):
  *
  * 1. WORD — the per-week deviation symbol generalizes from the sign
  *    (3 letters) to `b` magnitude bands per sign (2b+1 letters),
  *    where the band breakpoints are the |z|-quantiles of a standard
  *    normal (classic SAX discipline) evaluated integer-exactly:
  *    |z_i| >= t  <=>  d_i^2 * 1000 >= round(t^2*1000) * vx, with
  *    d_i = 6*w_i - sx and vx the user's own 6*sxx - sx^2 (so z is
  *    the user-normalized weekly deviation — level- AND
  *    variance-invariant). `b` steps up a ladder as the user count
  *    grows; b = 1 reproduces the original sign word byte-for-byte
  *    ('a' above mean, 'c' below, 'b' exactly at).
  * 2. VOL_BUCKET — an equi-depth bucket of the user's total volume
  *    sx, k = clamp(n/64, 1, 1024) buckets, built from a bounded
  *    1024-cell pre-histogram (the q_equi_depth_hist pattern: no
  *    global sort, the cumulative window runs over <= 1024 cells).
  *    k scales CONTINUOUSLY with n, which is what keeps 10x/20x
  *    probe ratios linear between the word ladder's discrete steps.
  *
  * Both engines consume SQL generated HERE from one constant table,
  * so the blocking is bit-identical by construction.
  */
object SaxBlocking {

  /** Per-mille squared |z|-quantile breakpoints of N(0,1) for b bands
    * per sign: band j (1-based) starts at the j/b quantile of |Z|.
    * round(Phi^-1((1+j/b)/2)^2 * 1000). b = 1 has no breakpoints —
    * pure sign. */
  val t2PerMille: Map[Int, Seq[Long]] = Map(
    1 -> Seq(),
    2 -> Seq(455L),
    3 -> Seq(186L, 936L),
    4 -> Seq(102L, 455L, 1323L),
    5 -> Seq(64L, 275L, 708L, 1642L),
    6 -> Seq(44L, 186L, 455L, 936L, 1913L),
    7 -> Seq(32L, 134L, 320L, 627L, 1140L, 2147L),
    8 -> Seq(25L, 102L, 239L, 455L, 787L, 1323L, 2354L))

  /** b steps up when the expected block size at the current alphabet
    * exceeds 64 even with the volume key at its 1024-bucket cap:
    * n > 64 * 1024 * (2b+1)^6. */
  private def pow6(x: Long): Long = x * x * x * x * x * x
  val ladder: Seq[(Int, Long)] = // (b, min-exclusive user count)
    (2 to 8).map(b => b -> 65536L * pow6(2L * (b - 1) + 1)).reverse

  /** CASE ladder selecting b from a user-count column. Valid in both
    * Spark SQL and DuckDB. */
  def bLadderSql(nCol: String): String =
    ladder.map { case (b, n) => s"WHEN $nCol > $n THEN $b" }
      .mkString("CASE ", " ", " ELSE 1 END")

  /** One week's symbol character for a given b, built from the
    * PRECOMPUTED columns d = 6*w - sx and q = d^2 * 1000 (wide
    * integer). Precomputing d/q keeps every comparison in the big
    * CASE a tiny column-vs-column test — the naive inline expansion
    * (each threshold re-expanding the decimal d^2 arithmetic)
    * overflows Janino's method limits and knocks the whole stage out
    * of codegen.
    * Symbol = chr(97 + b - sign(d) * (1 + band)), band = number of
    * breakpoints passed by q vs t2 * vx. */
  private def symbolSql(b: Int, d: String, q: String, vx: String,
      chr: String => String): String = {
    val band = t2PerMille(b) match {
      case Seq() => "0"
      case ts => ts.map(t =>
        s"(CASE WHEN $q >= $t * $vx THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
    }
    val sign = s"(CASE WHEN $d > 0 THEN 1 WHEN $d < 0 THEN -1 ELSE 0 END)"
    chr(s"97 + $b - $sign * (1 + $band)")
  }

  /** The full word expression: CASE on the b column, concat of the 6
    * weekly symbols, over precomputed dCols/qCols (paired by index). */
  def wordSql(bCol: String, dCols: Seq[String], qCols: Seq[String],
      vx: String, chr: String => String): String = {
    def word(b: Int) = dCols.zip(qCols)
      .map { case (d, q) => symbolSql(b, d, q, vx, chr) }
      .mkString("concat(", ", ", ")")
    val arms = (8 to 2 by -1).map(b => s"WHEN $bCol = $b THEN ${word(b)}")
    (arms :+ s"ELSE ${word(1)}").mkString("CASE ", " ", " END")
  }

  /** Spark flavor: chr() takes bigint. */
  def wordSqlSpark(bCol: String, dCols: Seq[String], qCols: Seq[String],
      vx: String): String =
    wordSql(bCol, dCols, qCols, vx, chr = e => s"chr($e)")

  /** DuckDB flavor: chr() needs INTEGER. */
  def wordSqlDuck(bCol: String, dCols: Seq[String], qCols: Seq[String],
      vx: String): String =
    wordSql(bCol, dCols, qCols, vx, chr = e => s"chr(CAST($e AS INTEGER))")
}
