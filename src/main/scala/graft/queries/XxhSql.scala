package graft.queries

/** DuckDB-SQL builders that replay Spark's XXH64 kernel bit-for-bit —
  * the machinery that upgrades the MinHash/SimHash family's registry
  * rows from rows-only to HASH-EXACT. Everything here emits plain SQL
  * text (no macros: the driver executes each oracle as ONE statement),
  * computed over HUGEINT (int128) with explicit mod-2^64 arithmetic:
  *
  *  - multiply-mod-2^64 splits the variable operand into 32-bit
  *    halves against literal constant halves (a 64×64 product would
  *    overflow int128);
  *  - rotations are shift-high + shift-low over disjoint bit ranges
  *    (so `+` IS the bitwise-or);
  *  - xor round-trips through UBIGINT (DuckDB's xor is not defined
  *    on HUGEINT; every value here is < 2^64 by construction).
  *
  * String hashing implements XXH64's SHORT path only (no 32-byte
  * stripe lanes), under the fixture contract the callers assert in
  * comments: ASCII text (byte = character, `ascii(s[i:i])` reads byte
  * i) and inputs < 32 bytes (3-word shingles max out at 26 bytes on
  * every shipped fixture; a longer shingle would make the oracle
  * DISAGREE loudly — a hash mismatch, never a silent pass). Validated
  * bit-for-bit against Spark's `xxhash64()` on string and long
  * reference vectors, and end-to-end by the d2/d3/d11/d15 rows.
  */
private[queries] object XxhSql {

  private val M64 = BigInt(1) << 64
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** (a * C) mod 2^64 for a column expression `a` (HUGEINT in
    * [0, 2^64)) and a CONSTANT C — C's 32-bit halves are literals, so
    * `a` appears three times and every partial product fits int128. */
  private def mulc(a: String, c: BigInt): String = {
    val lo = c % (BigInt(1) << 32)
    val hi = c / (BigInt(1) << 32)
    s"""((($a) % 4294967296) * $lo +
        (((($a) % 4294967296) * $hi + (($a) // 4294967296) * $lo)
         % 4294967296) * 4294967296) % 18446744073709551616"""
  }

  private def rotl(a: String, r: Int): String =
    s"""((($a) * ${BigInt(1) << r}) % 18446744073709551616 +
        (($a) // ${BigInt(1) << (64 - r)}))"""

  private def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  private def shr(a: String, r: Int): String =
    s"(($a) // ${BigInt(1) << r})"

  /** Little-endian 64-bit word of ASCII string column `s` at 1-based
    * byte offset `off`. */
  private def read64(s: String, off: Int): String =
    (0 until 8).map(k =>
        s"CAST(ascii($s[${off + k}:${off + k}]) AS HUGEINT) * ${BigInt(1) << (8 * k)}")
      .mkString("(", " + ", ")")

  /** Little-endian 32-bit word at a DYNAMIC 1-based offset expression. */
  private def read32(s: String, offExpr: String): String =
    (0 until 4).map(k =>
        s"CAST(ascii($s[($offExpr)+$k:($offExpr)+$k]) AS HUGEINT) * ${BigInt(1) << (8 * k)}")
      .mkString("(", " + ", ")")

  /** CTE cascade computing `hxx` = XXH64(sh, seed 42) (HUGEINT in
    * [0, 2^64)) for every row of `src`, which must expose the string
    * column `sh` plus `keyCols` (carried through verbatim). Emits CTE
    * names x0..xav — one cascade per statement. */
  def strHashCtes(src: String, keyCols: Seq[String]): String = {
    val kc = keyCols.mkString(", ")
    val steps = Seq.newBuilder[String]
    steps += s"""x0 AS (SELECT $kc, sh, CAST(length(sh) AS HUGEINT) AS n,
        (42 + $P5 + CAST(length(sh) AS HUGEINT))
          % 18446744073709551616 AS h FROM $src)"""
    // up to three conditional 8-byte rounds (inputs < 32 bytes):
    // k1 = rotl31(word*P2)*P1; h = rotl27(h ^ k1)*P1 + P4
    for ((w, off) <- Seq((1, 1), (2, 9), (3, 17))) {
      val prev = if (w == 1) "x0" else s"xw${w - 1}"
      steps += s"""xw$w AS (SELECT $kc, sh, n,
          CASE WHEN n >= ${off + 7} THEN
            (SELECT hh
             FROM (SELECT ${mulc(rotl(mulc(read64("sh", off), P2), 31), P1)}
                     AS k1) k,
                  LATERAL (SELECT (${mulc(rotl(xor("h", "k.k1"), 27), P1)}
                     + $P4) % 18446744073709551616 AS hh) t)
          ELSE h END AS h
        FROM $prev)"""
    }
    // optional 4-byte chunk: h = rotl23(h ^ read32*P1)*P2 + P3
    val o4 = "(8*(n//8)+1)"
    steps += s"""x4 AS (SELECT $kc, sh, n,
        CASE WHEN (n % 8) >= 4 THEN
          (${mulc(rotl(xor("h", mulc(read32("sh", o4), P1)), 23), P2)}
           + $P3) % 18446744073709551616
        ELSE h END AS h FROM xw3)"""
    // up to three tail bytes: h = rotl11(h ^ byte*P5)*P1
    val ob = "(8*(n//8) + CASE WHEN (n % 8) >= 4 THEN 4 ELSE 0 END)"
    for (t <- 0 until 3) {
      val prev = if (t == 0) "x4" else s"xb${t - 1}"
      val byteAt = s"CAST(ascii(sh[$ob+${t + 1}:$ob+${t + 1}]) AS HUGEINT)"
      steps += s"""xb$t AS (SELECT $kc, sh, n,
          CASE WHEN n >= $ob + ${t + 1} THEN
            ${mulc(rotl(xor("h", mulc(byteAt, P5)), 11), P1)}
          ELSE h END AS h FROM $prev)"""
    }
    steps += s"xa1 AS (SELECT $kc, sh, ${mulc(xor("h", shr("h", 33)), P2)} AS h FROM xb2)"
    steps += s"xa2 AS (SELECT $kc, sh, ${mulc(xor("h", shr("h", 29)), P3)} AS h FROM xa1)"
    steps += s"""xav AS (SELECT $kc, sh, ${xor("h", shr("h", 32))} AS hxx FROM xa2)"""
    steps.result().mkString(",\n")
  }

  /** One XXH64.hashLong round as a 5-CTE cascade: `outCol` =
    * XXH64(8 LE bytes of `lCol`, seed `seedCol`) for every row of
    * `src`, carrying `carry` columns. CTE names are `prefix`a-e. */
  def hashLongCtes(prefix: String, lCol: String, seedCol: String,
                   outCol: String, src: String,
                   carry: Seq[String]): String = {
    val c = carry.mkString(", ")
    s"""${prefix}a AS (SELECT $c,
          ((($seedCol) + $P5 + 8) % 18446744073709551616) AS h0,
          ${mulc(rotl(mulc(lCol, P2), 31), P1)} AS k1 FROM $src),
        ${prefix}b AS (SELECT $c,
          (${mulc(rotl(xor("h0", "k1"), 27), P1)} + $P4)
            % 18446744073709551616 AS h FROM ${prefix}a),
        ${prefix}c AS (SELECT $c, ${mulc(xor("h", shr("h", 33)), P2)} AS h
          FROM ${prefix}b),
        ${prefix}d AS (SELECT $c, ${mulc(xor("h", shr("h", 29)), P3)} AS h
          FROM ${prefix}c),
        ${prefix}e AS (SELECT $c, ${xor("h", shr("h", 32))} AS $outCol
          FROM ${prefix}d)"""
  }

  /** The full MinHash banding chain for the documents matching
    * `livePred` (a predicate over doc_id/text): CTEs ending in
    * `banded(id, band, bhash)` — per-document LSH band hashes
    * identical to graft.functions.MinHashBands. Consumes ONE
    * [[strHashCtes]] cascade (so one per statement): distinct 3-word
    * shingles → base = pmod(XXH64(shingle, 42), P) → 64
    * universal-hash minima (params = graft.ext.Dedup.hashParams,
    * spec constants shared with the Spark side) → 16 band hashes,
    * each XXH64-chained over its 4 signature slots from seed 42. */
  def minhashBandedCtes(livePred: String): String = {
    val P = 2147483647L
    val pvals = graft.ext.Dedup.hashParams.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val carry = Seq("id", "band", "m0", "m1", "m2", "m3")
    val chains = Seq(
      hashLongCtes("hL1", "CAST(m0 AS HUGEINT)", "CAST(42 AS HUGEINT)",
        "hb1", "bmat", carry),
      hashLongCtes("hL2", "CAST(m1 AS HUGEINT)", "hb1", "hb2", "hL1e",
        carry :+ "hb1"),
      hashLongCtes("hL3", "CAST(m2 AS HUGEINT)", "hb2", "hb3", "hL2e",
        carry :+ "hb2"),
      hashLongCtes("hL4", "CAST(m3 AS HUGEINT)", "hb3", "hb4", "hL3e",
        carry :+ "hb3")).mkString(",\n")
    s"""docsh AS (SELECT id, unnest(list_distinct(list_transform(
          range(0, GREATEST(len(tk)-3, 0)+1),
          i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))) AS sh
        FROM (SELECT doc_id AS id,
                string_split_regex(text, '\\s+') AS tk
              FROM documents WHERE $livePred)),
      ${strHashCtes("docsh", Seq("id"))},
      prm(i, a, b) AS (VALUES $pvals),
      hbase AS (SELECT id, CAST((((CASE WHEN hxx >= 9223372036854775808
              THEN hxx - 18446744073709551616 ELSE hxx END)
            % $P + $P) % $P) AS BIGINT) AS bse FROM xav),
      mins AS (SELECT id, prm.i, MIN((prm.a * bse + prm.b) % $P) AS mn
               FROM hbase, prm GROUP BY id, prm.i),
      bmat AS (SELECT id, i // 4 AS band,
                 MAX(CASE WHEN i % 4 = 0 THEN mn END) AS m0,
                 MAX(CASE WHEN i % 4 = 1 THEN mn END) AS m1,
                 MAX(CASE WHEN i % 4 = 2 THEN mn END) AS m2,
                 MAX(CASE WHEN i % 4 = 3 THEN mn END) AS m3
               FROM mins GROUP BY id, i // 4),
      $chains,
      banded AS (SELECT id, band,
          CAST(hb4 - CASE WHEN hb4 >= 9223372036854775808
                          THEN 18446744073709551616 ELSE 0 END
            AS BIGINT) AS bhash
        FROM hL4e)"""
  }

  /** The banded random-hyperplane LSH oracle (x3): the implicit
    * Rademacher sign matrix re-derived IN SQL from the same XXH64
    * kernel (`hashLong(d, 42+w)` over a 64-dim × word grid), the
    * per-(vector, hyperplane) projection as an ORDERED list_reduce
    * fold (left fold in dimension order — FP-add association matches
    * the Spark expression's sequential accumulation; a SQL SUM would
    * not), band values from the sign bits, the (band, bval) bucket
    * join under the cap, and the exact cosine verification
    * thresholded on the 4dp-rounded value. */
  def hyperplaneLshPairsOracle(threshold: Double, numBands: Int,
                               bandBits: Int, dim: Int = 64,
                               maxBucket: Int = 1024): String = {
    val g = numBands * bandBits
    val words = (g + 63) / 64
    val pw = (0 until 64).map(i => s"($i, ${BigInt(1) << i})")
      .mkString(", ")
    s"""WITH grid AS (SELECT d.d, w.w FROM unnest(range(0, $dim)) d(d),
            unnest(range(0, $words)) w(w)),
        ${hashLongCtes("hw", "CAST(d AS HUGEINT)",
          "CAST(42 + w AS HUGEINT)", "hxx", "grid", Seq("d", "w"))},
        pw(i, p) AS (VALUES $pw),
        signs AS (SELECT g.g, hw.d,
            CASE WHEN (hxx // p) % 2 = 1 THEN 1.0 ELSE -1.0 END AS s
          FROM unnest(range(0, $g)) g(g)
          JOIN hwe hw ON hw.w = g.g // 64
          JOIN pw ON pw.i = g.g % 64),
        sg AS (SELECT g, list(s ORDER BY d) AS sl FROM signs GROUP BY g),
        vecs AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
        accs AS (SELECT id, g // $bandBits AS band, g % $bandBits AS j,
            list_reduce(list_transform(range(1, ${dim + 1}),
              d -> sl[d] * v[d]), (a, b) -> a + b) AS acc
          FROM vecs, sg),
        bvals AS (SELECT id, band,
            CAST(SUM(CASE WHEN acc > 0 THEN (1::BIGINT << j)
                          ELSE 0 END) AS BIGINT) AS bval
          FROM accs GROUP BY id, band),
        bkt AS (SELECT band, bval, COUNT(*) AS c FROM bvals
                GROUP BY band, bval),
        cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
            FROM bvals l JOIN bvals r ON l.band = r.band
              AND l.bval = r.bval AND l.id < r.id
            JOIN bkt ON bkt.band = l.band AND bkt.bval = l.bval
              AND bkt.c > 1 AND bkt.c <= $maxBucket),
        cosv AS (SELECT id_a, id_b,
            ${Q.sqlRoundDet(
              """list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v)))""", 4)} AS cosine
          FROM cand JOIN vecs a ON a.id = id_a
                    JOIN vecs b ON b.id = id_b)
        SELECT id_a, id_b, cosine FROM cosv
        WHERE cosine >= $threshold ORDER BY id_a, id_b"""
  }

  /** Distinct-shingle lists per document (`shl`) for the exact-
    * Jaccard verification side, over documents matching `pred`. */
  def shingleListCtes(name: String, pred: String): String =
    s"""$name AS (SELECT doc_id AS id, list_distinct(list_transform(
          range(0, GREATEST(len(tk)-3, 0)+1),
          i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shl
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tk
              FROM documents WHERE $pred))"""

  /** Rounded exact shingle Jaccard of `shl`-bearing aliases a/b —
    * |A∩B| / |A∪B| over already-distinct lists, rounded 4dp exactly
    * as graft.ext.Dedup's verifier (single division of exact small
    * integers: correctly rounded in both engines). */
  def sqlJaccard4dp: String =
    Q.sqlRoundDet(
      """CAST(len(list_filter(a.shl, x -> list_contains(b.shl, x)))
           AS DOUBLE)
         / CAST(len(a.shl) + len(b.shl)
                - len(list_filter(a.shl, x -> list_contains(b.shl, x)))
           AS DOUBLE)""", 4)
}
