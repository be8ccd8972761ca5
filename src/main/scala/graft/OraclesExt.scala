package graft

/** DuckDB oracle SQL for [[SparkEntry.queries]], continued — the
  * sketch-at-rest / layout / maintenance / stream families, split from
  * Oracles.scala so each registry file stays reviewable. Every entry is
  * byte-identical to its pre-split form; keys must keep matching the
  * `queries` registry (RegistrySpec key parity enforces it).
  */
private[graft] object OraclesExt {
  import Oracles.{duckCrossPairs, duckShingles, duckBm25, duckSeriesTopk,
    duckAnnTopk, duckCompLabels, duckScore}

  def sql: Map[String, String] = Map(
    // moments slices merge by pure addition, so the at-rest rollup
    // oracles as the direct GROUP BY with the same binning arithmetic;
    // n_chars is integral → sums are exact doubles → no rounding at all
    "sketch_moments" ->
      """WITH x AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
        |), h AS (
        |  SELECT lang, v,
        |    CASE WHEN v IS NULL THEN NULL
        |         WHEN v < 0.0 THEN 0
        |         WHEN v >= 2000.0 THEN 9
        |         ELSE CAST(FLOOR((v - 0.0) / 250.0) AS INT) + 1 END AS b
        |  FROM x)
        |SELECT lang, COUNT(v) AS n,
        |  CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v*v) AS BIGINT) AS s2,
        |  CAST(MIN(v) AS BIGINT) AS mn, CAST(MAX(v) AS BIGINT) AS mx,
        |  SUM(v) / COUNT(v) AS mean,
        |  SUM(v*v) / COUNT(v) - (SUM(v) / COUNT(v)) * (SUM(v) / COUNT(v)) AS variance,
        |  CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h_under,
        |  CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |  CAST(SUM(CASE WHEN b = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
        |  CAST(SUM(CASE WHEN b = 9 THEN 1 ELSE 0 END) AS BIGINT) AS h_over
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin,
    // MG summaries at full counter capacity ARE the exact count table
    // (never overcount + nothing to decrement), so the at-rest rollup
    // oracles as the plain GROUP BY ranking
    // ledgered exact counts compressed at read: arrival form cannot move
    // them, so the streamed top-k shares q_mg_topk's oracle verbatim
    "stream_mg_topk" ->
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS c FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, user_id, c, ROW_NUMBER() OVER (
        |    PARTITION BY event_type ORDER BY c DESC, user_id) AS rnk
        |  FROM c
        |)
        |SELECT event_type, rnk, user_id, c FROM r WHERE rnk <= 10
        |ORDER BY event_type, rnk""".stripMargin,
    "q_mg_topk" ->
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS c FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, user_id, c, ROW_NUMBER() OVER (
        |    PARTITION BY event_type ORDER BY c DESC, user_id) AS rnk
        |  FROM c
        |)
        |SELECT event_type, rnk, user_id, c FROM r WHERE rnk <= 10
        |ORDER BY event_type, rnk""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '\s+', ' ', 'g'))) AS digest,
        |  CAST(strlen(trim(regexp_replace(lower(nfc_normalize(text)),
        |    '\s+', ' ', 'g'))) AS INT) AS n_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    // global time rank cut into 5 equal-count folds by integer division;
    // emb = the preceding fold when the row sits within 1800 s of its
    // close (left join to the k-row fold-close table)
    "q_purged_folds" ->
      """WITH r AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts,
        |    ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM events
        |), f AS (
        |  SELECT event_id, ts, (rn * 5) // n AS fold FROM r
        |), hi AS (
        |  SELECT fold, MAX(ts) AS hi FROM f GROUP BY fold
        |)
        |SELECT f.event_id, f.fold,
        |  CASE WHEN h.hi IS NOT NULL AND epoch(f.ts) <= epoch(h.hi) + 1800
        |       THEN f.fold - 1 END AS emb
        |FROM f LEFT JOIN hi h ON h.fold = f.fold - 1
        |ORDER BY f.event_id""".stripMargin,
    "q96_folds" ->
      """SELECT CAST(LEAST(4, FLOOR(
        |    CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
        |      / 4294967296.0 * 5)) AS BIGINT) AS fold,
        |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
        |  COUNT(DISTINCT source) AS n_src
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q95_skew" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT SUM(n) AS t FROM c)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(n * 1000000 // t.t AS BIGINT) AS ppm
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "stream_static" ->
      """SELECT CAST(user_id % 3 AS INT) AS segment, event_type,
        |  COUNT(*) AS n
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q93_psi" ->
      """WITH b AS (
        |  SELECT GREATEST(-1, LEAST(20,
        |      CAST(FLOOR(value / 25.0) AS BIGINT))) AS bin,
        |    COUNT(*) AS n_before
        |  FROM events WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-15'
        |  GROUP BY 1
        |), a AS (
        |  SELECT GREATEST(-1, LEAST(20,
        |      CAST(FLOOR(value / 25.0) AS BIGINT))) AS bin,
        |    COUNT(*) AS n_after
        |  FROM events WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-15'
        |  GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(b.bin, a.bin) AS bin,
        |    COALESCE(n_before, 0) AS n_before, COALESCE(n_after, 0) AS n_after
        |  FROM b FULL OUTER JOIN a ON b.bin = a.bin
        |), tot AS (SELECT SUM(n_before) AS tb, SUM(n_after) AS ta FROM j)
        |SELECT j.bin, CAST(j.n_before AS BIGINT) AS n_before,
        |  CAST(j.n_after AS BIGINT) AS n_after,
        |  ROUND(((n_before + 0.5) / (tb + 11.0) - (n_after + 0.5) / (ta + 11.0))
        |    * ln(((n_before + 0.5) / (tb + 11.0))
        |          / ((n_after + 0.5) / (ta + 11.0))), 9) AS contrib
        |FROM j CROSS JOIN tot ORDER BY bin""".stripMargin,
    "q94_shards" ->
      """WITH w AS (
        |  SELECT doc_id, s,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(s AS VARCHAR)), 1, 8)) AS BIGINT) AS wt
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS s)
        |), pick AS (
        |  SELECT doc_id, CAST(s AS INT) AS shard,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |                       ORDER BY wt DESC, s DESC) AS rn
        |  FROM w
        |)
        |SELECT shard, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM pick WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q89_fuzzy" ->
      """WITH n AS (
        |  SELECT p_name AS nm, MIN(p_partkey) AS id FROM part GROUP BY 1
        |)
        |SELECT a.id AS i, b.id AS j,
        |  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |FROM n a JOIN n b
        |  ON a.id < b.id AND levenshtein(a.nm, b.nm) <= 2
        |ORDER BY 1, 2""".stripMargin,
    "q103_entity" ->
      """WITH RECURSIVE n AS (
        |  SELECT p_name AS nm, MIN(p_partkey) AS id FROM part GROUP BY 1
        |), p AS (
        |  SELECT a.id AS i, b.id AS j FROM n a JOIN n b
        |  ON a.id < b.id AND levenshtein(a.nm, b.nm) <= 2
        |), e(a, b) AS (
        |  SELECT i, j FROM p UNION SELECT j, i FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), comp AS (
        |  SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
        |), lab AS (
        |  SELECT n.nm, COALESCE(c.comp, n.id) AS comp
        |  FROM n LEFT JOIN comp c ON n.id = c.id
        |), canon AS (SELECT comp, MIN(nm) AS canon FROM lab GROUP BY 1)
        |SELECT lab.nm, canon.canon FROM lab JOIN canon USING (comp)
        |ORDER BY nm""".stripMargin,
    "q90_qnorm" ->
      """WITH v AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT value AS gv, ROW_NUMBER() OVER (ORDER BY value) - 1 AS gid
        |  FROM v
        |), nn AS (SELECT COUNT(*) AS n FROM v),
        |r AS (
        |  SELECT event_type,
        |    RANK() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS ng
        |  FROM v
        |), p AS (
        |  SELECT event_type, rk * (nn.n - 1) // GREATEST(ng - 1, 1) AS pos
        |  FROM r, nn
        |)
        |SELECT p.event_type, ROUND(g.gv, 6) AS qn, COUNT(*) AS c
        |FROM p JOIN g ON p.pos = g.gid
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q88_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS lo,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) + CAST(FLOOR(value) AS BIGINT)
        |      AS hi
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |)
        |SELECT a.user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(a.event_id + b.event_id) AS BIGINT) AS pair_sum
        |FROM iv a JOIN iv b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND a.lo <= b.hi AND b.lo <= a.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_cooc" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), pos0 AS (
        |  SELECT doc_id, toks,
        |    CAST(unnest(generate_series(1, len(toks))) AS INT) AS i
        |  FROM base
        |), pos AS (
        |  SELECT doc_id, i, toks[i] AS tok FROM pos0
        |)
        |SELECT a.tok AS x, b.tok AS y, COUNT(*) AS c
        |FROM pos a JOIN pos b
        |  ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 3
        |GROUP BY 1, 2 HAVING COUNT(*) >= 50
        |ORDER BY c DESC, x, y LIMIT 30""".stripMargin,
    "text_chunks" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), st0 AS (
        |  SELECT doc_id, toks,
        |    CAST(unnest(generate_series(1, GREATEST(len(toks), 1), 6)) AS INT)
        |      AS s
        |  FROM base
        |)
        |SELECT doc_id, CAST((s - 1) / 6 AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(toks, s, s + 8 - 1)) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(list_slice(toks, s, s + 8 - 1), ' ')) AS digest
        |FROM st0 ORDER BY doc_id, chunk_id""".stripMargin,
    "text_pmi" ->
      """WITH base AS (
        |  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), bi AS (
        |  SELECT unnest([toks[i] || ' ' || toks[i+1]
        |                 for i in range(1, len(toks))]) AS bg
        |  FROM base WHERE len(toks) >= 2
        |), uni AS (SELECT unnest(toks) AS tok FROM base),
        |bcnt AS (
        |  SELECT string_split(bg, ' ')[1] AS x, string_split(bg, ' ')[2] AS y,
        |    COUNT(*) AS cxy
        |  FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM uni) AS nt,
        |               (SELECT CAST(COUNT(*) AS DOUBLE) FROM bi) AS nb)
        |SELECT b.x, b.y, b.cxy,
        |  ROUND(LN(CAST(b.cxy AS DOUBLE) * t.nt * t.nt
        |           / (t.nb * ux.c * uy.c)), 6) AS pmi
        |FROM bcnt b
        |JOIN ucnt ux ON ux.tok = b.x
        |JOIN ucnt uy ON uy.tok = b.y
        |CROSS JOIN tot t
        |ORDER BY pmi DESC, x, y LIMIT 20""".stripMargin,
    "text_diversity" ->
      """WITH tc AS (
        |  SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT), 6) AS ttr,
        |  ROUND(LN(CAST(SUM(c) AS DOUBLE))
        |        - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
        |          / CAST(SUM(c) AS DOUBLE), 6) AS entropy
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
        |                   ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7]
        |                   for i in range(1, len(l)-6)]) AS s
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS l
        |        FROM documents)
        |), hold AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 5)
        |SELECT sh.doc_id, CAST(COUNT(DISTINCT hold.g) AS BIGINT) AS n_shared
        |FROM sh JOIN hold ON list_contains(sh.s, hold.g)
        |WHERE sh.doc_id % 10 <> 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_despan" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    [struct_pack(pos := i, g := l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
        |     ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7])
        |     for i in range(1, len(l) - 6)] AS gs
        |  FROM base
        |), tall AS (
        |  SELECT doc_id, u.pos AS pos, u.g AS g
        |  FROM (SELECT doc_id, unnest(gs) AS u FROM sh)
        |), hold AS (SELECT DISTINCT g FROM tall WHERE doc_id % 10 = 5),
        |hits AS (
        |  SELECT t.doc_id, t.pos FROM tall t JOIN hold h ON t.g = h.g
        |  WHERE t.doc_id % 10 <> 5
        |), cov AS (
        |  SELECT doc_id, list(DISTINCT j) AS js
        |  FROM (SELECT doc_id, unnest(range(pos, pos + 8)) AS j FROM hits)
        |  GROUP BY doc_id
        |)
        |SELECT b.doc_id, CAST(len(cov.js) AS BIGINT) AS n_removed,
        |  md5(COALESCE(array_to_string(
        |    [b.l[k] for k in range(1, len(b.l) + 1)
        |     if NOT list_contains(cov.js, k)], ' '), '')) AS clean_digest
        |FROM base b JOIN cov ON b.doc_id = cov.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    // keep-first self-dedup: like text_despan but the "holdout" is each
    // gram's own first (min doc_id) occurrence
    "text_selfdedup" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    [struct_pack(pos := i, g := l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '
        |     ||l[i+4]||' '||l[i+5]||' '||l[i+6]||' '||l[i+7])
        |     for i in range(1, len(l) - 6)] AS gs
        |  FROM base
        |), tall AS (
        |  SELECT doc_id, u.pos AS pos, u.g AS g
        |  FROM (SELECT doc_id, unnest(gs) AS u FROM sh)
        |), rep AS (
        |  SELECT g, MIN(doc_id) AS first_doc
        |  FROM tall GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
        |), hits AS (
        |  SELECT t.doc_id, t.pos FROM tall t JOIN rep r ON t.g = r.g
        |  WHERE t.doc_id <> r.first_doc
        |), cov AS (
        |  SELECT doc_id, list(DISTINCT j) AS js
        |  FROM (SELECT doc_id, unnest(range(pos, pos + 8)) AS j FROM hits)
        |  GROUP BY doc_id
        |)
        |SELECT b.doc_id, CAST(len(cov.js) AS BIGINT) AS n_removed,
        |  md5(COALESCE(array_to_string(
        |    [b.l[k] for k in range(1, len(b.l) + 1)
        |     if NOT list_contains(cov.js, k)], ' '), '')) AS clean_digest
        |FROM base b JOIN cov ON b.doc_id = cov.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q51_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q, COUNT(*) AS c
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q50_unpivot" ->
      """SELECT metric, ROUND(SUM(v), 2) AS sv, COUNT(*) AS c FROM (
        |  SELECT 'l_quantity' AS metric, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_lateral" ->
      """SELECT o.o_orderkey, l.l_linenumber, l.p
        |FROM orders o,
        |LATERAL (
        |  SELECT l_linenumber, ROUND(l_extendedprice, 2) AS p
        |  FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber
        |  LIMIT 2
        |) l
        |WHERE o.o_orderkey < 200
        |ORDER BY o.o_orderkey, l.p DESC, l.l_linenumber""".stripMargin,
    "q48_window_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |  ROUND(CUME_DIST() OVER w, 6) AS cd,
        |  NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_top
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q46_hash_split" ->
      """SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
        |            ELSE 'val' END AS split,
        |  COUNT(*) AS n, MIN(doc_id) AS mn, MAX(doc_id) AS mx
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q47_corpus_prep" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents
         |), feat AS (
         |  SELECT doc_id, text, toks,
         |    ${duckScore("en")} AS s_en, ${duckScore("es")} AS s_es,
         |    ${duckScore("fr")} AS s_fr, ${duckScore("de")} AS s_de
         |  FROM base
         |), scored AS (
         |  SELECT doc_id, text,
         |    CASE
         |      WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |      WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
         |      WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
         |      WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
         |      WHEN s_de > 0 THEN 'de'
         |      ELSE 'und'
         |    END AS lang,
         |    len(toks) AS n_tokens,
         |    ROUND(
         |      CASE WHEN len(toks) >= 10 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END * 0.4
         |      + (CASE WHEN length(text) = 0 THEN 0.0
         |              ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         |                   / length(text) END) * 0.2
         |      + (CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE CAST(len(list_filter(toks, t -> list_contains(
         |                ['the','a','of','and','to','is','el','la','de','los','que','y',
         |                 'le','et','les','des','un','der','die','und','das','ist','ein'],
         |                t))) AS DOUBLE) / len(toks) END) * 0.2
         |      + (CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END) * 0.2,
         |      3) AS q
         |  FROM feat
         |), filtered AS (
         |  SELECT doc_id, text, q FROM scored WHERE lang = 'en' AND n_tokens >= 10
         |), survivors AS (
         |  SELECT text, q, MIN(doc_id) AS doc_id FROM filtered GROUP BY text, q
         |), tagged AS (
         |  SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
         |              ELSE 'val' END AS split,
         |    doc_id, q
         |  FROM survivors
         |)
         |SELECT split, COUNT(*) AS n, MIN(doc_id) AS mn, MAX(doc_id) AS mx,
         |  ROUND(AVG(q), 3) AS avg_q
         |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // horizon covers the bounded fixture => equals exact dedup
    "stream_dedup_wm" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // cumulative streamed pairs == full corpus closure (batch-boundary
    // invariance — see streamIndexDedup)
    "stream_index_dedup" -> duckShingles,
    "q33_sql_text" ->
      """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tok,
        |  CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER) AS has_spark,
        |  array_to_string(string_split(text, ' ')[1:3], '|') AS head3,
        |  string_split(text, ' ')[-1] AS last_tok,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q37_map_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
        |  CAST(len(json_keys(props)) AS INTEGER) AS nk
        |FROM events ORDER BY event_id""".stripMargin,
    "q38_month_agg" ->
      """SELECT CAST(FLOOR(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS mo,
        |  ROUND(SUM(o_totalprice), 2) AS tot, COUNT(*) AS c
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_string_funcs" ->
      """SELECT c_custkey,
        |  trim(lower(c_name)) AS lname,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  length(c_name) AS len,
        |  reverse(c_mktsegment) AS rseg
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin,
    "q40_topk_agg" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q35_union_all" ->
      """SELECT k, COUNT(*) AS c FROM (
        |  SELECT CAST(c_nationkey AS INTEGER) AS k FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS INTEGER) AS k FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_datediff" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "stream_state" ->
      """SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_tws" ->
      """SELECT user_id, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin,
    "stream_left_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c LEFT JOIN events p
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |WHERE c.event_type = 'click'
        |ORDER BY click_id, purchase_id""".stripMargin,
    "stream_sliding" ->
      """SELECT CAST(FLOOR(epoch(ts) / 300) * 300 - i.i * 300 AS BIGINT) AS ws,
        |  COUNT(*) AS c
        |FROM events, (SELECT 0 AS i UNION ALL SELECT 1) i
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e
        |)
        |SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS ss,
        |  COUNT(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, ss""".stripMargin,
    "q26_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q27_lag_diff" ->
      """SELECT event_id,
        |  ROUND(value - LAG(value, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), 2) AS dv
        |FROM events ORDER BY event_id""".stripMargin,
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n FROM documents
        |GROUP BY text ORDER BY doc_id""".stripMargin,
    "dedup_minhash" -> duckShingles,
    // R-S join: strictly one member per side (sides are id-disjoint, so
    // no a < b tie-break is needed)
    "dedup_cross" -> duckCrossPairs,
    // the persistent screen answers the same cross question from parquet
    // (i = probe doc < 400, j = benchmark doc >= 400) — and the streamed
    // probe's cumulative pairs are arrival-form blind against a static
    // index, so all three share the oracle; the rebuild cycle cannot
    // move pairs either (the shared order is pruning, not semantics)
    "dedup_screen_index" -> duckCrossPairs,
    "dedup_screen_rebuild" -> duckCrossPairs,
    "stream_screen" -> duckCrossPairs,
    "dedup_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |    len(list_intersect(a.s, b.s)) * 1.0
        |      / len(list_distinct(a.s || b.s)) AS jac
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |)
        |SELECT i, j, ROUND(jac, 3) AS jac FROM pj
        |WHERE jac >= 0.8 AND j >= 400
        |ORDER BY i, j""".stripMargin,
    // the persistent-index probe answers the same question as
    // dedup_incremental (same split, same geometry) — shared oracle
    "dedup_index" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |    len(list_intersect(a.s, b.s)) * 1.0
        |      / len(list_distinct(a.s || b.s)) AS jac
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |)
        |SELECT i, j, ROUND(jac, 3) AS jac FROM pj
        |WHERE jac >= 0.8 AND j >= 400
        |ORDER BY i, j""".stripMargin,
    "dedup_corpus" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.s, b.s)) * 1.0
        |        / len(list_distinct(a.s || b.s)) >= 0.8
        |), e(a, b) AS (
        |  SELECT i, j FROM pj UNION SELECT j, i FROM pj
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS c FROM reach GROUP BY a
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> c)
        |ORDER BY doc_id""".stripMargin,
    "dedup_quality" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.s, b.s)) * 1.0
        |        / len(list_distinct(a.s || b.s)) >= 0.8
        |), e(a, b) AS (
        |  SELECT i, j FROM pj UNION SELECT j, i FROM pj
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS c FROM reach GROUP BY a
        |), ranked AS (
        |  SELECT comp.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY comp.c
        |                       ORDER BY d.n_chars DESC, comp.doc_id) AS rn
        |  FROM comp JOIN documents d ON d.doc_id = comp.doc_id
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
        |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" -> duckShingles,
    "dedup_ngram" -> duckShingles,
    "dedup_embedding" ->
      """SELECT a.vec_id AS i, b.vec_id AS j,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 3) AS sim
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.95
        |ORDER BY i, j""".stripMargin,
    // semantic dedup in exact mode (nClusters = 1): survivors of the
    // brute-force cosine-closure at 0.45 — min id per reachability
    // component plus every unpaired vector. 0.45 sits inside the
    // fixture's same-label cosine band (14 pairs at sf0.01, 144 at
    // sf0.1) so the oracle actually discriminates — at the near-dup
    // thresholds the embedding fixture has NO pairs and the check
    // would be vacuous
    "dedup_semantic" ->
      """WITH RECURSIVE pj AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])) >= 0.45
        |), e(a, b) AS (
        |  SELECT i, j FROM pj UNION SELECT j, i FROM pj
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), losers AS (
        |  SELECT a AS vec_id FROM reach GROUP BY a HAVING LEAST(a, MIN(b)) <> a
        |)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
        |ORDER BY vec_id""".stripMargin,
    // shared by the incremental and streaming component queries: both
    // must equal the batch reachability closure — arrival-form
    // invariance IS the contract, so the oracle is identical
    "dedup_components_index" -> duckCompLabels,
    "stream_components" -> duckCompLabels,
    // the retraction cycle: the same reachability closure, recomputed
    // over the pair set with every pair touching the min pair doc removed
    // (mirrors EntryDedup.dedupComponentsRebuild's retract-then-rebuild)
    "dedup_components_rebuild" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |    list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        |                   for i in range(1, len(l)-1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |), pj0 AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |    AND len(list_intersect(a.s, b.s)) * 1.0
        |        / len(list_distinct(a.s || b.s)) >= 0.8
        |), pj AS (
        |  SELECT i, j FROM pj0
        |  WHERE i <> (SELECT MIN(i) FROM pj0)
        |    AND j <> (SELECT MIN(i) FROM pj0)
        |), e(a, b) AS (
        |  SELECT i, j FROM pj UNION SELECT j, i FROM pj
        |), reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |)
        |SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,
    "dedup_embedding_index" ->
      """WITH batch AS (
        |  SELECT vec_id + 10000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id < 10
        |), allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM batch
        |)
        |SELECT a.vec_id AS i, b.vec_id AS j,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 3) AS sim
        |FROM allv a, allv b
        |WHERE a.vec_id < b.vec_id AND b.vec_id >= 10000
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.95
        |ORDER BY i, j""".stripMargin,
    // rebuild changes the LSH geometry, never the answers: the planted
    // bit-identical clones are found at recall 1 under ANY key width, so
    // the maintenance cycle shares the stored-index probe's oracle
    "dedup_embedding_rebuild" ->
      """WITH batch AS (
        |  SELECT vec_id + 10000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id < 10
        |), allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM batch
        |)
        |SELECT a.vec_id AS i, b.vec_id AS j,
        |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 3) AS sim
        |FROM allv a, allv b
        |WHERE a.vec_id < b.vec_id AND b.vec_id >= 10000
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.95
        |ORDER BY i, j""".stripMargin,
    "ann_topk" -> duckAnnTopk,
    "ann_ivf" -> duckAnnTopk,
    // continuous-ingest ANN: half the corpus streamed in through
    // appendStream — full probing is exhaustive, so arrival form cannot
    // change the answers and the brute-force oracle is shared
    "stream_ann" -> duckAnnTopk,
    "stream_series" -> duckSeriesTopk,
    "stream_bm25" -> duckBm25,
    "ann_ivf_index" -> duckAnnTopk,
    // the retrain cycle changes the quantizer, never the answers at full
    // probing: search at nprobe = nClusters is brute force over
    // corpus ∪ the closed-form shifted cluster the query appended
    "ann_ivf_retrain" ->
      """WITH shifted AS (
        |  SELECT 10000 + i AS vec_id,
        |    list_transform(range(0, 64, 1),
        |      d -> 25.0 + ((10000 + i) % 7) * 0.3 + d * 0.01) AS embedding
        |  FROM range(0, 500, 1) t(i)
        |), allv AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
        |  FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM shifted
        |), q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM allv
        |  WHERE vec_id IN (0, 1, 2, 10000, 10001)
        |), scored AS (
        |  SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
        |    list_cosine_similarity(a.embedding, q.qv) AS sim
        |  FROM allv a, q WHERE a.vec_id <> q.qid
        |), ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM scored
        |)
        |SELECT query_id, rnk, neighbor_id, ROUND(sim, 3) AS sim
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // ann_pq stays rows-only by measured necessity — see the annPq
    // scaladoc: the fixture's near-uniform embeddings leave inter-rank
    // gaps (0.5–2 %) below the reconstruction error of ANY non-degenerate
    // codebook, so no tolerance oracle exists for ADC ranks here.
    "text_langid" ->
      s"""SELECT doc_id,
         |  CASE
         |    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
         |    WHEN s_es >= s_fr AND s_es >= s_de AND s_es > 0 THEN 'es'
         |    WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
         |    WHEN s_de > 0 THEN 'de'
         |    ELSE 'und'
         |  END AS pred_lang
         |FROM (
         |  SELECT doc_id, text,
         |    ${duckScore("en")} AS s_en, ${duckScore("es")} AS s_es,
         |    ${duckScore("fr")} AS s_fr, ${duckScore("de")} AS s_de
         |  FROM (SELECT doc_id, text,
         |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |        FROM documents)
         |) ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(n_tok AS BIGINT) AS n_tokens,
        |  ROUND(alpha_ratio, 3) AS alpha_ratio,
        |  ROUND(stop_ratio, 3) AS stopword_ratio,
        |  ROUND(distinct_ratio, 3) AS distinct_ratio,
        |  ROUND(len_ok * 0.4 + alpha_ratio * 0.2 + stop_ratio * 0.2
        |        + distinct_ratio * 0.2, 3) AS quality_score
        |FROM (
        |  SELECT doc_id,
        |    len(toks) AS n_tok,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |              / length(text) END AS alpha_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(toks, t -> list_contains(
        |                ['the','a','of','and','to','is','el','la','de','los','que','y',
        |                 'le','et','les','des','un','der','die','und','das','ist','ein'],
        |                t))) AS DOUBLE) / len(toks) END AS stop_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END
        |      AS distinct_ratio,
        |    CASE WHEN len(toks) >= 10 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END
        |      AS len_ok
        |  FROM (SELECT doc_id, text,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |        FROM documents)
        |) ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split(text, ' '), t -> t <> ''))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_bm25" -> duckBm25,
    "text_bm25_index" -> duckBm25,
    // positional-index oracles: re-tokenize (single-space split, empties
    // dropped — the TF.tokens convention) with 1-based positions and
    // replay adjacency/proximity as positional self-joins
    "text_phrase" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(lf) AS tok, unnest(range(1, len(lf)+1)) AS pos
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS lf
        |        FROM documents))
        |SELECT a.doc_id, COUNT(*) AS n_matches
        |FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.tok = 'table' AND b.tok = 'part'
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    "text_snippet" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(lf) AS tok, unnest(range(1, len(lf)+1)) AS pos
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS lf
        |        FROM documents)),
        |d AS (SELECT doc_id,
        |        list_filter(string_split(text, ' '), t -> t <> '') AS lf
        |      FROM documents),
        |m AS (SELECT a.doc_id, MIN(a.pos) AS s0
        |      FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |      WHERE a.tok = 'table' AND b.tok = 'part'
        |      GROUP BY a.doc_id)
        |SELECT m.doc_id,
        |  array_to_string(d.lf[GREATEST(s0 - 2, 1):LEAST(s0 + 3, len(d.lf))],
        |    ' ') AS snippet
        |FROM m JOIN d USING (doc_id) ORDER BY m.doc_id""".stripMargin,
    "text_near" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(lf) AS tok, unnest(range(1, len(lf)+1)) AS pos
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), t -> t <> '') AS lf
        |        FROM documents))
        |SELECT a.doc_id, MIN(ABS(a.pos - b.pos)) AS gap
        |FROM tk a JOIN tk b ON a.doc_id = b.doc_id
        |WHERE a.tok = 'spark' AND b.tok = 'vector'
        |GROUP BY a.doc_id HAVING MIN(ABS(a.pos - b.pos)) <= 3
        |ORDER BY a.doc_id""".stripMargin,
    "text_spans" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), spans AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+9], ' ')
        |            for i in range(1, len(toks) - 8)]) AS ngram
        |  FROM base
        |)
        |SELECT ngram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
        |FROM spans GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1
        |ORDER BY n_docs DESC, n_occ DESC, ngram LIMIT 20""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9][0-9()\s.-]{7,}[0-9]', '<PHONE>', 'g')) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_lm_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg
        |  FROM base
        |), bgw AS (
        |  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg
        |), c12 AS (SELECT bg, COUNT(*) AS c12 FROM bgw GROUP BY 1),
        |uni AS (SELECT unnest(toks) AS w FROM base),
        |c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM uni)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(AVG(ln(CAST(c12.c12 + 1 AS DOUBLE) / (c1.c1 + v.v))), 6) AS avg_logp
        |FROM bgw JOIN c12 USING (bg) JOIN c1 ON bgw.w1 = c1.w CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the oracle is the PLANTED LABEL RULE: the trained classifier's
    // hard predictions hash-match only if logistic GD on hashed
    // bag-of-words actually learned the signal to 100% train accuracy
    "text_quality_model" ->
      """SELECT doc_id,
        |  CASE WHEN list_contains(string_split(text, ' '), 'spark')
        |       THEN 1 ELSE 0 END AS pred
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_dsir" ->
      """SELECT doc_id FROM documents
        |WHERE list_contains(string_split(text, ' '), 'spark')
        |ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id,
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |     for i in range(1, len(toks) - 1)] AS g
        |  FROM base
        |), dup AS (
        |  SELECT doc_id,
        |    ROUND(CASE WHEN len(g) = 0 THEN 0.0
        |               ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
        |          END, 6) AS dup_3gram_frac
        |  FROM gr
        |), tf AS (
        |  SELECT doc_id, t, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT doc_id,
        |    ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_frac
        |  FROM tf GROUP BY 1
        |)
        |SELECT dup.doc_id, dup_3gram_frac, top_token_frac
        |FROM dup JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT d.doc_id, lower(u.t) AS term
        |  FROM documents d, unnest(string_split_regex(d.text, '\s+')) AS u(t)
        |  WHERE regexp_matches(u.t, '^[A-Za-z0-9]+$')
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df) DESC,
        |        tf.term ASC) AS rnk
        |  FROM tf JOIN dfx USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, rnk, term, ROUND(score, 4) AS score
        |FROM ranked WHERE rnk <= 3 AND doc_id < 30
        |ORDER BY doc_id, rnk""".stripMargin,
    "mm_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // bit-exact replay of the whole image near-dup path: the same
    // integer pixel generator -> Rec.601 luma (x1000, no division) ->
    // 9x8 cell sums -> cross-multiplied dHash comparisons -> per-band
    // xor/bit_count Hamming, as brute-force SQL (the banded Spark join
    // has EXACT recall at Hamming <= 3 over 4 bands, by pigeonhole);
    // P6 encode/decode is the identity on pixels, so the decode
    // round-trip drops out of the arithmetic
    "mm_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS j
        |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 48)
        |),
        |px AS (
        |  SELECT i.doc_id, i.j, x.range AS x, y.range AS y,
        |    i.j // 3 AS seed, i.j % 3 AS variant
        |  FROM ids i, range(36) x, range(32) y
        |),
        |lum AS (
        |  SELECT doc_id, j, (y * 8) // 32 AS gy, (x * 9) // 36 AS gx,
        |    299 * ((seed * 7919 + x * 31 + y * 17) % 200
        |      + CASE WHEN variant = 1 THEN 40 ELSE 0 END
        |      + CASE WHEN variant = 2 AND x < 4 AND y < 4 THEN 50 ELSE 0 END)
        |    + 587 * ((seed * 104729 + x * 13 + y * 29) % 200
        |      + CASE WHEN variant = 1 THEN 40 ELSE 0 END)
        |    + 114 * ((seed * 1299709 + x * 37 + y * 11) % 200
        |      + CASE WHEN variant = 1 THEN 40 ELSE 0 END) AS l
        |  FROM px
        |),
        |cells AS (
        |  SELECT doc_id, j, gy, gx, CAST(SUM(l) AS BIGINT) AS s, COUNT(*) AS c
        |  FROM lum GROUP BY doc_id, j, gy, gx
        |),
        |bits AS (
        |  SELECT a.doc_id, a.j, a.gy * 8 + a.gx AS k,
        |    CASE WHEN a.s * b.c < b.s * a.c THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b
        |    ON a.j = b.j AND a.gy = b.gy AND b.gx = a.gx + 1
        |),
        |hashes AS (
        |  SELECT doc_id, j,
        |    CAST(SUM(CASE WHEN k < 16 THEN bit << k ELSE 0 END) AS BIGINT) AS b0,
        |    CAST(SUM(CASE WHEN k >= 16 AND k < 32 THEN bit << (k - 16) ELSE 0 END) AS BIGINT) AS b1,
        |    CAST(SUM(CASE WHEN k >= 32 AND k < 48 THEN bit << (k - 32) ELSE 0 END) AS BIGINT) AS b2,
        |    CAST(SUM(CASE WHEN k >= 48 THEN bit << (k - 48) ELSE 0 END) AS BIGINT) AS b3
        |  FROM bits GROUP BY doc_id, j
        |)
        |SELECT h1.doc_id AS a, h2.doc_id AS b,
        |  CAST(bit_count(xor(h1.b0, h2.b0)) + bit_count(xor(h1.b1, h2.b1))
        |     + bit_count(xor(h1.b2, h2.b2)) + bit_count(xor(h1.b3, h2.b3)) AS BIGINT) AS hamming
        |FROM hashes h1 JOIN hashes h2 ON h1.j < h2.j
        |WHERE bit_count(xor(h1.b0, h2.b0)) + bit_count(xor(h1.b1, h2.b1))
        |    + bit_count(xor(h1.b2, h2.b2)) + bit_count(xor(h1.b3, h2.b3)) <= 3
        |ORDER BY a, b""".stripMargin,
    // bit-exact replay of the audio near-dup path: the same integer
    // amplitude envelope -> per-window energy (64 exact frames per
    // window, so the cross-multiplied energy comparison reduces to
    // A_k^2 < A_{k+1}^2) -> 64 comparison bits -> per-band
    // xor/bit_count Hamming, as brute-force SQL (the banded Spark join
    // has EXACT recall at Hamming <= 3 over 4 bands, by pigeonhole);
    // 16-bit PCM encode/decode is the identity on samples, so the WAV
    // round-trip drops out of the arithmetic — the mm_dedup precedent
    "mm_audio_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) - 1 AS j
        |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 48)
        |),
        |amps AS (
        |  SELECT i.doc_id, i.j, w.range AS w,
        |    ((i.j // 4 * 7919 + w.range * 104729
        |       + (i.j // 4) * w.range * 337) % 6000 + 2000
        |      + CASE WHEN i.j % 4 = 3 AND w.range = 0 THEN 3000 ELSE 0 END)
        |    * CASE WHEN i.j % 4 = 2 THEN 2 ELSE 1 END AS a
        |  FROM ids i, range(65) w
        |),
        |bits AS (
        |  SELECT x.doc_id, x.j, x.w AS k,
        |    CASE WHEN x.a * x.a < y.a * y.a THEN 1 ELSE 0 END AS bit
        |  FROM amps x JOIN amps y ON x.j = y.j AND y.w = x.w + 1
        |),
        |hashes AS (
        |  SELECT doc_id, j,
        |    CAST(SUM(CASE WHEN k < 16 THEN bit << k ELSE 0 END) AS BIGINT) AS b0,
        |    CAST(SUM(CASE WHEN k >= 16 AND k < 32 THEN bit << (k - 16) ELSE 0 END) AS BIGINT) AS b1,
        |    CAST(SUM(CASE WHEN k >= 32 AND k < 48 THEN bit << (k - 32) ELSE 0 END) AS BIGINT) AS b2,
        |    CAST(SUM(CASE WHEN k >= 48 THEN bit << (k - 48) ELSE 0 END) AS BIGINT) AS b3
        |  FROM bits GROUP BY doc_id, j
        |)
        |SELECT h1.doc_id AS a, h2.doc_id AS b,
        |  CAST(bit_count(xor(h1.b0, h2.b0)) + bit_count(xor(h1.b1, h2.b1))
        |     + bit_count(xor(h1.b2, h2.b2)) + bit_count(xor(h1.b3, h2.b3)) AS BIGINT) AS hamming
        |FROM hashes h1 JOIN hashes h2 ON h1.j < h2.j
        |WHERE bit_count(xor(h1.b0, h2.b0)) + bit_count(xor(h1.b1, h2.b1))
        |    + bit_count(xor(h1.b2, h2.b2)) + bit_count(xor(h1.b3, h2.b3)) <= 3
        |ORDER BY a, b""".stripMargin,
    // three latest-wins merge waves compose to a deterministic per-key
    // CASE: evens carry the deepest bump that reached them (mod 8 wins
    // over mod 4), odds arrive once with their original value — arrival
    // ORDER is pinned by the fixture, so the replay is closed-form
    "stream_merge" ->
      """WITH merged AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 8 = 0 THEN value + 2000
        |         WHEN event_id % 4 = 0 THEN value + 1000
        |         ELSE value END AS value
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the widened table = all events, flag non-null only on the appended
    // odds (null for the pre-evolution evens) — when(flag) counts only
    // true, so the replay is one CASE over the same arithmetic
    "q_schema_evolve" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v,
        |  CAST(SUM(CASE WHEN event_id % 2 = 1 AND event_id % 3 = 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS flagged
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // snapshots are plain row subsets of the source: v1 = the evens the
    // table was created from, v2 = everything after the append
    "q_time_travel" ->
      """SELECT 'v1' AS snap, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS v
        |FROM events WHERE event_id % 2 = 0 GROUP BY event_type
        |UNION ALL
        |SELECT 'v2' AS snap, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY event_type
        |ORDER BY snap, event_type""".stripMargin,
    // delete-wave stream_merge: w1 tombstones the ≡2 (mod 8), w2 the
    // ≡4 (mod 8) it had just bumped, and re-bumps the multiples of 8 to
    // +2000 (latest-wins REPLACE, not increment) — survivors and values
    // are closed-form over the pinned arrival order
    "stream_merge_delete" ->
      """WITH merged AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 8 = 0 THEN value + 2000 ELSE value END AS value
        |  FROM events
        |  WHERE event_id % 2 = 0 AND event_id % 8 <> 2 AND event_id % 8 <> 4
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the consumed change feed folds to the head-minus-base diff (the
    // query body require()s exact equality with Ingest.diff), and the
    // fixture's three commits are closed-form: %8==0 changed (+2000 if
    // %16==0, latest-wins, else +1000), %8 in (2,4) removed at base
    // value, odd multiples of 3 added
    "stream_table_cdf" ->
      """WITH changed AS (
        |  SELECT 'changed' AS status, event_type,
        |    value + CASE WHEN event_id % 16 = 0 THEN 2000 ELSE 1000 END AS val
        |  FROM events WHERE event_id % 8 = 0
        |), removed AS (
        |  SELECT 'removed' AS status, event_type, value AS val
        |  FROM events WHERE event_id % 8 = 2 OR event_id % 8 = 4
        |), added AS (
        |  SELECT 'added' AS status, event_type, value AS val
        |  FROM events WHERE event_id % 2 = 1 AND event_id % 3 = 0
        |)
        |SELECT status, event_type, COUNT(*) AS n, ROUND(SUM(val), 2) AS v
        |FROM (SELECT * FROM changed UNION ALL SELECT * FROM removed
        |      UNION ALL SELECT * FROM added)
        |GROUP BY status, event_type ORDER BY status, event_type""".stripMargin,
    // the streamed feed is the per-commit slices verbatim, so every
    // (commit, change_type) group is closed-form: seq 1 = merge A
    // (update pre at base value / post at +1000 on %8==0, delete %8==2),
    // seq 2 = the append's file-diff inserts (odd multiples of 3),
    // seq 3 = the compaction — ABSENT from both sides (it feeds
    // nothing), seq 4 = merge B (pre at +1000 / post at +2000 on
    // %16==0, delete %8==4 at base value)
    "stream_table_changes" ->
      """WITH base AS (
        |  SELECT event_id, value FROM events WHERE event_id % 2 = 0
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS commit_seq, 'delete' AS change_type,
        |    COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |  FROM base WHERE event_id % 8 = 2
        |  UNION ALL
        |  SELECT 1, 'update_preimage', COUNT(*), ROUND(SUM(value), 2)
        |  FROM base WHERE event_id % 8 = 0
        |  UNION ALL
        |  SELECT 1, 'update_postimage', COUNT(*), ROUND(SUM(value + 1000), 2)
        |  FROM base WHERE event_id % 8 = 0
        |  UNION ALL
        |  SELECT 2, 'insert', COUNT(*), ROUND(SUM(value), 2)
        |  FROM events WHERE event_id % 2 = 1 AND event_id % 3 = 0
        |  UNION ALL
        |  SELECT 4, 'delete', COUNT(*), ROUND(SUM(value), 2)
        |  FROM base WHERE event_id % 8 = 4
        |  UNION ALL
        |  SELECT 4, 'update_preimage', COUNT(*), ROUND(SUM(value + 1000), 2)
        |  FROM base WHERE event_id % 16 = 0
        |  UNION ALL
        |  SELECT 4, 'update_postimage', COUNT(*), ROUND(SUM(value + 2000), 2)
        |  FROM base WHERE event_id % 16 = 0
        |) ORDER BY commit_seq, change_type""".stripMargin,
    // merge-with-deletes is the same set algebra with the tombstoned
    // keys EXCLUDED instead of re-inserted: one CASE bumps the low
    // stripe's multiples of 8, one WHERE drops its ≡4 (mod 8); // is
    // integer division, matching Scala Long '/' on positives
    "q_merge_delete" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |merged AS (
        |  SELECT e.event_type,
        |    CASE WHEN e.event_id < mx.m // 4 AND e.event_id % 8 = 0
        |         THEN e.value + 1000 ELSE e.value END AS value
        |  FROM events e, mx
        |  WHERE NOT (e.event_id < mx.m // 4 AND e.event_id % 8 = 4)
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the persisted row-level slice is pure set algebra over the fixture:
    // stored multiples of 8 emit update_preimage (stored value) +
    // update_postimage (+1000), stored ≡2 (mod 8) emit delete at the
    // stored value, the odd multiples of 3 — keys the even-only table
    // does not hold — emit insert (+500); per-row value+c is exact IEEE
    // on both engines, no rounding
    "q_merge_cdf" ->
      """WITH base AS (
        |  SELECT event_id, value FROM events WHERE event_id % 2 = 0
        |)
        |SELECT event_id, change_type, val FROM (
        |  SELECT event_id, 'delete' AS change_type, value AS val
        |  FROM base WHERE event_id % 8 = 2
        |  UNION ALL
        |  SELECT event_id, 'update_preimage', value
        |  FROM base WHERE event_id % 8 = 0
        |  UNION ALL
        |  SELECT event_id, 'update_postimage', value + 1000
        |  FROM base WHERE event_id % 8 = 0
        |  UNION ALL
        |  SELECT event_id, 'insert', value + 500
        |  FROM events WHERE event_id % 2 = 1 AND event_id % 3 = 0
        |) ORDER BY event_id, change_type""".stripMargin,
    // conditional merge is one CASE over the gate's arithmetic: matched
    // multiples of 8 pass s.value > t.value (+1000 lands on value ONLY —
    // event_type is outside updateCols, so the stored one survives), the
    // ≡4 (mod 8) rows fail (−1000) and ride through unchanged, the odd
    // multiples of 5 insert with the batch's own event_type
    "q_merge_cond" ->
      """WITH merged AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 8 = 0 THEN value + 1000 ELSE value END AS value
        |  FROM events WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT 'fresh' AS event_type, value
        |  FROM events WHERE event_id % 2 = 1 AND event_id % 5 = 0
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // predicate DELETE is set algebra: survivors = NOT(low quarter AND
    // value < 250); // is integer division, matching Scala Long '/' on
    // positives, and NULL-predicate rows are kept on both engines
    "q_delete_where" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |kept AS (
        |  SELECT e.event_type, e.value FROM events e, mx
        |  WHERE NOT (e.event_id <= mx.m // 4 AND e.value < 250.0)
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM kept GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the SQL-text DELETE routes through the catalog onto the same
    // rewrite as q_delete_where: same set algebra, same oracle
    "q_sql_delete" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |kept AS (
        |  SELECT e.event_type, e.value FROM events e, mx
        |  WHERE NOT (e.event_id <= mx.m // 4 AND e.value < 250.0)
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM kept GROUP BY event_type ORDER BY event_type""".stripMargin,
    // SQL-text UPDATE: q_update_where's CASE arithmetic verbatim
    "q_sql_update" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN e.event_id >= (3 * mx.m) // 4
        |                  AND e.user_id % 3 = 0
        |                 THEN e.value * 2 + 7 ELSE e.value END), 2) AS v
        |FROM events e, mx
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // ALTER TABLE changes policies, never answers: the post-ALTER
    // UPDATE is q_update_where's arithmetic verbatim
    "q_sql_alter" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN e.event_id >= (3 * mx.m) // 4
        |                  AND e.user_id % 3 = 0
        |                 THEN e.value * 2 + 7 ELSE e.value END), 2) AS v
        |FROM events e, mx
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // CALL compact/history/vacuum are row-preserving maintenance: the
    // oracle is the plain aggregate
    "q_sql_call" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // SQL time travel changes syntax, never snapshots: q_time_travel's
    // two-snapshot UNION verbatim (v1 = the evens, head = everything)
    "q_sql_timetravel" ->
      """SELECT 'v1' AS snap, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS v
        |FROM events WHERE event_id % 2 = 0 GROUP BY event_type
        |UNION ALL
        |SELECT 'v2' AS snap, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY event_type
        |ORDER BY snap, event_type""".stripMargin,
    // SYNC merge (matched update + unmatched insert + not-matched-by-
    // source delete) makes the table EQUAL the source: every multiple
    // of 3 at value + 1000 — a full sync IS replacement
    "q_sql_merge_sync" ->
      """WITH synced AS (
        |  SELECT event_type, value + 1000 AS value
        |  FROM events WHERE event_id % 3 = 0
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM synced GROUP BY event_type ORDER BY event_type""".stripMargin,
    // composite-key merge: (event_id, event_type) tuples — multiples of
    // 3 under their own type update (+1000), multiples of 5 under the
    // shifted type are UNMATCHED tuples and insert iff value >= 100
    // (the conditional wing); same CASE + filtered-UNION set algebra
    "q_sql_merge2" ->
      """WITH upd AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 3 = 0 THEN value + 1000 ELSE value END
        |      AS value
        |  FROM events),
        |ins AS (
        |  SELECT event_type || '_x' AS event_type, value
        |  FROM events WHERE event_id % 5 = 0 AND value >= 100.0),
        |allr AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM allr GROUP BY event_type ORDER BY event_type""".stripMargin,
    // CDC apply as ONE two-matched-clause MERGE: multiples of 3 delete,
    // remaining multiples of 4 update to value+1000, multiples of 5
    // re-insert under fresh shifted keys (original images), phantom
    // deletes no-op — the tombstone-excluding replay
    "q_sql_merge_cdc" ->
      """WITH kept AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 4 = 0 THEN value + 1000 ELSE value END
        |      AS value
        |  FROM events WHERE event_id % 3 <> 0),
        |ins AS (SELECT event_type, value FROM events WHERE event_id % 5 = 0),
        |allr AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM allr GROUP BY event_type ORDER BY event_type""".stripMargin,
    // accumulate merge (SET value = t.value + s.delta) is one CASE of
    // the same arithmetic: multiples of 3 add (event_id % 7) + 0.5
    // (exact IEEE per row), everything else unchanged
    "q_sql_merge_acc" ->
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN event_id % 3 = 0
        |                 THEN value + (event_id % 7) + 0.5
        |                 ELSE value END), 2) AS v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // ALTER TABLE ADD COLUMN changes declared shape, never stored rows:
    // q_schema_evolve's CASE oracle verbatim (flag = odd multiples of 3;
    // pre-evolution evens read NULL = unflagged)
    "q_sql_evolve" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v,
        |  CAST(SUM(CASE WHEN event_id % 2 = 1 AND event_id % 3 = 0
        |                THEN 1 ELSE 0 END) AS BIGINT) AS flagged
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // CALL zorder / predicate-scoped compact are row-preserving
    // relayouts: the oracle is the plain aggregate
    "q_sql_zorder" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // OR pruning is a performance hint — the engine re-applies the
    // exact predicate, so the oracle is the plain OR-filtered aggregate
    "q_table_sql_or" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events)
        |SELECT e.event_type, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS v
        |FROM events e, mx
        |WHERE e.event_id <= mx.m // 8 OR e.event_id >= mx.m - mx.m // 8
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // SQL-text MERGE: multiples of 3 update to value+1000 (latest
    // batch image), multiples of 5 re-insert under fresh shifted keys
    "q_sql_merge" ->
      """WITH upd AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 3 = 0 THEN value + 1000 ELSE value END
        |      AS value
        |  FROM events),
        |ins AS (SELECT event_type, value FROM events WHERE event_id % 5 = 0),
        |allr AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM allr GROUP BY event_type ORDER BY event_type""".stripMargin,
    // predicate UPDATE is one CASE over the same arithmetic: the high
    // quarter's user_id ≡ 0 (mod 3) rows take value*2+7 (both exact
    // IEEE per row), everything else is unchanged
    "q_update_where" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN e.event_id >= (3 * mx.m) // 4
        |                  AND e.user_id % 3 = 0
        |                 THEN e.value * 2 + 7 ELSE e.value END), 2) AS v
        |FROM events e, mx
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // the SQL read path serves the pinned snapshot (the evens) with the
    // pushed filter applied exactly — pruning is a hint the engine
    // re-checks, so the oracle is the plain filtered aggregate
    "q_table_sql" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events)
        |SELECT e.event_type, COUNT(*) AS n, ROUND(SUM(e.value), 2) AS v
        |FROM events e, mx
        |WHERE e.event_id % 2 = 0 AND e.event_id <= mx.m // 4
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // a shallow clone shares the source's rows by reference, then the
    // clone's merge bumps ITS multiples of 8 while the source stays
    // untouched — both sides are the same closed-form set algebra
    "q_table_clone" ->
      """WITH base AS (
        |  SELECT event_type, event_id, value FROM events WHERE event_id % 2 = 0
        |)
        |SELECT 'clone' AS side, event_type, COUNT(*) AS n,
        |  ROUND(SUM(CASE WHEN event_id % 8 = 0 THEN value + 1000
        |            ELSE value END), 2) AS v
        |FROM base GROUP BY event_type
        |UNION ALL
        |SELECT 'src' AS side, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS v
        |FROM base GROUP BY event_type
        |ORDER BY side, event_type""".stripMargin,
    // the commit log is fixed by the fixture: create, CDC merge,
    // predicate delete, stripe compaction — operations at their versions
    "q_table_history" ->
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'create'),
        |  (2, 'merge'), (3, 'delete'), (4, 'compact'))
        |  AS t(version, operation)
        |ORDER BY version""".stripMargin,
    // the replica equals the source head (the body require()s it
    // row-for-row), and the head is closed-form: %8==0 bumped +1000,
    // %8==2 tombstoned, odd multiples of 3 appended, compaction a no-op
    "stream_table_replicate" ->
      """WITH merged AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 8 = 0 THEN value + 1000 ELSE value END AS value
        |  FROM events WHERE event_id % 2 = 0 AND event_id % 8 <> 2
        |  UNION ALL
        |  SELECT event_type, value FROM events
        |  WHERE event_id % 2 = 1 AND event_id % 3 = 0
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // merge is deterministic set algebra — (table minus batch keys) plus
    // the batch — so it replays as CASE + UNION ALL over the identical
    // arithmetic; // is integer division, matching Scala Long '/' on
    // positives, and the inserted ids are disjoint from every stored id
    "q_merge" ->
      """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
        |merged AS (
        |  SELECT e.event_type,
        |    CASE WHEN e.event_id < mx.m // 8 THEN e.value + 1000
        |         ELSE e.value END AS value
        |  FROM events e, mx WHERE e.event_id % 4 <> 0
        |  UNION ALL
        |  SELECT event_type, value FROM events WHERE event_id % 4 = 0
        |)
        |SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM merged GROUP BY event_type ORDER BY event_type""".stripMargin,
    // every GraftTable mutation is row-preserving (append unions, zorder
    // and compact relayout, vacuum touches only unreferenced files) and
    // pruning is conservative with the exact predicate re-applied on
    // read, so the whole lifecycle oracles as the plain filtered agg
    "q_table" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events
        |WHERE value BETWEEN 150 AND 650 AND user_id BETWEEN 10 AND 30
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_table" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events
        |WHERE user_id BETWEEN 25 AND 65
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the sink front door drains the same waves into the same lifecycle:
    // stream_table's oracle verbatim
    "stream_table_sink" ->
      """SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events
        |WHERE user_id BETWEEN 25 AND 65
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_tumbling" ->
      """SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS h, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)
}

