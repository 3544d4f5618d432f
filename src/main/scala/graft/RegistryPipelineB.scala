package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.er.EntityResolution
import graft.functions.GeoFunctions
import graft.functions.TextFunctions
import graft.functions.UrlFunctions
import graft.operators._
import graft.sources.Sources
import graft.staging.CityAssignment
import graft.RegistryCore._

/** LLM-pipeline rows: ANN / classifiers / capstones (part 2 of 2) (split from the former single-file SparkEntry registry;
  * rows and oracles are unchanged). */
private[graft] object PipelineRegistryB {
  val rows: Seq[Q] = Seq(
    // Corpus TF-IDF: per-document top term under smoothed idf
    Q("ta_tfidf",
      (s, dir) => TextAnalysis.tfidfTop(t(s, dir, "documents"),
        "doc_id", "text"),
      Some(s"""WITH toks AS ($toksSql),
              |tf AS (SELECT id, t_ AS term, count(*) AS tf
              |       FROM (SELECT id, unnest(tk) AS t_ FROM toks)
              |       GROUP BY id, t_),
              |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |n AS (SELECT count(*) AS n FROM documents),
              |scored AS (
              |  SELECT tf.id, tf.term,
              |    tf.tf * (ln((n.n + 1e0) / (dfreq.df + 1e0)) + 1e0) AS s
              |  FROM tf JOIN dfreq USING (term), n),
              |ranked AS (SELECT *, row_number() OVER (PARTITION BY id
              |    ORDER BY s DESC, term ASC) AS rn FROM scored)
              |SELECT id AS doc_id, term AS top_term, round(s, 4) AS tfidf
              |FROM ranked WHERE rn = 1""".stripMargin)),

    // TA: hashing-trick feature vectorizer — signed token counts folded
    // into a fixed bucket space (Weinberger et al. 2009), the
    // no-dictionary text featurizer. Sparse output; integer-exact
    // md5-prefix hashes on both engines, one partial-agg shuffle.
    Q("ta_hash_features",
      (s, dir) => TextAnalysis.hashFeatures(
          t(s, dir, "documents"), "doc_id", "text", numBuckets = 64)
        .select(col("id").as("doc_id"), col("bucket"), col("feat")),
      Some(s"""WITH toks AS ($toksSql),
              |t AS (SELECT id, unnest(tk) AS tok FROM toks),
              |h AS (
              |  SELECT id,
              |    ${h32Sql("tok", "0")} % 64 AS bucket,
              |    CASE WHEN (${h32Sql("tok", "1")} & 1) = 1
              |      THEN 1 ELSE -1 END AS sign
              |  FROM t)
              |SELECT id AS doc_id, bucket,
              |  CAST(sum(sign) AS BIGINT) AS feat
              |FROM h GROUP BY id, bucket""".stripMargin)),

    // Inverted-index build: per-term document frequency + capped sorted
    // posting head. Distinct (term, doc) pairs partial-aggregate before
    // the per-term shuffle; the collect is capped so no term's posting
    // list materializes unbounded state (same discipline as a3/a11).
    Q("ta_postings",
      (s, dir) => t(s, dir, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("term"),
          col("doc_id"))
        .distinct()
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          array_join(transform(
            slice(array_sort(collect_list(col("doc_id"))), 1, 5),
            x => x.cast("string")), ",").as("posting_head")),
      Some(s"""WITH toks AS ($toksSql),
              |pairs AS (SELECT DISTINCT id, t_ AS term
              |          FROM (SELECT id, unnest(tk) AS t_ FROM toks)),
              |ranked AS (SELECT term, id, row_number() OVER (
              |    PARTITION BY term ORDER BY id) AS rn FROM pairs)
              |SELECT term, count(*) AS df,
              |  string_agg(CASE WHEN rn <= 5 THEN CAST(id AS VARCHAR) END,
              |    ',' ORDER BY id) AS posting_head
              |FROM ranked GROUP BY term""".stripMargin)),

    // Rolling-hash document fingerprint
    Q("ta_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp")),
      Some(s"""WITH toks AS ($toksSql)
              |SELECT id AS doc_id,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(tk, t -> ${h32Sql("t", "7")})),
              |    (acc_, h_) -> (acc_ * 1000003 + h_) % 2147483647) AS fp
              |FROM toks""".stripMargin)),

    // Token-window document chunking: 64-token windows, 16-token overlap
    // (stride 48), tail kept, one chunk for short/empty docs
    Q("ta_chunk",
      (s, dir) => TextAnalysis.chunk(t(s, dir, "documents"), "doc_id",
        "text", chunkSize = 64, overlap = 16),
      Some(s"""WITH toks AS ($toksSql),
              |c AS (SELECT id, tk, CASE WHEN len(tk) <= 64 THEN 1
              |  ELSE CAST(ceil((len(tk) - 64) / 48e0) AS INT) + 1 END AS nc
              |  FROM toks),
              |e AS (SELECT id, tk, unnest(range(0, nc)) AS i FROM c)
              |SELECT id AS doc_id, i::BIGINT AS chunk_id,
              |  len(tk[i*48+1 : i*48+64])::BIGINT AS n_tokens,
              |  array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text
              |FROM e""".stripMargin)),

    // jusText-shaped HTML main-text extraction — the missing FIRST stage
    // of a real web-corpus pipeline: strip script/style/comments, split
    // on block tags, keep blocks by length + link density, decode
    // entities, join with newlines. The fixture wraps each document in a
    // full synthesized page (nav, ads, chrome, a <div> hidden inside the
    // script) and both engines render AND extract independently — so the
    // check covers the extraction semantics, not a fixture replay. All
    // codegen'd built-ins: one narrow map over the scan, no UDF.
    Q("ta_html_extract",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.htmlExtract(
            synthHtmlCol(col("doc_id"), col("text"))).as("text")),
      Some(s"""WITH h AS (SELECT doc_id, $synthHtmlSql AS html
              |          FROM documents)
              |SELECT doc_id, ${htmlExtractSql("html")} AS text
              |FROM h""".stripMargin)),

    // Deterministic dataset mixing: per-source sampling fractions decided
    // by a seeded key hash — same rows make the cut on any cluster or
    // partitioning (df.sample's per-partition RNG cannot promise that),
    // and the oracle replays the identical integer arithmetic.
    Q("ds_mix_sample",
      (s, dir) => Sampling.mixBySource(t(s, dir, "documents"), "doc_id",
          "source", Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25,
            "src3" -> 0.1), seed = 7)
        .select("doc_id", "source", "lang"),
      Some(s"""SELECT doc_id, source, lang FROM documents
              |WHERE ${h32Sql("doc_id::VARCHAR", "7")} % 1000000 <
              |  CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000
              |    WHEN 'src2' THEN 250000 WHEN 'src3' THEN 100000
              |    ELSE -1 END""".stripMargin)),

    // DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    // bag-of-buckets log-likelihood ratio between a target exemplar
    // class (source = src0) and the raw pool, deterministic top-k keep.
    // The oracle refits both smoothed multinomials and replays the
    // quantized weight + (w desc, id asc) selection.
    Q("ds_dsir_select",
      (s, dir) => Sampling.dsirSelect(t(s, dir, "documents"), "doc_id",
        "text", col("source") === "src0", numBuckets = 64, k = 25),
      Some(s"""WITH toks AS ($toksSql),
              |g AS (
              |  SELECT id, unnest(list_concat(tk,
              |    list_transform(range(0, greatest(len(tk) - 1, 0)),
              |      i -> tk[i+1] || ' ' || tk[i+2]))) AS gram
              |  FROM toks),
              |dc AS (
              |  SELECT g.id, ${h32Sql("gram", "0")} % 64 AS bucket,
              |    count(*) AS c
              |  FROM g GROUP BY 1, 2),
              |lab AS (SELECT doc_id AS id,
              |          CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS tgt
              |        FROM documents),
              |cb AS (SELECT tgt, bucket, sum(c) AS n
              |       FROM dc JOIN lab USING (id) GROUP BY 1, 2),
              |tot AS (SELECT tgt, sum(n) AS nn FROM cb GROUP BY 1),
              |dom AS (SELECT unnest(range(0, 64)) AS bucket),
              |ratio AS (
              |  SELECT dom.bucket,
              |    ln((coalesce(t.n, 0) + 1)::DOUBLE / (tt.nn + 64)) -
              |    ln((coalesce(r.n, 0) + 1)::DOUBLE / (rt.nn + 64)) AS lr
              |  FROM dom
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 1) t
              |    ON dom.bucket = t.bucket
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 0) r
              |    ON dom.bucket = r.bucket,
              |  (SELECT nn FROM tot WHERE tgt = 1) tt,
              |  (SELECT nn FROM tot WHERE tgt = 0) rt),
              |wsum AS (
              |  SELECT dc.id, sum(dc.c * ratio.lr) AS wraw
              |  FROM dc JOIN ratio USING (bucket) GROUP BY dc.id),
              |wq AS (
              |  SELECT d.doc_id,
              |    coalesce(floor(wraw * 1e6 + 5e-1) / 1e6 + 0e0, 0e0) AS w
              |  FROM documents d LEFT JOIN wsum ON d.doc_id = wsum.id),
              |ranked AS (
              |  SELECT doc_id, w, row_number() OVER (
              |    ORDER BY w DESC, doc_id ASC) AS rn
              |  FROM wq)
              |SELECT doc_id, w,
              |  CASE WHEN rn <= 25 THEN 1 ELSE 0 END AS selected
              |FROM ranked""".stripMargin)),

    // DSIR with the paper's actual Gumbel RESAMPLING: selection key =
    // importance weight + seeded-hash Gumbel noise (-ln(-ln(u)), u from
    // the keyedCut integer uniform) — Gumbel-top-k IS sampling without
    // replacement proportional to softmax(w), and the seeded hash keeps
    // it deterministic and oracle-replayable.
    Q("ds_dsir_sample",
      (s, dir) => Sampling.dsirSelect(t(s, dir, "documents"), "doc_id",
        "text", col("source") === "src0", numBuckets = 64, k = 25,
        gumbelSeed = Some(11)),
      Some(s"""WITH toks AS ($toksSql),
              |g AS (
              |  SELECT id, unnest(list_concat(tk,
              |    list_transform(range(0, greatest(len(tk) - 1, 0)),
              |      i -> tk[i+1] || ' ' || tk[i+2]))) AS gram
              |  FROM toks),
              |dc AS (
              |  SELECT g.id, ${h32Sql("gram", "0")} % 64 AS bucket,
              |    count(*) AS c
              |  FROM g GROUP BY 1, 2),
              |lab AS (SELECT doc_id AS id,
              |          CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS tgt
              |        FROM documents),
              |cb AS (SELECT tgt, bucket, sum(c) AS n
              |       FROM dc JOIN lab USING (id) GROUP BY 1, 2),
              |tot AS (SELECT tgt, sum(n) AS nn FROM cb GROUP BY 1),
              |dom AS (SELECT unnest(range(0, 64)) AS bucket),
              |ratio AS (
              |  SELECT dom.bucket,
              |    ln((coalesce(t.n, 0) + 1)::DOUBLE / (tt.nn + 64)) -
              |    ln((coalesce(r.n, 0) + 1)::DOUBLE / (rt.nn + 64)) AS lr
              |  FROM dom
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 1) t
              |    ON dom.bucket = t.bucket
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 0) r
              |    ON dom.bucket = r.bucket,
              |  (SELECT nn FROM tot WHERE tgt = 1) tt,
              |  (SELECT nn FROM tot WHERE tgt = 0) rt),
              |wsum AS (
              |  SELECT dc.id, sum(dc.c * ratio.lr) AS wraw
              |  FROM dc JOIN ratio USING (bucket) GROUP BY dc.id),
              |wq AS (
              |  SELECT d.doc_id,
              |    coalesce(floor(wraw * 1e6 + 5e-1) / 1e6 + 0e0, 0e0) AS w
              |  FROM documents d LEFT JOIN wsum ON d.doc_id = wsum.id),
              |keyed AS (
              |  SELECT doc_id, w,
              |    floor((w - ln(-ln(
              |      ((${h32Sql("doc_id::VARCHAR", "11")} % 1000000)::DOUBLE
              |        + 5e-1) / 1e6))) * 1e6 + 5e-1) / 1e6 + 0e0
              |      AS sel_key
              |  FROM wq),
              |ranked AS (
              |  SELECT doc_id, w, sel_key, row_number() OVER (
              |    ORDER BY sel_key DESC, doc_id ASC) AS rn
              |  FROM keyed)
              |SELECT doc_id, w, sel_key,
              |  CASE WHEN rn <= 25 THEN 1 ELSE 0 END AS selected
              |FROM ranked""".stripMargin)),

    // Curriculum-style quality binning: ntile quartiles over the composite
    // quality score (deterministic tie order by doc_id)
    Q("ds_quality_bins",
      (s, dir) => {
        // exchange barrier: the interpreted quality HOF must materialize
        // BEFORE the global ntile sort, or projection collapse re-evaluates
        // it through the window (measured ~10x on the corpus)
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
          .repartition(col("doc_id"))
        // distributed exact ntile: a bare NTILE() OVER (ORDER BY ...) is a
        // single-partition window — the one 100x bottleneck this registry
        // had left; globalNtile keeps the sort range-partitioned
        graft.operators.Ranking.globalNtile(d, 4,
            Seq(col("quality").desc, col("doc_id").asc), "bin")
          .select(col("doc_id"), col("quality"), col("bin"))
      },
      Some(s"""WITH toks AS ($toksSql),
              |q AS (SELECT id AS doc_id, ${qualitySql("text", "tk")} AS quality
              |      FROM toks)
              |SELECT doc_id, quality,
              |  CAST(ntile(4) OVER (ORDER BY quality DESC, doc_id ASC) AS INT)
              |    AS bin
              |FROM q""".stripMargin)),

    // Sequence packing for training: docs fill fixed 512-token bins in
    // doc_id order within each source shard (contiguous greedy fill; a
    // doc belongs to the bin holding its first token). Per-source
    // windows keep the cumulative sum distributed — no global order.
    Q("ds_pack_sequences",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id", expr("(cum - n_tokens) div 512"))
          .select("doc_id", "source", "n_tokens", "seq_id")
      },
      Some(s"""WITH toks AS ($toksSql),
              |d AS (SELECT t.id AS doc_id, doc.source,
              |        len(t.tk)::BIGINT AS n_tokens
              |      FROM toks t JOIN documents doc ON t.id = doc.doc_id),
              |c AS (SELECT doc_id, source, n_tokens,
              |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |          ROWS UNBOUNDED PRECEDING) AS cum
              |      FROM d)
              |SELECT doc_id, source, n_tokens,
              |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id
              |FROM c""".stripMargin)),

    // Benchmark decontamination: docs >= 10 checked against the "benchmark"
    // docs < 10 on shared distinct word 3-grams (>= 2 hits flags a doc)
    Q("dd_decontaminate",
      (s, dir) => {
        val all = t(s, dir, "documents")
        Dedup.ngramContamination(
          all.where(col("doc_id") >= 10), all.where(col("doc_id") < 10),
          "doc_id", "text", shingleN = 3, minHits = 2)
      },
      Some(s"""WITH sh0 AS ($shinglesSql),
              |h AS (
              |  SELECT id, list_transform(sh, s -> ${h32Sql("s", "0")}) AS h1
              |  FROM sh0),
              |d AS (SELECT id AS doc_id, unnest(h1) AS g FROM h WHERE id >= 10),
              |p AS (SELECT id AS probe_id, unnest(h1) AS g FROM h WHERE id < 10)
              |SELECT d.doc_id, p.probe_id, count(*) AS n_hits
              |FROM d JOIN p USING (g)
              |GROUP BY d.doc_id, p.probe_id
              |HAVING count(*) >= 2""".stripMargin)),

    // DD: SEMANTIC decontamination — the paraphrase-robust complement
    // of dd_decontaminate: corpus docs flagged when their embedding
    // sits within cosine 0.3 of ANY probe embedding (a rewritten eval
    // item shares no n-grams but lands next to the original in
    // embedding space; real pipelines run both checks). SRP bucket
    // equi-join candidates, exact cosine verify, per-doc evidence
    // (argmax probe, max cosine, hit count).
    Q("dd_semantic_decontaminate",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Dedup.semanticContamination(
          emb.where(col("vec_id") >= 50), emb.where(col("vec_id") < 50),
          "vec_id", "embedding", threshold = 0.3, numPlanes = 8,
          tables = 4)
      },
      Some {
        val buckets = (0 until 4).map(tb =>
          s"SELECT id, v, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM e")
          .mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |b AS ($buckets),
           |cand AS (
           |  SELECT DISTINCT d.id AS doc_id, p.id AS probe_id,
           |    d.v AS d_v, p.v AS p_v
           |  FROM b d JOIN b p ON d.tbl = p.tbl AND d.bucket = p.bucket
           |  WHERE d.id >= 50 AND p.id < 50),
           |hits AS (
           |  SELECT doc_id, probe_id, ${cosSql("d_v", "p_v")} AS cosine
           |  FROM cand WHERE ${cosSql("d_v", "p_v")} >= 0.3),
           |agg AS (
           |  SELECT doc_id, max(cosine) AS maxc, count(*) AS n_hits
           |  FROM hits GROUP BY doc_id),
           |best AS (
           |  SELECT h.doc_id, min(h.probe_id) AS probe_id
           |  FROM hits h JOIN agg
           |    ON h.doc_id = agg.doc_id AND h.cosine = agg.maxc
           |  GROUP BY h.doc_id)
           |SELECT agg.doc_id, best.probe_id,
           |  round(agg.maxc, 6) + 0e0 AS max_cosine, agg.n_hits
           |FROM agg JOIN best ON agg.doc_id = best.doc_id""".stripMargin
      }),

    // DD: per-document duplicated-text fraction — the share of each
    // doc's distinct 3-gram shingles that appear in >= 2 docs corpus-
    // wide (the "mostly boilerplate?" filter signal). One shingle-df
    // partial agg + a vocab-keyed join-back; floor(f*1e6+0.5)/1e6
    // quantization because power-of-two shingle counts make decimal
    // midpoints reachable.
    Q("dd_dup_fraction",
      (s, dir) => Dedup.dupShingleFraction(
        t(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH s AS ($shinglesSql),
              |e AS (SELECT id, ${h32Sql("unnest(sh)", "0")} AS g FROM s),
              |d AS (SELECT g, count(*) AS df FROM e GROUP BY g),
              |j AS (SELECT e.id, d.df FROM e JOIN d USING (g))
              |SELECT id AS doc_id, count(*) AS n_shingles,
              |  count(*) FILTER (WHERE df >= 2) AS n_dup,
              |  floor((CAST(count(*) FILTER (WHERE df >= 2) AS DOUBLE) /
              |    CAST(count(*) AS DOUBLE)) * 1e6 + 5e-1) / 1e6 AS dup_frac
              |FROM j GROUP BY id""".stripMargin)),

    // DD: C4-style corpus-wide line dedup — documents are synthesized
    // into 4-token lines (both engines independently, the htmlPage
    // precedent), then any line >= 10 chars occurring more than once
    // keeps only its first (doc, line_no) occurrence and every doc is
    // rebuilt from its surviving lines. Short lines are never candidates.
    Q("dd_line_dedup",
      (s, dir) => Dedup.lineDedup(linedDocs(s, dir), "doc_id", "text",
        minLen = 10),
      Some(s"""WITH $lineDedupCtes
              |SELECT doc_id, text, n_lines, n_dropped
              |FROM lined_docs""".stripMargin)),

    // DD: duplicated-SPAN extraction — the actionable complement of
    // dd_dup_fraction: the maximal token ranges whose every 3-gram is
    // corpus-duplicated (the C4-style "cut the boilerplate passage,
    // keep the document" operator). Positional shingle explode ->
    // shingle df partial agg -> island windows per doc.
    Q("dd_dup_spans",
      (s, dir) => Dedup.dupSpans(t(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH toks AS ($toksSql),
              |e AS (
              |  SELECT id,
              |    unnest(range(0, greatest(len(tk) - 2, 1))) AS p,
              |    unnest(CASE WHEN len(tk) < 3
              |      THEN [${h32Sql("array_to_string(tk, ' ')", "0")}]
              |      ELSE list_transform(range(0, len(tk) - 2),
              |        i -> ${h32Sql("array_to_string(tk[i+1:i+3], ' ')", "0")})
              |      END) AS g
              |  FROM toks),
              |d AS (SELECT g, count(*) AS df
              |      FROM (SELECT DISTINCT id, g FROM e) GROUP BY g),
              |dup AS (SELECT e.id, e.p FROM e JOIN d USING (g)
              |        WHERE d.df >= 2),
              |isl AS (SELECT id, p,
              |          p - row_number() OVER (PARTITION BY id ORDER BY p)
              |            AS island
              |        FROM dup)
              |SELECT id AS doc_id, CAST(min(p) AS INT) AS start_tok,
              |  CAST(max(p) + 2 AS INT) AS end_tok,
              |  count(*) AS n_shingles
              |FROM isl GROUP BY id, island""".stripMargin)),

    // DD: exact duplicated substrings with the Lee et al. 2022 minimum
    // CHARACTER length contract (>= 50 chars) — dd_dup_spans' islands
    // lifted to character offsets via offset-preserving tokenization.
    // The oracle rebuilds token char spans from first principles (char
    // classification -> alnum-run islands -> positions), so the whole
    // offset pipeline is independently replayed, not trusted.
    Q("dd_dup_spans_exact",
      (s, dir) => Dedup.dupSpansExact(t(s, dir, "documents"), "doc_id",
          "text", n = 3, minDocs = 2, minChars = 50)
        .select(col("doc_id"), col("start_char"), col("end_char"),
          col("len_chars"), col("n_shingles")),
      Some(s"""WITH ch AS (
              |  SELECT doc_id, i, substring(lower(text), i + 1, 1) AS c
              |  FROM (SELECT doc_id, text,
              |          unnest(range(0, length(text))) AS i
              |        FROM documents)),
              |an AS (SELECT doc_id, i FROM ch
              |       WHERE (c >= 'a' AND c <= 'z')
              |          OR (c >= '0' AND c <= '9')),
              |tki AS (SELECT doc_id, i,
              |          i - row_number() OVER (PARTITION BY doc_id
              |            ORDER BY i) AS isl
              |        FROM an),
              |tk0 AS (SELECT doc_id, isl, min(i) AS s, max(i) + 1 AS e
              |        FROM tki GROUP BY doc_id, isl),
              |tk AS (SELECT doc_id, s, e, row_number() OVER (
              |         PARTITION BY doc_id ORDER BY s) - 1 AS p
              |       FROM tk0),
              |tks AS (SELECT tk.doc_id, p, s, e,
              |          substring(lower(d.text), s + 1, e - s) AS tok
              |        FROM tk JOIN documents d ON tk.doc_id = d.doc_id),
              |cnt AS (SELECT doc_id, count(*) AS nt FROM tks
              |        GROUP BY doc_id),
              |sh AS (
              |  SELECT t0.doc_id, t0.p,
              |    ${h32Sql("t0.tok || ' ' || t1.tok || ' ' || t2.tok", "0")}
              |      AS g,
              |    t0.s AS sc, t2.e AS ec
              |  FROM tks t0
              |  JOIN tks t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
              |  JOIN tks t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2
              |  UNION ALL
              |  SELECT x.doc_id, 0 AS p, ${h32Sql("x.alltok", "0")} AS g,
              |    x.s0 AS sc, x.e1 AS ec
              |  FROM (SELECT doc_id, string_agg(tok, ' ' ORDER BY p)
              |          AS alltok, min(s) AS s0, max(e) AS e1
              |        FROM tks GROUP BY doc_id) x
              |  JOIN cnt ON cnt.doc_id = x.doc_id AND cnt.nt < 3),
              |d AS (SELECT g, count(*) AS df
              |      FROM (SELECT DISTINCT doc_id, g FROM sh) GROUP BY g),
              |dup AS (SELECT sh.doc_id, sh.p, sh.sc, sh.ec
              |        FROM sh JOIN d USING (g) WHERE d.df >= 2),
              |isl2 AS (SELECT doc_id, p, sc, ec,
              |           p - row_number() OVER (PARTITION BY doc_id
              |             ORDER BY p) AS island
              |         FROM dup),
              |sp AS (SELECT doc_id, CAST(min(sc) AS INT) AS start_char,
              |         CAST(max(ec) AS INT) AS end_char,
              |         count(*) AS n_shingles
              |       FROM isl2 GROUP BY doc_id, island)
              |SELECT doc_id, start_char, end_char,
              |  end_char - start_char AS len_chars, n_shingles
              |FROM sp WHERE end_char - start_char >= 50""".stripMargin)),

    // Intra-document repetition signals (Gopher/RefinedWeb-style quality
    // rules): duplicate word-3-gram fraction + most-common-token fraction
    Q("ta_repetition",
      (s, dir) => t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.dupNgramFrac(col("text"), 3).as("dup_3gram_frac"),
        TextAnalysis.topTokenFrac(col("text")).as("top_token_frac")),
      Some(s"""WITH toks AS ($toksSql),
              |sh AS (
              |  SELECT id, tk, CASE WHEN len(tk) < 3
              |    THEN [array_to_string(tk, ' ')]
              |    ELSE list_transform(range(0, len(tk) - 2),
              |      i -> array_to_string(tk[i+1:i+3], ' ')) END AS g
              |  FROM toks)
              |SELECT id AS doc_id,
              |  round(1e0 - len(list_distinct(g))::DOUBLE / len(g), 6)
              |    AS dup_3gram_frac,
              |  round(coalesce(list_max(list_transform(list_distinct(tk),
              |    t -> len(list_filter(tk, x -> x = t))))::DOUBLE
              |    / len(tk), 0e0), 6) AS top_token_frac
              |FROM sh""".stripMargin)),

    // PII scrubbing (training-data pipeline op): per-pattern counts on the
    // raw text + tag-redacted output. Known PII is synthesized into each
    // doc from its id so the redaction provably fires; patterns are
    // lookaround-free so Java regex (Spark) and RE2 (DuckDB) agree.
    Q("ta_pii_redact",
      (s, dir) => {
        val withPii = t(s, dir, "documents").withColumn("txt",
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com or http://ex.org/p/"),
            col("doc_id").cast("string"), lit(" tel +1 555 01"),
            pmod(col("doc_id"), lit(100L)).cast("string"), lit(" ip 10.0."),
            pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7")))
        withPii.select(
          (col("doc_id") +: TextAnalysis.piiCounts(col("txt"))) :+
            TextAnalysis.redactPii(col("txt")).as("redacted"): _*)
      },
      Some {
        val mk = TextAnalysis.PiiPatterns
        val txt = """text || ' contact user' || doc_id::VARCHAR ||
                    |'@example.com or http://ex.org/p/' || doc_id::VARCHAR ||
                    |' tel +1 555 01' || (doc_id % 100)::VARCHAR ||
                    |' ip 10.0.' || (doc_id % 256)::VARCHAR || '.7'"""
          .stripMargin.replace("\n", " ")
        val counts = mk.map { case (kind, re, _) =>
          s"CAST(len(regexp_extract_all(txt, '$re')) AS INT) AS n_$kind"
        }.mkString(",\n  ")
        val redacted = mk.foldLeft("txt") { case (acc, (_, re, tag)) =>
          s"regexp_replace($acc, '$re', '$tag', 'g')"
        }
        s"""WITH w AS (SELECT doc_id, $txt AS txt FROM documents)
           |SELECT doc_id,
           |  $counts,
           |  $redacted AS redacted
           |FROM w""".stripMargin
      }),

    // TA: URL canonicalization — the C4/CCNet pre-dedup step. Messy URL
    // forms (mixed-case scheme/host, www., default and explicit ports,
    // trailing slashes, shuffled + tracking query params, empty parts,
    // bare '?', fragments) are synthesized per doc_id by the SAME
    // construction in both engines; each engine then canonicalizes
    // INDEPENDENTLY with its own regex/list primitives, so the compare
    // exercises the full normal form, not a shared shortcut.
    // TA: unicode SCRIPT census — the routing signal langId can't give:
    // marker words only exist within a script family, so a multilingual
    // corpus first splits by dominant script (codepoint counts over the
    // BMP script blocks, codegen'd length-diff regexp — no UDF), then
    // runs per-family language ID. Mixed-script text synthesized
    // identically in both engines from chr() codepoints (the url/html
    // synthesis precedent).
    Q("ta_script_mix",
      (s, dir) => {
        val id = col("doc_id")
        def pick(base: Int, n: Int) = element_at(
          array((0 until n).map(i =>
            lit(new String(Character.toChars(base + i)))): _*),
          (pmod(id, lit(n.toLong)) + 1).cast("int"))
        val mixed = t(s, dir, "documents")
          .select(id, col("text"), pick(0x0430, 8).as("gc"),
            pick(0x4E00, 16).as("gk"), pick(0x0627, 4).as("ga"),
            pick(0x03B1, 6).as("gg"))
          .select(id, concat(
            expr("substr(lower(text), 1, CAST(doc_id % 13 AS INT))"),
            expr("repeat(gc, CAST(doc_id % 7 AS INT) * 3)"),
            expr("repeat(gk, CAST(doc_id % 5 AS INT) * 4)"),
            expr("repeat(ga, CAST(doc_id % 3 AS INT) * 5)"),
            expr("repeat(gg, CAST(doc_id % 4 AS INT) * 2)")).as("mtext"))
        val counts = TextAnalysis.scriptCounts(col("mtext"))
          .map { case (n, e) => e.as(n) }
        mixed.select(Seq(id) ++ counts ++ Seq(
          TextAnalysis.dominantScript(col("mtext")).as("dominant"),
          TextAnalysis.nonLatinRatio(col("mtext")).as("non_latin_ratio")): _*)
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    substr(lower(text), 1, (doc_id % 13)::INT) ||
             |    repeat(chr(1072 + (doc_id % 8)::INT),
             |      (doc_id % 7)::INT * 3) ||
             |    repeat(chr(19968 + (doc_id % 16)::INT),
             |      (doc_id % 5)::INT * 4) ||
             |    repeat(chr(1575 + (doc_id % 4)::INT),
             |      (doc_id % 3)::INT * 5) ||
             |    repeat(chr(945 + (doc_id % 6)::INT),
             |      (doc_id % 4)::INT * 2) AS mtext
             |  FROM documents),
             |cnt AS (
             |  SELECT doc_id,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS n_latin,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{0370}-\x{03FF}]', '', 'g')) AS n_greek,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]',
             |      '', 'g')) AS n_cjk
             |  FROM m)
             |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk,
             |  CASE
             |    WHEN n_latin >= n_cyrillic AND n_latin >= n_greek AND
             |      n_latin >= n_arabic AND n_latin >= n_cjk AND n_latin > 0
             |      THEN 'latin'
             |    WHEN n_cyrillic >= n_latin AND n_cyrillic >= n_greek AND
             |      n_cyrillic >= n_arabic AND n_cyrillic >= n_cjk AND
             |      n_cyrillic > 0 THEN 'cyrillic'
             |    WHEN n_greek >= n_latin AND n_greek >= n_cyrillic AND
             |      n_greek >= n_arabic AND n_greek >= n_cjk AND n_greek > 0
             |      THEN 'greek'
             |    WHEN n_arabic >= n_latin AND n_arabic >= n_cyrillic AND
             |      n_arabic >= n_greek AND n_arabic >= n_cjk AND n_arabic > 0
             |      THEN 'arabic'
             |    WHEN n_cjk >= n_latin AND n_cjk >= n_cyrillic AND
             |      n_cjk >= n_greek AND n_cjk >= n_arabic AND n_cjk > 0
             |      THEN 'cjk'
             |    ELSE 'none' END AS dominant,
             |  CASE WHEN n_latin + n_cyrillic + n_greek + n_arabic + n_cjk
             |      = 0 THEN 0e0
             |    ELSE floor((n_cyrillic + n_greek + n_arabic + n_cjk)::DOUBLE
             |      / (n_latin + n_cyrillic + n_greek + n_arabic + n_cjk)
             |      * 1e6 + 5e-1) / 1e6
             |  END AS non_latin_ratio
             |FROM cnt""".stripMargin)),

    // TA: domain-level curation — the CCNet/RefinedWeb stage a per-doc
    // filter can't express: roll quality and exact-dup evidence up to
    // the REGISTERED DOMAIN and gate whole domains (a spam domain's
    // individually-plausible docs all drop together). URLs synthesized
    // identically in both engines (the ta_url_canon precedent, 23
    // domains); per-doc verdict carries the domain evidence. The stats
    // join is rollup-sized (#domains), AQE broadcasts it.
    Q("ta_domain_filter",
      (s, dir) => {
        val url = concat(lit("https://www.news"),
          pmod(col("doc_id"), lit(23L)).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string"))
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            UrlFunctions.urlDomain(url).as("domain"))
        val stats = docs.groupBy("domain").agg(
          count(lit(1)).as("domain_docs"),
          (floor((lit(1.0) - countDistinct(md5(col("text"))).cast("double")
            / count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("domain_dup_rate"),
          (floor(avg(TextAnalysis.qualityScoreExpr(col("text"))) * lit(1e6)
            + lit(0.5)) / lit(1e6)).as("domain_mean_q"))
        // the quality gate is RELATIVE — at or above the cross-domain
        // median — so it calibrates itself at any scale instead of
        // hard-coding a corpus-specific absolute threshold (23 domains,
        // odd count: the median is an exact element on both engines).
        // Exact percentile buffers all domain means in the final agg
        // task — fine for rollup-sized domain counts; at web-scale
        // domain cardinality (~10^7+) swap in the mergeable
        // Sketches.autoRangeQuantiles bound instead.
        val med = stats.agg(
          expr("percentile(domain_mean_q, 0.5)").as("med_q"))
        docs.join(stats, "domain").crossJoin(broadcast(med))
          .select(col("doc_id"), col("domain"), col("domain_docs"),
            col("domain_dup_rate"), col("domain_mean_q"),
            when(col("domain_dup_rate") <= 0.2 &&
              col("domain_mean_q") >= col("med_q"), 1).otherwise(0)
              .as("keep"))
      },
      Some(s"""WITH toks AS ($toksSql),
              |d AS (SELECT d0.doc_id, d0.text, t.tk,
              |        'news' || (d0.doc_id % 23)::VARCHAR || '.org'
              |          AS domain
              |      FROM documents d0 JOIN toks t ON d0.doc_id = t.id),
              |q AS (SELECT doc_id, domain, text,
              |        ${qualitySql("text", "tk")} AS q
              |      FROM d),
              |st AS (SELECT domain, count(*)::BIGINT AS domain_docs,
              |         floor((1e0 - count(DISTINCT md5(text))::DOUBLE /
              |           count(*)) * 1e6 + 5e-1) / 1e6 AS domain_dup_rate,
              |         floor(avg(q) * 1e6 + 5e-1) / 1e6 AS domain_mean_q
              |       FROM q GROUP BY domain),
              |md AS (SELECT median(domain_mean_q) AS med_q FROM st)
              |SELECT doc_id, q.domain, domain_docs, domain_dup_rate,
              |  domain_mean_q,
              |  CASE WHEN domain_dup_rate <= 2e-1 AND domain_mean_q >= med_q
              |    THEN 1 ELSE 0 END AS keep
              |FROM q JOIN st ON q.domain = st.domain, md""".stripMargin)),

    Q("ta_url_canon",
      (s, dir) => {
        val m = pmod(col("doc_id"), lit(12L))
        val id = col("doc_id").cast("string")
        val qs = when(m % 6 === 0, lit("b=2&a=1&utm_source=feed"))
          .when(m % 6 === 1, lit("a=1&b=2"))
          .when(m % 6 === 2, lit("utm_campaign=x&b=2&a=1"))
          .when(m % 6 === 3, lit("fbclid=ZZ"))
          .when(m % 6 === 4, lit("b=2&&a=1"))
          .otherwise(lit(""))
        val url = concat(
          when(m % 3 === 0, lit("HTTPS")).when(m % 3 === 1, lit("http"))
            .otherwise(lit("https")),
          lit("://"),
          when(m % 2 === 0, lit("WWW.")).otherwise(lit("")),
          lit("News"), pmod(col("doc_id"), lit(7L)).cast("string"),
          lit(".Example.COM"),
          when(m === 0, lit(":443")).when(m === 1, lit(":80"))
            .when(m === 2, lit(":8080")).otherwise(lit("")),
          when(m === 5, lit("")).otherwise(concat(lit("/Articles/"), id,
            when(m % 4 === 0, lit("/")).otherwise(lit("")))),
          when(qs =!= "", concat(lit("?"), qs))
            .when(m === 11, lit("?")).otherwise(lit("")),
          when(m % 2 === 1, concat(lit("#Sec"), id)).otherwise(lit("")))
        t(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"), col("url"),
            UrlFunctions.canonicalUrl(col("url")).as("canonical_url"),
            UrlFunctions.urlHost(col("url")).as("host"),
            UrlFunctions.urlDomain(col("url")).as("domain"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    (CASE (doc_id % 12) % 3 WHEN 0 THEN 'HTTPS'
             |       WHEN 1 THEN 'http' ELSE 'https' END) || '://' ||
             |    (CASE WHEN (doc_id % 12) % 2 = 0 THEN 'WWW.' ELSE '' END) ||
             |    'News' || (doc_id % 7)::VARCHAR || '.Example.COM' ||
             |    (CASE doc_id % 12 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
             |       WHEN 2 THEN ':8080' ELSE '' END) ||
             |    (CASE WHEN doc_id % 12 = 5 THEN ''
             |       ELSE '/Articles/' || doc_id::VARCHAR ||
             |         (CASE WHEN (doc_id % 12) % 4 = 0 THEN '/' ELSE '' END)
             |     END) ||
             |    (CASE (doc_id % 12) % 6
             |       WHEN 0 THEN '?b=2&a=1&utm_source=feed'
             |       WHEN 1 THEN '?a=1&b=2'
             |       WHEN 2 THEN '?utm_campaign=x&b=2&a=1'
             |       WHEN 3 THEN '?fbclid=ZZ'
             |       WHEN 4 THEN '?b=2&&a=1'
             |       ELSE (CASE WHEN doc_id % 12 = 11 THEN '?' ELSE '' END)
             |     END) ||
             |    (CASE WHEN (doc_id % 12) % 2 = 1
             |       THEN '#Sec' || doc_id::VARCHAR ELSE '' END) AS url
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, url,
             |    lower(regexp_extract(url,
             |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |    lower(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
             |    regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
             |    regexp_extract(url, '\?([^#]*)', 1) AS q
             |  FROM u),
             |d AS (
             |  SELECT *, regexp_extract(auth, ':([0-9]+)$', 1) AS port,
             |    regexp_replace(regexp_replace(auth, ':[0-9]+$', ''),
             |      '^www\.', '') AS host
             |  FROM c),
             |e AS (
             |  SELECT *,
             |    host || (CASE WHEN port <> '' AND NOT
             |        ((scheme = 'http' AND port = '80') OR
             |         (scheme = 'https' AND port = '443'))
             |      THEN ':' || port ELSE '' END) AS authority,
             |    (CASE WHEN regexp_replace(rawpath, '/+$', '') = ''
             |      THEN '/' ELSE regexp_replace(rawpath, '/+$', '') END)
             |      AS path,
             |    coalesce(array_to_string(
             |      list_sort(list_filter(string_split(q, '&'),
             |        p -> p <> '' AND NOT regexp_matches(p,
             |          '^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))), '&'), '')
             |      AS cq
             |  FROM d)
             |SELECT doc_id, url,
             |  scheme || '://' || authority || path ||
             |    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)
             |    AS canonical_url,
             |  host,
             |  (CASE WHEN len(string_split(host, '.')) >= 2
             |    THEN string_split(host, '.')[-2] || '.' ||
             |      string_split(host, '.')[-1]
             |    ELSE host END) AS domain
             |FROM e""".stripMargin)),

    // Multimodal plumbing: opaque binary column + typed metadata
    // extraction, decode REAL end-to-end — payloads are synthesized in
    // five actual container formats (PNG/JPEG/BMP/WAV/GIF), then
    // extractMeta sniffs the magic bytes and reads dimensions from each
    // format's own header structures (CRC-verified PNG IHDR, JPEG SOF
    // walk, BMP/GIF LE descriptors, RIFF chunk walk). The oracle replays
    // the closed form of the synthesis parameters; GIF's LZW-compressed
    // byte length has no closed form, so n_bytes is NULL for gif rows on
    // both sides (dims still checked).
    Q("mm_binary_meta",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p = (id % 5) match {
              case 0 => Multimodal.pngSynth((id % 300 + 1).toInt,
                (id % 200 + 1).toInt)
              case 1 => Multimodal.jpegSynthHeader((id % 500 + 1).toInt,
                (id % 400 + 1).toInt)
              case 2 => Multimodal.bmpSynth((id % 320 + 1).toInt,
                (id % 240 + 1).toInt)
              case 3 => Multimodal.wavSynth(1, 8000,
                (0 until (id % 10 + 1).toInt)
                  .map(i => ((id * 7 + i) % 65536 - 32768).toShort))
              case _ => graft.operators.Gif.gifSynth(id,
                (id % 50 + 1).toInt, (id % 40 + 1).toInt)
            }
            (id, p)
          }.toDF("doc_id", "payload")
        Multimodal.extractMeta(payloads, "doc_id", "payload").toDF()
          .select(col("doc_id"),
            when(col("format") === "gif", lit(null).cast("long"))
              .otherwise(col("n_bytes")).as("n_bytes"),
            col("width"), col("height"), col("format"))
      },
      Some("""SELECT doc_id,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN 45 WHEN 1 THEN 23
             |    WHEN 2 THEN 54 WHEN 3 THEN 44 + (doc_id % 10 + 1) * 2
             |    ELSE NULL END AS BIGINT) AS n_bytes,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN doc_id % 300 + 1
             |    WHEN 1 THEN doc_id % 500 + 1 WHEN 2 THEN doc_id % 320 + 1
             |    WHEN 3 THEN 0 ELSE doc_id % 50 + 1 END AS INT) AS width,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN doc_id % 200 + 1
             |    WHEN 1 THEN doc_id % 400 + 1 WHEN 2 THEN doc_id % 240 + 1
             |    WHEN 3 THEN 0 ELSE doc_id % 40 + 1 END AS INT) AS height,
             |  (['png', 'jpeg', 'bmp', 'wav', 'gif'])[(doc_id % 5) + 1]
             |    AS format
             |FROM documents""".stripMargin)),

    // REAL pixel transform on an uncompressed format: synthesize full
    // 24bpp BMPs (header + padded bottom-up pixel rows), nearest-neighbor
    // resize them to 4x3, re-encode, and checksum the RE-ENCODED bytes —
    // decode -> transform -> encode as pure distributed byte arithmetic.
    // The oracle replays the closed form of source-pixel sampling.
    Q("mm_bmp_resize",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            (id, Multimodal.bmpSynthPixels(
              (id % 6 + 2).toInt, (id % 5 + 2).toInt))
          }.toDF("doc_id", "payload")
        Multimodal.extractBmpResized(payloads, "doc_id", "payload",
            outW = 4, outH = 3).toDF()
          .select("doc_id", "out_w", "out_h", "n_bytes", "pix_sum", "px_last")
      },
      Some("""WITH px AS (
             |  SELECT doc_id, i, j,
             |    (i * (doc_id % 6 + 2)) // 4 AS sx,
             |    (j * (doc_id % 5 + 2)) // 3 AS sy
             |  FROM documents,
             |    (SELECT unnest(range(0, 4)) AS i),
             |    (SELECT unnest(range(0, 3)) AS j)),
             |packed AS (
             |  SELECT doc_id, i, j,
             |    ((sx * 3 + sy * 17 + 11) % 256) * 65536 +
             |    ((sx * 11 + sy * 5 + 7) % 256) * 256 +
             |    ((sx * 7 + sy * 13 + 3) % 256) AS v
             |  FROM px)
             |SELECT doc_id, 4 AS out_w, 3 AS out_h,
             |  CAST(90 AS BIGINT) AS n_bytes,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN i = 3 AND j = 2 THEN v END) AS BIGINT)
             |    AS px_last
             |FROM packed GROUP BY doc_id""".stripMargin)),

    // Magic-byte sniff + REAL header decode roundtrip: payloads are
    // synthesized per doc_id in four container formats (PNG with verified
    // IHDR CRC, JPEG SOF marker walk, BMP little-endian header, RIFF/WAVE
    // chunk walk), then sniffed and measured back; the oracle is the
    // closed form of the synthesis parameters. Full PIXEL decode of the
    // compressed formats is real too — mm_png_decode / mm_jpeg_decode /
    // mm_gif_decode exercise the pure-JVM codecs end to end.
    Q("mm_format_sniff",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p = (id % 4) match {
              case 0 => Multimodal.pngSynth((id % 1000 + 1).toInt,
                (id % 700 + 1).toInt)
              case 1 => Multimodal.jpegSynthHeader((id % 800 + 1).toInt,
                (id % 600 + 1).toInt)
              case 2 => Multimodal.bmpSynth((id % 640 + 1).toInt,
                (id % 480 + 1).toInt)
              case _ => Multimodal.wavSynth(1, 8000,
                (0 until (id % 20 + 1).toInt)
                  .map(i => ((id * 13 + i) % 65536 - 32768).toShort))
            }
            (id, p)
          }.toDF("doc_id", "payload")
        Multimodal.extractSniffedMeta(payloads, "doc_id", "payload").toDF()
      },
      Some("""SELECT doc_id,
             |  CASE doc_id % 4 WHEN 0 THEN 45 WHEN 1 THEN 23 WHEN 2 THEN 54
             |    ELSE 44 + (doc_id % 20 + 1) * 2 END AS n_bytes,
             |  (['png', 'jpeg', 'bmp', 'wav'])[(doc_id % 4) + 1] AS format,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 1000 + 1
             |    WHEN 1 THEN doc_id % 800 + 1 WHEN 2 THEN doc_id % 640 + 1
             |    ELSE 0 END AS INT) AS width,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 700 + 1
             |    WHEN 1 THEN doc_id % 600 + 1 WHEN 2 THEN doc_id % 480 + 1
             |    ELSE 0 END AS INT) AS height,
             |  true AS valid
             |FROM documents""".stripMargin)),

    // MM: REAL MPEG audio frame walk (ISO 11172-3 header arithmetic —
    // sync, bitrate/samplerate tables, per-layer frame lengths) over
    // per-doc synthesized Layer III streams; the oracle is the closed
    // form of the synthesis parameters. Entropy decode is NOT needed
    // for any of these fields — this is the metadata a pipeline routes
    // audio on (duration, bitrate, rate).
    Q("mm_mp3_meta",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p = MpegAudio.mp3SynthFrames((id % 5 + 1).toInt,
              (id % 14 + 1).toInt, (id % 3).toInt)
            MpegAudio.mp3Meta(id, p)
          }.toDF()
      },
      Some("""WITH g AS (
             |  SELECT doc_id, doc_id % 5 + 1 AS n,
             |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
             |      [CAST(doc_id % 14 + 1 AS INT)] AS kbps,
             |    ([44100,48000,32000])[CAST(doc_id % 3 + 1 AS INT)] AS sr
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(n * ((144 * kbps * 1000) // sr) AS BIGINT) AS n_bytes,
             |  CAST(1 AS INT) AS version, CAST(3 AS INT) AS layer,
             |  CAST(kbps AS INT) AS bitrate_kbps,
             |  CAST(sr AS INT) AS sample_rate,
             |  CAST(1 AS INT) AS channels, CAST(n AS INT) AS n_frames,
             |  CAST((n * 1152 * 1000) // sr AS BIGINT) AS duration_ms,
             |  false AS vbr, true AS valid
             |FROM g""".stripMargin)),

    // MM: REAL MPEG-1 Layer I subband decode — bit allocation,
    // scalefactor, and the spec's requantization formula
    // s'' = (2^nb/(2^nb-1)) * (s''' + 2^(1-nb)) — over per-doc
    // synthesized single-subband frames. The oracle replays the exact
    // requantization arithmetic (documented operation order, dyadic
    // constants, power-of-two scalefactors) per sample — 12 rows per
    // doc, bit-exact doubles with NO rounding on either side.
    Q("mm_mp1_subbands",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .flatMap { id =>
            val nb = (id % 14 + 2).toInt
            val sb = (id % 32).toInt
            val frame = MpegAudio.mp1Synth(sb, nb - 1, (3 * (id % 21)).toInt,
              sIdx => ((id * 7 + sIdx * 13) % (1L << nb)).toInt)
            val dec = MpegAudio.decodeLayer1(frame)
            (0 until 12).map(sIdx => (id, sIdx, dec.sub(0)(sb * 12 + sIdx)))
          }.toDF("doc_id", "s", "v")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, CAST(doc_id % 14 + 2 AS INT) AS nb,
             |    doc_id % 21 AS k
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, nb, k, unnest(range(0, 12)) AS s FROM g)
             |SELECT doc_id, CAST(s AS INT) AS s,
             |  ((CAST((doc_id * 7 + s * 13) % (1 << nb) AS DOUBLE) /
             |      CAST(1 << (nb - 1) AS DOUBLE)
             |    - 1e0 + 2e0 / CAST(1 << nb AS DOUBLE))
             |   * (CAST(1 << nb AS DOUBLE) /
             |      (CAST(1 << nb AS DOUBLE) - 1e0)))
             |  * (2e0 / CAST(1 << k AS DOUBLE)) AS v
             |FROM e""".stripMargin)),

    // MM: REAL MPEG-1 Layer II subband decode — the alloc-table (B.2a)
    // variant of the Layer I path: per-subband allocation classes,
    // scfsi scalefactor sharing (scfsi=0 here: three independent
    // per-part scalefactors, all exact powers of two), and 36 samples
    // per subband. The oracle replays the generalized requantization
    // C*(c/2^(nb-1) - 1 + D)*sf per sample — bit-exact doubles, no
    // rounding on either side (IEEE multiplication commutes, so the
    // C-first kernel order and the X-first oracle order agree).
    Q("mm_mp2_subbands",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .flatMap { id =>
            val allocIdx = (id % 15 + 1).toInt
            val nb = allocIdx + 1
            val levels = (1 << nb) - 1
            val sb = (id % 3).toInt // class-0 subband: ungrouped levels
            val sfi = Array((3 * (id % 21)).toInt,
              (3 * ((id + 4) % 21)).toInt, (3 * ((id + 8) % 21)).toInt)
            val frame = MpegAudio.mp2Synth(sb, allocIdx, 0, sfi,
              sIdx => ((id * 7 + sIdx * 13) % levels).toInt)
            val dec = MpegAudio.decodeLayer2(frame)
            (0 until 36).map(sIdx => (id, sIdx, dec.sub(0)(sb * 36 + sIdx)))
          }.toDF("doc_id", "s", "v")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, CAST(doc_id % 15 + 2 AS INT) AS nb
             |  FROM documents),
             |e AS (SELECT doc_id, nb, unnest(range(0, 36)) AS s FROM g),
             |k AS (
             |  SELECT doc_id, nb, s,
             |    CAST((doc_id * 7 + s * 13) % ((1 << nb) - 1) AS DOUBLE)
             |      AS c,
             |    CASE CAST(s // 12 AS INT) WHEN 0 THEN doc_id % 21
             |      WHEN 1 THEN (doc_id + 4) % 21
             |      ELSE (doc_id + 8) % 21 END AS kp
             |  FROM e)
             |SELECT doc_id, CAST(s AS INT) AS s,
             |  ((c / CAST(1 << (nb - 1) AS DOUBLE) - 1e0 +
             |      2e0 / CAST(1 << nb AS DOUBLE))
             |    * (CAST(1 << nb AS DOUBLE) /
             |       CAST((1 << nb) - 1 AS DOUBLE)))
             |  * (2e0 / CAST(1 << kp AS DOUBLE)) AS v
             |FROM k""".stripMargin)),

    // MM: REAL MPEG-1 Layer III SIDE-INFORMATION decode — the fully
    // normative field arithmetic of §2.4.1.7 (main_data_begin/scfsi,
    // then per granule the 12+9+8+4+1 head and either the switched
    // 2+1+2·5+3·3 or the long 3·5+4+3 branch, then preflag/
    // scalefac_scale/count1table). This is the routing metadata a
    // pipeline keys on (block-type mix, reservoir depth, table usage)
    // and needs no entropy tables. Granule 0 synthesizes LONG, granule
    // 1 SWITCHED (block_type 2), so both bitstream branches decode in
    // one row; absent fields report -1, never spec-implied defaults.
    // The entropy decode behind it is the declared refusal in
    // SURVEY_COVERAGE.md (normative Annex B.7 Huffman tables are not
    // derivable and not available in this environment).
    Q("mm_mp3_sideinfo",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .flatMap { id =>
            val g0 = MpegAudio.Mp3Granule(0, (id % 289).toInt,
              (id * 3 % 256).toInt, (id % 16).toInt,
              windowSwitching = false, blockType = 0, mixedBlock = false,
              Array((id % 32).toInt, (id * 3 % 32).toInt, (id * 7 % 32).toInt),
              Array.empty, (id % 16).toInt, (id % 8).toInt,
              (id % 2).toInt, (id / 2 % 2).toInt, (id / 4 % 2).toInt)
            val g1 = MpegAudio.Mp3Granule(0, (id * 5 % 289).toInt,
              (id * 7 % 256).toInt, (id * 3 % 16).toInt,
              windowSwitching = true, blockType = 2,
              mixedBlock = id / 8 % 2 == 1,
              Array((id * 5 % 32).toInt, (id * 11 % 32).toInt),
              Array((id % 8).toInt, (id * 3 % 8).toInt, (id * 5 % 8).toInt),
              -1, -1, (id / 16 % 2).toInt, (id / 32 % 2).toInt,
              (id / 64 % 2).toInt)
            val si = MpegAudio.decodeLayer3Side(MpegAudio.mp3SynthSide(
              (id % 512).toInt, (id % 16).toInt, Array(g0, g1)))
            si.granules.zipWithIndex.map { case (grs, gi) =>
              val g = grs(0)
              (id, gi, si.mainDataBegin, si.scfsi(0), g.bigValues,
                g.globalGain, g.scalefacCompress,
                if (g.windowSwitching) 1 else 0, g.blockType,
                if (g.mixedBlock) 1 else 0,
                g.tableSelect(0), g.tableSelect(1),
                if (g.windowSwitching) -1 else g.tableSelect(2),
                if (g.windowSwitching) g.subblockGain(0) else -1,
                if (g.windowSwitching) g.subblockGain(1) else -1,
                if (g.windowSwitching) g.subblockGain(2) else -1,
                g.region0Count, g.region1Count, g.preflag,
                g.scalefacScale, g.count1Table)
            }
          }.toDF("doc_id", "gr", "main_data_begin", "scfsi", "big_values",
            "global_gain", "scalefac_compress", "window_switching",
            "block_type", "mixed_block", "ts0", "ts1", "ts2", "sbg0",
            "sbg1", "sbg2", "region0", "region1", "preflag",
            "scalefac_scale", "count1table")
      },
      Some("""WITH e AS (
             |  SELECT doc_id, unnest(range(0, 2)) AS gr FROM documents)
             |SELECT doc_id, CAST(gr AS INT) AS gr,
             |  CAST(doc_id % 512 AS INT) AS main_data_begin,
             |  CAST(doc_id % 16 AS INT) AS scfsi,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 289
             |       ELSE doc_id * 5 % 289 END AS INT) AS big_values,
             |  CAST(CASE WHEN gr = 0 THEN doc_id * 3 % 256
             |       ELSE doc_id * 7 % 256 END AS INT) AS global_gain,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 16
             |       ELSE doc_id * 3 % 16 END AS INT) AS scalefac_compress,
             |  CAST(gr AS INT) AS window_switching,
             |  CAST(CASE WHEN gr = 0 THEN 0 ELSE 2 END AS INT) AS block_type,
             |  CAST(CASE WHEN gr = 0 THEN 0
             |       ELSE doc_id // 8 % 2 END AS INT) AS mixed_block,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 32
             |       ELSE doc_id * 5 % 32 END AS INT) AS ts0,
             |  CAST(CASE WHEN gr = 0 THEN doc_id * 3 % 32
             |       ELSE doc_id * 11 % 32 END AS INT) AS ts1,
             |  CAST(CASE WHEN gr = 0 THEN doc_id * 7 % 32
             |       ELSE -1 END AS INT) AS ts2,
             |  CAST(CASE WHEN gr = 0 THEN -1
             |       ELSE doc_id % 8 END AS INT) AS sbg0,
             |  CAST(CASE WHEN gr = 0 THEN -1
             |       ELSE doc_id * 3 % 8 END AS INT) AS sbg1,
             |  CAST(CASE WHEN gr = 0 THEN -1
             |       ELSE doc_id * 5 % 8 END AS INT) AS sbg2,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 16
             |       ELSE -1 END AS INT) AS region0,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 8
             |       ELSE -1 END AS INT) AS region1,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 2
             |       ELSE doc_id // 16 % 2 END AS INT) AS preflag,
             |  CAST(CASE WHEN gr = 0 THEN doc_id // 2 % 2
             |       ELSE doc_id // 32 % 2 END AS INT) AS scalefac_scale,
             |  CAST(CASE WHEN gr = 0 THEN doc_id // 4 % 2
             |       ELSE doc_id // 64 % 2 END AS INT) AS count1table
             |FROM e""".stripMargin)),

    // MM: REAL ISO-BMFF (MP4) box walk — the VIDEO leg of the
    // multimodal column set (ISO/IEC 14496-12 box grammar: size+type
    // headers, nesting, skip-unknown-by-size). Extracts major brand,
    // mvhd timescale/duration, per-trak hdlr handler + stsd codec
    // fourcc, tkhd 16.16 fixed-point dimensions — the fields a 100 TB
    // ingest routes and budgets video on. Payloads synthesize real
    // nested boxes per doc_id (incl. a free box the walk must skip);
    // the oracle is the closed form of the synthesis parameters.
    Q("mm_mp4_meta",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val ts = Seq(600, 1000, 90000)((id % 3).toInt)
            val vc = Seq("avc1", "hev1", "vp09")((id % 3).toInt)
            val p = Mp4.mp4Synth("isom", ts, id % 5000 + 1, vc,
              (id % 640 + 16).toInt, (id % 360 + 16).toInt,
              withAudio = id % 2 == 1, mdatBytes = (id % 100).toInt)
            Mp4.mp4Meta(id, p)
          }.toDF()
      },
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    ([600, 1000, 90000])[CAST(doc_id % 3 + 1 AS INT)] AS ts,
             |    (['avc1', 'hev1', 'vp09'])[CAST(doc_id % 3 + 1 AS INT)]
             |      AS vc,
             |    doc_id % 5000 + 1 AS dur,
             |    doc_id % 2 = 1 AS with_audio,
             |    doc_id % 100 AS mdat
             |  FROM documents)
             |SELECT doc_id,
             |  -- ftyp 24 + free 14 + moov(8 + mvhd 108 + video trak 221)
             |  -- + mdat hdr 8 = 383 fixed; audio trak adds another 221
             |  CAST(383 + mdat + CASE WHEN with_audio
             |    THEN 221 ELSE 0 END AS BIGINT) AS n_bytes,
             |  'isom' AS major_brand, CAST(ts AS INT) AS timescale,
             |  CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
             |  CAST(1 + CASE WHEN with_audio THEN 1 ELSE 0 END AS INT)
             |    AS n_tracks,
             |  vc AS video_codec,
             |  CASE WHEN with_audio THEN 'mp4a' ELSE '' END AS audio_codec,
             |  CAST(doc_id % 640 + 16 AS INT) AS width,
             |  CAST(doc_id % 360 + 16 AS INT) AS height,
             |  true AS valid
             |FROM g""".stripMargin)),

    // MM: video FRAME SAMPLING — the canonical training-data video op: a
    // 100 TB pipeline never decodes every frame, it samples by index/
    // timestamp, and the ISO-BMFF sample table (stts/stsc/stsz/stco) is
    // what makes that O(kept frames) rather than O(video bytes).
    // Payloads are MJPEG-in-MP4 with REAL sample tables (each sample a
    // complete baseline JPEG from the exact-integer synth); every 2nd
    // frame is resolved by table walk, sliced, and decoded through the
    // full JPEG entropy path. The oracle replays the pixel closed form
    // per (doc, kept frame) with the frame-seeded synthesis id.
    // Synthesis runs ONCE per session into a parquet fixture (the real
    // corpus would arrive on disk too) so repeated runs measure the
    // table walk + decode, not MP4+JPEG construction.
    Q("mm_video_frames",
      (s, dir) => Multimodal.sampleVideoFrames(
        videoFixture(s, dir), "doc_id", "payload", every = 2)
        .toDF(),
      Some("""WITH fr AS (
             |  SELECT doc_id, f,
             |    CAST((doc_id + 101 * f) % 1000 AS INTEGER) AS idi,
             |    CAST(doc_id % 9 + 4 AS INTEGER) AS w,
             |    CAST(doc_id % 7 + 4 AS INTEGER) AS h
             |  FROM documents, (SELECT unnest(range(0, 4)) AS f)
             |  WHERE f < doc_id % 3 + 2 AND f % 2 = 0),
             |px AS (
             |  SELECT doc_id, f, idi, w, h, x, y,
             |    CAST(x // 8 AS INTEGER) AS bx,
             |    CAST(y // 8 AS INTEGER) AS by,
             |    CASE WHEN (x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END AS sx,
             |    CASE WHEN (y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END AS sy
             |  FROM fr,
             |    (SELECT unnest(range(0, 12)) AS x),
             |    (SELECT unnest(range(0, 10)) AS y)
             |  WHERE x < w AND y < h),
             |ycc AS (
             |  SELECT doc_id, f, w, h, x, y,
             |    40 + (bx*29 + by*17 + idi*3) % 176
             |      + ((bx + by + idi) % 7 - 3) * sx
             |      + ((2*bx + by + idi) % 5 - 2) * sy
             |      + ((bx + 2*by + idi) % 3 - 1) * sx * sy AS yv,
             |    70 + (13*bx + 7*by + 5*idi) % 116
             |      + ((bx + idi) % 3 - 1) * sx
             |      + ((by + idi) % 3 - 1) * sy AS cb,
             |    70 + (11*bx + 19*by + 7*idi) % 116
             |      + ((by + idi) % 3 - 1) * sx
             |      + ((bx + 2*idi) % 3 - 1) * sy AS cr
             |  FROM px),
             |rgb AS (
             |  SELECT doc_id, f, w, h, x, y,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv + 1.402e0 * (cr - 128) + 0.5e0) AS INTEGER))) AS r,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv - 0.344136e0 * (cb - 128) - 0.714136e0 * (cr - 128)
             |      + 0.5e0) AS INTEGER))) AS g,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv + 1.772e0 * (cb - 128) + 0.5e0) AS INTEGER))) AS b
             |  FROM ycc),
             |packed AS (
             |  SELECT doc_id, f, w, h, x, y,
             |    r * 65536 + g * 256 + b AS v
             |  FROM rgb)
             |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(f * 40 AS BIGINT) AS pts_ms,
             |  max(w) AS width, max(h) AS height,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN x = w - 1 AND y = h - 1 THEN v END)
             |    AS BIGINT) AS px_last,
             |  TRUE AS valid
             |FROM packed GROUP BY doc_id, f""".stripMargin)),

    // PIPE: audio-corpus capstone — synth a mixed audio corpus (MPEG
    // Layer III streams + RIFF/WAVE PCM), sniff the container from
    // magic bytes, dispatch to the matching REAL frame walk
    // (MpegAudio.mp3Meta / Multimodal.wavMeta), and aggregate
    // per-format corpus stats: the route-by-format + duration-budget
    // accounting every audio ingest does before any sample decode.
    // One narrow per-partition pass + a 2-group partial agg.
    Q("pipe_audio_corpus",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val stats = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p =
              if (id % 2 == 0)
                MpegAudio.mp3SynthFrames((id % 5 + 1).toInt,
                  (id % 14 + 1).toInt, (id % 3).toInt)
              else Multimodal.wavSynth(1, (8000 + (id % 3) * 4000).toInt,
                (0 until (id % 40 + 5).toInt).map(i =>
                  ((id * 13 + i) % 65536 - 32768).toShort))
            val dur = Multimodal.sniffFormat(p) match {
              case "mp3" => MpegAudio.mp3Meta(id, p).duration_ms
              case "wav" => Multimodal.wavMeta(id, p).duration_ms
              case _ => -1L
            }
            (id, Multimodal.sniffFormat(p), p.length.toLong, dur)
          }.toDF("doc_id", "format", "n_bytes", "duration_ms")
        stats.where(col("duration_ms") >= 0)
          .groupBy("format")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bytes").as("total_bytes"),
            sum("duration_ms").as("total_ms"),
            min("duration_ms").as("min_ms"),
            max("duration_ms").as("max_ms"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'wav' END AS format,
             |    doc_id % 5 + 1 AS n,
             |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
             |      [CAST(doc_id % 14 + 1 AS INT)] AS kbps,
             |    ([44100,48000,32000])[CAST(doc_id % 3 + 1 AS INT)] AS sr,
             |    8000 + (doc_id % 3) * 4000 AS wr,
             |    doc_id % 40 + 5 AS ns
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, format,
             |    CASE WHEN format = 'mp3' THEN n * ((144 * kbps * 1000) // sr)
             |         ELSE 44 + ns * 2 END AS n_bytes,
             |    CASE WHEN format = 'mp3' THEN (n * 1152 * 1000) // sr
             |         ELSE (ns * 1000) // wr END AS duration_ms
             |  FROM g)
             |SELECT format, count(*) AS n_docs,
             |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             |  CAST(sum(duration_ms) AS BIGINT) AS total_ms,
             |  min(duration_ms) AS min_ms, max(duration_ms) AS max_ms
             |FROM p GROUP BY format""".stripMargin)),

    // K6: bucketed co-located join — both sides written bucketBy the join
    // key, so the join plans WITHOUT a shuffle exchange (PlanSpec gate).
    // This is the 100 TB answer for repeated fact-to-fact joins on a
    // stable key: pay the layout once at ingest, never shuffle again.
    Q("k6_bucketed_join",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val (lt, ot) = (s"graft_bkt_lineitem_$tag", s"graft_bkt_orders_$tag")
        // coalesce(8) before the bucketed write: 8 tasks x 8 buckets = 64
        // files instead of numPartitions x 8 tiny ones
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
          .coalesce(8)
          .write.mode("overwrite").format("parquet")
          .option("path", s"/tmp/graft_bucketed/${tag}_lineitem")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .coalesce(8)
          .write.mode("overwrite").format("parquet")
          .option("path", s"/tmp/graft_bucketed/${tag}_orders")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
        s.table(lt).join(s.table(ot),
            col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_partkey", "l_quantity", "o_orderpriority")
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity, o_orderpriority
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
        .stripMargin)),

    // Streaming-shaped windowed aggregation (batch equivalent of the
    // Structured Streaming path in streaming/EventStream.scala)
    Q("st_window_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"),
          countDistinct("user_id").as("n_users"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("n_events"), col("total_value"), col("n_users")),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
             |  count(*) AS n_events, round(sum(value), 2) AS total_value,
             |  count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1""".stripMargin)),

    // Sliding-window aggregation (1h window, 30m slide): every event lands
    // in exactly 2 overlapping windows — the sliding counterpart of
    // st_window_agg's tumbling shape; the oracle replays the window
    // membership by exploding both candidate starts per event
    Q("st_sliding_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("n_events"), col("total_value")),
      Some("""WITH e AS (
             |  SELECT value, (epoch_ms(ts) // 1000) // 1800 * 1800
             |    - k.k * 1800 AS win_start
             |  FROM events, (SELECT unnest([0, 1]) AS k) k)
             |SELECT win_start, count(*) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM e GROUP BY win_start""".stripMargin)),

    // Streaming attribution operator on its batch path (the stream path —
    // watermarks + state eviction — is pinned by EventStreamSpec's
    // stream/batch parity test; this row puts the join semantics under
    // the DuckDB oracle).
    Q("st_attribution",
      (s, dir) => graft.streaming.EventStream
        .attributedPurchases(t(s, dir, "events")),
      Some("""SELECT p.user_id,
             |  epoch_ms(p.ts) // 1000 AS p_s,
             |  epoch_ms(c.ts) // 1000 AS c_s,
             |  p.value AS p_value
             |FROM events p JOIN events c
             |  ON p.event_type = 'purchase' AND c.event_type = 'click'
             |  AND p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts"""
        .stripMargin)),

    // ST: the LEFT-OUTER attribution — purchases with no click in the
    // window survive with null click columns; streaming mode emits them
    // on watermark expiry (outer stream-stream join state contract),
    // batch mode (checked here) is the plain left interval join.
    Q("st_attribution_outer",
      (s, dir) => graft.streaming.EventStream
        .attributedPurchasesOuter(t(s, dir, "events")),
      Some("""SELECT p.user_id,
             |  epoch_ms(p.ts) // 1000 AS p_s,
             |  epoch_ms(c.ts) // 1000 AS c_s,
             |  p.value AS p_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts"""
        .stripMargin)),

    // ST: watermarked OHLC bars on the batch path (withWatermark is a
    // no-op on batch frames; the streaming path — watermark-bounded
    // state, availableNow — is pinned against this exact frame by
    // EventStreamSpec's parity test). Open/close tie-break is
    // min/max(struct(ts, value)): same ts -> min value opens, max
    // value closes; the oracle replays it with ORDER BY ts, value.
    Q("st_ohlc",
      (s, dir) => graft.streaming.EventStream.ohlcBars(t(s, dir, "events")),
      Some("""WITH b AS (
             |  SELECT event_type, date_trunc('hour', ts) AS bucket,
             |    ts, value
             |  FROM events),
             |r AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts, value) AS rn,
             |    count(*) OVER (PARTITION BY event_type, bucket) AS cnt
             |  FROM b)
             |SELECT CAST(epoch(bucket) AS BIGINT) AS win_start, event_type,
             |  max(CASE WHEN rn = 1 THEN value END) AS open,
             |  max(CASE WHEN rn = cnt THEN value END) AS close,
             |  max(value) AS high, min(value) AS low, count(*) AS n
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // ST: streaming approximate distinct users per hour — the HLL
    // register build AS the streaming aggregation (state = at most 2^p
    // register rows per window/type; max IS the HLL merge, so
    // micro-batch boundaries cannot change the registers — batch parity
    // is exact, which is what this row checks). The estimate fold runs
    // at read time over the emitted registers; the oracle replicates
    // registers + fold + corrections in SQL, joined with the exact
    // count for the accuracy audit.
    Q("st_hll_window",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val est = graft.streaming.EventStream.hllWindowEstimate(
          graft.streaming.EventStream.hllRegisterStream(ev, p = 12), p = 12)
        val exact = ev.groupBy(
            unix_timestamp(date_trunc("hour", col("ts"))).as("win_start"),
            col("event_type"))
          .agg(countDistinct("user_id").as("exact"))
        est.join(exact, Seq("win_start", "event_type"))
          .select(col("win_start"), col("event_type"),
            (round(col("hll_estimate"), 4) + 0.0).as("est"), col("exact"))
      },
      Some {
        val hv = h32Sql("CAST(user_id AS VARCHAR)", "0")
        s"""WITH h AS (
           |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
           |      AS win_start,
           |    event_type, $hv AS hv FROM events),
           |regs AS (
           |  SELECT win_start, event_type, hv >> 20 AS idx,
           |    max(CASE WHEN (hv & 1048575) = 0 THEN 21
           |        ELSE 20 - (length(bin(hv & 1048575)) - 1) END) AS mj
           |  FROM h GROUP BY win_start, event_type, idx),
           |folded AS (
           |  SELECT win_start, event_type, sum(pow(2e0, -mj)) AS s_present,
           |    count(*) AS present FROM regs GROUP BY win_start, event_type),
           |est AS (
           |  SELECT win_start, event_type,
           |    (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
           |      / (s_present + (4096 - present)) AS raw,
           |    CAST(4096 - present AS DOUBLE) AS v
           |  FROM folded),
           |ex AS (
           |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
           |      AS win_start,
           |    event_type, count(DISTINCT user_id) AS exact
           |  FROM events GROUP BY 1, 2)
           |SELECT win_start, event_type,
           |  round(CASE
           |    WHEN raw <= 2.5 * 4096 AND v > 0 THEN 4096e0 * ln(4096e0 / v)
           |    WHEN raw > 4294967296e0 / 30 THEN
           |      -4294967296e0 * ln(1 - raw / 4294967296e0)
           |    ELSE raw END, 4) + 0e0 AS est,
           |  exact
           |FROM est JOIN ex USING (win_start, event_type)""".stripMargin
      }),

    // S5: template extraction UDTF shape (1 row -> N listing rows)
    Q("s5_template_extract",
      (s, dir) => t(s, dir, "part")
        .withColumn("wikitext", concat(
          lit("{{see|name="), col("p_name"), lit("|lat=4"),
          pmod(col("p_partkey"), lit(10)).cast("string"),
          lit("}} filler {{eat|name="), col("p_brand"), lit("}}")))
        .select(col("p_partkey"),
          explode(expr(
            "regexp_extract_all(wikitext, '\\\\{\\\\{(see|eat)\\\\|name=([^|}]+)', 2)"))
            .as("listing_name")),
      Some("""WITH w AS (
             |  SELECT p_partkey, '{{see|name=' || p_name || '|lat=4' ||
             |    CAST(p_partkey % 10 AS VARCHAR) || '}} filler {{eat|name=' ||
             |    p_brand || '}}' AS wikitext
             |  FROM part)
             |SELECT p_partkey, unnest(regexp_extract_all(wikitext,
             |  '\{\{(see|eat)\|name=([^|}]+)', 2)) AS listing_name
             |FROM w""".stripMargin)),

    // F1: NFKD deaccent UDF vs DuckDB strip_accents
    Q("f1_deaccent",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 200)
        .select(col("c_custkey"),
          TextFunctions.deaccentLowerUdf(
            concat(lit("Café Ñandú "), col("c_name"))).as("clean")),
      Some("""SELECT c_custkey,
             |  lower(strip_accents('Café Ñandú ' || c_name)) AS clean
             |FROM customer WHERE c_custkey < 200""".stripMargin)),

    // F26: unicode NFC normalization — the ingest normal form that makes
    // byte-level digests agree across sources emitting composed vs
    // decomposed text. Fixture builds DECOMPOSED strings (base char +
    // combining mark via compiler/chr() escapes, identically in both
    // engines); both engines then normalize with their own UAX #15
    // implementation, and the composed forms must agree byte-for-byte
    // (lengths shrink by exactly the two combining marks).
    Q("f26_nfc",
      (s, dir) => {
        // the literal is byte-DECOMPOSED (renders composed): "Cafe" +
        // U+0301 combining acute + " u" + U+0308 combining diaeresis
        val dec = concat(lit("Café über "), col("c_name"))
        t(s, dir, "customer").where(col("c_custkey") < 200)
          .select(col("c_custkey"),
            length(dec).cast("long").as("raw_len"),
            TextFunctions.nfcUdf(dec).as("nfc_text"),
            length(TextFunctions.nfcUdf(dec)).cast("long").as("nfc_len"))
      },
      Some("""SELECT c_custkey,
             |  length('Cafe' || chr(769) || ' u' || chr(776) || 'ber '
             |    || c_name)::BIGINT AS raw_len,
             |  nfc_normalize('Cafe' || chr(769) || ' u' || chr(776) ||
             |    'ber ' || c_name) AS nfc_text,
             |  length(nfc_normalize('Cafe' || chr(769) || ' u' ||
             |    chr(776) || 'ber ' || c_name))::BIGINT AS nfc_len
             |FROM customer WHERE c_custkey < 200""".stripMargin)),

    // F7: rapidfuzz-parity similarity kernels over a PINNED pair set. The
    // oracle is a literal VALUES table of scores computed at build time by
    // the same Scala kernels the codegen'd Catalyst expressions invoke —
    // the driver's DuckDB run then hash-verifies expression==kernel parity
    // and cross-engine rounding, closing the former no_oracle gap.
    Q("f7_fuzzy_ratios",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        fuzzPairs.toDF("id", "a", "b").select(col("id"),
          round(graft.plans.FuzzyExpressions.tokenSetRatio(
            col("a"), col("b")), 6).as("token_set"),
          round(graft.plans.FuzzyExpressions.tokenSortRatio(
            col("a"), col("b")), 6).as("token_sort"),
          round(graft.plans.FuzzyExpressions.partialRatio(
            col("a"), col("b")), 6).as("partial_r"),
          round(graft.plans.FuzzyExpressions.erNameSimilarity(
            col("a"), col("b")), 6).as("er_sim"),
          round(graft.plans.FuzzyExpressions.nameSimilarity(
            col("a"), col("b")), 6).as("name_sim"))
      },
      Some {
        import TextFunctions._
        val rows = fuzzPairs.map { case (id, a, b) =>
          s"($id, ${dLit(round6(tokenSetRatio(a, b)))}, " +
            s"${dLit(round6(tokenSortRatio(a, b)))}, " +
            s"${dLit(round6(partialRatio(a, b)))}, " +
            s"${dLit(round6(erNameSimilarity(a, b)))}, " +
            s"${dLit(round6(nameSimilarity(a, b)))})"
        }.mkString(",\n")
        s"SELECT * FROM (VALUES\n$rows\n) " +
          "AS t(id, token_set, token_sort, partial_r, er_sim, name_sim)"
      }),

    // T3: greedy top-k near-duplicate-suppressed selection over a pinned
    // deterministic group set; the oracle VALUES are produced at build time
    // by the reference's scan-everything greedy, so the driver verifies the
    // distributed Aggregator (partial agg + merge across partitions)
    // against the sequential reference semantics.
    Q("t3_topk_distinct",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t3Docs.toDF("grp", "text")
          .repartition(5) // force multi-partition partial aggregation
          .as[(String, String)].groupByKey(_._1).mapValues(_._2)
          .agg(TopKDistinct.topK(3, 0.9, maxLen = 1200).name("kept"))
          .toDF("grp", "kept")
          .select(col("grp"), size(col("kept")).as("n_kept"),
            array_join(col("kept"), "|").as("kept_join"))
      },
      Some {
        val rows = t3Docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, ds) =>
          val kept = refTopKGreedy(ds.map(_._2), k = 3, thr = 0.9, maxLen = 1200)
          s"('$g', ${kept.size}, '${kept.mkString("|").replace("'", "''")}')"
        }.mkString(",\n")
        s"SELECT * FROM (VALUES\n$rows\n) AS t(grp, n_kept, kept_join)"
      })
  )

  /** Pinned inputs for f7: chosen to exercise token-subset 1.0 shortcuts,
    * boundary-overlap partial windows, deaccent divergence, and plain
    * InDel cases. */
  private lazy val fuzzPairs: Seq[(Int, String, String)] = Seq(
    (1, "International Airport Vienna", "Vienna Intl. Airport"),
    (2, "Cafe Central", "Café Central Wien"),
    (3, "St. Stephen's Cathedral", "Stephansdom"),
    (4, "Hotel Sacher", "Sacher Hotel"),
    (5, "Powder Tower", "Explore Powder Tower"),
    (6, "Charles Bridge", "Karluv most"),
    (7, "abc", "abd"),
    (8, "bcd", "abc"),
    (9, "world", "hello world"),
    (10, "Naschmarkt", "Nasch Markt"),
    (11, "Schönbrunn Palace", "Schoenbrunn"),
    (12, "identical", "identical"))

  /** Spark `round(col, 6)` semantics (BigDecimal HALF_UP) for build-time
    * oracle literals. */
}
