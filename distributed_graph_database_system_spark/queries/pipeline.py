"""Training-data pipeline operators (round 4): exact n-gram-Jaccard
similarity join, deterministic corpus splitting, sequence packing, corpus
n-gram stats, and embedding centroids.

These extend the LLM-pipeline surface (SURVEY.md §2.2 last rows) with the
operations a 100 TB pretraining-data pipeline runs hourly. All of them are
pure JVM column expressions (no Python in the row path) and every one has a
full DuckDB oracle — no pinned goldens needed, because each is exactly
SQL-expressible.

Scale shapes:
- the similarity join is prefix-filtered (Bayardo et al., WWW'07 "Scaling
  Up All Pairs Similarity Search"): candidates come from an equi-join on
  rare-shingle prefixes, never an all-pairs product;
- splitting/packing are single-shuffle window/groupBy plans keyed on
  (source) — the natural partition key of a sharded corpus;
- centroids are one partial+final aggregate over (label, dim) — the
  classic vector-mean shape that scales to any corpus since the state per
  reducer is one (sum, count) pair per dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.dedup import (
    ngram_jaccard_pairs,
    shingles_long,
)
from distributed_graph_database_system_spark.operators.graph import (
    connected_components,
)
from distributed_graph_database_system_spark.operators.textstats import (
    mean_word_length,
    ws_token_count,
    ws_tokens as ws_token_array,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table

# DuckDB twin of operators.dedup.shingles (3-gram word shingles over the
# shared ws_tokens tokenization; short docs fall back to the whole-text
# single shingle).
_SHINGLES_SQL = r"""
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct(list_transform(range(1, len(t)-1),
                     i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
              ELSE [array_to_string(t, ' ')] END AS s
  FROM (
    SELECT doc_id,
           CASE WHEN regexp_replace(coalesce(text,''),'^\s+|\s+$','','g') = ''
                THEN []::VARCHAR[]
                ELSE string_split_regex(
                       regexp_replace(lower(text),'^\s+|\s+$','','g'), '\s+')
           END AS t
    FROM documents
  )
"""


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
    """,
    tags=("llm", "dedup", "jaccard", "prefix-filter"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs (threshold 3/5) via prefix
    filtering — the deterministic, recall-1.0 counterpart of MinHash-LSH.

    Plan (Bayardo et al., WWW'07): order each doc's shingles by ascending
    global document frequency (rarest first; ties by shingle string), keep
    only the first |s| - ceil(t*|s|) + 1 as the doc's PREFIX. Any pair with
    Jaccard >= t must share a prefix shingle (if all shared shingles sat in
    one doc's suffix, overlap <= ceil(t*|s|)-1 < t*|s| <= t*|union| —
    contradiction), so an equi-self-join on prefix shingles finds every
    qualifying pair while candidate volume tracks rare-shingle collisions,
    not |docs|². Verify = exact Jaccard on the candidate pairs only.

    The oracle is the honest all-pairs join — affordable at oracle scale
    (500 docs) precisely because THIS side never does all-pairs. Algorithm
    and recall proof: operators.dedup.ngram_jaccard_pairs.
    """
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold_num=3, threshold_den=5
    )


def _md5_bucket() -> F.Column:
    """Deterministic 0-99 bucket of doc_id — pure function of the id, byte-
    identical in Spark and DuckDB (md5 of the decimal-string id; first 8 hex
    digits as an int). The basis of every split/holdout decision below, so
    membership can never depend on row order, partitioning, or engine."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )


# DuckDB twin of _md5_bucket().
_MD5_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@query(
    "split_train_holdout",
    oracle="""
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents
    )
    GROUP BY split, source
    """,
    tags=("llm", "pipeline", "split"),
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by hashed doc_id — the
    standard leakage-safe corpus split: membership is a pure function of the
    id (stable across runs, partitionings, and engines — md5 is used rather
    than xxhash64/`hash()` precisely because both engines implement it
    identically), never of row order or sampling state. Per-(split, source)
    counts audit the split balance. One narrow projection + one aggregate;
    no shuffle beyond the groupBy."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _md5_bucket()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split"), F.col("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "pack_sequences",
    oracle=r"""
    WITH tok AS (
      SELECT source, doc_id,
             CAST(CASE WHEN regexp_replace(coalesce(text,''),'^\s+|\s+$','','g') = ''
                  THEN 0
                  ELSE len(string_split_regex(
                         regexp_replace(lower(text),'^\s+|\s+$','','g'), '\s+'))
             END AS BIGINT) AS n_tok
      FROM documents
    ), packed AS (
      SELECT source, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - n_tok)
                        / 2048) AS BIGINT) AS bin
      FROM tok
    )
    SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin
    """,
    tags=("llm", "pipeline", "packing"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches: concatenate each source's
    docs in stable (doc_id) order and cut every 2048 tokens — a doc's bin is
    floor(start_offset / 2048), the concat-and-chunk packing used for LLM
    pretraining shards. One window cumsum per source partition + one
    aggregate; at corpus scale `source` shards the cumsum so no global
    ordering is ever needed. Integer token counts only — no float in the
    bin math."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", "doc_id", ws_token_count(F.col("text")).alias("n_tok")
    )
    cum = F.sum("n_tok").over(
        W.partitionBy("source").orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    packed = tok.withColumn(
        "bin", F.floor((cum - F.col("n_tok")) / F.lit(2048))
    )
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
    )


@query(
    "chunk_documents_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 7 = 0
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 48)) AS start_tok
      FROM t
    )
    SELECT doc_id,
           CAST(start_tok // 48 AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(toks[start_tok + 1 : start_tok + 64]) AS INTEGER)
             AS n_chunk_tokens,
           md5(array_to_string(toks[start_tok + 1 : start_tok + 64], ' '))
             AS chunk_md5
    FROM s ORDER BY doc_id, chunk_idx
    """,
    tags=("llm", "pipeline", "chunking"),
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    between raw documents and pack_sequences' bin packing: every doc
    (a deterministic 1-in-7 slice keeps the fixture result compact)
    splits into 64-token chunks starting every 48 tokens (16-token
    overlap, the RAG/pretraining boundary-context idiom), each chunk
    carrying provenance (doc_id, chunk_idx, start_tok) and an md5 of its
    text so the oracle compares content without hashing megabytes of
    strings. Pure per-row fan-out: sequence() generates the start
    offsets, explode distributes them, slice/array_join stay in codegen
    — no shuffle at all before the presentation sort, so the op scales
    as a map over the corpus. Both engines slice identically (Spark
    slice(arr, start+1, 64) ≡ DuckDB toks[start+1 : start+64], 1-based,
    length-clamped)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    s = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(48))
        ).alias("start_tok"),
    )
    chunk = F.slice("toks", F.col("start_tok") + 1, 64)
    return s.select(
        "doc_id",
        (F.col("start_tok") / 48).cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "text_ngram_topk",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM (SELECT unnest(s) AS shingle, doc_id FROM sh)
    GROUP BY shingle
    ORDER BY doc_freq DESC, shingle
    LIMIT 20
    """,
    tags=("llm", "text", "ngram-stats"),
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 trigram shingles by document frequency (shingles
    are per-doc distinct, so the count IS doc frequency). explode → count →
    TakeOrderedAndProject; ties broken by shingle string so the result set
    is deterministic across engines and partitionings."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingles_long(d)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "shingle")
        .limit(20)
    )


@query(
    "embed_centroids",
    oracle="""
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000 AS centroid
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM embeddings
    )
    GROUP BY label, dim
    """,
    tags=("llm", "embedding", "centroid"),
)
def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long (label, dim, centroid) form —
    the building block of IVF coarse quantizers and class prototypes.
    Components are quantized to integer micro-units (floor(v * 1e6)) before
    summing, so the aggregate is exact int64 arithmetic — float summation
    order can't flip a bit across engines or partitionings — and the final
    mean is two identical IEEE divisions on both sides. posexplode →
    partial+final agg on (label, dim): reducer state is one (sum, count)
    per dimension regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1_000_000).cast("bigint").alias("q"),
    )
    return exploded.groupBy("label", "dim").agg(
        (F.sum("q").cast("double") / F.count("*") / F.lit(1_000_000)).alias(
            "centroid"
        )
    )


@query(
    "decontaminate_holdout",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    bucketed AS (
      SELECT doc_id, {_MD5_BUCKET_SQL} AS bucket FROM documents
    ),
    bench AS (
      SELECT DISTINCT unnest(sh.s) AS b_shingle
      FROM sh JOIN bucketed USING (doc_id) WHERE bucket >= 90
    ),
    tok AS (
      SELECT doc_id, unnest(sh.s) AS shingle
      FROM sh JOIN bucketed USING (doc_id) WHERE bucket < 80
    )
    SELECT doc_id, COUNT(*) AS n_shingles, COUNT(b_shingle) AS n_matched,
           ROUND(CAST(COUNT(b_shingle) AS DOUBLE) / COUNT(*), 4) AS overlap
    FROM tok LEFT JOIN bench ON shingle = b_shingle
    GROUP BY doc_id
    HAVING CAST(COUNT(b_shingle) AS DOUBLE) / COUNT(*) >= 0.8
    """,
    tags=("llm", "pipeline", "decontamination"),
)
def decontaminate_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag TRAIN-split documents whose trigram
    shingles overlap >= 80% with the TEST split's shingle set — the n-gram
    overlap check run before pretraining so eval data never leaks into the
    training corpus (the 13-gram variant of GPT-3 appendix C; 3-grams here
    because fixture docs are short — `n` is a knob on `shingles`).

    Plan: both sides derive from one `documents` scan; the test-side
    shingle set is distinct-projected, the train side exploded, and the
    membership check is a shingle-keyed LEFT join counted per doc
    (count(b) / count(*)). At corpus scale the benchmark side is 10% of
    docs — too big to broadcast blindly, so the join is left to AQE; for a
    real fixed benchmark suite (MMLU et al., thousands of docs) the same
    plan auto-broadcasts. Membership and split are both pure functions of
    content/id, so the result is partition- and engine-invariant."""
    d = load_table(spark, sf_dir, "documents")
    bucketed = d.withColumn("bucket", _md5_bucket())
    bench = (
        shingles_long(bucketed.where(F.col("bucket") >= 90))
        .select(F.col("shingle").alias("b_shingle"))
        .distinct()
    )
    tok = shingles_long(bucketed.where(F.col("bucket") < 80)).withColumnRenamed(
        "_id", "doc_id"
    )
    counted = (
        tok.join(bench, tok.shingle == bench.b_shingle, "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("b_shingle").alias("n_matched"),
        )
    )
    frac = F.col("n_matched").cast("double") / F.col("n_shingles")
    return counted.where(frac >= 0.8).select(
        "doc_id",
        "n_shingles",
        "n_matched",
        F.round(frac, 4).alias("overlap"),
    )


@query(
    "text_repetition_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(
               regexp_replace(lower(text),'^\s+|\s+$','','g'), '\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)-1),
                    i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM t WHERE len(t) >= 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct,
           ROUND(1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE) / COUNT(*), 4)
             AS rep_frac
    FROM g GROUP BY doc_id
    ORDER BY rep_frac DESC, doc_id LIMIT 15
    """,
    tags=("llm", "pipeline", "quality", "repetition"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition screen — the Gopher/MassiveText rule
    family: looping or boilerplate-stuffed text shows up as a high
    duplicate-n-gram fraction (1 − distinct/total over trigram
    OCCURRENCES — deliberately NOT the deduped shingle set the
    similarity operators use; duplicates are the signal here). Returns
    the 15 most repetitive documents. Pure integer counts per doc — no
    float-ordering hazard — with one exploded aggregation whose
    count-distinct is per-doc (map-side combinable on the (doc, gram)
    pre-aggregate)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", ws_token_array(F.col("text")).alias("t"))
    g = toks.where(F.size("t") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.col("t")[i],
                    F.col("t")[i + 1],
                    F.col("t")[i + 2],
                ),
            )
        ).alias("s"),
    )
    counted = g.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        F.count_distinct("s").alias("n_distinct"),
    )
    return (
        counted.select(
            "doc_id",
            "n_trigrams",
            "n_distinct",
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_trigrams"),
                4,
            ).alias("rep_frac"),
        )
        .orderBy(F.desc("rep_frac"), "doc_id")
        .limit(15)
    )


@query(
    "quality_filter_funnel",
    oracle=r"""
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE nonempty) AS n_nonempty,
           COUNT(*) FILTER (WHERE nonempty AND len_ok) AS n_len_ok,
           COUNT(*) FILTER (WHERE nonempty AND len_ok AND mwl_ok) AS n_mwl_ok,
           COUNT(*) FILTER (WHERE nonempty AND len_ok AND mwl_ok AND lang = 'en')
             AS n_en
    FROM (
      SELECT source, lang,
             regexp_replace(coalesce(text,''),'^\s+|\s+$','','g') <> '' AS nonempty,
             n_tok >= 10 AS len_ok,
             n_tok > 0 AND n_alpha / n_tok BETWEEN 2.0 AND 12.0 AS mwl_ok
      FROM (
        SELECT source, lang, text,
               CAST(CASE WHEN regexp_replace(coalesce(text,''),'^\s+|\s+$','','g') = ''
                    THEN 0
                    ELSE len(string_split_regex(
                           regexp_replace(lower(text),'^\s+|\s+$','','g'), '\s+'))
               END AS DOUBLE) AS n_tok,
               CAST(length(regexp_replace(lower(coalesce(text,'')),'\s+','','g'))
                    AS DOUBLE) AS n_alpha
        FROM documents
      )
    )
    GROUP BY source
    """,
    tags=("llm", "pipeline", "quality-funnel"),
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel audit: per source, how many docs survive each
    successive filter stage (non-empty → >= 10 tokens → mean word length in
    [2, 12] → English) — the per-shard report a corpus-cleaning pipeline
    emits so a mis-tuned filter that silently drops a source is visible.
    One scan, one aggregate: every stage is a conditional count over the
    SAME pass (partial+final combine), never one job per stage. Stages are
    cumulative conjunctions, so the funnel is monotonically non-increasing
    by construction."""
    d = load_table(spark, sf_dir, "documents")
    nonempty = (
        F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"^\s+|\s+$", "")
        != ""
    )
    len_ok = ws_token_count(F.col("text")) >= 10
    mwl_ok = mean_word_length(F.col("text")).between(2.0, 12.0)
    is_en = F.col("lang") == "en"
    cnt = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return d.groupBy("source").agg(
        F.count("*").alias("n_total"),
        cnt(nonempty).alias("n_nonempty"),
        cnt(nonempty & len_ok).alias("n_len_ok"),
        cnt(nonempty & len_ok & mwl_ok).alias("n_mwl_ok"),
        cnt(nonempty & len_ok & mwl_ok & is_en).alias("n_en"),
    )


# ---------------------------------------------------------------------------
# Round-4 continuation: cluster canonicalization, PII redaction, stratified
# sampling, length histograms, embedding-norm audit, normalization audit.
# Same design rules as above: JVM column expressions only, every query a
# full DuckDB oracle, every hash/split decision a pure function of ids or
# content so results are engine- and partitioning-invariant.
# ---------------------------------------------------------------------------

# DuckDB twin of the exact n-gram-Jaccard pair predicate at threshold 3/5
# (the same all-pairs formulation used by the dedup_ngram_jaccard oracle).
_JACCARD_PAIRS_SQL = f"""
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      WHERE e.b <> r.a
    ),
    labels AS (
      SELECT a AS vid, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
    )
    SELECT comp AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_removed,
           MAX(vid) AS max_doc_id
    FROM labels GROUP BY comp
    """,
    tags=("llm", "dedup", "clusters"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER canonicalization — the production dedup end-game:
    pairwise near-dup evidence is only half the job, because near-duplicate
    relations are not transitive-closed pairlists but overlapping groups
    (A~B, B~C ⇒ {A,B,C} is one cluster even when A~C is below threshold).
    Pipeline: exact n-gram-Jaccard pairs (prefix-filtered, recall 1.0) →
    weakly connected components over the pair graph → one surviving doc per
    cluster (the minimum id — which IS the component label, since
    ``connected_components`` labels each component with its min vid).

    Output: one row per multi-doc cluster (cluster_id = surviving doc,
    n_docs, n_removed, max_doc_id). Scale: the pair graph is orders of
    magnitude smaller than the corpus (only near-dup docs appear) and the
    large-star/small-star CC converges in O(log n) rounds — the same
    operator already probed to 1M edges (operators/graph.py:381). The
    oracle computes the same closure with a recursive CTE — affordable at
    oracle scale exactly because components there are tiny."""
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold_num=3, threshold_den=5
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges)
    return comp.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.lit(1)).alias("n_removed"),
        F.max("vid").alias("max_doc_id"),
    )


@query(
    "dedup_survivor_quality",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      WHERE e.b <> r.a
    ),
    labels AS (
      SELECT a AS vid, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a
    ),
    sized AS (
      SELECT l.vid, l.comp,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
      FROM labels l JOIN documents d ON l.vid = d.doc_id
    ),
    ranked AS (
      SELECT *, row_number()
               OVER (PARTITION BY comp ORDER BY n_tok DESC, vid ASC) AS rn
      FROM sized
    )
    SELECT comp AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(CASE WHEN rn = 1 THEN vid END) AS survivor_id,
           MAX(CASE WHEN rn = 1 THEN n_tok END) AS survivor_tokens,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_removed
    FROM ranked GROUP BY comp ORDER BY cluster_id
    """,
    tags=("llm", "dedup", "clusters", "quality"),
)
def dedup_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection — what production pipelines
    actually do with a near-dup cluster: keep the BEST member (here:
    most whitespace tokens, the usual longest-version heuristic; ties to
    the smaller doc_id for determinism), not the smallest id. Same pair
    graph → connected components derivation as dedup_clusters; the
    survivor pick is a single aggregate of a lexicographic (quality,
    −doc_id) struct max — map-side combinable, NO per-cluster window
    sort, so the selection pass costs one shuffle of the (small,
    dup-only) cluster membership joined to its token counts. The oracle
    mirrors the exact tie order with arg_max over a [n_tok, −vid] list
    key."""
    from distributed_graph_database_system_spark.operators.graph import (
        connected_components,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold_num=3, threshold_den=5)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges)
    sized = comp.join(
        d.select(
            F.col("doc_id").alias("vid"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        ),
        "vid",
    )
    best = F.max(
        F.struct(F.col("n_tok").alias("q"), (-F.col("vid")).alias("nv"))
    )
    return (
        sized.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_docs"),
            (-best["nv"]).alias("survivor_id"),
            best["q"].alias("survivor_tokens"),
            (F.count("*") - F.lit(1)).alias("n_removed"),
        )
        .select(
            "cluster_id", "n_docs", "survivor_id", "survivor_tokens", "n_removed"
        )
        .orderBy("cluster_id")
    )


# PII patterns — RE2-safe subset (no lookaround/backrefs) so the Java regex
# engine (Spark) and RE2 (DuckDB) match identically; \b and \d agree between
# the engines on ASCII input.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# Deterministically planted PII (fixture text has none — auditing zero
# matches would be vacuous): docs in md5-buckets [0,10) get an email,
# [10,20) a phone number, both derived from doc_id so both engines plant
# byte-identical strings.
_PLANTED_SQL = f"""
      SELECT source,
             coalesce(text, '') ||
             CASE WHEN {_MD5_BUCKET_SQL} < 10
                  THEN ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com'
                  WHEN {_MD5_BUCKET_SQL} < 20
                  THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS t
      FROM documents
"""


@query(
    "pii_redact",
    oracle=f"""
    WITH planted AS ({_PLANTED_SQL}),
    red AS (
      SELECT source, t,
             regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS r
      FROM planted
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN len(regexp_extract_all(t, '{_EMAIL_RE}')) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_email_docs,
           CAST(SUM(CASE WHEN len(regexp_extract_all(t, '{_PHONE_RE}')) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_phone_docs,
           CAST(SUM(len(regexp_extract_all(t, '{_EMAIL_RE}'))
                    + len(regexp_extract_all(t, '{_PHONE_RE}'))) AS BIGINT)
             AS n_redactions,
           CAST(SUM(len(regexp_extract_all(r, '{_EMAIL_RE}'))
                    + len(regexp_extract_all(r, '{_PHONE_RE}'))) AS BIGINT)
             AS n_residual
    FROM red GROUP BY source
    """,
    tags=("llm", "pipeline", "pii"),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit — the scrub-before-training pass every corpus
    pipeline runs: find emails/phone numbers, replace with typed placeholder
    tokens, and report per source (a) how many docs carried each PII kind,
    (b) total redactions applied, and (c) residual matches AFTER redaction
    (must be 0 — the audit recomputes it honestly rather than asserting it).

    The fixture corpus contains no real PII, so a deterministic planted
    layer (pure function of doc_id — same strings in both engines) makes
    the audit non-vacuous; the dedup_embedding_near golden uses the same
    planted-input pattern. All regex work is JVM-side `regexp_count` /
    `regexp_replace` over one scan — per-row cost is the regex automaton,
    no Python, no shuffle beyond the final per-source aggregate."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _md5_bucket()
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(
            bucket < 10,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            bucket < 20,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.lit("")),
    )
    base = d.select("source", planted.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    n_email = F.regexp_count(F.col("t"), F.lit(_EMAIL_RE))
    n_phone = F.regexp_count(F.col("t"), F.lit(_PHONE_RE))
    n_res = F.regexp_count(redacted, F.lit(_EMAIL_RE)) + F.regexp_count(
        redacted, F.lit(_PHONE_RE)
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((n_email > 0).cast("long")).alias("n_email_docs"),
        F.sum((n_phone > 0).cast("long")).alias("n_phone_docs"),
        F.sum((n_email + n_phone).cast("long")).alias("n_redactions"),
        F.sum(n_res.cast("long")).alias("n_residual"),
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT MIN(cnt) AS mn FROM c),
    r AS (
      SELECT lang,
             GREATEST(CAST(10 AS BIGINT),
                      CAST(FLOOR(100 * mn / cnt) AS BIGINT)) AS rate
      FROM c, m
    ),
    b AS (SELECT lang, {_MD5_BUCKET_SQL} AS bucket FROM documents)
    SELECT b.lang, r.rate,
           COUNT(*) AS n_before,
           CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after
    FROM b JOIN r ON b.lang = r.lang
    GROUP BY b.lang, r.rate
    """,
    tags=("llm", "pipeline", "sampling"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced stratified downsampling: each language keeps
    `max(10, floor(100·min_count/count))`% of its docs — dominant languages
    are downsampled toward the smallest one (floor of 10% so nothing is
    wiped out), membership decided by the deterministic md5 bucket of
    doc_id, never by sampling state. Reports per-language before/after so
    the rebalance is auditable.

    The integer rate math is exact in both engines (IEEE division of
    integers whose quotient fits a double is exact, then floor), and the
    rate table is a per-language dim — broadcast-joined back to the corpus,
    so the only full shuffle is the final per-language aggregate. This is
    the deterministic replacement for `df.sampleBy()`, whose
    per-partition RNG draws are neither engine- nor repartition-stable."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    m = c.agg(F.min("cnt").alias("mn"))
    r = c.crossJoin(F.broadcast(m)).select(
        "lang",
        F.greatest(
            F.lit(10).cast("bigint"),
            F.floor(F.lit(100) * F.col("mn") / F.col("cnt")).cast("bigint"),
        ).alias("rate"),
    )
    b = d.select("lang", _md5_bucket().alias("bucket"))
    return (
        b.join(F.broadcast(r), "lang")
        .groupBy("lang", "rate")
        .agg(
            F.count("*").alias("n_before"),
            F.sum((F.col("bucket") < F.col("rate")).cast("long")).alias(
                "n_after"
            ),
        )
    )


@query(
    "token_length_histogram",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             CAST(CASE WHEN regexp_replace(coalesce(text,''),'^\s+|\s+$','','g') = ''
                  THEN 0
                  ELSE len(string_split_regex(
                         regexp_replace(lower(text),'^\s+|\s+$','','g'), '\s+'))
             END AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT source,
           CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(FLOOR(LOG2(n_tok)) AS BIGINT) END AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM tok GROUP BY source, len_bucket
    """,
    tags=("llm", "pipeline", "histogram"),
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source log2-bucketed token-length histogram — the length
    distribution a pipeline inspects before choosing packing lengths and
    truncation cutoffs (bucket k = lengths in [2^k, 2^(k+1)); empty docs in
    bucket -1). log2 of an integer is boundary-exact in IEEE754 (powers of
    two are representable and log2 of them is integral), so the floor
    cannot straddle engines. One scan, one aggregate; partial+final combine
    keeps reducer state at one row per (source, bucket)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = ws_token_count(F.col("text"))
    bucket = (
        F.when(n_tok == 0, F.lit(-1).cast("bigint"))
        .otherwise(F.floor(F.log2(n_tok)).cast("bigint"))
        .alias("len_bucket")
    )
    return d.select("source", n_tok.alias("n_tok"), bucket).groupBy(
        "source", "len_bucket"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


@query(
    "embed_norm_stats",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)
               AS q
      FROM embeddings
    ),
    pv AS (
      SELECT vec_id, label,
             CAST(SUM(q * q) AS BIGINT) AS norm2q,
             COUNT(*) AS dim
      FROM q GROUP BY vec_id, label
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           MAX(dim) AS n_dims,
           MIN(norm2q) AS min_norm2q,
           MAX(norm2q) AS max_norm2q,
           CAST(SUM(norm2q) AS DOUBLE) / COUNT(*) / 1000000 AS avg_norm2
    FROM pv GROUP BY label
    """,
    tags=("llm", "embedding", "audit"),
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm audit per label: vector counts, dimensionality, and
    min/max/mean squared L2 norm — the sanity pass that catches unnormalized
    or degenerate (near-zero) vectors before they poison cosine similarity
    and IVF training. Components are quantized to integer milli-units before
    squaring/summing (same determinism device as embed_centroids:
    float-summation order can never flip a bit), the mean is one double
    division per engine. explode → per-vector agg → per-label agg; both
    aggregates are partial+final shapes whose reducer state is O(1) per
    group, so the plan survives any corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id", "label", F.explode("embedding").alias("v")
    ).select(
        "vec_id",
        "label",
        F.floor(F.col("v").cast("double") * 1000).cast("bigint").alias("q"),
    )
    pv = q.groupBy("vec_id", "label").agg(
        F.sum(F.col("q") * F.col("q")).alias("norm2q"),
        F.count("*").alias("dim"),
    )
    return pv.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.max("dim").alias("n_dims"),
        F.min("norm2q").alias("min_norm2q"),
        F.max("norm2q").alias("max_norm2q"),
        (F.sum("norm2q").cast("double") / F.count("*") / F.lit(1000000)).alias(
            "avg_norm2"
        ),
    )


@query(
    "text_clean_normalize",
    oracle=r"""
    WITH n AS (
      SELECT source, coalesce(text, '') AS t,
             trim(regexp_replace(
                    regexp_replace(lower(coalesce(text, '')),
                                   '[^a-z0-9 ]', ' ', 'g'),
                    ' +', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN norm <> t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(length(t) - length(norm)) AS BIGINT) AS chars_removed,
           CAST(SUM(length(norm)) AS BIGINT) AS total_norm_chars
    FROM n GROUP BY source
    """,
    tags=("llm", "pipeline", "normalize"),
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-normalization audit: lowercase, map every non-[a-z0-9 ] char to
    a space, collapse runs of spaces, trim — the canonicalization applied
    before shingling/fingerprinting — and report per source how many docs
    changed and how many characters the cleanup removed (length is
    monotone non-increasing under these rewrites, so `chars_removed` is a
    true shrinkage measure). Pure codegen'd string expressions over one
    scan; the regex classes are ASCII-explicit so Java regex and RE2 agree
    byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^a-z0-9 ]", " "), r" +", " "
        )
    )
    base = d.select("source", t.alias("t"), norm.alias("norm"))
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("norm") != F.col("t")).cast("long")).alias("n_changed"),
        F.sum(F.length("t") - F.length("norm")).alias("chars_removed"),
        F.sum(F.length("norm")).alias("total_norm_chars"),
    )


@query(
    "sample_weighted_reservoir",
    oracle="""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             ROUND(
               ln(GREATEST(
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  / 4294967296.0), 1e-300))
               / GREATEST(CAST(n_chars AS DOUBLE), 1.0), 10) AS k
      FROM documents
    ), ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rank
      FROM keyed
    )
    SELECT lang, rank, doc_id, n_chars FROM ranked WHERE rank <= 20
    """,
    tags=("llm", "pipeline", "sampling", "weighted"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): per doc, key = ln(u)/w with u an md5-derived uniform
    and w the weight (doc length here — sampling probability proportional
    to size); the top-k keys per language are exactly a PPS-without-
    replacement draw. Unlike rand()-based sampling, membership is a pure
    function of doc_id — reproducible across engines, runs, partitionings,
    and retries, which is what makes a sampled training mix auditable.
    One window per group — no driver-side state; the key is rounded to 10
    decimals on BOTH engines so a 1-ulp libm difference in ln() can't flip
    a selection at the boundary."""
    from distributed_graph_database_system_spark.queries.helpers import md5_uniform

    d = load_table(spark, sf_dir, "documents")
    u = md5_uniform("doc_id")
    w = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    key = F.round(F.log(F.greatest(u, F.lit(1e-300))) / w, 10)
    ranked = d.withColumn("_k", key).select(
        "lang",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("lang").orderBy(F.col("_k").desc(), "doc_id"))
        .alias("rank"),
    )
    return ranked.where(F.col("rank") <= 20).select("lang", "rank", "doc_id", "n_chars")


@query(
    "snapshot_diff_corpus",
    oracle="""
    WITH newv AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text ELSE text END AS text
      FROM documents WHERE doc_id % 13 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, 'new doc ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT change_type, COUNT(*) AS n FROM (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
             END AS change_type
      FROM documents o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id
    ) WHERE change_type IS NOT NULL
    GROUP BY change_type
    """,
    tags=("llm", "pipeline", "diff", "versioning"),
)
def snapshot_diff_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus versioning: row-level diff between the fixture corpus and a
    deterministically derived "next crawl" (every 13th doc dropped, every
    7th rewritten, one new doc per 11th) — counts per change class. The
    operator (operators/diff.py) is one full-outer join on the key with
    NULL-safe value comparison; here summarized so the oracle compares
    class counts rather than 5k per-row tags (the per-row path is asserted
    in tests/test_pipeline.py)."""
    from distributed_graph_database_system_spark.operators.diff import snapshot_diff

    old = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = old.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("v2 "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = old.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias("text"),
    )
    new = kept.unionByName(added)
    return (
        snapshot_diff(old, new, key_cols=["doc_id"], compare_cols=["text"])
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "sample_weighted_priority",
    oracle="""
    WITH k AS (
      SELECT o_orderpriority, o_orderkey,
             o_totalprice /
               ((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                / 4294967297.0) AS pk
      FROM orders
    ), r AS (
      SELECT o_orderpriority, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY pk DESC, o_orderkey) AS rank
      FROM k
    )
    SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank, o_orderkey
    FROM r WHERE rank <= 5 ORDER BY o_orderpriority, rank
    """,
    tags=("llm", "sampling", "weighted"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield-Lund-Thorup): each row gets priority w/u with u a
    deterministic md5-uniform in (0,1], and the sample is the top-k
    priorities per stratum — inclusion probability ≈ proportional to
    weight, with unbiased subset-sum estimators. Chosen over the
    Efraimidis-Spirakis u^(1/w) key on purpose: the priority is ONE IEEE
    division (no pow/ln), so the key — and therefore sample MEMBERSHIP —
    is bit-identical in any engine, which the oracle asserts.

    Scale: per-stratum top-k is rank-then-filter here (one window); the
    100 TB form is the same partial top-k every TakeOrderedAndProject
    does — each partition keeps its local k before the per-stratum merge,
    so no global sort materializes. Membership is a pure function of
    (orderkey, weight): re-running on a replica or after repartitioning
    reproduces the exact sample — the property that makes downstream
    training-set builds reproducible."""
    from distributed_graph_database_system_spark.queries.helpers import md5_uniform

    o = load_table(spark, sf_dir, "orders")
    # u in (0, 1]: (h+1)/2^32+1 — never 0, so w/u is always finite.
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("pk"), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            (F.col("o_totalprice") / u).alias("pk"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select("o_orderpriority", "rank", "o_orderkey")
        .orderBy("o_orderpriority", "rank")
    )


@query(
    "pii_luhn_validation",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             '4532' || lpad(CAST(doc_id * 7919 % 1000000000000 AS VARCHAR), 12, '0')
               AS num
      FROM documents WHERE doc_id % 10 = 0
    ), digits AS (
      SELECT doc_id, num,
             list_reverse([CAST(x AS INT) FOR x IN string_split(num, '') IF x <> ''])
               AS ds
      FROM planted
    )
    SELECT doc_id, num,
           CAST(list_sum([CASE WHEN (i % 2) = 0 THEN ds[i+1]
                          ELSE CASE WHEN ds[i+1] * 2 > 9 THEN ds[i+1] * 2 - 9
                               ELSE ds[i+1] * 2 END END
                          FOR i IN range(len(ds))]) % 10 = 0 AS BOOLEAN)
             AS luhn_ok
    FROM digits ORDER BY doc_id
    """,
    tags=("llm", "pipeline", "pii", "luhn"),
)
def pii_luhn_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum validation for candidate payment-card numbers (the
    false-positive filter behind PII card redaction: a 16-digit run is
    only sensitive if it Luhn-validates). Deterministic planted
    candidates (pure function of doc_id, identical strings both engines);
    the checksum itself is a pure JVM higher-order expression — reverse
    the digit array, double every second digit with the 9-subtraction,
    aggregate mod 10 — no UDF, so it runs at scan throughput inside the
    redaction pipeline (pii_redact)."""
    d = load_table(spark, sf_dir, "documents")
    num = F.concat(
        F.lit("4532"),
        F.lpad(((F.col("doc_id") * 7919) % 1000000000000).cast("string"), 12, "0"),
    )
    planted = d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", num.alias("num")
    )
    ds = F.reverse(
        F.filter(F.split("num", ""), lambda x: x != "")
    )
    terms = F.transform(
        ds,
        lambda x, i: F.when(i % 2 == 0, x.cast("int")).otherwise(
            F.when(x.cast("int") * 2 > 9, x.cast("int") * 2 - 9).otherwise(
                x.cast("int") * 2
            )
        ),
    )
    luhn_ok = (
        F.aggregate(terms, F.lit(0), lambda acc, t: acc + t) % 10 == 0
    )
    return planted.select("doc_id", "num", luhn_ok.alias("luhn_ok")).orderBy(
        "doc_id"
    )


@query(
    "embed_centroid_classifier_eval",
    oracle="""
    WITH q AS (
      SELECT vec_id, label AS true_label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings
    ), cs AS (
      SELECT true_label AS cent_label, dim, SUM(qv) AS s, COUNT(*) AS n
      FROM q GROUP BY true_label, dim
    ), cent AS (
      SELECT cent_label, dim, CAST(s AS DOUBLE) / n / 1000000 AS c FROM cs
    ), t AS (
      SELECT q.vec_id, q.true_label, cent.cent_label,
             SUM(CAST(ROUND(
                   (CAST(q.qv AS DOUBLE) / 1000000 - cent.c)
                   * (CAST(q.qv AS DOUBLE) / 1000000 - cent.c), 12)
                 AS DECIMAL(24,12))) AS dist2
      FROM q JOIN cent ON q.dim = cent.dim
      GROUP BY q.vec_id, q.true_label, cent.cent_label
    ), p AS (
      SELECT vec_id, true_label, cent_label AS pred_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist2, cent_label) AS rk
      FROM t
    )
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM p WHERE rk = 1
    GROUP BY true_label, pred_label
    ORDER BY true_label, pred_label
    """,
    tags=("llm", "embedding", "classifier", "evaluation"),
)
def embed_centroid_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier evaluation — the confusion matrix of
    predicting each vector's label by its closest per-label centroid
    (Rocchio / class-prototype classification, the standard first
    baseline over any labeled embedding table). Determinism discipline
    end-to-end: components quantize to integer micro-units (the
    embed_centroids precedent) so centroid means are one identical IEEE
    division; each squared-difference term rounds to 12 decimals into
    exact DECIMAL sums, so distances compare identically in both engines;
    argmin breaks ties by (distance, label) total order via row_number.

    Scale shape: the centroid table is |labels|×dims rows (broadcast at
    any corpus size); the distance pass is one explode + broadcast join +
    partial-agg groupBy — no vector ever meets another vector, unlike
    kNN eval (which needs the ANN index path)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "true_label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000).cast("bigint").alias(
            "qv"
        ),
    )
    cs = q.groupBy(
        F.col("true_label").alias("cent_label"), "dim"
    ).agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
    cent = cs.select(
        "cent_label",
        "dim",
        (F.col("s").cast("double") / F.col("n") / 1000000).alias("c"),
    )
    dv = F.col("qv").cast("double") / 1000000 - F.col("c")
    t = (
        q.join(F.broadcast(cent), "dim")
        .select(
            "vec_id",
            "true_label",
            "cent_label",
            F.round(dv * dv, 12).cast("decimal(24,12)").alias("term"),
        )
        .groupBy("vec_id", "true_label", "cent_label")
        .agg(F.sum("term").alias("dist2"))
    )
    p = t.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("vec_id").orderBy("dist2", "cent_label")
        ),
    ).where(F.col("rk") == 1)
    return (
        p.groupBy("true_label", F.col("cent_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .orderBy("true_label", "pred_label")
    )


@query(
    "embed_knn_classifier_eval",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings WHERE vec_id < 200
    ), d AS (
      SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb, b.label AS lb,
             SUM((a.qv - b.qv) * (a.qv - b.qv)) AS dist2
      FROM q a JOIN q b ON a.dim = b.dim AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, a.label, b.vec_id, b.label
    ), nn AS (
      SELECT va, la, lb,
             row_number() OVER (PARTITION BY va ORDER BY dist2, vb) AS rk
      FROM d
    ), votes AS (
      SELECT va, la AS true_label, lb AS cand, COUNT(*) AS nv
      FROM nn WHERE rk <= 5 GROUP BY va, la, lb
    ), pick AS (
      SELECT va, true_label, cand AS pred_label,
             row_number() OVER (PARTITION BY va
                                ORDER BY nv DESC, cand) AS pr
      FROM votes
    )
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM pick WHERE pr = 1
    GROUP BY true_label, pred_label
    ORDER BY true_label, pred_label
    """,
    tags=("llm", "embedding", "knn", "evaluation"),
)
def embed_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN classifier confusion matrix on a deterministic
    200-vector evaluation slice — the standard label-quality /
    embedding-quality diagnostic. EXACT integer arithmetic end-to-end:
    components quantize to micro-units, squared L2 distances are integer
    sums (no float comparison anywhere), neighbor rank ties break by
    vec_id and vote ties by smallest label — every step totally ordered,
    so both engines agree bit-for-bit at every SF (this oracle is a real
    cross-engine SQL program, not a pinned golden; the fixed eval slice
    is what bounds the pair join). At corpus scale the same eval swaps
    the brute-force pair join for the ANN path
    (operators/similarity.py knn_join / IVF) — this query is the exact
    ground-truth twin those approximations are measured against in
    tests/test_llm.py recall tests."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    q = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000).cast("bigint").alias(
            "qv"
        ),
    )
    a = q.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        "dim",
        F.col("qv").alias("qa"),
    )
    b = q.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        "dim",
        F.col("qv").alias("qb"),
    )
    d = (
        a.join(b, "dim")
        .where(F.col("va") != F.col("vb"))
        .groupBy("va", "la", "vb", "lb")
        .agg(
            F.sum(
                (F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb"))
            ).alias("dist2")
        )
    )
    nn = d.withColumn(
        "rk", F.row_number().over(W.partitionBy("va").orderBy("dist2", "vb"))
    ).where(F.col("rk") <= 5)
    votes = nn.groupBy(
        "va", F.col("la").alias("true_label"), F.col("lb").alias("cand")
    ).agg(F.count(F.lit(1)).alias("nv"))
    pick = votes.withColumn(
        "pr",
        F.row_number().over(
            W.partitionBy("va").orderBy(F.desc("nv"), "cand")
        ),
    ).where(F.col("pr") == 1)
    return (
        pick.groupBy("true_label", F.col("cand").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .orderBy("true_label", "pred_label")
    )


@query(
    "corpus_mix_plan",
    oracle="""
    WITH w(lang, wt) AS (
      VALUES ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.15 AS DOUBLE)),
             ('fr', CAST(0.15 AS DOUBLE)), ('es', CAST(0.1 AS DOUBLE)),
             ('zh', CAST(0.1 AS DOUBLE))
    ), n AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), j AS (
      SELECT w.lang, w.wt, n.n_docs FROM w JOIN n ON n.lang = w.lang
    ), t AS (
      SELECT MIN(CAST(n_docs AS DOUBLE) / wt) AS cap FROM j
    ), r AS (
      SELECT j.lang, j.wt, j.n_docs, (t.cap * j.wt) / j.n_docs AS rate
      FROM j, t
    ), sel AS (
      SELECT d.lang, COUNT(*) AS n_selected
      FROM documents d JOIN r ON d.lang = r.lang
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967296.0 < r.rate
      GROUP BY d.lang
    )
    SELECT r.lang AS lang, r.wt AS weight,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           ROUND(r.rate, 6) AS rate,
           CAST(COALESCE(sel.n_selected, 0) AS BIGINT) AS n_selected
    FROM r LEFT JOIN sel ON sel.lang = r.lang
    ORDER BY lang
    """,
    tags=("llm", "pipeline", "mixing", "sampling"),
)
def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planner: given target language weights (the Pile /
    DoReMi-style mixture spec), compute the largest downsample-only
    corpus honoring them — cap = min_l(n_l / w_l) sets the achievable
    total, rate_l = cap·w_l / n_l the per-language keep rate — then
    materialize the per-language selection with the md5_uniform
    deterministic coin (membership is a pure function of doc_id, so the
    mix is reproducible and decontamination-stable across reruns and
    engines). One groupBy for the histogram, a broadcast of the
    |languages|-row rate table, one filtered count — at 100 TB the plan
    costs a scan, and the selection filter fuses into whatever consumes
    it (no materialized intermediate)."""
    from distributed_graph_database_system_spark.queries.helpers import (
        md5_uniform,
    )

    weights = {"en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.1, "zh": 0.1}
    d = load_table(spark, sf_dir, "documents")
    w = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(weights.items())],
        "lang STRING, wt DOUBLE",
    )
    n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    j = w.join(n, "lang")
    cap = j.agg(
        F.min(F.col("n_docs").cast("double") / F.col("wt")).alias("cap")
    )
    r = j.crossJoin(F.broadcast(cap)).select(
        "lang",
        "wt",
        "n_docs",
        ((F.col("cap") * F.col("wt")) / F.col("n_docs")).alias("rate"),
    )
    sel = (
        d.join(F.broadcast(r.select("lang", "rate")), "lang")
        .where(md5_uniform("doc_id") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_selected"))
    )
    return (
        r.join(sel, "lang", "left")
        .select(
            "lang",
            F.col("wt").alias("weight"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("rate", 6).alias("rate"),
            F.coalesce("n_selected", F.lit(0)).cast("bigint").alias(
                "n_selected"
            ),
        )
        .orderBy("lang")
    )


@query(
    "embed_similarity_histogram",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings WHERE vec_id < 200
    ), d AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             SUM(a.qv * b.qv) AS dot,
             SUM(a.qv * a.qv) AS na,
             SUM(b.qv * b.qv) AS nb
      FROM q a JOIN q b ON a.dim = b.dim AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ), c AS (
      SELECT CAST(FLOOR(CAST(dot AS DOUBLE)
                        / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)))
                        * 10) AS INT) AS bin
      FROM d WHERE na > 0 AND nb > 0
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM c GROUP BY bin ORDER BY bin
    """,
    tags=("llm", "embedding", "diagnostics", "histogram"),
)
def embed_similarity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine-similarity histogram over the fixed 200-vector
    eval slice — the embedding-collapse diagnostic: a healthy space
    spreads mass across bins, a collapsed one piles into the top bin
    (anisotropy/cone effect). Cross-engine float story: quantized-integer
    dot products and squared norms are EXACT; the only float ops are one
    division, two square roots and a multiply — all IEEE correctly-
    rounded operations, so both engines produce bit-identical cosines and
    the 0.1-bin floor needs no rounding guard at all (unlike libm
    transcendentals — see events_periodogram). Bin index =
    floor(cos·10) ∈ [-10, 9]."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    q = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000).cast("bigint").alias(
            "qv"
        ),
    )
    a = q.select(
        F.col("vec_id").alias("va"), "dim", F.col("qv").alias("qa")
    )
    b = q.select(
        F.col("vec_id").alias("vb"), "dim", F.col("qv").alias("qb")
    )
    d = (
        a.join(b, "dim")
        .where(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("dot"),
            F.sum(F.col("qa") * F.col("qa")).alias("na"),
            F.sum(F.col("qb") * F.col("qb")).alias("nb"),
        )
        .where((F.col("na") > 0) & (F.col("nb") > 0))
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        d.select(F.floor(cos * 10).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("bin")
    )
