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
from distributed_graph_database_system_spark.operators.textstats import (
    mean_word_length,
    ws_token_count,
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
