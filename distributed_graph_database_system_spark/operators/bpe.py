"""Byte-pair-encoding vocabulary training over a distributed corpus.

The tokenizer-building step of an LLM data pipeline (Sennrich et al. 2016;
the GPT-2 ``get_stats``/``merge_vocab`` loop), restructured for Spark's
execution model:

- the corpus collapses ONCE to a (word, count) vocabulary — BPE statistics
  depend only on word frequencies, so all per-iteration work runs on the
  vocab relation (≪ corpus; bounded by distinct-word count), not the corpus;
- each merge iteration is one partial-aggregated groupBy over exploded
  adjacent symbol pairs (weighted by word count, overlaps counted — the
  reference convention) plus a 1-row ordered ``head`` to pick the best pair
  (exact integer counts; ties broken lexicographically so the winner is
  unique and engine-independent);
- applying the winning merge is a per-word Arrow-batched transform
  (left-to-right non-overlapping replacement) — embarrassingly parallel;
- ``localCheckpoint`` between iterations cuts the growing lineage, the same
  discipline as the iterative graph operators (operators/graph.py).

Determinism: integer counts + total tie order ⇒ the merge sequence is a pure
function of the corpus, whatever the partitioning — asserted against a
single-process pure-Python reference in tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from distributed_graph_database_system_spark.operators.textstats import ws_tokens

_VOCAB_SCHEMA = StructType(
    [
        StructField("syms", ArrayType(StringType())),
        StructField("cnt", LongType()),
    ]
)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms: array<string>, cnt): the distinct-word frequency table with
    each word exploded to single-character symbols — the only pass that
    touches the corpus."""
    words = docs.select(
        F.explode(ws_tokens(F.col(text_col))).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.split("word", "").alias("syms"), "cnt")
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, pair_count): adjacent-symbol pair frequencies weighted
    by word count. One explode + one groupBy; map-side combine absorbs the
    Zipf head exactly as in the token-count paths."""
    pairs = vocab.where(F.size("syms") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.col("syms")[i].alias("left"),
                    F.col("syms")[i + 1].alias("right"),
                ),
            )
        ).alias("p"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("cnt").alias("pair_count"))


def _merge_vocab(vocab: DataFrame, left: str, right: str) -> DataFrame:
    def apply_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged = left + right
        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                syms = list(syms)
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                out_syms.append(out)
            yield pd.DataFrame({"syms": out_syms, "cnt": pdf["cnt"]})

    return vocab.mapInPandas(apply_batches, schema=_VOCAB_SCHEMA)


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """The merge table: [(rank, left, right, pair_count)] for the first
    ``n_merges`` BPE merges. Driver loop bounded by n_merges; per iteration
    one vocab aggregation + a single-row argmax collect + one parallel
    merge transform."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_count"), "left", "right")
            .head(1)
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b["left"], b["right"], int(b["pair_count"])))
        vocab = _merge_vocab(vocab, b["left"], b["right"]).localCheckpoint()
    return merges


def bpe_train_py(
    texts: list[str], n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Single-process reference implementation (test oracle): identical
    tokenization (ws_tokens_py), identical overlap-counting and
    lexicographic tie-break."""
    from collections import Counter

    from distributed_graph_database_system_spark.operators.dedup import ws_tokens_py

    vocab = Counter()
    for t in texts:
        for w in ws_tokens_py(t):
            vocab[w] += 1
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in vocab.items()
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        stats: Counter = Counter()
        for syms, c in words:
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        merged = left + right
        new_words = []
        for syms, c in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, c))
        words = new_words
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table to every document: chars → iteratively
    merged symbols, merges applied in RANK order (the standard BPE encode).
    One Arrow-batched pass per document with the (tiny) merge list closed
    over — embarrassingly parallel, no shuffle. Returns
    ``(doc_id, n_tokens, n_symbols)``: whitespace-token count and the
    total post-merge symbol count (the sequence length a trainer would
    see)."""
    pairs = [(left, right) for _, left, right, _ in merges]

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("n_symbols", LongType()),
        ]
    )

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from distributed_graph_database_system_spark.operators.dedup import (
            ws_tokens_py,
        )

        def encode_word(w: str) -> int:
            syms = list(w)
            for left, right in pairs:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return len(syms)

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = ws_tokens_py(text)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_tokens": len(toks),
                        "n_symbols": sum(encode_word(w) for w in toks),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        encode_batches, schema=out_schema
    )
