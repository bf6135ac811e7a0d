"""Text-analysis pipeline operators over the documents table — the
training-data-pipeline extension surface (language ID, quality scoring,
token counting, fingerprinting, chunking). All JVM-side expressions;
each is oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators.chunker import chunk_documents, duckdb_chunk_sql
from sales_agent_graphdb_spark.registry import register

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic tie-break: first language in this order wins.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "zh": ["的", "是", "不", "了", "在", "人", "有"],
}

CHUNK_SIZE, CHUNK_OVERLAP = 120, 20  # docs are 48-553 chars; reference
# constants are 1000/200 (db_service.py:209-212) — same operator,
# smaller size so the testdata actually splits.


def _tokens(c: Column) -> Column:
    return F.split(F.trim(c), r"\s+")


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_actual,
           CAST(length(replace(text, ' ', '')) AS INT) AS n_nonspace
    FROM documents ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + char counts — the
    unit-economics columns of a training-data pipeline."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
        F.length(F.regexp_replace("text", " ", "")).cast("int").alias("n_nonspace"),
    ).orderBy("doc_id")


_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+"


@register(
    "text_bpe_token_estimate",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS INT) AS n_bpe_pieces,
           CAST(ceil(length(text) / 4.0) AS INT) AS n_chars_div4
    FROM documents ORDER BY doc_id
    """,
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (space-prefixed letter runs / short digit runs / punctuation runs /
    whitespace) counts merge-candidate pieces, plus the crude chars/4
    estimate — both pure JVM regex, no tokenizer library."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)).alias("n_bpe_pieces"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("n_chars_div4"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS toks,
             length(text) AS n
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(n AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is'))) AS DOUBLE)
             / len(toks) AS stopword_ratio,
           (len(toks) BETWEEN 5 AND 1000) AND
             (CAST(len(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is'))) AS DOUBLE)
               / len(toks) > 0.01) AS passes_quality
    FROM t ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio heuristics (the
    C4/Gopher-style filter family) as pure column math."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    en = LANG_STOPWORDS["en"]
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*en)))
    n_tokens = F.size(toks)
    stop_ratio = stop_hits.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.length("text").cast("double") / n_tokens).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (n_tokens.between(5, 1000) & (stop_ratio > 0.01)).alias("passes_quality"),
    ).orderBy("doc_id")


def _stopword_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda w: w.isin(*words)))


def _lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: _stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


@register(
    "text_langid",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
             len(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is'))) AS s_en,
             len(list_filter(toks, w -> w IN ('der','die','das','und','ist','ein','nicht'))) AS s_de,
             len(list_filter(toks, w -> w IN ('el','la','de','que','y','en','un'))) AS s_es,
             len(list_filter(toks, w -> w IN ('le','la','et','les','des','un','une'))) AS s_fr,
             len(list_filter(toks, w -> w IN ('的','是','不','了','在','人','有'))) AS s_zh
      FROM t)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
                WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
                WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM s ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-hit scoring with a deterministic
    priority tie-break (en > de > es > fr > zh)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    s = _lang_scores(toks)
    predicted = (
        F.when(s["en"] >= F.greatest(s["de"], s["es"], s["fr"], s["zh"]), "en")
        .when(s["de"] >= F.greatest(s["es"], s["fr"], s["zh"]), "de")
        .when(s["es"] >= F.greatest(s["fr"], s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), predicted.alias("predicted_lang")
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
           CAST(('0x' || substr(md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')), 1, 15)) AS BIGINT)
             % 1024 AS shard
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over alnum-normalized content +
    a derived shard bucket (the distribution key a 100 TB dedup would
    partition on)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    fp = F.md5(norm)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        (F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint") % 1024).alias("shard"),
    ).orderBy("doc_id")


@register(
    "f11_chunk_documents",
    oracle=duckdb_chunk_sql(CHUNK_SIZE, CHUNK_OVERLAP) + " ORDER BY doc_id, chunk_idx",
)
def f11_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — the 1000/200 chunker (reference db_service.py:209-212) as
    sequence→transform→explode; run at 120/20 so sf-testdata documents
    actually split. chunk_id surrogate column is dropped here so the
    oracle compares the pure chunking function."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return (
        chunk_documents(d, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
        .select("doc_id", "chunk_idx", "chunk_text")
        .orderBy("doc_id", "chunk_idx")
    )
