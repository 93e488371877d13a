"""JSONL document-corpus source with corrupt-record quarantine.

Web corpora overwhelmingly arrive as (gzipped) JSON-lines drops. This
source reads them with an EXPLICIT schema (never inferSchema — schema
inference is an extra full pass over 100 TB and non-deterministic
across drops), quarantines malformed lines instead of silently
dropping or failing on them, and normalizes to the engine's canonical
``documents`` shape so every downstream operator (dedup, quality,
packing, …) applies unchanged.

Spark-native details that matter at scale:

- malformed lines become quarantine rows carrying the raw text — the
  ingest ships a per-drop audit (count + samples) instead of a crash
  at hour three.
- gzip JSONL is NOT splittable: one file = one task regardless of
  size, so the reader exposes ``repartition_to`` to restore
  parallelism right after the scan (many small .gz drops parallelize
  naturally; a single 1 TB .gz does not — re-shard upstream).
- Missing keys are NULL columns (schema is the contract); extra keys
  are ignored by the projection — both are the desired drop-to-drop
  tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical corpus schema (matches testdata documents.parquet)
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = CORPUS_SCHEMA,
    repartition_to: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL drop → ``(good, quarantine)`` frames.

    ``good`` carries the schema columns plus ``n_chars`` (computed, the
    canonical shape); ``quarantine`` carries the raw malformed lines.
    Both come from ONE scan definition, so the split is a filter, not a
    second read of the files.

    Parsing is explicit — ``spark.read.text`` + ``from_json`` — rather
    than the json reader's internal ``_corrupt_record`` column: Spark
    refuses any downstream query whose referenced file columns prune to
    only the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN, e.g. a
    plain ``quarantine.count()``), and the documented workaround is
    caching the whole parse — a non-starter at corpus scale.
    ``from_json`` yields NULL for a malformed line and a (possibly
    null-fielded) struct otherwise, which is exactly the split.
    """
    raw = spark.read.text(path)
    if repartition_to:
        raw = raw.repartition(int(repartition_to))
    # from_json alone is too forgiving: it partially parses some
    # malformed lines (e.g. an unterminated string) into a struct.
    # try_parse_json is the STRICT validity authority; from_json then
    # only shapes lines that passed it. (Older Sparks without
    # try_parse_json fall back to the from_json-null test.)
    strict = getattr(F, "try_parse_json", None)
    ok = F.from_json("value", schema).isNotNull()
    if strict is not None:
        ok = ok & strict(F.col("value")).isNotNull()
    parsed = raw.select(
        F.col("value"), ok.alias("__ok"), F.from_json("value", schema).alias("__j")
    ).filter(F.trim(F.col("value")) != "")
    good = (
        parsed.filter(F.col("__ok"))
        .select("__j.*")
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    quarantine = parsed.filter(~F.col("__ok")).select(
        F.col("value").alias("raw_line")
    )
    return good, quarantine


def ingest_report(quarantine: DataFrame, sample: int = 5) -> dict:
    """Per-drop audit: malformed-line count + first samples.

    quarantine is a filter over the raw text scan, so unpinned the
    count() and the sample collect() would each re-read and re-parse
    the entire drop; pinning parses once and reuses the (truncated)
    quarantined lines. NOT a collect_list aggregate: an all-corrupt
    drop would buffer every line in one agg state, where checkpoint
    blocks spill to executor disk."""
    pinned = quarantine.select(
        F.substring("raw_line", 1, 200).alias("raw_line")
    ).localCheckpoint(eager=False)
    n = pinned.count()
    examples = [r.raw_line for r in pinned.limit(int(sample)).collect()]
    return {"n_corrupt": n, "samples": examples}
