"""Per-batch inverted text index for the versioned corpus store:
term-level search without a full-corpus text scan (the posting-list
complement of the Bloom index's exact-key pruning).

Why an engine for 100 TB needs this: "find every document containing
these terms" — takedown audits, eval-contamination spot checks,
targeted re-annotation — is a full text scan per query on a store
with no index. An inverted index holds (token, key) postings per
immutable batch; a conjunctive term query then (1) prunes to the
batches whose index contains ALL query terms, (2) resolves matching
keys from the candidate batches' postings alone, and (3) scans ONLY
those batches' payloads for the matched keys. Text is tokenized
once, at index build — never again at query time.

Layout: ``store/_indexes/text_<col>/b000001/`` — one parquet
directory per batch holding (token, key) rows, distinct per
document, sorted by token so term predicates prune parquet row
groups. Index directories are immutable like their batches, written
atomically (temp dir + rename), consulted only through the
manifest's batch list, and incremental by construction: each
maintenance call indexes NEW batches only (O(delta), the same
posture as the store's upsert path).

Reference frame: the reference serves only key/time/space-addressed
reads (querying/QueryingController.java:98-167); content-addressed
search over the stored corpus is an extension the training-data
mandate needs.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_pipeline_spark.sources.versioned import (
    _DATA,
    _manifest_path,
    latest_version,
)


def _tindex_dir(store_dir: str, text_col: str) -> str:
    return os.path.join(store_dir, "_indexes", f"text_{text_col}")


def build_text_index(
    spark: SparkSession,
    store_dir: str,
    text_col: str = "text",
    key: str = "doc_id",
    version: int | None = None,
    index_partitions: int = 2,
) -> int:
    """Index every batch of ``version`` (default latest) that lacks
    an index; returns how many batches were newly indexed. Each
    batch's postings are one scan of THAT batch: lowercase
    whitespace tokens, distinct per document (`array_distinct`
    before the explode — the index answers membership, not term
    frequency), range-partitioned and sorted by token so a term
    predicate reads only the row groups that can contain it.
    ``index_partitions`` sizes the per-batch posting files — scale
    it with batch size (it bounds write parallelism and file count,
    never correctness)."""
    if version is None:
        version = latest_version(store_dir)
    with open(_manifest_path(store_dir, version)) as f:
        batches = json.load(f)["batches"]
    idir = _tindex_dir(store_dir, text_col)
    os.makedirs(idir, exist_ok=True)
    built = 0
    for b in batches:
        out = os.path.join(idir, b)
        if os.path.exists(out):
            continue
        src = spark.read.parquet(os.path.join(store_dir, _DATA, b))
        postings = (
            src.where(F.col(text_col).isNotNull())
            .select(
                F.col(key),
                F.explode(
                    F.array_distinct(
                        F.split(F.lower(F.col(text_col)), " ")
                    )
                ).alias("token"),
            )
            .select("token", key)
        )
        tmp = os.path.join(idir, f".tmp_{b}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            postings.repartitionByRange(index_partitions, "token")
            .sortWithinPartitions("token")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(tmp, out)
        built += 1
    return built


def search_text_index(
    spark: SparkSession,
    store_dir: str,
    terms: list[str],
    text_col: str = "text",
    key: str = "doc_id",
    version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Conjunctive (AND) term search through the index: returns
    (matched payload rows, stats). Three stages, none of which
    touches text:

    1. **Batch pruning**: one read of the posting lists with the
       term IN-list pushed into the token-sorted parquet — a batch
       is a candidate only if its index contains EVERY query term
       (necessary condition; kilobyte-bounded decision, computed
       where partition pruning is: on the driver).
    2. **Key resolution**: within candidate batches, a document
       matches when its distinct-token postings cover all terms —
       group by key, countDistinct(token) == len(terms). Postings
       only; no false positives to verify away.
    3. **Payload fetch**: scan ONLY the candidate batches' data
       directories, semi-joined to the matched keys.

    Raises if any batch of the version lacks an index — a silently
    partial index would return silently partial results."""
    if not terms:
        raise ValueError("empty term list")
    terms_lc = sorted({t.lower() for t in terms})
    if version is None:
        version = latest_version(store_dir)
    with open(_manifest_path(store_dir, version)) as f:
        batches = json.load(f)["batches"]
    idir = _tindex_dir(store_dir, text_col)
    missing = [
        b for b in batches if not os.path.isdir(os.path.join(idir, b))
    ]
    if missing:
        raise ValueError(
            f"text index missing for batches {missing}; run "
            "build_text_index first (a partial index would return "
            "partial results)"
        )
    idx = (
        spark.read.parquet(*[os.path.join(idir, b) for b in batches])
        .where(F.col("token").isin(terms_lc))
        .withColumn(
            "_b",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"/(b\d{6})/[^/]+$", 1
            ),
        )
    )
    per_batch = (
        idx.groupBy("_b")
        .agg(F.countDistinct("token").alias("nt"))
        .where(F.col("nt") == len(terms_lc))
        .collect()
    )
    cand = sorted(r["_b"] for r in per_batch)
    stats = {
        "batches_total": len(batches),
        "batches_scanned": len(cand),
    }
    if not cand:
        empty = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(store_dir, _DATA, b) for b in batches])
            .limit(0)
        )
        return empty, stats
    matched = (
        idx.where(F.col("_b").isin(cand))
        .groupBy(key)
        .agg(F.countDistinct("token").alias("nt"))
        .where(F.col("nt") == len(terms_lc))
        .select(key)
    )
    payload = (
        spark.read.option("mergeSchema", "true")
        .parquet(*[os.path.join(store_dir, _DATA, b) for b in cand])
        .join(matched, key, "left_semi")
    )
    return payload, stats


# --- Positional index + phrase search (round 11) ----------------------------


def _pindex_dir(store_dir: str, text_col: str) -> str:
    return os.path.join(store_dir, "_indexes", f"pos_{text_col}")


def build_positional_index(
    spark: SparkSession,
    store_dir: str,
    text_col: str = "text",
    key: str = "doc_id",
    version: int | None = None,
    index_partitions: int = 2,
) -> int:
    """Positional postings (token, key, pos) per batch — the phrase-
    search upgrade of the membership index: token positions from ONE
    posexplode at build time mean phrase adjacency is decided from
    postings alone, text never re-tokenized. Same lifecycle contract
    as build_text_index: immutable per-batch directories, atomic
    rename, incremental (new batches only), token-sorted for row-
    group pruning."""
    if version is None:
        version = latest_version(store_dir)
    with open(_manifest_path(store_dir, version)) as f:
        batches = json.load(f)["batches"]
    idir = _pindex_dir(store_dir, text_col)
    os.makedirs(idir, exist_ok=True)
    built = 0
    for b in batches:
        out = os.path.join(idir, b)
        if os.path.exists(out):
            continue
        src = spark.read.parquet(os.path.join(store_dir, _DATA, b))
        postings = (
            src.where(F.col(text_col).isNotNull())
            .select(
                F.col(key),
                F.posexplode(
                    F.split(F.lower(F.col(text_col)), " ")
                ).alias("pos", "token"),
            )
            .select("token", key, F.col("pos").cast("long").alias("pos"))
        )
        tmp = os.path.join(idir, f".tmp_{b}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            postings.repartitionByRange(index_partitions, "token")
            .sortWithinPartitions("token")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(tmp, out)
        built += 1
    return built


def search_phrase(
    spark: SparkSession,
    store_dir: str,
    phrase: list[str],
    text_col: str = "text",
    key: str = "doc_id",
    version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Exact phrase search through the positional index: documents
    where the phrase tokens occur CONSECUTIVELY. Four stages, text
    touched only for the final payload fetch:

    1. **Batch pruning** — identical necessary condition to the
       conjunctive search (a batch must index every phrase term).
    2. **Candidate docs** — docs whose postings cover all distinct
       terms (the conjunctive answer; counted into stats so the
       adjacency filter's effect is measurable).
    3. **Adjacency verify from postings alone** — anchors = positions
       of the first term; each subsequent term i semi-joins anchors
       on (key, anchor_pos + i = pos). Hash equi-joins only; a
       surviving anchor IS a phrase occurrence.
    4. **Payload fetch** from candidate batches, semi-joined to the
       matched keys.

    Raises on a partial index, same as search_text_index."""
    if not phrase or any(not t for t in phrase):
        raise ValueError("empty phrase or empty term")
    terms_lc = [t.lower() for t in phrase]
    uniq = sorted(set(terms_lc))
    if version is None:
        version = latest_version(store_dir)
    with open(_manifest_path(store_dir, version)) as f:
        batches = json.load(f)["batches"]
    idir = _pindex_dir(store_dir, text_col)
    missing = [
        b for b in batches if not os.path.isdir(os.path.join(idir, b))
    ]
    if missing:
        raise ValueError(
            f"positional index missing for batches {missing}; run "
            "build_positional_index first"
        )
    idx = (
        spark.read.parquet(*[os.path.join(idir, b) for b in batches])
        .where(F.col("token").isin(uniq))
        .withColumn(
            "_b",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"/(b\d{6})/[^/]+$", 1
            ),
        )
    )
    per_batch = (
        idx.groupBy("_b")
        .agg(F.countDistinct("token").alias("nt"))
        .where(F.col("nt") == len(uniq))
        .collect()
    )
    cand = sorted(r["_b"] for r in per_batch)
    stats = {
        "batches_total": len(batches),
        "batches_scanned": len(cand),
        "candidate_docs": 0,
        "matched_docs": 0,
    }
    if not cand:
        empty = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(store_dir, _DATA, b) for b in batches])
            .limit(0)
        )
        return empty, stats
    cidx = idx.where(F.col("_b").isin(cand))
    stats["candidate_docs"] = (
        cidx.groupBy(key)
        .agg(F.countDistinct("token").alias("nt"))
        .where(F.col("nt") == len(uniq))
        .count()
    )
    anchors = cidx.where(F.col("token") == terms_lc[0]).select(
        F.col(key).alias("k"), F.col("pos").alias("p")
    )
    for i, t in enumerate(terms_lc[1:], start=1):
        nxt = cidx.where(F.col("token") == t).select(
            F.col(key).alias("k"), (F.col("pos") - i).alias("p")
        )
        anchors = anchors.join(nxt, ["k", "p"], "left_semi")
    matched = anchors.select(F.col("k").alias(key)).distinct()
    stats["matched_docs"] = matched.count()
    payload = (
        spark.read.option("mergeSchema", "true")
        .parquet(*[os.path.join(store_dir, _DATA, b) for b in cand])
        .join(matched, key, "left_semi")
    )
    return payload, stats
