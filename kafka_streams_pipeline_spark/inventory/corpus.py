"""Round-out additions: n-gram generation, TF-DF term scoring, edit
distance, IVF training, quantization, semantic dedup, corpus
statistics/packing/mixture/vocab/surprisal, incremental dedup,
range/interval joins, and sampling/split/contamination guards.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_streams_pipeline_spark import geo
from kafka_streams_pipeline_spark.functions.hashing import md5_long, md5_long_sql
from kafka_streams_pipeline_spark.inventory._registry import register
from kafka_streams_pipeline_spark.inventory._shared import (
    _cents_sum,
    _t,
)
from kafka_streams_pipeline_spark.operators import corpus as _corpus
from kafka_streams_pipeline_spark.operators import dedup as _dedup
from kafka_streams_pipeline_spark.operators import similarity as _sim
from kafka_streams_pipeline_spark.operators import sketches as _sk
from kafka_streams_pipeline_spark.operators import text as _text
from kafka_streams_pipeline_spark.sources.readings import (
    EVENT_TYPE_GEOHASH,
    readings_from_events,
    readings_from_events_sql,
)

# ---------------------------------------------------------------------------
# Round-out additions: n-gram generation, TF-DF term scoring,
# incremental corpus dedup, non-equi range/band join.
# ---------------------------------------------------------------------------


@register("q_text_bigrams", oracle=_text.word_bigrams_oracle(100))
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 / n-gram generation: top-100 word bigrams corpus-wide
    (higher-order array build, map-side partial counts, TakeOrdered
    top-N — no global sort)."""
    return _text.word_bigrams(_t(spark, sf_dir, "documents"), top_n=100)


@register("q_term_stats", oracle=_text.term_stats_oracle())
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 / TF-IDF core: per-term total frequency, document frequency,
    fixed-point tf/df score (integer div keeps the hash engine-stable)."""
    return _text.term_stats(_t(spark, sf_dir, "documents"))


@register("q_dedup_edit", oracle=_dedup.edit_distance_pairs_oracle(20))
def q_dedup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: edit-distance near-dup — MinHash band candidates verified
    with levenshtein (≤20% of the longer text, integer predicate).
    The character-level complement to jaccard verification; only
    candidate-pair texts ever cross the verify join."""
    return _dedup.edit_distance_pairs(_t(spark, sf_dir, "documents"))


@register("q_dedup_components_alt", oracle=_dedup.components_oracle(0.8))
def q_dedup_components_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: the same duplicate-group clustering as q_dedup_components,
    computed by the alternating large-star/small-star algorithm
    (O(log n) rounds, diameter-independent — the 100 TB path for deep
    near-dup chains). Certified by the identical recursive-CTE
    oracle, so the driver proves both component strategies agree."""
    return _dedup.dedup_components(
        _t(spark, sf_dir, "documents"), algorithm="alternating"
    )


@register("q_repetition_stats", oracle=_text.repetition_stats_oracle())
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (Gopher-style repetition signals): top-token mass fraction
    + duplicated-bigram fraction per document — the public
    MassiveText boilerplate indicators, as per-row JVM higher-order
    expressions (no shuffle, no Python)."""
    return _text.repetition_stats(_t(spark, sf_dir, "documents"))


@register("q_heuristic_filter", oracle=_text.heuristic_filter_oracle())
def q_heuristic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 (C4/Gopher-style quality gate): word-count bounds, mean
    token length bounds, symbol ratio → keep flag + first failed rule.
    The debuggable corpus-filter form: one per-row pass, no shuffle."""
    return _text.heuristic_filter(_t(spark, sf_dir, "documents"))


@register(
    "q_hash_split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, lang,
                   {md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
                       AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*)    AS n_docs,
               min(doc_id) AS first_id,
               max(doc_id) AS last_id
        FROM assigned
        GROUP BY 1, 2
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by salted id
    hash — the reproducible way to partition a 100 TB corpus:
    membership depends only on the id, so re-runs, retries, and
    different partitionings assign every document identically, and
    adding documents never reshuffles existing assignments (unlike
    rand() or row_number splits). Per-(split, lang) counts certify
    the stratification."""
    d = _t(spark, sf_dir, "documents")
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return (
        d.withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
    )


@register("q_ivf_train", oracle=_sim.ivf_train_oracle(2), bench=True)
def q_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 (index training): two k-means Lloyd iterations for the IVF
    coarse quantizer in exact micro-unit integer arithmetic —
    assignment minimizes the integer surrogate |c|²−2x·c, centroid
    updates are one deterministic division on exact integer sums, so
    the iterative 'ML' workload is still hash-certifiable against a
    fully-unrolled SQL twin. Broadcast argmin + (cell,dim) mean
    aggregate per iteration: the canonical distributed Lloyd step."""
    return _sim.ivf_train(_t(spark, sf_dir, "embeddings"), iters=2)


@register("q_embed_quantize", oracle=_sim.quantize_embeddings_oracle())
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X4: symmetric int8 scalar quantization of the embedding
    column (scale = 127/max|v|, floor(x·scale + 0.5)) with
    integer-only summary stats so the oracle match is exact. The
    compression step before any large-scale ANN index build."""
    return _sim.quantize_embeddings(_t(spark, sf_dir, "embeddings"))


@register("q_semantic_dedup", oracle=_sim.semantic_dedup_oracle(), bench=True)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 SemDeDup-shaped semantic dedup: coarse-quantizer cells
    (broadcast-centroid assignment), then an in-cell cosine self-join
    drops every vector with a lower-id neighbor ≥ threshold — one
    representative per semantic near-dup chain, candidate work
    Σ|cell|² not N². Since r8 this row runs the PRODUCTION default —
    the Arrow-vectorized matmul assignment with the Spark-HALF_UP
    rounding kernel — hash-matched against the exact SQL oracle, so
    the driver gate certifies the path a 100 TB run would use.
    See operators/similarity.semantic_dedup."""
    return _sim.semantic_dedup(_t(spark, sf_dir, "embeddings"))


@register(
    "q_corpus_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS wc,
                   list_sum([length(x) FOR x IN string_split(text, ' ')])
                       * 1.0 / len(string_split(text, ' ')) AS mean_len,
                   length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                       * 1.0 / length(text) AS sym_ratio
            FROM documents
        ),
        g AS (
            SELECT doc_id, lang, wc,
                   wc BETWEEN {_text.FILTER_MIN_TOKENS}
                          AND {_text.FILTER_MAX_TOKENS}
                   AND mean_len BETWEEN {_text.FILTER_MIN_MEAN_LEN}
                                    AND {_text.FILTER_MAX_MEAN_LEN}
                   AND sym_ratio <= {_text.FILTER_MAX_SYMBOL_RATIO} AS keep,
                   CAST(round(round(
                       (wc * least(wc, 100)
                        + 60 * len(list_distinct(toks))
                        + 4 * least(list_sum([length(x) FOR x IN toks]),
                                    10 * wc))
                       / (200.0::DOUBLE * wc), 6) * 1000000)
                        AS BIGINT) AS q_micro
            FROM t
        )
        SELECT lang,
               count(*)                        AS n_docs,
               CAST(sum(wc) AS BIGINT)         AS total_tokens,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               round(sum(q_micro) / 1000000.0 / count(*), 6)
                   AS mean_quality
        FROM g GROUP BY lang
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health report per language: doc/token counts, heuristic
    keep counts, mean quality. The mean aggregates micro-integer
    quality scores (each per-row score quantized before summation) so
    the language-level average is order-independent — the fixed-point
    discipline applied to a derived metric, not just money."""
    docs = _t(spark, sf_dir, "documents")
    hf = _text.heuristic_filter(docs).select("doc_id", "n_tokens", "keep")
    q = _text.quality_score(docs).select(
        "doc_id", F.round(F.col("quality") * 1_000_000).cast("long").alias("q_micro")
    )
    return (
        docs.select("doc_id", "lang")
        .join(hf, "doc_id")
        .join(q, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.sum("q_micro") / 1_000_000.0 / F.count(F.lit(1)), 6).alias(
                "mean_quality"
            ),
        )
    )


@register("q_pack_sequences", oracle=_text.pack_sequences_oracle())
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: GPT-style concat-then-chunk sequence packing —
    documents assigned to fixed-token-budget bins by prefix-sum
    offset, windowed PER LANGUAGE so packing parallelizes across
    streams instead of funneling through one global sort. Per-bin
    doc counts and token mass are the packing-efficiency stats a
    training-data pipeline reports."""
    return _text.pack_sequences(_t(spark, sf_dir, "documents"))


@register("q_mixture_sample", oracle=_text.mixture_sample_oracle())
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: deterministic mixture weighting — per-source
    salted-hash admission at two rates (80%/30%). Membership is a
    pure function of the id, so the sample is identical under
    re-runs, retries, and any partitioning; counts + kept-token mass
    certify the realized rates."""
    return _text.mixture_sample(_t(spark, sf_dir, "documents"))


@register("q_vocab_build", oracle=_text.vocab_build_oracle())
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 tokenizer-vocabulary construction: corpus token counts,
    min-count floor, dense frequency-ranked ids with a deterministic
    (count DESC, token) tie-break — two runs assign identical ids.
    The ranking window rides the min-count-pruned VOCAB, not the
    token stream. See operators/text.vocab_build."""
    return _text.vocab_build(_t(spark, sf_dir, "documents"))


@register(
    "q_encode_documents", bench=True,
    oracle=_text.encode_documents_oracle(),
)
def q_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 tokenizer application (round 8): every document mapped to
    its id sequence under the vocab_build vocabulary (OOV → UNK 0),
    certified per document by an ORDER-SENSITIVE integer checksum —
    a transposed, dropped, or mis-assigned id anywhere flips the
    hash, with no arrays crossing the differential gate. Completes
    the tokenizer-prep chain vocab_build → encode → pack_sequences.
    See operators/text.encode_documents."""
    return _text.encode_documents(_t(spark, sf_dir, "documents"))


@register("q_unigram_surprisal", oracle=_text.unigram_surprisal_oracle())
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 CCNet-shaped LM quality scoring, integer-exact: mean
    unigram surprisal of each eval-split document under the
    train-split unigram model, with a pure-integer floor-log2 (no
    float log — engine-portable to the bit). OOV gets the max
    penalty. See operators/text.unigram_surprisal."""
    return _text.unigram_surprisal(_t(spark, sf_dir, "documents"))


@register("q_bigram_surprisal", oracle=_text.bigram_surprisal_oracle())
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 LM quality scoring one order up: mean BIGRAM surprisal
    with stupid backoff (unseen bigram → unigram cost + integer
    penalty; train-OOV → max penalty; document-initial token scored
    unigram) under the train split — still pure-integer bit-length
    arithmetic, no float log. The bigram twin of
    q_unigram_surprisal; see operators/text.bigram_surprisal."""
    return _text.bigram_surprisal(_t(spark, sf_dir, "documents"))


@register(
    "q_bigram_surprisal_hashed", bench=True,
    oracle=_text.bigram_surprisal_oracle(),
)
def q_bigram_surprisal_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB production form of q_bigram_surprisal (VERDICT r7
    item 2): the bigram/unigram model aggregation and all three
    scoring joins shuffle 64-bit xxhash64 token keys instead of raw
    strings. The per-document scores are key-representation-
    independent (absent a 64-bit collision), so the SAME exact SQL
    oracle certifies this path — the driver gate hash-matches the
    hashed-shuffle plan end-to-end, not just a pytest twin.
    See operators/text.bigram_surprisal(hash_keys=True)."""
    return _text.bigram_surprisal(
        _t(spark, sf_dir, "documents"), hash_keys=True
    )


@register(
    "q_corpus_pipeline",
    bench=True,
    oracle=f"""
        WITH f AS (
            SELECT doc_id, text, lang,
                   string_split(text, ' ') AS toks
            FROM documents
        ),
        kept AS (
            SELECT doc_id, text, lang, len(toks) AS n_tokens
            FROM f
            WHERE len(toks) BETWEEN {_text.FILTER_MIN_TOKENS}
                                AND {_text.FILTER_MAX_TOKENS}
              AND list_sum([length(x) FOR x IN toks]) * 1.0 / len(toks)
                    BETWEEN {_text.FILTER_MIN_MEAN_LEN}
                        AND {_text.FILTER_MAX_MEAN_LEN}
              AND length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                    * 1.0 / length(text) <= {_text.FILTER_MAX_SYMBOL_RATIO}
        ),
        dedup AS (
            SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
        ),
        train AS (
            SELECT k.doc_id, k.lang, k.n_tokens
            FROM kept k JOIN dedup d ON k.doc_id = d.doc_id
            WHERE {md5_long_sql("'split:' || CAST(k.doc_id AS VARCHAR)")}
                    % 100 < 80
        ),
        packed AS (
            SELECT lang, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM train
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               count(DISTINCT CAST(floor((cum - n_tokens)
                                         / {_text.PACK_CAPACITY}) AS BIGINT))
                   AS n_bins
        FROM packed
        GROUP BY lang
    """,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star flagship: the full training-corpus pipeline as ONE
    declarative plan — heuristic quality gate → exact dedup (keep
    lowest id per text hash) → deterministic 80% train split →
    per-language sequence packing — reported as per-language doc/
    token/bin counts. Catalyst fuses the per-row stages into the
    scan-side map; the only shuffles are the dedup groupBy, the pack
    window, and the final aggregate. Every stage is the registered
    operator's own builder, so this certifies the COMPOSITION, not a
    re-implementation."""
    docs = _t(spark, sf_dir, "documents")
    kept_ids = (
        _text.heuristic_filter(docs).where(F.col("keep")).select("doc_id")
    )
    # `kept` feeds both the exact-dedup grouping (needs text) and the
    # survivor join (needs lang/tokens); left lazy the full-text
    # heuristic-filter pass re-runs per consumer (4 parquet scans in
    # the before plan). Materialize the filtered corpus once — the
    # stage boundary a production pipeline would checkpoint anyway.
    kept = docs.join(kept_ids, "doc_id").localCheckpoint(eager=True)
    keepers = _dedup.exact_dedup(kept).select(F.col("keeper").alias("doc_id"))
    survivors = kept.join(keepers, "doc_id")
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    train = survivors.where(bucket < 80)
    packed = _text.pack_sequences(train)
    return packed.groupBy("lang").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_bins"),
    )


@register(
    "q_tokenizer_pipeline",
    bench=True,
    oracle=_text.tokenizer_pipeline_oracle(),
)
def q_tokenizer_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star flagship (round 9): the tokenizer-prep chain
    vocab_build → encode_documents → pack_sequences composed as ONE
    declarative plan — the tokenizer mirror of q_corpus_pipeline's
    hygiene chain. Per language: doc counts, encoded token/OOV mass,
    the modular sum of the order-sensitive per-doc id checksums, the
    fixed-capacity bin count the encoded mass packs into, and the
    corpus vocab size — one driver row certifying every stage AND
    the composition. Every stage is the registered operator's own
    builder (the one vocab subtree feeds both the broadcast encode
    join and the vocab_size scalar), so this certifies the chain,
    not a re-implementation. See operators/text.tokenizer_pipeline."""
    return _text.tokenizer_pipeline(_t(spark, sf_dir, "documents"))


@register("q_dedup_incremental", oracle=_dedup.incremental_dedup_oracle("src0"))
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 / ingest loop: anti-join a new batch (source src0) against
    the admitted corpus's normalized fingerprints, then dedup within
    the batch. Fingerprints (not text) cross the join; small sets
    broadcast, large ones fall back to a hash anti-join via AQE."""
    return _dedup.incremental_dedup(_t(spark, sf_dir, "documents"), batch_source="src0")


#: Price bands for the non-equi range join — a dimension of
#: [lo, hi) intervals; any row set works, bands just bucket it.
PRICE_BANDS: list[tuple[str, float, float]] = [
    ("b0_low", 0.0, 925.0),
    ("b1_mid", 925.0, 950.0),
    ("b2_high", 950.0, 975.0),
    ("b3_top", 975.0, 100000.0),
]


@register(
    "q_range_band_join",
    bench=True,
    oracle=f"""
        WITH bands(band, lo, hi) AS (VALUES {", ".join(
            f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
        SELECT band,
               count(*) AS n_parts,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_price_cents,
               min(p_partkey) AS first_part
        FROM part JOIN bands
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
    """,
)
def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range (band) join: bucket parts into [lo, hi) price
    intervals from an inline dimension. The tiny band table is
    broadcast, so the non-equi condition runs as a
    BroadcastNestedLoopJoin — the right physical plan for an
    interval dimension at any fact-side scale. Money summed in
    integer cents (order-independent)."""
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(PRICE_BANDS, ["band", "lo", "hi"])
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_price_cents"),
            F.min("p_partkey").alias("first_part"),
        )
    )


@register(
    "q_interval_join",
    oracle="""
        SELECT p.event_id AS p_id, p.user_id,
               epoch_ms(p.ts) AS p_ts_ms,
               count(c.ts)    AS n_clicks_10m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <  p.ts
        GROUP BY 1, 2, 3
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (the batch shape of a stream-stream time-bounded
    join): for each purchase, clicks by the same user in the
    preceding 10 minutes. The user_id equi-key carries the shuffle
    (hash join); the time bounds are post-join range predicates, so
    the plan stays a key-partitioned join — the same layout a
    watermarked stream-stream join uses — not a cross product."""
    return interval_click_attribution(_t(spark, sf_dir, "events"))


def interval_click_attribution(events: DataFrame) -> DataFrame:
    """The q_interval_join body over any events-shaped frame — shared
    with the boundary test so the REGISTERED bounds (inclusive lower,
    strict upper) are what gets asserted."""
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") < F.col("p_ts")),
            "left",
        )
        .groupBy("p_id", "user_id", F.unix_millis("p_ts").alias("p_ts_ms"))
        .agg(F.count("c_ts").alias("n_clicks_10m"))
    )


@register(
    "q_window_ntile",
    oracle="""
        SELECT user_id, spend_cents,
               ntile(4) OVER (ORDER BY spend_cents DESC, user_id) AS quartile
        FROM (
            SELECT user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS spend_cents
            FROM events GROUP BY user_id
        )
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ntile: users bucketed into spend quartiles. Sums in
    integer cents (order-independent); the ORDER BY carries a user_id
    tiebreak so bucket assignment is unique. The window is
    single-partition over one row PER USER — far below raw-event
    size, but per-user cardinality still grows with the corpus, so
    this is a known single-reducer sort at extreme scale (VERDICT r6
    cosmetic): exact global quartiles inherently need a total order.
    The scalable twin is ``q_spend_quartile_scalable`` (exact
    percentile_disc cutpoints + broadcast compare, no total order);
    exact ntile is kept here because the certified row IS the exact
    equal-bucket semantics."""
    e = _t(spark, sf_dir, "events")
    spend = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("spend_cents")
    )
    w = Window.orderBy(F.desc("spend_cents"), F.asc("user_id"))
    return spend.select(
        "user_id", "spend_cents", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "q_spend_quartile_scalable",
    oracle="""
        WITH spend AS (
            SELECT user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS spend_cents
            FROM events GROUP BY user_id
        ),
        cuts AS (
            SELECT
                CAST(percentile_disc(0.25)
                     WITHIN GROUP (ORDER BY spend_cents) AS BIGINT) AS c1,
                CAST(percentile_disc(0.50)
                     WITHIN GROUP (ORDER BY spend_cents) AS BIGINT) AS c2,
                CAST(percentile_disc(0.75)
                     WITHIN GROUP (ORDER BY spend_cents) AS BIGINT) AS c3
            FROM spend
        )
        SELECT user_id, spend_cents,
               CAST(1 + CASE WHEN spend_cents > c1 THEN 1 ELSE 0 END
                      + CASE WHEN spend_cents > c2 THEN 1 ELSE 0 END
                      + CASE WHEN spend_cents > c3 THEN 1 ELSE 0 END
                    AS INTEGER) AS quartile
        FROM spend, cuts
    """,
)
def q_spend_quartile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB answer to q_window_ntile's inherent global sort:
    VALUE-based spend quartiles via exact ``percentile_disc``
    cutpoints + a broadcast bucket compare — no total order of users
    anywhere. Semantics differ from ntile deliberately (equal spends
    always share a bucket; ntile splits ties to equalize bucket
    sizes) — these are the distribution quartiles, which is what
    training-mixture work actually wants (assign by VALUE cutoff,
    reproducible under corpus growth).

    Scale shape: one user-keyed aggregate; the cutpoint aggregate's
    state is a partial-merged value→count map bounded by the DISTINCT
    cents grid (value range, not user count); the bucket assignment
    is a 1-row broadcast crossJoin — embarrassingly parallel. Both
    engines implement SQL-standard percentile_disc (smallest value
    with cume_dist ≥ p), so the cutpoints — actual elements of the
    integer-cents multiset — are hash-exact (the double return ride
    is lossless below 2^53 cents)."""
    e = _t(spark, sf_dir, "events")
    spend = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("spend_cents")
    )
    cuts = spend.agg(
        *[
            F.expr(
                f"CAST(percentile_disc({p}) WITHIN GROUP "
                f"(ORDER BY spend_cents) AS BIGINT)"
            ).alias(f"c{i}")
            for i, p in ((1, 0.25), (2, "0.50"), (3, 0.75))
        ]
    )
    return spend.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "spend_cents",
        (
            F.lit(1)
            + (F.col("spend_cents") > F.col("c1")).cast("int")
            + (F.col("spend_cents") > F.col("c2")).cast("int")
            + (F.col("spend_cents") > F.col("c3")).cast("int")
        ).cast("int").alias("quartile"),
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus)   AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                   AS total_price
        FROM orders
        GROUP BY GROUPING SETS
            ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general Expand-operator form that
    rollup/cube (q_rollup/q_cube) specialize. Spark's Expand node
    replicates each input row once per grouping set ahead of a single
    hash aggregate, so the table is scanned once no matter how many
    sets are requested; partial aggregation still applies per set.
    grouping() markers disambiguate aggregation NULLs from data NULLs
    (statuses are non-null here, but the contract must not rely on
    that). Money summed in integer cents (order-independent)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count("*").alias("n_orders"),
        _cents_sum(F.col("o_totalprice"), "total_price"),
    )


@register(
    "q_minmax_by",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, cents * 1000000000 + o_orderkey)
                   AS top_orderkey,
               max(cents) / 100.0 AS top_price,
               arg_min(o_orderkey, cents * 1000000000 + o_orderkey)
                   AS bottom_orderkey,
               min(cents) / 100.0 AS bottom_price
        FROM (
            SELECT o_orderstatus, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        )
        GROUP BY o_orderstatus
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max/arg-min aggregates (max_by/min_by): the priciest and
    cheapest order per status in ONE aggregation pass — no self-join,
    no window sort; partial max_by states merge associatively like any
    algebraic aggregate. Prices tie across orders, so the ordering key
    is a composite BIGINT (cents * 1e9 + orderkey) that is unique and
    overflow-safe while cents < 9.2e9 (a $92M order) and orderkey <
    1e9 — both hold at every TPC-H scale factor in range."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    key = F.col("cents") * F.lit(1_000_000_000) + F.col("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", key).alias("top_orderkey"),
        (F.max("cents") / F.lit(100.0)).alias("top_price"),
        F.min_by("o_orderkey", key).alias("bottom_orderkey"),
        (F.min("cents") / F.lit(100.0)).alias("bottom_price"),
    )


@register(
    "q_sessionize",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                   CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                        THEN 1 ELSE 0 END AS is_start
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        marked AS (
            SELECT user_id, ts_ms,
                   CAST(sum(is_start) OVER (
                       PARTITION BY user_id ORDER BY ts_ms, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM ordered
        )
        SELECT user_id, session_idx, count(*) AS n_events,
               min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
               max(ts_ms) - min(ts_ms) AS duration_ms
        FROM marked
        GROUP BY user_id, session_idx
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization: a session breaks after a
    30-min silence. The streaming twin is q_session_window
    (session_window(ts, '30 minutes')); this is the batch idiom —
    lag() marks session starts, a running sum numbers them, one
    groupBy collapses them. All three windows partition by user_id, so
    the whole plan rides a single hash partitioning of 150..N-million
    users with no global sort; exact epoch-ms integer arithmetic and
    an event_id tiebreak keep the numbering engine-identical."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = e.withColumn(
        "is_start",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > 1_800_000),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


@register(
    "q_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS rendered as a
    LEFT SEMI join with a non-equi residual (l_shipdate > o_orderdate
    — the fixture has no commit/receipt dates, so late shipment stands
    in). Semi join means lineitem matches short-circuit per order and
    the probe side never duplicates rows; the quarter predicate on
    orders is pushed to its scan before the shuffle."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q_priority_shipmode",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
)
def q_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional aggregation over a fact join): the
    year predicate prunes lineitem at the scan, the join shuffles both
    sides on orderkey once, and the CASE pivot happens inside the
    partial aggregate — 3 output rows, so the final shuffle is
    trivial. The fixture lacks l_shipmode; l_returnflag plays the
    grouping role with identical plan shape."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_decayed_engagement",
    oracle="""
        WITH mx AS (SELECT max(epoch_ms(ts)) AS mx_ms FROM events),
        w AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT)
                   * (1::BIGINT << (30 - least(
                         (mx_ms - epoch_ms(ts)) // 86400000, 30)))
                       AS w_scaled
            FROM events, mx
        )
        SELECT user_id,
               count(*) AS n_events,
               round(CAST(sum(w_scaled) AS BIGINT)
                     / (CAST(1073741824 AS DOUBLE) * 100.0), 6)
                   AS decayed_spend
        FROM w
        GROUP BY user_id
        ORDER BY decayed_spend DESC, user_id
        LIMIT 20
    """,
)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement (feature-engineering shape): each
    event's spend decays by 2^-age_days (capped at 30 days), top-20
    users by the decayed total. The half-life weight is a POWER OF
    TWO, so every term value_cents·2^(30−age) is an exact integer —
    the whole aggregate is integer arithmetic and only the final
    single division is float (deterministic on both engines). The
    usual exp(-λ·age) weighting cannot be differentially certified
    (transcendental per-row + order-dependent float sum); the dyadic
    form keeps the operator shape with exact parity. One shuffle on
    user_id with map-side partials; the max-ts anchor is a one-row
    broadcast."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    mx = e.agg(F.max("ts_ms").alias("mx_ms"))
    w = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(
            "cents * shiftleft(1L, 30 - "
            "least((mx_ms - ts_ms) div 86400000, 30))"
        ).alias("w_scaled"),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum("w_scaled")
                / (F.lit(1073741824).cast("double") * F.lit(100.0)),
                6,
            ).alias("decayed_spend"),
        )
        .orderBy(F.col("decayed_spend").desc(), "user_id")
        .limit(20)
    )


def _radius_search_parts() -> tuple[str, str, float, float]:
    """Driver-side spatial prep shared by q_radius_search and its
    oracle: the distinct reading cells decoded to centers (pure-Python
    geohash toolkit — F6/F7), the center point, the equirectangular
    longitude scale, and the radius² in squared degrees. Every float
    is embedded via repr() into BOTH engines' SQL, so the refine
    arithmetic is bit-identical."""
    import math

    from kafka_streams_pipeline_spark.sources.readings import (
        EVENT_TYPE_GEOHASH,
    )

    lat0, lon0 = geo.decode("u155mz")
    k = math.cos(math.radians(lat0))
    r2 = (20.0 / 111.32) ** 2  # 20 km in squared degrees
    cells = sorted({gh[:6] for gh in EVENT_TYPE_GEOHASH.values()})
    rows = [(c, *geo.decode(c)) for c in cells]
    spark_dim = "VALUES " + ", ".join(
        f"('{c}', {la!r}D, {lo!r}D)" for c, la, lo in rows
    )
    duck_dim = "VALUES " + ", ".join(
        f"('{c}', CAST({la!r} AS DOUBLE), CAST({lo!r} AS DOUBLE))"
        for c, la, lo in rows
    )
    # CAST(… AS DOUBLE) on every literal: both engines parse bare
    # float literals as DECIMAL (DuckDB even overflows its max scale
    # multiplying them); the cast form is portable and IEEE-exact.
    la0 = f"CAST({lat0!r} AS DOUBLE)"
    lo0 = f"CAST({lon0!r} AS DOUBLE)"
    kk = f"CAST({k!r} AS DOUBLE)"
    d2 = (
        f"((clat - {la0}) * (clat - {la0}) + "
        f"((clon - {lo0}) * {kk}) * ((clon - {lo0}) * {kk}))"
    )
    return spark_dim, duck_dim, r2, d2


_RS_SPARK_DIM, _RS_DUCK_DIM, _RS_R2, _RS_D2 = (
    lambda p: (p[0], p[1], p[2], p[3])
)(_radius_search_parts())


@register(
    "q_radius_search",
    oracle=f"""
        WITH readings AS ({readings_from_events_sql()}),
        dim(gh6, clat, clon) AS ({_RS_DUCK_DIM}),
        hits AS (
            SELECT substring(r.geohash, 1, 6) AS gh6, r.tempVal,
                   d.clat, d.clon
            FROM readings r
            JOIN dim d ON substring(r.geohash, 1, 6) = d.gh6
            WHERE {_RS_D2} <= CAST({_RS_R2!r} AS DOUBLE)
        )
        SELECT gh6,
               count(*) AS n_readings,
               round(sum(CAST(round(tempVal * 100) AS BIGINT)) / 100.0
                     / count(*), 6) AS avg_val,
               round(sqrt({_RS_D2.replace('clat', 'any_value(clat)')
                                 .replace('clon', 'any_value(clon)')})
                     * 111.32, 6) AS dist_km
        FROM hits
        GROUP BY gh6
    """,
)
def q_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius search — the natural companion to the bbox
    snapshot (querying/QueryingService.java:124-203): readings within
    20 km of a center point, aggregated per cell. The geohash toolkit
    runs DRIVER-side (the repo's core spatial design): distinct cells
    decode to a literal dimension, the equirectangular refine
    ((Δlat)² + (Δlon·cos lat₀)² ≤ r²) is plain arithmetic over
    literals identical in both engines — no trig, no Python, no UDF
    in the plan. At scale the dim is the maintained distinct-cell
    table (≪ data, broadcast), the coarse cover prefilter is the
    same IN/prefix predicate the snapshot uses, and the refine is a
    scan-local expression."""
    r = readings_from_events(_t(spark, sf_dir, "events")).select(
        F.expr("substring(geohash, 1, 6)").alias("gh6"), "tempVal"
    )
    dim = spark.sql(
        f"SELECT col1 AS gh6, col2 AS clat, col3 AS clon FROM ({_RS_SPARK_DIM})"
    )
    hits = r.join(F.broadcast(dim), "gh6").where(
        F.expr(_RS_D2) <= F.lit(_RS_R2)
    )
    return hits.groupBy("gh6").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.round(
            F.sum(F.round(F.col("tempVal") * 100).cast("long"))
            / F.lit(100.0)
            / F.count(F.lit(1)),
            6,
        ).alias("avg_val"),
        F.round(
            F.expr(
                "sqrt("
                + _RS_D2.replace("clat", "any_value(clat)").replace(
                    "clon", "any_value(clon)"
                )
                + ") * 111.32"
            ),
            6,
        ).alias("dist_km"),
    )


@register(
    "q_small_qty_revenue",
    oracle="""
        WITH li AS (
            SELECT l_partkey,
                   CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
            FROM lineitem
        )
        SELECT count(*) AS n_lines,
               CAST(sum(l.price_c) AS BIGINT) AS rev_cents
        FROM li l
        WHERE l.qty_c * 5 * (SELECT count(*) FROM li i
                             WHERE i.l_partkey = l.l_partkey)
              < (SELECT sum(i.qty_c) FROM li i
                 WHERE i.l_partkey = l.l_partkey)
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): keep lines whose
    quantity is below 20% of their part's average — the canonical
    CORRELATED SCALAR SUBQUERY, which Catalyst decorrelates into an
    aggregate + join (run .explain: no per-row subplan execution
    survives). Expressed through the SQL surface so the rewrite
    itself is what's certified. The avg comparison is cross-
    multiplied (qty·5·cnt < sum) so the predicate is pure-integer —
    no float avg to drift between engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q17_raw")
    return spark.sql(
        """
        WITH li AS (
            SELECT l_partkey,
                   CAST(round(l_quantity * 100) AS BIGINT)      AS qty_c,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
            FROM li_q17_raw
        )
        SELECT count(*) AS n_lines,
               CAST(sum(l.price_c) AS BIGINT) AS rev_cents
        FROM li l
        WHERE l.qty_c * 5 * (SELECT count(*) FROM li i
                             WHERE i.l_partkey = l.l_partkey)
              < (SELECT sum(i.qty_c) FROM li i
                 WHERE i.l_partkey = l.l_partkey)
        """
    )


@register(
    # bench flag retired in round 9: the Q18 aggregate-derived-join
    # shape is tripwire-covered by q_returned_items/q_tpch_pricing;
    # its slot guards the r8 tokenizer production paths instead
    # (BENCH_DETAIL_r09 notes the set change).
    "q_large_orders",
    oracle="""
        WITH totals AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS total_qty_c,
                   count(*)        AS n_items
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 17500
        )
        SELECT o.o_orderkey,
               epoch_ms(o.o_orderdate) AS order_ms,
               t.total_qty_c,
               t.n_items
        FROM orders o JOIN totals t ON o.o_orderkey = t.l_orderkey
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): a HAVING-filtered
    aggregate over the fact table drives a join back to the orders
    dimension — the aggregate-derived join pattern. The heavy side
    aggregates BEFORE joining (map-side partials, one shuffle on
    orderkey); the surviving total is tiny, so AQE turns the join
    broadcast at runtime. Quantities in integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    totals = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
            .cast("long")
            .alias("total_qty_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .where(F.col("total_qty_c") > 17500)
    )
    o = _t(spark, sf_dir, "orders")
    return o.join(totals, o.o_orderkey == totals.l_orderkey).select(
        "o_orderkey",
        # o_orderdate arrives TIMESTAMP_NTZ; session tz is UTC, so the
        # naive values ARE UTC instants (same rule as load_table)
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "order_ms"
        ),
        "total_qty_c",
        "n_items",
    )


@register(
    "q_customer_distribution",
    oracle="""
        WITH c_orders AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM c_orders
        GROUP BY c_count
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): count orders
    per customer INCLUDING zero-order customers, then histogram the
    counts. The priority predicate lives INSIDE the left-join
    condition — pushing it to a WHERE would silently delete the
    zero-order rows, so this certifies join-condition-vs-filter
    semantics. Two-level aggregation: per-customer count (shuffle on
    custkey), then a histogram over the tiny count domain."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )




@register(
    "q_hll_distinct",
    oracle=_sk.hll_distinct_oracle("events", "user_id"),
    bench=True,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 approximate aggregation: portable HyperLogLog distinct-user
    estimate whose registers are bit-identical on Spark and DuckDB
    (md5-derived buckets, pure-integer rho, exact-BIGINT harmonic
    denominator) — the sketch VALUE is oracle-certified, not just its
    plumbing. One pass + a 256-key shuffle + a one-row final agg;
    registers merge associatively, so map-side partials do the work.
    See operators/sketches.py."""
    return _sk.hll_distinct(_t(spark, sf_dir, "events"), "user_id")


@register(
    "q_bloom_prefilter",
    oracle=_sk.bloom_semijoin_oracle(
        "SELECT DISTINCT o_custkey AS k FROM orders "
        "WHERE o_orderpriority = '1-URGENT' "
        "AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'",
        "customer",
        "c_custkey",
    ),
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 runtime-filter certification: Bloom semi-join reduction —
    bit positions of the filtered build-side key set (urgent 1998
    orders' custkeys) broadcast against the customer probe side;
    output counts the probe population, bloom passes, exact matches,
    and false positives, so the no-false-negative invariant and the
    false-positive rate are both inside the oracle hash. The probe
    side never shuffles before the reduction — the mechanism behind
    Spark's runtimeFilter.bloomFilter, differentially tested.
    See operators/sketches.bloom_semijoin_reduction."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (
            F.col("o_orderdate")
            >= F.lit("1998-01-01 00:00:00").cast("timestamp")
        )
    )
    return _sk.bloom_semijoin_reduction(
        o, _t(spark, sf_dir, "customer"), "o_custkey", "c_custkey"
    )


@register("q_chunk_dedup", oracle=_corpus.chunk_dedup_oracle())
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/corpus-hygiene: CCNet-style boilerplate removal by
    corpus-wide chunk-hash dedup — per-document total/boilerplate
    chunk counts and surviving word count. Text never shuffles; both
    exchanges carry (doc_id, md5) pairs. See operators/corpus.py."""
    return _corpus.chunk_dedup(_t(spark, sf_dir, "documents"))


@register("q_contamination", oracle=_corpus.contamination_oracle())
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene: train/eval 12-gram contamination check over
    q_hash_split's deterministic splits — per held-out doc, distinct
    shingles, shingles also present anywhere in train, and the ratio.
    Both sides reduce to hash sets before the only join."""
    return _corpus.contamination(_t(spark, sf_dir, "documents"))


@register("q_stratified_sample", oracle=_corpus.stratified_sample_oracle())
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene: reproducible per-language top-20 sample keyed
    by salted doc_id md5 — identical membership across runs, engines,
    and partitionings (rand()/TABLESAMPLE cannot promise this)."""
    return _corpus.stratified_sample(_t(spark, sf_dir, "documents"))


@register("q_epoch_shuffle", oracle=_corpus.epoch_shuffle_oracle())
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order reproducibility (round 9): the deterministic
    per-epoch global reshuffle — every document assigned (shard,
    pos) for epoch 1 as a pure function of (epoch, doc_id), so a
    preempted training job resumes with bit-identical data order and
    each epoch is a fresh full permutation. One shuffle on the
    uniformly-distributed shard key + a per-shard window; no global
    sort. See operators/corpus.epoch_shuffle."""
    return _corpus.epoch_shuffle(_t(spark, sf_dir, "documents"))


@register(
    "q_weighted_sample",
    oracle=_corpus.systematic_weighted_sample_oracle(500),
    bench=True,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (round 9): systematic (grid)
    resampling of 500 draws over n_chars weights — the training-
    mixture quota draw where every run, retry, and engine must pick
    the identical sample with EXACTLY the requested total
    multiplicity (Σ copies == 500, telescoping floor counts).
    Pure-BIGINT selection on a salted-hash-ordered weight line;
    heavy documents legitimately draw multiple copies. Every
    selected row (id, weight, copies) is hash-bound. One
    global-order window for the exclusive prefix sum; two-phase
    prefix sum is the documented 100 TB refinement.
    See operators/corpus.systematic_weighted_sample."""
    return _corpus.systematic_weighted_sample(
        _t(spark, sf_dir, "documents"), 500
    )


@register("q_rag_chunks", oracle=_text.rag_chunks_oracle(), bench=True)
def q_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 retrieval prep: overlapping fixed-token-window chunking
    (64-token chunks, 48-token stride) — the document → chunk
    explosion a RAG/embedding-index pipeline runs before encoding.
    The chunk md5 binds exact chunk CONTENT into the driver hash;
    zero shuffles (embarrassingly parallel, text never moves). See
    operators/text.py rag_chunks."""
    return _text.rag_chunks(_t(spark, sf_dir, "documents"))


@register("q_repeated_ngrams", oracle=_text.repeated_ngrams_oracle(), bench=True)
def q_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 substring-level dedup signal (Lee et al. 2021): fixed
    5-token windows repeated across ≥2 documents — the repeated
    PASSAGES (boilerplate, licenses, templates) that survive
    document-level dedup. Top-50 by occurrences with rank bound into
    the hash. One window explosion → one aggregate → TopN. See
    operators/text.py repeated_ngrams."""
    return _text.repeated_ngrams(_t(spark, sf_dir, "documents"))


@register(
    "q_repeated_ngrams_hashed",
    bench=True,
    oracle=f"""
        WITH wins AS (
            SELECT doc_id,
                   unnest([list_aggregate(
                               list_slice(ws, i, i + {_text.REPEAT_W} - 1),
                               'string_agg', ' ')
                           FOR i IN range(1, len(ws) - {_text.REPEAT_W} + 2)])
                       AS win
            FROM (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents)
            WHERE len(ws) >= {_text.REPEAT_W}
        ),
        agg AS (
            SELECT win,
                   CAST(count(*) AS BIGINT) AS n_occur,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM wins
            GROUP BY win
            HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT n_occur, n_docs,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM agg
        GROUP BY n_occur, n_docs
    """,
)
def q_repeated_ngrams_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB production form of q_repeated_ngrams (VERDICT r7
    item 4): the window aggregate shuffles 64-bit xxhash64 keys
    instead of raw W-token strings, and there is NO TopN and NO rank
    — two plain aggregates with map-side partials, no sort anywhere.
    The hash keys themselves are not SQL-reproducible (DuckDB has no
    xxhash64), but the multiset of (n_occur, n_docs) over the FULL
    repeated-window set is key-representation-independent — so this
    row emits that invariant and the exact text-form oracle
    certifies it (a hash collision, a lost window, or a miscounted
    occurrence all break the match).
    See operators/text.repeated_window_stats."""
    return _text.repeated_window_stats(_t(spark, sf_dir, "documents"))


@register(
    "q_temperature_mixture", oracle=_text.temperature_mixture_oracle()
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 multilingual rebalancing: α=1/2 temperature sampling over
    language shares (the mT5/XLM-R upsampling rule) with
    integer-exact weights (IEEE sqrt on scaled integers) and pure
    integer-division target allocation — low-resource languages gain
    share, and every number is engine-bit-identical. See
    operators/text.py temperature_mixture."""
    return _text.temperature_mixture(_t(spark, sf_dir, "documents"))


@register("q_vocab_coverage", oracle=_text.vocab_coverage_oracle())
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 tokenizer health: per-document OOV rate against the top-24
    built vocabulary (vocab_build composition) — the coverage metric
    that validates a vocabulary against a corpus before training.
    Vocabulary broadcast against the exploded token stream, one
    doc-keyed aggregate. See operators/text.py vocab_coverage."""
    return _text.vocab_coverage(_t(spark, sf_dir, "documents"))


@register(
    "q_pipeline_audit",
    oracle=f"""
        WITH f AS (
            SELECT doc_id, text, lang,
                   string_split(text, ' ') AS toks
            FROM documents
        ),
        kept AS (
            SELECT doc_id, text, lang
            FROM f
            WHERE len(toks) BETWEEN {_text.FILTER_MIN_TOKENS}
                                AND {_text.FILTER_MAX_TOKENS}
              AND list_sum([length(x) FOR x IN toks]) * 1.0 / len(toks)
                    BETWEEN {_text.FILTER_MIN_MEAN_LEN}
                        AND {_text.FILTER_MAX_MEAN_LEN}
              AND length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                    * 1.0 / length(text) <= {_text.FILTER_MAX_SYMBOL_RATIO}
        ),
        dedup AS (
            SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
        ),
        train AS (
            SELECT d.doc_id
            FROM dedup d
            WHERE {md5_long_sql("'split:' || CAST(d.doc_id AS VARCHAR)")}
                    % 100 < 80
        )
        SELECT 1 AS stage_idx, 'input' AS stage,
               CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs
        UNION ALL
        SELECT 2, 'quality_gate',
               CAST((SELECT count(*) FROM kept) AS BIGINT)
        UNION ALL
        SELECT 3, 'exact_dedup',
               CAST((SELECT count(*) FROM dedup) AS BIGINT)
        UNION ALL
        SELECT 4, 'train_split',
               CAST((SELECT count(*) FROM train) AS BIGINT)
    """,
)
def q_pipeline_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline lineage: per-stage row-count attrition for the
    flagship corpus pipeline (input → quality gate → exact dedup →
    train split) — the audit artifact every production data pipeline
    records so a surprising corpus size is attributable to a stage,
    not discovered at training time. Stages are the registered
    operators' own builders (certifies the composition's bookkeeping,
    not a re-implementation); the oracle recomputes each stage
    population in SQL."""
    docs = _t(spark, sf_dir, "documents")
    kept_ids = (
        _text.heuristic_filter(docs).where(F.col("keep")).select("doc_id")
    )
    # same shared-subtree materialization as q_corpus_pipeline: the
    # attrition report takes several actions over `kept`
    kept = docs.join(kept_ids, "doc_id").localCheckpoint(eager=True)
    keepers = _dedup.exact_dedup(kept).select(F.col("keeper").alias("doc_id"))
    bucket = md5_long(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    train = keepers.where(bucket < 80)
    counts = [
        ("input", docs.count()),
        ("quality_gate", kept.count()),
        ("exact_dedup", keepers.count()),
        ("train_split", train.count()),
    ]
    return spark.createDataFrame(
        [(i + 1, s, n) for i, (s, n) in enumerate(counts)],
        "stage_idx int, stage string, n_docs long",
    )


# ---------------------------------------------------------------------------
# Round-9 data-quality family: single-pass column profiling and the
# declarative constraint-check suite (operators/quality.py).
# ---------------------------------------------------------------------------

# Columns of the float-free orders projection both profile rows run
# over; (name, needs_varchar_cast) — string columns min/max without a
# cast, numeric ones render through VARCHAR.
_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
    ("o_totalprice_cents", True),
    ("o_orderdate_days", True),
]


def _orders_profile_oracle(extra_select: str = "") -> str:
    """The per-column exact-profile oracle over the normalized orders
    projection, one UNION ALL branch per column; ``extra_select``
    appends invariant columns (e.g. the approx row's pinned-TRUE
    tolerance bit)."""
    branches = []
    for name, cast in _PROFILE_COLS:
        mn = f"CAST(min({name}) AS VARCHAR)" if cast else f"min({name})"
        mx = f"CAST(max({name}) AS VARCHAR)" if cast else f"max({name})"
        branches.append(f"""
        SELECT '{name}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count({name}) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
               {mn} AS min_value,
               {mx} AS max_value{extra_select}
        FROM o""")
    return f"""
        WITH o AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT)
                       AS o_totalprice_cents,
                   CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS o_orderdate_days
            FROM orders
        )
        {" UNION ALL ".join(branches)}
    """


def _orders_profile_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("o_totalprice_cents"),
        # o_orderdate is midnight-valued TIMESTAMP_NTZ; unix_date on
        # the DATE cast is timezone-free
        F.unix_date(F.to_date("o_orderdate"))
        .cast("long")
        .alias("o_orderdate_days"),
    )


@register(
    "q_table_profile",
    bench=True,
    oracle=_orders_profile_oracle(),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling (X10a): per-column health numbers —
    row/non-null/distinct counts plus min/max — for the whole orders
    table (operators/quality.table_profile, the Deequ-analyzer
    family as plain Catalyst aggregates: one algebraic pass for
    counts and typed min/max, one constant-buffer (col_name, value)
    dedupe shuffle for the exact distincts — measured and chosen over
    Catalyst's Expand-rewritten multi-distinct plan). Floats are
    normalized to exact cents and the NTZ order date to epoch days
    BEFORE profiling, per the repo's float-free oracle discipline,
    so min/max render identically across engines. approx=True is
    the one-pass HLL++ form for 100 TB (differential-tested in
    pytest and certified by q_table_profile_approx)."""
    from kafka_streams_pipeline_spark.operators.quality import table_profile

    return table_profile(_orders_profile_input(spark, sf_dir))


@register(
    "q_table_profile_approx",
    oracle=_orders_profile_oracle(
        extra_select=",\n               TRUE AS hll_within_tol"
    ),
)
def q_table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10i (VERDICT r11 item 2): certification of q_table_profile's
    documented 100 TB branch — the one-pass HLL++ distinct sketch
    (rsd 1%) runs NEXT TO the exact profile over the same normalized
    orders projection, and the row certifies BOTH the exact columns
    (value-for-value) and the pinned-TRUE ``hll_within_tol`` bit:
    every per-column HLL++ estimate within 5% (a 5σ gate on the 1%-σ
    sketch; approx_count_distinct is deterministic given the data, so
    the bit is a fixed fact of the fixture, not a flake). The
    plan-contract test pins the approx aggregate Expand-free /
    single-scan. See operators/quality.table_profile_approx_certified."""
    from kafka_streams_pipeline_spark.operators.quality import (
        table_profile_approx_certified,
    )

    return table_profile_approx_certified(_orders_profile_input(spark, sf_dir))


@register(
    "q_quality_checks",
    oracle="""
        WITH v AS (
            SELECT 'orderkey_not_null' AS check_name,
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS violations
            FROM orders
            UNION ALL
            SELECT 'orderkey_unique',
                   CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                        AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'custkey_unique',
                   CAST(count(o_custkey) - count(DISTINCT o_custkey)
                        AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'status_in_set',
                   CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                                  AND o_orderstatus NOT IN ('O', 'F', 'P')
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'priority_in_set',
                   CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                                  AND o_orderpriority NOT IN
                                      ('1-URGENT', '2-HIGH', '3-MEDIUM',
                                       '4-NOT SPECIFIED')
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'totalprice_in_range',
                   CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                                  AND (o_totalprice < 0.0
                                       OR o_totalprice > 300000.0)
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'priority_format',
                   CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                                  AND NOT regexp_matches(o_orderpriority,
                                                         '^[1-4]-')
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'custkey_references_customer',
                   CAST(count(*) AS BIGINT)
            FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey IS NOT NULL)
        )
        SELECT check_name, violations, violations = 0 AS passed FROM v
    """,
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite (X10b): eight Deequ-style checks
    over orders — key completeness + uniqueness, closed enums, a
    value-range contract, a format regex, and an FK into customer —
    compiled by operators/quality.run_checks into ONE aggregate pass
    plus one broadcast LEFT ANTI join for the referential check. The
    suite is built to return a MIX of passing and failing checks
    (custkey repeats, 5-LOW breaks the narrowed enum/format, prices
    exceed the 300k cap) so both branches of `passed` are certified,
    not just the happy path."""
    from kafka_streams_pipeline_spark.operators.quality import (
        Check,
        run_checks,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    checks = [
        Check("orderkey_not_null", "not_null", "o_orderkey"),
        Check("orderkey_unique", "unique", "o_orderkey"),
        Check("custkey_unique", "unique", "o_custkey"),
        Check("status_in_set", "in_set", "o_orderstatus",
              values=("O", "F", "P")),
        Check("priority_in_set", "in_set", "o_orderpriority",
              values=("1-URGENT", "2-HIGH", "3-MEDIUM",
                      "4-NOT SPECIFIED")),
        Check("totalprice_in_range", "in_range", "o_totalprice",
              lo=0.0, hi=300000.0),
        Check("priority_format", "matches", "o_orderpriority",
              pattern="^[1-4]-"),
        Check("custkey_references_customer", "references", "o_custkey",
              ref_df=customer, ref_col="c_custkey"),
    ]
    return run_checks(orders, checks)


# ---------------------------------------------------------------------------
# Round-9 graph centrality: weighted PageRank / TextRank
# (operators/graph.py).
# ---------------------------------------------------------------------------


from kafka_streams_pipeline_spark.operators.graph import textrank_oracle as _textrank_oracle


@register("q_textrank", oracle=_textrank_oracle(), bench=True)
def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph centrality (X11): TextRank keyword salience — weighted
    PageRank over the token co-occurrence graph (Mihalcea & Tarau
    2004), 5 unrolled iterations of scaled-integer power iteration
    (all BIGINT floor arithmetic, so Spark and the oracle's unrolled
    SQL produce BIT-IDENTICAL ranks — no float drift across an
    iterative algorithm). The heavy distributed stage is the edge
    aggregation over the corpus; each iteration is one edges⋈ranks
    join + one dst-keyed partial-merged aggregate, localCheckpointed
    so the plan stays constant-size (round-2 lesson). See
    operators/graph.weighted_pagerank."""
    from kafka_streams_pipeline_spark.operators.graph import textrank

    return textrank(_t(spark, sf_dir, "documents"))


@register("q_bpe_train", oracle=_text.bpe_train_oracle(), bench=True)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer LEARNING (X5s): distributed BPE merge-rule training
    (Sennrich et al. 2016) — 8 rounds of frequency-weighted pair
    counting, lexicographic-tie-break argmax, and greedy
    non-overlapping merge application, entirely as window functions
    + aggregates over the vocabulary-sized word-frequency table
    (never the raw corpus — the same state-size argument real
    tokenizer trainers rely on). The oracle unrolls the identical 8
    rounds in SQL; `corpus_symbols_after` pins the merge APPLICATION
    (overlap policy included), `pair_freq` the selection. Completes
    the tokenizer family: learn (this) → vocab_build → encode →
    pack. See operators/text.bpe_train."""
    return _text.bpe_train(_t(spark, sf_dir, "documents"))


@register(
    "q_triangle_count",
    bench=True,
    oracle=f"""
        WITH pairs AS MATERIALIZED ({_dedup.minhash_pairs_oracle()}),
        e AS (SELECT DISTINCT id_a, id_b FROM pairs),
        deg AS (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT id_a AS n FROM e
                  UNION ALL SELECT id_b AS n FROM e)
            GROUP BY n
        ),
        w AS (
            SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
            FROM deg
        ),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        t AS (
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.id_b = e2.id_a
            JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
        )
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges = 0 THEN CAST(0 AS BIGINT)
                    ELSE (3 * n_triangles * 1000000) // n_wedges END
                   AS clustering_ppm
        FROM w, ne, t
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics (X11b): exact triangle census + global
    clustering coefficient over the MinHash near-dup graph — the
    standard structure metric for duplicate-cluster quality (a
    near-dup component that is also triangle-dense is boilerplate;
    a sparse chain is drift). Edges come from the SAME banded-LSH
    pair generator the dedup family certifies, the a<b<c ordered
    triple join counts each triangle once, and the clustering
    coefficient is a parts-per-million integer division — fully
    engine-exact. Completes the graph trio: components (dedup),
    centrality (textrank), structure (this).
    See operators/graph.triangle_count."""
    from kafka_streams_pipeline_spark.operators.graph import triangle_count

    pairs = _dedup.minhash_near_dup_pairs(_t(spark, sf_dir, "documents"))
    return triangle_count(pairs)


@register(
    "q_decode_documents", oracle=_text.decode_documents_oracle()
)
def q_decode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer round-trip (round 9): decode(encode(x)) must equal
    the UNK-normalized source — the detokenization-fidelity proof
    closing vocab_build → encode → decode. The oracle rebuilds each
    document's normalized text DIRECTLY from source (no id
    indirection) and compares md5s, so a non-bijective id
    assignment, a lossy reverse join, or an ordering slip anywhere
    flips the hash. Two broadcast vocab joins + one per-doc
    aggregate. See operators/text.decode_documents."""
    return _text.decode_documents(_t(spark, sf_dir, "documents"))


@register("q_cdc_chunk_dedup", oracle=_corpus.cdc_chunk_dedup_oracle())
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup (round 9): boundaries declared by
    token content (salted hash ≡ 0 mod 8 — word-level gear CDC), so
    near-copies with insertions re-synchronize at the next boundary
    and still dedup where fixed-width chunking shifts everything
    (pytest constructs exactly that). Same per-doc outputs and
    shuffle profile as q_chunk_dedup; the chunk-id prefix sum is a
    per-document window — fully parallel across documents.
    See operators/corpus.cdc_chunk_dedup."""
    return _corpus.cdc_chunk_dedup(_t(spark, sf_dir, "documents"))


@register("q_epoch_manifest", oracle=_corpus.epoch_manifest_oracle(500))
def q_epoch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection flagship (round 9): the epoch training MANIFEST —
    exactly 500 (document, copy) slots drawn by systematic weighted
    sampling (multiplicity preserved as distinct slots) and laid out
    in the deterministic epoch-1 (shard, pos) order, as ONE plan.
    Every slot row is hash-bound, so the draw, the multiplicity
    expansion, and the permutation all certify together. A preempted
    training job rebuilds the identical manifest by construction.
    See operators/corpus.epoch_manifest."""
    return _corpus.epoch_manifest(_t(spark, sf_dir, "documents"), 500)


_DECON_BENCH_PRED = (
    f"{md5_long_sql(chr(39) + 'bench:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} % 61 = 0"
)


@register(
    "q_decontaminate",
    oracle=_text.decontaminate_oracle(_DECON_BENCH_PRED),
    bench=True,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 training-data hygiene: BENCHMARK DECONTAMINATION — flag
    every training document sharing any 8-token n-gram with the
    evaluation set (the scaled GPT-3 13-gram procedure). The
    benchmark here is a deterministic ~1/61 salted-hash slice of the
    corpus itself, so contamination is guaranteed non-trivial (the
    slice docs self-match) and the oracle reconstructs the identical
    slice. Benchmark n-grams broadcast; the corpus text never
    shuffles — only matched (doc_id, count) rows reach the one
    aggregation exchange. See operators/text.decontaminate."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(
        md5_long(
            F.concat(F.lit("bench:"), F.col("doc_id").cast("string"))
        )
        % 61
        == 0
    )
    return _text.decontaminate(docs, bench)


@register(
    "q_local_clustering",
    oracle=f"""
        WITH pairs AS MATERIALIZED ({_dedup.minhash_pairs_oracle()}),
        e AS (SELECT DISTINCT id_a, id_b FROM pairs),
        deg AS (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT id_a AS n FROM e
                  UNION ALL SELECT id_b AS n FROM e)
            GROUP BY n
        ),
        tris AS (
            SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
            FROM e e1
            JOIN e e2 ON e1.id_b = e2.id_a
            JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
        ),
        corners AS (SELECT unnest([a, b, c]) AS node FROM tris),
        t AS (
            SELECT node, CAST(count(*) AS BIGINT) AS triangles
            FROM corners GROUP BY node
        )
        SELECT deg.n AS node,
               deg.d AS degree,
               CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
               CAST(CASE WHEN deg.d < 2 THEN 0
                    ELSE (2 * coalesce(t.triangles, 0) * 1000000)
                         // (deg.d * (deg.d - 1)) END AS BIGINT)
                   AS clustering_ppm
        FROM deg LEFT JOIN t ON deg.n = t.node
    """,
)
def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics (X11c): PER-NODE triangle counts and local
    clustering coefficient over the MinHash near-dup graph — the
    node-granular complement of q_triangle_count's global census
    (a doc whose neighborhood is triangle-dense sits inside a
    boilerplate clique; a high-degree low-clustering doc is a hub
    stitching unrelated near-dup groups — the classic curation
    signal for template pages). Triangles are enumerated once from
    the degree-oriented minimum corner (arboricity-bounded work, the
    q_triangle_count orientation), then credit all three corners via
    one explode; coefficients are ppm integer divisions, fully
    engine-exact. See operators/graph.local_clustering."""
    from kafka_streams_pipeline_spark.operators.graph import local_clustering

    pairs = _dedup.minhash_near_dup_pairs(_t(spark, sf_dir, "documents"))
    return local_clustering(pairs.select("id_a", "id_b"))


def _drift_profile_sql(src: str, cols: list[str]) -> str:
    """DuckDB table_profile twin over subquery ``src`` (exact form)."""
    parts = []
    for c in cols:
        parts.append(f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count({c}) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM {src}""")
    return " UNION ALL ".join(parts)


_DRIFT_NEW_SLICE = f"""(
    SELECT doc_id,
           CASE WHEN {md5_long_sql("'nulllang:' || CAST(doc_id AS VARCHAR)")} % 7 = 0
                THEN NULL ELSE lang END AS lang,
           source,
           CASE WHEN {md5_long_sql("'grow:' || CAST(doc_id AS VARCHAR)")} % 11 = 0
                THEN n_chars + 5000 ELSE n_chars END AS n_chars
    FROM documents
    WHERE {md5_long_sql("'drop:' || CAST(doc_id AS VARCHAR)")} % 13 != 0
)"""

_DRIFT_COLS = ["doc_id", "lang", "source", "n_chars"]


@register(
    "q_profile_drift",
    oracle=f"""
        WITH po AS ({_drift_profile_sql("(SELECT doc_id, lang, source, n_chars FROM documents)", _DRIFT_COLS)}),
        pn AS ({_drift_profile_sql(_DRIFT_NEW_SLICE, _DRIFT_COLS)})
        SELECT po.col_name,
               po.n_rows AS rows_old, pn.n_rows AS rows_new,
               po.n_nonnull AS nonnull_old, pn.n_nonnull AS nonnull_new,
               po.n_distinct AS distinct_old, pn.n_distinct AS distinct_new,
               CAST(abs((pn.n_nonnull * 1000000) // pn.n_rows
                      - (po.n_nonnull * 1000000) // po.n_rows) AS BIGINT)
                   AS nonnull_drift_ppm,
               CAST((abs(pn.n_distinct - po.n_distinct) * 1000000)
                    // po.n_distinct AS BIGINT) AS distinct_drift_ppm,
               (po.min_value != pn.min_value OR po.max_value != pn.max_value)
                   AS minmax_changed,
               (abs((pn.n_nonnull * 1000000) // pn.n_rows
                  - (po.n_nonnull * 1000000) // po.n_rows) >= 50000
                OR (abs(pn.n_distinct - po.n_distinct) * 1000000)
                   // po.n_distinct >= 50000
                OR po.min_value != pn.min_value
                OR po.max_value != pn.max_value) AS drifted
        FROM po JOIN pn ON po.col_name = pn.col_name
    """,
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality drift detection (X10c): diff two per-column
    profiles and flag the columns whose health moved — here between
    the documents corpus and a deterministically degraded successor
    snapshot (~1/13 of rows dropped, lang nulled for a 1/7 slice,
    n_chars inflated for a 1/11 slice — simulating a broken upstream
    between two ingest versions). The drift math is O(columns) ppm
    integer arithmetic over two profile frames; neither snapshot is
    rescanned. See operators/quality.profile_drift; pairs with
    sources/versioned.read_corpus for version-to-version monitoring.
    """
    from kafka_streams_pipeline_spark.operators.quality import (
        profile_drift,
        table_profile,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    h = lambda salt: md5_long(  # noqa: E731
        F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))
    )
    degraded = (
        docs.where(h("drop") % 13 != 0)
        .select(
            "doc_id",
            F.when(h("nulllang") % 7 == 0, F.lit(None)).otherwise(
                F.col("lang")
            ).alias("lang"),
            "source",
            F.when(h("grow") % 11 == 0, F.col("n_chars") + 5000).otherwise(
                F.col("n_chars")
            ).alias("n_chars"),
        )
    )
    return profile_drift(table_profile(docs), table_profile(degraded))


@register(
    "q_negative_sampling",
    oracle=_corpus.negative_samples_oracle(),
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 contrastive-training support: K deterministic pseudo-random
    negatives per anchor — negative j of anchor a is the document at
    dense index md5('neg:a:j') mod N, a pure function of ids, so
    every engine/retry/rerun draws identical negatives (rand()-based
    sampling loses this on any repartition). Self-collisions drop
    (documented ≤ k per anchor). Ids-only dense index + one shuffle
    join; payloads never move. See operators/corpus.negative_samples.
    """
    return _corpus.negative_samples(_t(spark, sf_dir, "documents"))


@register(
    "q_k_anonymity",
    oracle="""
        SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS class_size,
               (count(*) < 8) AS at_risk
        FROM customer
        GROUP BY c_mktsegment, c_nationkey
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10e privacy audit: k-anonymity equivalence classes over the
    (market segment, nation) quasi-identifiers of customer — class
    sizes plus the at-risk flag at k=8 (chosen so the sf0.01 gate
    exercises BOTH flag branches: class sizes there span 5..21).
    One counter-only aggregate shuffle; the k_anonymize enforcement
    twin (QI suppression via a broadcast class-size join, row count
    preserved) is pytest-certified. See operators/quality.k_anonymity.
    """
    from kafka_streams_pipeline_spark.operators.quality import k_anonymity

    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_nationkey").cast("long").alias("c_nationkey")
    )
    return k_anonymity(cust, ["c_mktsegment", "c_nationkey"], k=8)


@register(
    "q_l_diversity",
    oracle="""
        SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS class_size,
               CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                    AS BIGINT) AS n_distinct_sensitive,
               (count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 5)
                   AS at_risk
        FROM customer
        GROUP BY c_mktsegment, c_nationkey
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10f privacy audit (round 15): distinct l-diversity over the
    same (market segment, nation) quasi-identifiers as q_k_anonymity,
    with the account-balance thousand-bucket as the sensitive
    attribute — the homogeneity-attack successor criterion
    (Machanavajjhala et al. 2007): a k-anonymous class whose members
    share one sensitive value still leaks it. l=5 is chosen so the
    sf0.01 gate exercises BOTH at-risk branches (distinct counts
    there span 4..10; at sf0.001 every class is at risk — the gate
    SF carries the discriminating evidence). One distinct-count
    aggregate shuffle, bounded by the sensitive domain per class.
    See operators/quality.l_diversity."""
    from kafka_streams_pipeline_spark.operators.quality import l_diversity

    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("bal_k"),
    )
    return l_diversity(
        cust, ["c_mktsegment", "c_nationkey"], "bal_k", l_threshold=5
    )


@register(
    "q_t_closeness",
    bench=True,
    oracle="""
        WITH base AS (
            SELECT c_mktsegment AS seg, CAST(c_nationkey AS BIGINT) AS nat,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS s
            FROM customer WHERE c_acctbal IS NOT NULL
        ),
        gdist AS (SELECT s, count(*) AS gq FROM base GROUP BY s),
        tot AS (SELECT count(*) AS N, count(DISTINCT s) AS m FROM base),
        cls AS (
            SELECT seg, nat, count(*) AS n_c FROM base GROUP BY seg, nat
        ),
        cell AS (
            SELECT seg, nat, s, count(*) AS cp
            FROM base GROUP BY seg, nat, s
        ),
        grid AS (
            SELECT c.seg, c.nat, c.n_c, g.s, g.gq,
                   COALESCE(cell.cp, 0) AS cp
            FROM cls c CROSS JOIN gdist g
            LEFT JOIN cell ON cell.seg = c.seg AND cell.nat = c.nat
                          AND cell.s = g.s
        ),
        cum AS (
            SELECT seg, nat, n_c, s,
                   sum(cp) OVER (PARTITION BY seg, nat ORDER BY s) AS cpc,
                   sum(gq) OVER (PARTITION BY seg, nat ORDER BY s) AS gqc
            FROM grid
        )
        SELECT seg AS c_mktsegment, nat AS c_nationkey,
               CAST(max(n_c) AS BIGINT) AS class_size,
               CAST((SELECT m FROM tot) AS BIGINT) AS domain_size,
               CAST(sum(abs(CAST(cpc AS HUGEINT) * (SELECT N FROM tot)
                          - CAST(gqc AS HUGEINT) * n_c)) AS BIGINT)
                   AS emd_num,
               (sum(abs(CAST(cpc AS HUGEINT) * (SELECT N FROM tot)
                      - CAST(gqc AS HUGEINT) * n_c)) * 12
                > 1 * ((SELECT m FROM tot) - 1)
                    * CAST(max(n_c) AS HUGEINT) * (SELECT N FROM tot))
                   AS at_risk
        FROM cum GROUP BY seg, nat
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10g privacy audit (round 16): t-closeness over the same
    (market segment, nation) quasi-identifiers as q_k_anonymity /
    q_l_diversity with the balance-thousand bucket as the ORDERED
    sensitive attribute — the skewness-attack successor criterion
    (Li et al., ICDE 2007): a diverse class whose distribution sits
    far from the global one still leaks. Ordered-domain EMD held as
    exact integers (|cpc*N - gqc*n_c| per domain step, threshold by
    cross-multiply at t = 1/12 - chosen so the sf0.01 gate
    exercises BOTH branches: 46/125 classes close there, while at
    sf0.1 concentration pulls every class within t; the gate SF
    carries the discriminating evidence). Domain-bounded plan: two
    map-side-partial groupBys, a broadcast classes x domain grid,
    per-class <= m-row cum windows. See
    operators/quality.t_closeness."""
    from kafka_streams_pipeline_spark.operators.quality import t_closeness

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment"),
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("bal_k"),
    )
    return t_closeness(
        cust, ["c_mktsegment", "c_nationkey"], "bal_k"
    )


@register("q_dsir_select", oracle=_text.dsir_select_oracle())
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5ac data selection via importance resampling (DSIR, Xie et
    al. 2023): rank non-English candidate documents by how
    English-target-like their hashed-bigram distribution is —
    per-bucket integer-bits importance scores (Laplace-smoothed,
    bit-length surprisal, no float log), length-normalized doc
    weights, deterministic top-50 with doc_id tie-break where the
    paper's Gumbel resampling would be irreproducible. Both models
    collapse to ≤ 512 rows map-side and broadcast into the scoring
    join; selection is TakeOrderedAndProject — no global sort. See
    operators/text.dsir_select."""
    return _text.dsir_select(_t(spark, sf_dir, "documents"))


@register("q_shard_balance", oracle=_corpus.shard_balance_oracle())
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5ad balanced training-shard assignment: documents distributed
    over 8 output shards with near-equal TOTAL characters via sorted
    round-robin (deterministic LPT), the write-side balance step
    that keeps 1000 downstream readers finishing together. Global
    rank is two-phase (range repartition → parallel local ranks →
    broadcast prefix offsets — no single-task sort); the certified
    per-shard manifest pins membership via the id checksum. See
    operators/corpus.shard_balance."""
    return _corpus.shard_balance(_t(spark, sf_dir, "documents"))


@register("q_boilerplate_scrub", oracle=_text.boilerplate_scrub_oracle(), bench=True)
def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5af boilerplate-span removal (round 11): every 3-token span
    appearing in >=3 distinct docs is scrubbed from all docs, unique
    remainder re-emitted in original order (the RefinedWeb/C4
    line-dedup step for newline-free corpora — keeps the content
    whole-doc dedup would discard with the wrapper). Positional
    n-grams explode as integer rows (text never shuffles for the
    frequency pass), one hash-keyed doc-frequency shuffle, AQE-sized
    frequent-set join, covered-position lists ride the final
    doc-keyed join instead of text. See
    operators/text.boilerplate_scrub."""
    return _text.boilerplate_scrub(_t(spark, sf_dir, "documents"))


@register("q_budget_select", oracle=_corpus.budget_select_oracle())
def q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5ag token-budget data selection (round 11): highest
    quality-density docs kept until a 10k-token global budget is
    exhausted (prefix rule over the engine-exact integer-ppm density
    order). The global cumulative sum is two-phase like
    shard_balance — range repartition, parallel local running
    totals, broadcast prefix offsets; no single-task sort. See
    operators/corpus.budget_select."""
    return _corpus.budget_select(_t(spark, sf_dir, "documents"))


@register("q_ngram_diversity", oracle=_text.ngram_diversity_oracle())
def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5ai per-source n-gram diversity audit (round 11): bigram
    type-token ratio in integer ppm per source — the self-repetition
    measure that flags template farms and mode-collapsed synthetic
    data — with the exact distinct count and the per-group KMV
    estimate side by side (the exact column is the certification
    twin; KMV is the 100 TB path). See
    operators/text.ngram_diversity."""
    return _text.ngram_diversity(_t(spark, sf_dir, "documents"))


@register(
    "q_group_quantile_filter",
    oracle=None,  # set right below (quality module builder)
)
def q_group_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10g per-group quality-quantile gate (round 11, deferred to
    the r12 window): within each language keep the top 1/4 of docs
    by integer-ppm quality — the Gopher/MassiveText per-language
    filtering convention (a global cutoff lets high-resource
    languages wipe out low-resource groups). Float-free rank read
    (rank·den ≤ n·num), id tie-break; per-group membership pinned by
    checksum. See operators/quality.group_quantile_filter."""
    from kafka_streams_pipeline_spark.operators.quality import (
        group_quantile_filter,
    )

    return group_quantile_filter(_t(spark, sf_dir, "documents"))


@register(
    "q_ref_integrity",
    oracle=None,  # set right below
)
def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10h cross-table referential-integrity audit (round 11,
    deferred to the r12 window): documents.doc_id vs
    embeddings.vec_id matched / left_only / right_only with distinct
    key counts and checksums (each side modulus-restricted so all
    three classes appear at the sf0.01 gate) — the join-health scorecard before any
    multimodal pairing job trains on silently-dropped rows. Both
    sides reduce to distinct keys map-side; one full-outer hash
    join. See operators/quality.ref_integrity."""
    from kafka_streams_pipeline_spark.operators.quality import ref_integrity

    return ref_integrity(
        _t(spark, sf_dir, "documents").where(F.col("doc_id") % 5 != 0),
        _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 7 != 0),
        "doc_id",
        "vec_id",
    )


from kafka_streams_pipeline_spark.inventory._registry import ORACLES as _OR
from kafka_streams_pipeline_spark.operators.quality import (
    group_quantile_filter_oracle as _gqf_oracle,
    ref_integrity_oracle as _ri_oracle,
)

_OR["q_group_quantile_filter"] = _gqf_oracle()
_OR["q_ref_integrity"] = _ri_oracle(
    left_table="(SELECT * FROM documents WHERE doc_id % 5 != 0)",
    right_table="(SELECT * FROM embeddings WHERE vec_id % 7 != 0)",
)


def _kcore_oracle() -> str:
    from kafka_streams_pipeline_spark.operators.graph import (
        kcore_oracle_tail,
    )

    return f"""
        WITH pairs AS MATERIALIZED ({_dedup.simhash_hamming_oracle()}),
        {kcore_oracle_tail().lstrip()}
    """


@register("q_kcore", oracle=_kcore_oracle())
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics (X11e, round 12 — deferred cert → r13 window):
    k-core decomposition over the SimHash Hamming near-dup graph
    (the densest certified pair generator — its designed near-dup
    cliques give a non-trivial 176-node core at the gate SF) — the
    maximal subgraph of minimum degree ≥ 3, the standard flag for
    template-farm duplicate clusters (dense cores) vs organic drift
    (tree-ish components). Bounded peeling: exactly 8 rounds of
    degree-filter + semi-join prune (localCheckpoint per round), the
    oracle unrolling the IDENTICAL iterations as chained CTEs, with
    ``converged`` = last round removed nothing (pinned TRUE at the
    gate SFs, where fixed-rounds ≡ run-to-fixpoint). Completes the
    graph family: components, centrality, triangles/clustering,
    cores. See operators/graph.kcore."""
    from kafka_streams_pipeline_spark.operators.graph import kcore

    pairs = _dedup.simhash_hamming_pairs(
        _t(spark, sf_dir, "documents")
    ).select("id_a", "id_b")
    return kcore(pairs)


@register(
    "q_span_dedup", oracle=_dedup.duplicated_spans_oracle(), bench=True
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 span leg (round 13): exact duplicated-SPAN detection — the
    maximal token regions whose 8-grams each repeat in the corpus
    (Lee et al. 2022 substring dedup, positional-n-gram form).
    Doc-level dedup keeps or drops whole documents; this localizes
    the repeated region so boilerplate can be excised from otherwise
    unique documents. One gram-partitioned window count (single
    shuffle of the gram stream) + a per-doc gaps-and-islands merge;
    all-integer span arithmetic makes the DuckDB twin exact. See
    operators/dedup.duplicated_spans."""
    return _dedup.duplicated_spans(_t(spark, sf_dir, "documents"))


@register("q_record_linkage", oracle=_dedup.record_linkage_oracle())
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 structured leg (round 13): blocked record linkage /
    entity resolution over customer rows — deterministic blocking on
    (nation, 16-char name prefix), candidate pairs only within
    blocks, match decided by a field-level agreement vector (name
    edit distance ≤ 1) with the agreement evidence in the output for
    survivor rules. ONE shuffle on the composite blocking key; block
    size is bounded by key design, which is what keeps pairwise
    linkage linear-ish at 100 TB. See
    operators/dedup.record_linkage_pairs."""
    return _dedup.record_linkage_pairs(_t(spark, sf_dir, "customer"))


@register(
    "q_token_cooccurrence",
    oracle=_text.token_cooccurrence_oracle(),
    bench=True,
)
def q_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 skip-gram co-occurrence (round 13): unordered token pairs
    within ±3 positions, the word2vec/GloVe training statistic —
    word_bigrams is one diagonal of this matrix. Per-row nested
    array generation (no positional self-join), one map-side-partial
    count aggregate, TakeOrdered top-150 tie-broken by pair text.
    See operators/text.token_cooccurrence."""
    return _text.token_cooccurrence(_t(spark, sf_dir, "documents"))


@register("q_entity_golden", oracle=_dedup.entity_golden_oracle())
def q_entity_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MDM completion (round 13, deferred cert → r14 window):
    end-to-end entity resolution — blocked linkage pairs →
    transitive closure (adaptive small-graph union-find, the same
    min-id fixpoint as the distributed large-star/small-star
    solver) → one entity_id per cluster → deterministic golden-record
    survivorship. Total assignment: every customer row gets
    (entity_id, is_survivor), singletons included. Recursive-CTE
    closure oracle over the SAME blocked pairs. See
    operators/dedup.entity_golden."""
    return _dedup.entity_golden(_t(spark, sf_dir, "customer"))


@register("q_entity_golden_alt", oracle=_dedup.entity_golden_oracle())
def q_entity_golden_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MDM, distributed branch (round 14, VERDICT r13 item 7): the
    same entity resolution as q_entity_golden with the transitive
    closure FORCED through the alternating large-star/small-star
    solver — the branch every 100 TB deployment takes (the adaptive
    probe routes fixture-sized graphs through driver union-find, so
    without this row the distributed leg would never earn its own
    driver certification). Identical recursive-CTE oracle: the
    driver proves both closure strategies reach the same min-id
    fixpoint, mirroring q_dedup_components_alt."""
    return _dedup.entity_golden(
        _t(spark, sf_dir, "customer"), algorithm="alternating"
    )
