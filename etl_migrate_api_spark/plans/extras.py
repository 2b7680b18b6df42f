"""Tail-registered extra queries — imported LAST by the registry on
purpose: these are additive demonstrations whose survey coverage is
already driver-gated elsewhere, so if the driver caps the gate at 50
queries they are among the entries that fall out (pytest's oracle-parity
mirror still verifies them every run)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_migrate_api_spark.operators import dedup as dd
from etl_migrate_api_spark.plans.llm_ops import (
    PLANTED_DOCS_SQL,
    _minhash_oracle,
    planted_docs,
)
from etl_migrate_api_spark.plans.registry import register


@register(
    "sample_class_balanced",
    oracle="""
      select lang, doc_id
      from (select lang, doc_id,
                   row_number() over (partition by lang
                                      order by md5(cast(doc_id as string)), doc_id) as rn
            from documents) t
      where rn <= 100
    """,
    survey_refs=("F2", "W1"),
)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class-balanced downsampling — the training-data
    curation op for rebalancing skewed label distributions: keep exactly
    k docs per class, chosen by md5 rank (reproducible across runs,
    engines, and re-partitioning, unlike rand(seed)-based sampleBy whose
    draws depend on row order). One shuffle on the class key."""
    from pyspark.sql import Window

    from etl_migrate_api_spark.catalog import load

    docs = load(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 100)
        .select("lang", "doc_id")
    )


def _neardup_clusters_oracle() -> str:
    """Components of the SimHash hamming ≤ 3 pair graph via a recursive
    transitive closure (fine for the oracle's small gate-scale graph;
    the Spark side is the scalable label propagation)."""
    from etl_migrate_api_spark.plans.llm_ops import _SIMHASH_DOC_SQL

    # the recursive CTE requires WITH RECURSIVE at the head of the chain
    sig_sql = _SIMHASH_DOC_SQL.replace("\nwith docs", "\nwith recursive docs", 1)
    return (
        sig_sql
        + """,
      p as (
        select a.id as id_a, b.id as id_b
        from sig a join sig b on a.id < b.id
        where bit_count(xor(a.simhash_lo, b.simhash_lo))
              + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
      ),
      edges as (
        select id_a as u, id_b as v from p
        union
        select id_b as u, id_a as v from p
      ),
      reach(u, v) as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u
      )
      select u as id, least(u, min(v)) as root
      from reach group by u
    """
    )


@register("llm_neardup_clusters", oracle=_neardup_clusters_oracle())
def llm_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the SimHash
    hamming ≤ 3 pair graph — the step between pair detection and a
    deduplicated corpus (keep root per component). Spark side is
    iterative min-label propagation (operators/dedup.py::
    connected_components); the oracle computes the same components by
    recursive transitive closure."""
    pairs = dd.simhash_neardup_pairs(planted_docs(spark, sf_dir))
    out = dd.connected_components(pairs)
    pairs.unpersist()
    return out


# ---------------------------------------------------------------------------
# Representative assignment — the scale-safe OUTPUT of the near-dup family
# ---------------------------------------------------------------------------


def _attach_representatives(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, rep_id) for EVERY corpus doc: members of a near-dup
    component map to its min doc_id, singletons map to themselves.
    Output is exactly one row per doc — the contract that makes this
    the 100 TB shape (the pair list is O(cluster²) on dup-heavy
    corpora; this is O(n) by construction). One hash join of the corpus
    keys against the component labels (labels cover only docs that
    appear in some pair — the small side on any real corpus)."""
    comp = dd.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left_outer")
        .select(
            "doc_id", F.coalesce("root", F.col("doc_id")).alias("rep_id")
        )
    )


_REP_CLOSURE_SQL = """
      edges as (
        select id_a as u, id_b as v from p
        union
        select id_b as u, id_a as v from p
      ),
      reach(u, v) as (
        select u, v from edges
        union
        select r.u, e.v from reach r join edges e on r.v = e.u
      ),
      roots as (
        select u as id, least(u, min(v)) as root from reach group by u
      )
"""


def _simhash_representatives_oracle() -> str:
    from etl_migrate_api_spark.plans.llm_ops import _SIMHASH_DOC_SQL

    sig_sql = _SIMHASH_DOC_SQL.replace(
        "\nwith docs", "\nwith recursive docs", 1
    )
    return (
        sig_sql
        + """,
      p as (
        select a.id as id_a, b.id as id_b
        from sig a join sig b on a.id < b.id
        where bit_count(xor(a.simhash_lo, b.simhash_lo))
              + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
      ),
"""
        + _REP_CLOSURE_SQL
        + """
      select s.id as doc_id, coalesce(r.root, s.id) as rep_id
      from sig s left join roots r on s.id = r.id
    """
    )


@register(
    "llm_simhash_representatives",
    oracle=_simhash_representatives_oracle(),
    survey_refs=("E1", "J2"),
)
def llm_simhash_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup REPRESENTATIVE assignment: (doc_id, rep_id) for
    every corpus doc, rep = min doc_id of the hamming ≤ 3 component
    (self for singletons). This is the output a 100 TB dedup pass
    actually ships — llm_simhash_neardup's pair list is O(cluster²) on
    dup-heavy corpora (measured 43× pair growth at 10× data on a
    repetitive corpus), while this is one row per doc by construction
    (tests/test_extras.py pins rows == n_docs). Spark side: pigeonhole
    band join → min-label propagation → one corpus-key join; oracle:
    recursive transitive closure + left join back to the corpus."""
    docs = planted_docs(spark, sf_dir)
    pairs = dd.simhash_neardup_pairs(docs)
    out = _attach_representatives(docs, pairs)
    pairs.unpersist()
    return out


_MINHASH_REP_TAU = 0.8


def _minhash_representatives_oracle() -> str:
    return (
        f"""
with recursive docs as ({PLANTED_DOCS_SQL}),
      p as (
        select id_a, id_b from ({_minhash_oracle()}) q
        where jaccard >= {_MINHASH_REP_TAU}
      ),
"""
        + _REP_CLOSURE_SQL
        + """
select d.doc_id, coalesce(r.root, d.doc_id) as rep_id
from docs d left join roots r on d.doc_id = r.id
"""
    )


@register(
    "llm_minhash_representatives",
    oracle=_minhash_representatives_oracle(),
    survey_refs=("E1", "J2"),
)
def llm_minhash_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup REPRESENTATIVE assignment: candidates from
    the banded equi-join, exact-Jaccard-verified at ≥ 0.8, clustered by
    min-label propagation, then every corpus doc mapped to its
    component's min doc_id (self if unpaired). Same one-row-per-doc
    scale contract as llm_simhash_representatives; the jaccard
    threshold compares identically on both engines (same integer
    operands, one correctly-rounded double division)."""
    docs = planted_docs(spark, sf_dir)
    cands = dd.minhash_lsh_candidates(docs)
    out = _attach_representatives(
        docs, cands.where(F.col("jaccard") >= _MINHASH_REP_TAU)
    )
    cands.unpersist()
    return out


@register(
    "llm_dedup_corpus",
    oracle="""
      with docs as (
        select doc_id, text, lang, source from documents
        union all
        select doc_id + 100000, text || ' near duplicate tail marker', lang, source
        from documents where doc_id % 25 = 0
        union all
        select doc_id + 200000, text, lang, source
        from documents where doc_id % 20 = 5
      ),
      fps as (
        select doc_id,
               md5(lower(regexp_replace(trim(text), '[ \\t\\r\\n\\f]+', ' ', 'g'))) as fp
        from docs
      ),
      keepers as (select fp, min(doc_id) as keeper from fps group by fp)
      select f.doc_id, d.lang, d.source
      from fps f
      join keepers k on f.fp = k.fp and f.doc_id = k.keeper
      join docs d on d.doc_id = f.doc_id
    """,
    survey_refs=("E1", "E2"),
)
def llm_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACT half of exact dedup: the deduplicated corpus itself —
    first occurrence (min doc_id) per content fingerprint survives.
    Genuinely ONE hash shuffle: min_by carries the keeper's whole row
    through the fingerprint aggregation, no join-back. This is the
    query a training pipeline actually materializes."""
    docs = planted_docs(spark, sf_dir)
    from etl_migrate_api_spark.functions.text import fingerprint

    keeper = F.min_by(F.struct("doc_id", "lang", "source"), F.col("doc_id"))
    return (
        docs.select(fingerprint("text").alias("fp"), "doc_id", "lang", "source")
        .groupBy("fp")
        .agg(keeper.alias("k"))
        .select("k.doc_id", "k.lang", "k.source")
    )


def _minhash_incremental_oracle() -> str:
    """The incremental operator's output (batch = odd doc_ids, store =
    even doc_ids) is EXACTLY the full-corpus result restricted to pairs
    with ≥1 odd member: bands are per-document, so batch×(corpus∪batch)
    candidates ≡ full candidates touching the batch."""
    return f"""
      select * from ({_minhash_oracle()}) t
      where id_a % 2 = 1 or id_b % 2 = 1
    """


@register("llm_minhash_incremental_dedup", oracle=_minhash_incremental_oracle())
def llm_minhash_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the odd-doc_id half of the corpus
    deduped against the even half's persisted signature/band store —
    corpus text is never rescanned (operators/dedup.py::
    minhash_lsh_candidates_incremental). Oracle-checked via the parity
    restriction of the full-corpus oracle."""
    docs = planted_docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    # materialize the store the way a real deployment would — the
    # operator's "never rescan corpus text" contract holds only when
    # sigs/bands aren't lazy views over the corpus (its verify joins
    # would otherwise re-run the shingle chain per branch)
    sigs, bands = dd.minhash_signature_tables(corpus)
    sigs, bands = sigs.persist(), bands.persist()
    out = dd.minhash_lsh_candidates_incremental(batch, sigs, bands)
    sigs.unpersist()
    bands.unpersist()
    return out


@register(
    "events_transition_matrix",
    oracle="""
      with seq as (
        select user_id, event_type,
               lag(event_type) over (partition by user_id
                                     order by ts, event_id) as prev_type
        from events
      ),
      trans as (
        select prev_type as from_type, event_type as to_type,
               count(*) as n
        from seq where prev_type is not null
        group by prev_type, event_type
      )
      select from_type, to_type, cast(n as bigint) as n,
             cast(n as double)
               / cast(sum(n) over (partition by from_type) as double)
               as prob
      from trans
    """,
    survey_refs=("W2", "A3", "J2"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over the event stream: for each ordered
    pair of event types, how often does one follow the other within a
    user's timeline, and with what conditional probability — the
    standard user-journey / funnel-analysis summary (and the input to
    next-event prediction baselines). Engine-exactness: counts are
    integers; each probability is ONE bigint/bigint division in double
    (correctly rounded, identical on both engines — no float sums
    anywhere). Shape: one (user_id)-partitioned window for the lag,
    one map-side-combined aggregate on the (from, to) pair (bounded by
    |event_types|²), and a |pairs|-row window for the row
    normalization. The per-user window is the only corpus shuffle."""
    from etl_migrate_api_spark.catalog import load
    from pyspark.sql import Window

    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double")
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split — dedup-aware eval hygiene
# ---------------------------------------------------------------------------


def _leakage_safe_split_oracle() -> str:
    from etl_migrate_api_spark.plans.llm_ops import _SIMHASH_DOC_SQL

    sig_sql = _SIMHASH_DOC_SQL.replace(
        "\nwith docs", "\nwith recursive docs", 1
    )
    return (
        sig_sql
        + """,
      p as (
        select a.id as id_a, b.id as id_b
        from sig a join sig b on a.id < b.id
        where bit_count(xor(a.simhash_lo, b.simhash_lo))
              + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
      ),
"""
        + _REP_CLOSURE_SQL
        + """,
      rep as (
        select s.id as doc_id, coalesce(r.root, s.id) as rep_id
        from sig s left join roots r on s.id = r.id
      )
      select doc_id, rep_id,
             case when substring(md5('split' || cast(rep_id as varchar)), 1, 2) < 'f6'
                  then 'train'
                  when substring(md5('split' || cast(rep_id as varchar)), 1, 2) < 'fb'
                  then 'val'
                  else 'test' end as split
      from rep
    """
    )


@register(
    "llm_leakage_safe_split",
    oracle=_leakage_safe_split_oracle(),
    survey_refs=("E1", "J2", "F3"),
)
def llm_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test assignment — eval-set hygiene at
    the dataset level: hashing doc_id (llm_split_assign) puts two
    near-identical documents in DIFFERENT splits with probability
    2·p·(1−p), which leaks training text into eval. This query hashes
    the near-dup component REPRESENTATIVE instead (SimHash hamming ≤ 3
    components, min-id rep — the verified llm_simhash_representatives
    machinery), so every member of a duplicate cluster lands in the
    SAME split by construction. Singleton docs hash their own id with
    the same salt and thresholds as llm_split_assign, so the two
    queries agree everywhere except inside near-dup clusters — the
    exact set whose naive assignment was the leak. Scale: rep
    assignment is the banded pair join + min-label propagation already
    bounded by the dup set; the split itself is a pure expression on
    rep_id (no extra shuffle)."""
    docs = planted_docs(spark, sf_dir)
    pairs = dd.simhash_neardup_pairs(docs)
    reps = _attach_representatives(docs, pairs)
    b = F.substring(
        F.md5(F.concat(F.lit("split"), F.col("rep_id").cast("string"))), 1, 2
    )
    out = reps.select(
        "doc_id",
        "rep_id",
        F.when(b < "f6", "train").when(b < "fb", "val").otherwise("test")
        .alias("split"),
    )
    out = out.persist()
    out.count()
    pairs.unpersist()
    return out


# ---------------------------------------------------------------------------
# Per-source dedup report — the corpus-quality dashboard
# ---------------------------------------------------------------------------

_FP_SQL = (
    "md5(lower(regexp_replace(trim(text), '[ \\t\\r\\n\\f]+', ' ', 'g')))"
)


def _dedup_report_oracle() -> str:
    from etl_migrate_api_spark.plans.llm_ops import _SIMHASH_DOC_SQL

    sig_sql = _SIMHASH_DOC_SQL.replace(
        "\nwith docs", "\nwith recursive docs", 1
    )
    return (
        sig_sql
        + f""",
      p as (
        select a.id as id_a, b.id as id_b
        from sig a join sig b on a.id < b.id
        where bit_count(xor(a.simhash_lo, b.simhash_lo))
              + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
      ),
"""
        + _REP_CLOSURE_SQL
        + f""",
      flags as (
        select d.doc_id, d.source,
               case when row_number() over (
                      partition by {_FP_SQL}
                      order by d.doc_id) > 1
                    then 1 else 0 end as is_exact_dup,
               case when coalesce(r.root, d.doc_id) <> d.doc_id
                    then 1 else 0 end as is_near_dup
        from docs d left join roots r on d.doc_id = r.id
      )
      select source,
             cast(count(*) as bigint) as n_docs,
             cast(sum(is_exact_dup) as bigint) as n_exact_dup,
             cast(sum(is_near_dup) as bigint) as n_near_dup,
             cast(sum(case when is_exact_dup = 0 and is_near_dup = 0
                      then 1 else 0 end) as bigint) as n_clean
      from flags group by source
    """
    )


@register(
    "llm_dedup_report",
    oracle=_dedup_report_oracle(),
    survey_refs=("A3", "E1", "E2", "W1"),
)
def llm_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup dashboard — the report a 100 TB curation run
    ships to its owners: for every source, how many docs, how many are
    exact duplicates (not the first occurrence of their content
    fingerprint — the llm_exact_dedup identity), how many are near
    duplicates (member of a SimHash hamming ≤ 3 cluster but not its
    min-id representative), and how many are clean. Integer counts
    only — no rate arithmetic to disagree on. Composes the two already-
    verified dedup identities into one aggregate; scale shape is one
    fingerprint window + the banded near-dup machinery + a single
    groupBy(source)."""
    from pyspark.sql import Window

    from etl_migrate_api_spark.functions.text import fingerprint

    docs = planted_docs(spark, sf_dir)
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    flagged = docs.select(
        "doc_id",
        "source",
        (F.row_number().over(w) > 1).cast("int").alias("is_exact_dup"),
    )
    pairs = dd.simhash_neardup_pairs(docs)
    reps = _attach_representatives(docs, pairs)
    joined = flagged.join(reps, "doc_id").withColumn(
        "is_near_dup",
        (F.col("rep_id") != F.col("doc_id")).cast("int"),
    )
    out = joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_exact_dup").cast("bigint").alias("n_exact_dup"),
        F.sum("is_near_dup").cast("bigint").alias("n_near_dup"),
        F.sum(
            F.when(
                (F.col("is_exact_dup") == 0) & (F.col("is_near_dup") == 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clean"),
    )
    out = out.persist()
    out.count()
    pairs.unpersist()
    return out


# ---------------------------------------------------------------------------
# JSONL ingest round-trip — the file-source contract, oracled
# ---------------------------------------------------------------------------

_JSONL_CHECKSUM_SQL = """
  select lang,
         count(*) as n_docs,
         cast(sum(cast(concat('0x',
                substr(md5(concat_ws('|', cast(doc_id as varchar), text,
                                     source, cast(n_chars as varchar))),
                       1, 10)) as bigint)) as bigint) as checksum,
         0 as n_corrupt
  from documents
  group by lang
"""


@register(
    "llm_jsonl_roundtrip",
    oracle=_JSONL_CHECKSUM_SQL,
    survey_refs=("S1", "K2"),
)
def llm_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSONL corpus-ingest contract, proven lossless end-to-end:
    export the documents table as gzip'd JSONL shards
    (sources/jsonl.py::write_jsonl), re-ingest with the schema-pinned
    PERMISSIVE reader, and aggregate a per-language row count + content
    checksum + corrupt-line count. The oracle computes the same
    aggregate DIRECTLY on the parquet table — a hash match means JSON
    escaping round-tripped every byte of every doc (newlines, quotes,
    non-ASCII) and the reader parsed zero lines as corrupt.

    Checksum discipline: per-row 40-bit md5 prefix as bigint, summed as
    exact decimal (40-bit values keep the sum inside bigint range well
    past sf10 on the oracle side; the engine widens to decimal before
    summing for the same reason).

    100 TB: gzip shards are unsplittable, so write_jsonl's n_shards is
    the read-parallelism knob; the reader never infers (one scan, not
    two); corrupt lines become rows to count, not exceptions to crash
    on. The tmp index-dir hygiene mirrors llm_ann_ivf_topk."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = load(spark, "documents", sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_jsonl")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    path = os.path.join(root, f"corpus_{tag}_{uuid.uuid4().hex[:8]}")
    write_jsonl(docs, path, n_shards=8, compression="gzip")
    back = read_jsonl(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    "text",
                    "source",
                    F.col("n_chars").cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(h.cast("decimal(20,0)")).cast("bigint").alias("checksum"),
        F.sum(
            F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)
        )
        .cast("int")
        .alias("n_corrupt"),
    )


_FORMAT_ROUNDTRIP_SQL = """
  select o_orderstatus,
         cast(count(*) as bigint) as n_orders,
         cast(round(sum(cast(o_totalprice as decimal(18,2))), 2)
              as double) as total_price,
         strftime(min(o_orderdate), '%Y-%m-%d') as first_date,
         strftime(max(o_orderdate), '%Y-%m-%d') as last_date,
         cast(count(distinct o_custkey) as bigint) as n_custs
  from orders
  group by o_orderstatus
  order by o_orderstatus
"""


def _format_roundtrip_agg(df: DataFrame) -> DataFrame:
    """Shared verification aggregate for format-roundtrip queries: a
    hash match against _FORMAT_ROUNDTRIP_SQL (computed on the RAW
    parquet) proves every long / double / string / timestamp survived
    the format's serialization byte-for-byte."""
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias(
                "first_date"
            ),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias(
                "last_date"
            ),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderstatus")
    )


def _roundtrip_tmpdir(kind: str, sf_dir: str) -> str:
    """Per-run tmp dir with the shared stale-sweep hygiene
    (tmputil.sweep_stale_dirs; uuid-suffixed so concurrent runs never
    collide)."""
    import os
    import tempfile
    import uuid

    from etl_migrate_api_spark.tmputil import sweep_stale_dirs

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{kind}")
    sweep_stale_dirs(root)
    return os.path.join(root, f"{tag}_{uuid.uuid4().hex[:8]}")


@register(
    "orders_orc_roundtrip",
    oracle=_FORMAT_ROUNDTRIP_SQL,
    survey_refs=("S4", "K2"),
)
def orders_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a source/sink format, proven lossless end-to-end: export
    the orders table as zlib ORC (Spark's native writer — column
    stripes with built-in min/max indexes, the Hive-ecosystem
    counterpart to parquet), re-read it SCHEMA-PINNED (one scan, no
    inference pass), and aggregate counts + an exact-decimal price sum
    + date bounds + a distinct count per status. The oracle computes
    the same aggregate directly on the raw parquet, so a hash match
    proves longs, doubles, strings and TIMESTAMPS survived the format
    conversion exactly — timestamps being the classic ORC hazard
    (ORC stores them zone-adjusted; the UTC session conf pins both
    directions).

    100 TB: ORC ingest parallelizes per stripe like parquet per
    row-group; the schema-pinned read avoids the double scan that
    inference costs on a petabyte landing zone."""
    from etl_migrate_api_spark.catalog import load

    orders = load(spark, "orders", sf_dir)
    path = _roundtrip_tmpdir("orc", sf_dir)
    orders.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).orc(path)
    return _format_roundtrip_agg(back)


@register(
    "orders_csv_roundtrip",
    oracle=_FORMAT_ROUNDTRIP_SQL,
    survey_refs=("S4", "K2"),
)
def orders_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a source/sink format, proven lossless end-to-end: export
    orders as gzip'd, header-carrying CSV with an explicit microsecond
    timestamp format, re-read SCHEMA-PINNED in PERMISSIVE mode with
    the same format string, and verify via the shared roundtrip
    aggregate (hash-matched against the raw parquet). The traps this
    pins down: double→text→double round-trips exactly (Spark writes
    shortest-round-trip representations), timestamps must carry an
    explicit format on BOTH sides (the default write pattern and the
    default read pattern disagree about fractional seconds), and the
    quote/escape defaults must survive arbitrary string payloads.

    100 TB: gzip CSV shards are unsplittable — parallelism is the
    shard count at write time, exactly like the JSONL contract; the
    schema-pinned PERMISSIVE read turns bad lines into countable rows
    instead of job-killing exceptions."""
    from etl_migrate_api_spark.catalog import load

    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    orders = load(spark, "orders", sf_dir)
    path = _roundtrip_tmpdir("csv", sf_dir)
    (
        orders.repartition(8)
        .write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .option("timestampFormat", ts_fmt)
        .csv(path)
    )
    back = (
        spark.read.schema(
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string"
        )
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return _format_roundtrip_agg(back)


@register(
    "orders_schema_evolution",
    oracle="""
      with v1 as (
        select o_orderkey, o_orderstatus, o_totalprice,
               cast(null as varchar) as channel
        from orders where o_orderkey % 2 = 0
      ),
      v2 as (
        select o_orderkey, o_orderstatus, o_totalprice,
               case when o_orderkey % 3 = 0 then 'web'
                    when o_orderkey % 3 = 1 then 'app'
                    else 'ship' end as channel
        from orders where o_orderkey % 2 = 1
      ),
      u as (
        select * from v1 union all select * from v2
      )
      select o_orderstatus,
             cast(count(*) as bigint) as n_orders,
             cast(sum(case when channel is not null then 1 else 0 end)
                  as bigint) as n_with_channel,
             cast(sum(case when channel = 'web' then 1 else 0 end)
                  as bigint) as n_web,
             cast(round(sum(cast(o_totalprice as decimal(18,2))), 2)
                  as double) as total_price
      from u
      group by o_orderstatus
      order by o_orderstatus
    """,
    survey_refs=("K2", "P2", "P5"),
)
def orders_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the manifest-log table, driver-gated
    end-to-end: v1 lands half the orders WITHOUT the ``channel``
    column, v2 APPENDS the other half WITH it (a widened schema —
    the additive-column evolution every long-lived table undergoes),
    and the plain read must serve the union with NULLs for rows that
    predate the column (mergeSchema over the version's segments). The
    rollup counts channel coverage per status; the oracle rebuilds the
    same union from raw orders, so a hash match proves the old
    segments were neither rewritten nor misread and the new column's
    values and null-backfill are exact.

    100 TB: adding a column costs ZERO data movement — old segments
    stay byte-identical (their footers simply lack the column) and
    only the manifest's schema advances; the alternative (rewrite the
    table) is a full-corpus shuffle nobody runs."""
    import os

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = VersionedTable(_roundtrip_tmpdir("schemaevo", sf_dir))
    t.commit(orders.where(F.col("o_orderkey") % 2 == 0), mode="overwrite")
    evolved = orders.where(F.col("o_orderkey") % 2 == 1).withColumn(
        "channel",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("web"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("app"))
        .otherwise(F.lit("ship")),
    )
    t.commit(evolved, mode="append", allow_evolution=True)
    back = t.read(spark)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("channel").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_with_channel"),
            F.sum(F.when(F.col("channel") == "web", 1).otherwise(0))
            .cast("bigint")
            .alias("n_web"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "orders_json_functions",
    oracle=_FORMAT_ROUNDTRIP_SQL,
    survey_refs=("T3", "P3"),
)
def orders_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSON column-function surface, proven lossless against an
    identity oracle: serialize each order row to a JSON string
    (to_json over a struct), then recover the typed columns THREE
    different ways — from_json with a pinned schema for the numeric
    and timestamp fields, get_json_object (JSONPath) for one string
    field, and json_tuple for another — and run the shared roundtrip
    aggregate. The oracle computes the aggregate directly on the raw
    table, so a hash match proves the full encode→decode cycle for
    longs, doubles, timestamps and strings across all three decode
    APIs (the event-payload pattern: the events table's props column
    is exactly such a JSON string at ingest).

    100 TB: all JSON codecs here are JVM intrinsics inside whole-stage
    codegen — no Python, no shuffle until the final 3-group agg."""
    from etl_migrate_api_spark.catalog import load

    orders = load(spark, "orders", sf_dir)
    js = orders.select(
        F.to_json(
            F.struct(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
            )
        ).alias("j")
    )
    parsed = js.select(
        F.from_json(
            F.col("j"),
            "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
            "o_orderdate timestamp",
        ).alias("s"),
        F.get_json_object(F.col("j"), "$.o_orderstatus").alias(
            "o_orderstatus"
        ),
    ).select(
        F.col("s.o_orderkey").alias("o_orderkey"),
        F.col("s.o_custkey").alias("o_custkey"),
        "o_orderstatus",
        F.col("s.o_totalprice").alias("o_totalprice"),
        F.col("s.o_orderdate").alias("o_orderdate"),
    )
    return _format_roundtrip_agg(parsed)


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (operators/quality.py)
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
  with o as (
    select count(*) as n,
           sum(case when o_custkey is null then 1 else 0 end) as v_notnull,
           count(o_orderkey) - count(distinct o_orderkey) as v_unique,
           sum(case when o_orderstatus not in ('O','F','P')
                      or o_orderstatus is null then 1 else 0 end) as v_status,
           sum(case when o_totalprice < 0 or o_totalprice is null
                    then 1 else 0 end) as v_price,
           sum(case when not (o_orderdate < timestamp '2100-01-01')
                      or o_orderdate is null then 1 else 0 end) as v_date
    from orders
  ),
  l as (
    select count(*) as n,
           sum(case when l_discount < 0 or l_discount > 1
                      or l_discount is null then 1 else 0 end) as v_disc,
           sum(case when not (l_quantity > 0) or l_quantity is null
                    then 1 else 0 end) as v_qty,
           sum(case when l_orderkey is null then 1 else 0 end) as v_ok
    from lineitem
  ),
  fk1 as (
    select (select count(*) from lineitem) as n,
           (select count(*) from lineitem li
             left join (select distinct o_orderkey from orders) o
               on li.l_orderkey = o.o_orderkey
            where o.o_orderkey is null) as v
  ),
  fk2 as (
    select (select count(*) from orders) as n,
           (select count(*) from orders r
             left join (select distinct c_custkey from customer) c
               on r.o_custkey = c.c_custkey
            where c.c_custkey is null) as v
  )
  select 'not_null(o_custkey)' as check, n as n_rows,
         cast(v_notnull as bigint) as violations, v_notnull = 0 as passed from o
  union all
  select 'unique(o_orderkey)', n, cast(v_unique as bigint), v_unique = 0 from o
  union all
  select 'accepted_values(o_orderstatus)', n, cast(v_status as bigint),
         v_status = 0 from o
  union all
  select 'in_range(o_totalprice)', n, cast(v_price as bigint),
         v_price = 0 from o
  union all
  select 'o_orderdate sane', n, cast(v_date as bigint), v_date = 0 from o
  union all
  select 'in_range(l_discount)', n, cast(v_disc as bigint), v_disc = 0 from l
  union all
  select 'l_quantity positive', n, cast(v_qty as bigint), v_qty = 0 from l
  union all
  select 'not_null(l_orderkey)', n, cast(v_ok as bigint), v_ok = 0 from l
  union all
  select 'fk(l_orderkey -> o_orderkey)', n, cast(v as bigint), v = 0 from fk1
  union all
  select 'fk(o_custkey -> c_custkey)', n, cast(v as bigint), v = 0 from fk2
"""


@register(
    "dq_expectations_report",
    oracle=_DQ_ORACLE,
    survey_refs=("A3", "F1", "J1", "J3"),
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (operators/quality.py) over the
    orders/lineitem/customer triangle: null/uniqueness/domain/range
    checks compile to ONE aggregate scan per table, referential checks
    to one anti-join each, and the whole report is a 10-row frame a
    load pipeline gates on. The Deequ/Great-Expectations surface
    re-expressed as plain Catalyst plans — no collect, no per-check
    jobs."""
    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import quality as q

    orders = load(spark, "orders", sf_dir)
    lineitem = load(spark, "lineitem", sf_dir)
    customer = load(spark, "customer", sf_dir)
    return q.expectation_report(
        suites=[
            (
                orders,
                [
                    q.not_null("o_custkey"),
                    q.unique("o_orderkey"),
                    q.accepted_values("o_orderstatus", ["O", "F", "P"]),
                    q.in_range("o_totalprice", lo=0),
                    q.satisfies(
                        "o_orderdate sane",
                        F.col("o_orderdate")
                        < F.to_timestamp(F.lit("2100-01-01")),
                    ),
                ],
            ),
            (
                lineitem,
                [
                    q.in_range("l_discount", lo=0, hi=1),
                    q.satisfies(
                        "l_quantity positive", F.col("l_quantity") > 0
                    ),
                    q.not_null("l_orderkey"),
                ],
            ),
        ],
        fk_reports=[
            q.fk_check(lineitem, "l_orderkey", orders, "o_orderkey"),
            q.fk_check(orders, "o_custkey", customer, "c_custkey"),
        ],
    )


# ---------------------------------------------------------------------------
# Versioned table: time travel + change feed (sinks/versioned.py)
# ---------------------------------------------------------------------------


@register(
    "orders_version_diff",
    oracle="""
      select o_orderkey,
             case when o_orderkey % 97 = 0 then 'added'
                  else 'changed' end as change
      from orders
      where o_orderkey % 97 = 0 or o_orderkey % 89 = 0
    """,
    survey_refs=("K8", "X3", "E2"),
)
def orders_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest-log table exercised end-to-end: v1 = yesterday's
    load (every %97 key missing), v2 = APPEND of the missing keys (the
    manifest reuses v1's segment — no rewrite), v3 = OVERWRITE with
    every %89 status mutated. The query time-travels back to v1 and
    change-feeds v1→v3: %97 keys surface as 'added', %89 (and not %97)
    as 'changed', everything else is filtered inside the diff join.
    The oracle derives the same classification from arithmetic alone —
    a hash match proves commit isolation, time travel, and the
    CDF join in one go."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_versioned")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    t = VersionedTable(
        os.path.join(root, f"orders_{tag}_{uuid.uuid4().hex[:8]}")
    )
    t.commit(orders.where(F.col("o_orderkey") % 97 != 0), mode="overwrite")
    t.commit(orders.where(F.col("o_orderkey") % 97 == 0), mode="append")
    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    t.commit(mutated, mode="overwrite")
    return t.diff(spark, 1, 3, ["o_orderkey"]).where(
        F.col("change").isNotNull()
    )


@register(
    "orders_incremental_rollup",
    oracle="""
      select o_orderstatus,
             count(*) as n_orders,
             cast(round(sum(cast(o_totalprice as decimal(18,2))), 2)
                  as double) as total_price
      from orders
      group by o_orderstatus
    """,
    survey_refs=("A3", "K7", "X1"),
)
def orders_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over the manifest log: orders land
    in three commits (initial load + two appends), and the per-status
    rollup is maintained by aggregating ONLY each increment's segments
    (sinks/versioned.py::read_increment) and re-aggregating the
    partials — the base data is never rescanned. The oracle is the
    full-recompute groupBy over the whole table: a hash match proves
    partial-merge ≡ recompute, the property IVM rests on.

    100 TB: each maintenance pass scans |increment| bytes, not |table|;
    the merge aggregates |groups|×|batches| partial rows. Sums stay
    exact decimals through the merge (the partials must be mergeable
    EXACTLY — a double partial would make the merged total depend on
    batch boundaries)."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_versioned")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    t = VersionedTable(
        os.path.join(root, f"rollup_{tag}_{uuid.uuid4().hex[:8]}")
    )
    t.commit(orders.where(F.col("o_orderkey") % 3 == 0), mode="overwrite")
    t.commit(orders.where(F.col("o_orderkey") % 3 == 1), mode="append")
    t.commit(orders.where(F.col("o_orderkey") % 3 == 2), mode="append")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        )

    parts = (
        partial(t.read(spark, 1))
        .unionByName(partial(t.read_increment(spark, 1, 2)))
        .unionByName(partial(t.read_increment(spark, 2, 3)))
    )
    return parts.groupBy("o_orderstatus").agg(
        F.sum("n").alias("n_orders"),
        F.round(F.sum("s"), 2).cast("double").alias("total_price"),
    )


@register(
    "orders_zonemap_pruned_scan",
    oracle="""
      select month(o_orderdate) as mo,
             count(*) as n_orders,
             cast(round(sum(cast(o_totalprice as decimal(18,2))), 2)
                  as double) as total_price
      from orders
      where o_orderdate >= timestamp '1997-01-01'
        and o_orderdate <  timestamp '1998-01-01'
      group by mo
      order by mo
    """,
    survey_refs=("F2", "F3", "A3"),
)
def orders_zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping end-to-end: orders land as one APPEND per
    year (the natural layout of a date-partitioned ingest stream), so
    each segment's manifest stats carry a disjoint o_orderdate range;
    a one-year scan then PROVABLY opens exactly one segment — the query
    raises if pruning kept more, making the skip itself part of the
    oracled contract. The residual predicate still applies on top, so
    the monthly rollup is identical to a full scan + filter (which is
    what the oracle computes on the raw table).

    100 TB: the prune is a manifest-only decision (O(#segments) driver
    work, zero data I/O) — a 7-year table serves a 1-year query by
    opening 1/7 of its files, before parquet row-group pruning even
    starts. Cites the Delta/Iceberg min-max skipping design."""
    import datetime
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_versioned")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    t = VersionedTable(
        os.path.join(root, f"zonemap_{tag}_{uuid.uuid4().hex[:8]}")
    )
    for yr in range(1995, 2002):
        t.commit(
            orders.where(F.year("o_orderdate") == yr), mode="append"
        )
    filters = [
        ("o_orderdate", ">=", datetime.datetime(1997, 1, 1)),
        ("o_orderdate", "<", datetime.datetime(1998, 1, 1)),
    ]
    kept, skipped = t.pruned_segments(filters)
    if len(kept) != 1:
        raise AssertionError(
            f"zone maps failed to isolate 1997: kept {len(kept)} of "
            f"{len(kept) + len(skipped)} segments"
        )
    return (
        t.scan(spark, filters)
        .groupBy(F.month("o_orderdate").alias("mo"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("mo")
    )


@register(
    "orders_wap_publish",
    oracle="""
      select o_orderstatus,
             count(*) as n_orders,
             cast(round(sum(cast(o_totalprice as decimal(18,2))), 2)
                  as double) as total_price
      from orders
      group by o_orderstatus
      order by o_orderstatus
    """,
    survey_refs=("X3", "K2", "A3"),
)
def orders_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish over the versioned table's branch refs: the
    initial load lands on main WITHOUT every %3 key, the missing batch
    lands on a BRANCH (numbered version, invisible to main readers —
    asserted in-query), an expectation suite audits the branch head,
    and only then fast_forward publishes the snapshot into main. The
    final rollup must equal the plain groupBy over ALL orders — a hash
    match proves branch isolation, the audit read, and the
    publish-by-manifest-copy end to end.

    100 TB: this is how risky batches reach a production table — the
    audit runs against real committed files, and publish moves zero
    bytes (the manifest copy). Cites Iceberg's WAP / branch refs."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import quality as q
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_versioned")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    t = VersionedTable(
        os.path.join(root, f"wap_{tag}_{uuid.uuid4().hex[:8]}")
    )
    t.commit(orders.where(F.col("o_custkey") % 3 != 0), mode="overwrite")
    n_main_before = t.read(spark).count()
    t.branch("wap")
    t.commit_to_branch(
        "wap", orders.where(F.col("o_custkey") % 3 == 0), mode="append"
    )
    if t.read(spark).count() != n_main_before:
        raise AssertionError("branch commit leaked into main pre-publish")
    audit = q.run_checks(
        t.read(spark, t.refs()["wap"]["version"]),
        [q.not_null("o_orderkey"), q.in_range("o_totalprice", lo=0)],
    ).collect()
    failed = [r["check"] for r in audit if not r["passed"]]
    if failed:
        raise AssertionError(f"WAP audit failed: {failed}")
    t.fast_forward("wap")
    return (
        t.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "orders_bloom_point_lookup",
    oracle="""
      with mid as (
        select (min(o_orderkey) + max(o_orderkey)) // 2 as m from orders
      ),
      keys as (
        select o_orderkey from orders, mid
        order by abs(o_orderkey - m), o_orderkey limit 5
      )
      select o_orderkey, o_custkey, o_totalprice
      from orders
      where o_orderkey in (select o_orderkey from keys)
      order by o_orderkey
    """,
    survey_refs=("F1", "PH2"),
)
def orders_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-sidecar point lookup on a HASH-distributed layout: orders
    land as 8 appends keyed by o_orderkey % 8, so every segment's zone
    map spans the whole key range and min/max skipping proves nothing
    — the layout surrogate-key ingest produces at scale. The per-
    segment bloom sidecars (built once per immutable segment) then
    prune the lookup of 5 known keys down to the few segments that can
    actually hold them; the query raises if the blooms failed to skip
    at least 3 of 8. Results are re-filtered on top, so pruning can
    never change them — the oracle is the plain IN query on the raw
    table.

    100 TB: the probe is driver-side (k bit tests per value per
    segment against a ~1-byte-per-row sidecar); false positives cost
    one extra file open, false negatives are impossible. The 5-key
    collect is a bounded TakeOrdered, not a data-plane collect."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_versioned")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    t = VersionedTable(
        os.path.join(root, f"bloom_{tag}_{uuid.uuid4().hex[:8]}")
    )
    for r in range(8):
        t.commit(
            orders.where(F.col("o_orderkey") % 8 == r), mode="append"
        )
    # tight fpp (0.001): the in-query skip assertion below must hold
    # DETERMINISTICALLY at every SF, and at the default 1% a single
    # baked-in false positive showed up at sf1 (15 probe-eligible
    # (segment, key) pairs x 1% ≈ 14% chance per dataset)
    t.build_bloom(spark, "o_orderkey", fpp=0.001)
    # MID-RANGE keys: every segment's [min, max] contains them (keys
    # at the extremes would let the zone maps prune after all, since
    # per-residue minima/maxima differ near the range ends). Two
    # bounded scalar reads, then a bounded TakeOrdered.
    lo_hi = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    mid = (lo_hi["lo"] + lo_hi["hi"]) // 2
    keys = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey")
        .orderBy(F.abs(F.col("o_orderkey") - mid), "o_orderkey")
        .limit(5)
        .collect()
    ]
    zm_kept, _ = t.pruned_segments([("o_orderkey", "in", keys)])
    bl_kept, bl_skipped = t.bloom_prune("o_orderkey", keys)
    if len(zm_kept) != 8:
        raise AssertionError(
            "hash layout should defeat zone maps, but they pruned "
            f"{8 - len(zm_kept)} segments"
        )
    # 5 mid-range keys land in ≤5 residue segments → ≥3 of 8 are
    # skippable; allow ONE false positive (P ≈ 1.5% per dataset at
    # fpp=0.001 — and deterministic, so the three gate SFs are
    # explicitly verified clean)
    if len(bl_skipped) < 2:
        raise AssertionError(
            f"blooms skipped only {len(bl_skipped)} of 8 segments for "
            f"5 keys"
        )
    return t.lookup(spark, "o_orderkey", keys).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# kNN graph (operators/similarity.py::knn_graph / knn_graph_banded)
# ---------------------------------------------------------------------------


@register(
    "llm_knn_graph",
    oracle="""
      with n as (select vec_id, embedding from embeddings where vec_id < 200),
      scored as (
        select q.vec_id as query_id, c.vec_id as neighbor_id,
               list_cosine_similarity(q.embedding, c.embedding) as sim
        from n q join n c on c.vec_id <> q.vec_id
      ),
      r as (select query_id, neighbor_id,
                   row_number() over (partition by query_id
                                      order by sim desc, neighbor_id) as rank
            from scored)
      select query_id, cast(rank as int) as rank, neighbor_id
      from r where rank <= 3
    """,
    survey_refs=("J2", "O2", "W1"),
)
def llm_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT kNN graph (k=3) over a bounded node panel (vec_id < 200) —
    every node's nearest neighbors, the input to graph clustering and
    SemDeDup-style pruning. |panel|² cosines by definition (this is the
    exactness baseline; llm_knn_graph_banded is the corpus-scale path).
    Rank-only output: both engines compute the identical sequential-
    double cosine, so the (sim desc, neighbor_id) total order is
    engine-stable without shipping float scores."""
    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import similarity as sim

    nodes = load(spark, "embeddings", sf_dir).where(F.col("vec_id") < 200)
    return sim.knn_graph(nodes, k=3)


_KNN_CFG = dict(n_bands=8, band_size=6, max_bucket=128)


def _knn_banded_cte(blk_sql: str, k: int = 5) -> str:
    """Shared CTE chain mirroring operators/similarity.py::
    knn_graph_banded, which is deterministic END TO END — md5-derived
    ±1 hyperplane weights (plan constants both engines re-derive),
    md5-rank bucket capping, exact-cosine ranking with (sim desc, id)
    ties — so unlike the pq/semdedup families it needs no pinned twin:
    the production queries themselves get oracles (r9; converts the
    banded-kNN family from rows-only to hash-checked). Cosine rank
    parity across engines is the same bet llm_ann_bruteforce_topk has
    won in every round: DuckDB's list_cosine_similarity and the
    zip_with+aggregate fold are the identical sequential double
    program. ``blk_sql`` is the blocking column expression ('label'
    for the blocked graph, '1' for the corpus-wide one)."""
    from etl_migrate_api_spark.operators.similarity import (
        hyperplane_weights_sql,
    )

    nb, bs, cap = (
        _KNN_CFG["n_bands"],
        _KNN_CFG["band_size"],
        _KNN_CFG["max_bucket"],
    )
    ws = hyperplane_weights_sql(nb * bs, 64)
    bit_exprs = " || ".join(
        f"(case when list_dot_product(v, {w}) >= 0 then '1' else '0' end)"
        for w in ws
    )
    return f"""
      emb as materialized (
        select vec_id as id, {blk_sql} as blk,
               cast(embedding as double[]) as v
        from embeddings
      ),
      sig as materialized (select id, blk, v, {bit_exprs} as bits from emb),
      banded as materialized (
        select id, blk, b as band_idx,
               substr(bits, b * {bs} + 1, {bs}) as band_key
        from sig cross join (
          select unnest(generate_series(0, {nb - 1})) as b) g
      ),
      capped as materialized (
        select id, blk, band_idx, band_key from (
          select id, blk, band_idx, band_key,
                 row_number() over (
                   partition by blk, band_idx, band_key
                   order by md5(cast(id as varchar)), id) as rn
          from banded)
        where rn <= {cap}
      ),
      cand as materialized (
        select distinct a.id as query_id, b.id as neighbor_id
        from capped a join capped b
          on a.blk = b.blk and a.band_idx = b.band_idx
         and a.band_key = b.band_key and a.id <> b.id
      ),
      scored as (
        select c.query_id, c.neighbor_id,
               list_cosine_similarity(x.v, y.v) as sim
        from cand c
        join emb x on x.id = c.query_id
        join emb y on y.id = c.neighbor_id
      ),
      edges as materialized (
        select query_id, neighbor_id, rank
        from (
          select query_id, neighbor_id,
                 row_number() over (partition by query_id
                                    order by sim desc, neighbor_id) as rank
          from scored)
        where rank <= {k}
      )"""


def _knn_banded_oracle() -> str:
    return (
        "with "
        + _knn_banded_cte("label")
        + """
      select query_id, cast(rank as int) as rank, neighbor_id from edges
    """
    )


def _knn_refined_oracle(k: int = 5) -> str:
    """One NN-descent iteration over the corpus-wide banded graph
    (operators/similarity.py::knn_graph_refine): candidates = the
    current edges in both directions plus 2-hop edges through the
    undirected graph, exact-reranked top-k. Deterministic given the
    deterministic banded base, so the SQL just extends the shared CTE
    chain — edges ⋈ edges, distinct, rerank."""
    return (
        "with "
        + _knn_banded_cte("1")
        + f""",
      und as materialized (
        select query_id, neighbor_id from edges
        union all
        select neighbor_id as query_id, query_id as neighbor_id from edges
      ),
      cand2 as materialized (
        select distinct query_id, neighbor_id from (
          select query_id, neighbor_id from und
          union all
          select a.query_id, b.neighbor_id
          from und a join und b on a.neighbor_id = b.query_id)
        where query_id <> neighbor_id
      ),
      scored2 as (
        select c.query_id, c.neighbor_id,
               list_cosine_similarity(x.v, y.v) as sim
        from cand2 c
        join emb x on x.id = c.query_id
        join emb y on y.id = c.neighbor_id
      )
      select query_id, cast(rank as int) as rank, neighbor_id
      from (
        select query_id, neighbor_id,
               row_number() over (partition by query_id
                                  order by sim desc, neighbor_id) as rank
        from scored2)
      where rank <= {k}
    """
    )


@register(
    "llm_knn_graph_banded",
    oracle=_knn_banded_oracle(),
    survey_refs=("J2", "O2"),
)
def llm_knn_graph_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN graph over the WHOLE embedding corpus:
    hyperplane-band collisions generate candidates (|bucket|-sized,
    never |corpus|²), exact cosine ranks them, top-5 per node survives.

    The config is the SCALE-SAFE one (8 bands × 6 bits, buckets capped
    at 128 by deterministic md5 rank): measured at sf1, the naive
    4-bit/uncapped banding took 238 s (quadratic — 16 buckets per band)
    vs 23 s for this config; the recall the wider bands give up,
    NN-descent buys back (llm_knn_graph_refined). Rows-only gate;
    recall vs the exact graph is pinned in tests/test_knn_graph.py."""
    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import similarity as sim

    emb = load(spark, "embeddings", sf_dir)
    return sim.knn_graph_banded(emb, k=5, block_col="label", **_KNN_CFG)


@register(
    "llm_knn_graph_refined",
    oracle=_knn_refined_oracle(),
    survey_refs=("J2", "O2"),
)
def llm_knn_graph_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe banded graph + one NN-descent iteration
    (neighbors-of-neighbors exact-reranked). Measured on the sf0.001
    fixtures against the exact graph: the capped 6-bit banding alone
    reaches 0.333 recall@3-in-top-5, one descent iteration lifts it to
    0.442, two to 0.498 — matching what the quadratic 4-bit banding got
    (0.447) at an order of magnitude less sf1 join cost (banded+refine
    27 s vs 238 s banded-naive; uniformly random 64-d vectors are the
    hard case for any locality method — planted duplicate clusters are
    found from iteration 0). Each iteration joins the k·n edge list
    with itself; the corpus is touched only to attach vectors.
    Rows-only gate; the recall ladder is pinned in
    tests/test_knn_graph.py."""
    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import similarity as sim

    emb = load(spark, "embeddings", sf_dir)
    banded = sim.knn_graph_banded(emb, k=5, block_col=None, **_KNN_CFG)
    out = sim.knn_graph_refine(emb, banded, k=5, iters=1)
    banded.unpersist()
    return out


@register(
    "orders_merge_upsert",
    oracle="""
      select o_orderkey, 'changed' as change
      from orders where o_orderkey % 89 = 0
      union all
      select o_orderkey + 10000000 as o_orderkey, 'added' as change
      from orders where o_orderkey % 101 = 0
    """,
    survey_refs=("K2", "K3", "E2", "J3"),
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE through the manifest log, driver-gated end-to-end: load
    orders as v1, merge an update batch (every %89 key with a mutated
    status — whenMatched — plus every %101 key re-keyed +10M —
    whenNotMatched), then CHANGE-FEED v1→v2. The oracle derives the
    expected classification arithmetically: mutated keys surface as
    'changed', re-keyed ones as 'added', everything else is filtered
    inside the diff join — a hash match proves the upsert replaced
    exactly the matched rows, inserted exactly the new ones, and
    touched nothing else (the untouched-segment carryover is pinned
    byte-level in tests/test_versioned.py)."""
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.sinks.versioned import VersionedTable

    orders = load(spark, "orders", sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_versioned")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d)
        for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass  # a concurrent sweep already took it
    t = VersionedTable(
        os.path.join(root, f"merge_{tag}_{uuid.uuid4().hex[:8]}")
    )
    t.commit(orders, mode="overwrite")
    updates = (
        orders.where(F.col("o_orderkey") % 89 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .unionByName(
            orders.where(F.col("o_orderkey") % 101 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10000000
            )
        )
    )
    t.merge_by_key(spark, updates, ["o_orderkey"])
    return t.diff(spark, 1, 2, ["o_orderkey"]).where(
        F.col("change").isNotNull()
    )


@register(
    "llm_quarantine_split",
    oracle="""
      select source,
             cast(sum(case when bad then 0 else 1 end) as bigint) as n_clean,
             cast(sum(case when bad then 1 else 0 end) as bigint)
               as n_quarantined
      from (
        select source,
               (text is null)
               or (n_chars < 1 or n_chars > 300 or n_chars is null)
               or (lang not in ('en','de','es','fr') or lang is null)
               as bad
        from documents
      )
      group by source
    """,
    survey_refs=("F1", "F5", "A3"),
)
def llm_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine routing (operators/quality.py::
    split_by_expectations): every document goes to exactly one of
    clean/quarantined by the OR of the suite's per-row violations —
    the dead-letter alternative to refusing a whole batch. Reported as
    per-source disposition counts; the oracle recomputes the routing
    predicate inline, so a hash match proves the split is a PARTITION
    (no row dropped, none double-counted) with exactly the suite's
    semantics (NULLs quarantine — 3VL-proof). Both sides are narrow
    filters of one scan; the counts are map-side-combined aggregates."""
    from etl_migrate_api_spark.catalog import load
    from etl_migrate_api_spark.operators import quality as q

    docs = load(spark, "documents", sf_dir)
    clean, bad = q.split_by_expectations(
        docs,
        [
            q.not_null("text"),
            q.in_range("n_chars", lo=1, hi=300),
            q.accepted_values("lang", ["en", "de", "es", "fr"]),
        ],
    )
    c = clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clean")
    )
    b = bad.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quarantined")
    )
    return (
        c.join(b, "source", "full_outer")
        .select(
            "source",
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("n_quarantined", F.lit(0)).alias("n_quarantined"),
        )
    )
