"""Training-data curation operators beyond the dedup/ANN families —
the day-2 ops of a 100 TB pretraining pipeline: PII scrubbing,
benchmark decontamination, repetition-based quality filtering, URL
canonicalization, and temperature-weighted domain mixing.

Registered AFTER the driver's 50-query window (plans/registry.py
DRIVER_WINDOW): every query here still carries a full DuckDB oracle and
is hash-verified by the pytest mirror (tests/test_oracle_parity.py) and
tools/driver_sim.py on every run.

All operators are pure column expressions or explode→agg shapes (one
shuffle on a well-distributed key, map-side combined) — no Python in
the hot path, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.plans.registry import register


# the ONE tokenization shared with the streaming pass and the SQL
# mirrors — lives in functions/text.py
from etl_migrate_api_spark.functions.text import ws_tokens as _ws_tokens  # noqa: E402


def _word_ngrams(toks_attr: str, n: int) -> F.Column:
    """Space-joined word n-grams of an ALREADY-MATERIALIZED token
    attribute column (never pass a token *expression*: anything inside
    the transform lambda is re-evaluated per gram — the measured 25×
    trap, see operators/dedup.py PERF NOTE). Guarded BEFORE building the
    range: sequence(1, 0) is DESCENDING [1, 0] (slice start 0 throws),
    and the stop-inclusive upper bound must be size-(n-1) to match the
    oracle's stop-exclusive range() — one past it emits a trailing
    (n-1)-word gram the oracle never generates. Shared by the
    registered query and its edge tests."""
    toks = F.col(toks_attr)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns + redaction order live in functions/text.py (shared with the
# streaming curation pass); the oracle SQL below mirrors them verbatim.
from etl_migrate_api_spark.functions.text import (  # noqa: E402
    PII_EMAIL as _PII_EMAIL,
    PII_IPV4 as _PII_IPV4,
    PII_PHONE as _PII_PHONE,
)


def _planted_pii_sql() -> str:
    """The deterministic PII plant, as DuckDB SQL (the corpus carries no
    real PII, so both engines inject the same synthetic contacts)."""
    return """
      concat(text,
        case when doc_id % 3 = 0
             then ' contact user' || cast(doc_id as varchar) || '@example.com'
             else '' end,
        case when doc_id % 4 = 0
             then ' tel +1-202-' || lpad(cast(doc_id % 10000 as varchar), 4, '0')
             else '' end,
        case when doc_id % 5 = 0
             then ' from 10.' || cast(doc_id % 256 as varchar) || '.0.1'
             else '' end)
    """


def _planted_pii_col() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" tel +1-202-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" from 10."), (did % 256).cast("string"), F.lit(".0.1")),
        ).otherwise(F.lit("")),
    )


@register(
    "llm_pii_redact",
    oracle=f"""
      with planted as (
        select doc_id, {_planted_pii_sql()} as text from documents
      )
      select doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IP>', 'g') as redacted,
             cast(len(regexp_extract_all(text, '{_PII_EMAIL}')) as int) as n_emails,
             cast(len(regexp_extract_all(text, '{_PII_PHONE}')) as int) as n_phones,
             cast(len(regexp_extract_all(
               regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}')) as int) as n_ips
      from planted
    """,
    survey_refs=("T1", "U1"),
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training corpora: detect + redact emails, phone
    numbers, and IPv4 addresses with pure regexp expressions (the same
    extract/replace machinery as the reference's extractPhones,
    utils/util.js:1-13, turned outward to redaction). Counts come from
    regexp_extract_all sizes; ip counting runs AFTER email/phone
    redaction (mirrored in the oracle) so an address inside an already-
    redacted span can't double-count. Pure narrow projections — no
    shuffle at all; at 100 TB this is scan-speed."""
    from etl_migrate_api_spark.functions.text import redact_pii

    docs = load(spark, "documents", sf_dir)
    planted = docs.select("doc_id", _planted_pii_col().alias("text"))
    # the counts need the email+phone intermediate; the redacted column
    # itself comes from the ONE shared chain (streaming uses it too)
    after_email = F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, _PII_PHONE, "<PHONE>")
    return planted.select(
        "doc_id",
        redact_pii("text").alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(after_phone, F.lit(_PII_IPV4), F.lit(0)))
        .cast("int")
        .alias("n_ips"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_CONTAM_N = 5  # word n-gram size
_CONTAM_MIN_SHARED = 3  # pairs sharing fewer distinct n-grams are noise


@register(
    "llm_contamination_ngrams",
    oracle=f"""
      with toks as (
        select doc_id, source,
               list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'),
                           x -> x <> '') as t
        from documents
      ),
      grams as (
        select distinct doc_id, source,
               cast(concat('0x', substr(md5(g), 1, 15)) as bigint) as gh
        from (
          select doc_id, source,
                 unnest([array_to_string(t[i:i+{_CONTAM_N - 1}], ' ')
                         for i in range(1, greatest(len(t) - {_CONTAM_N - 2}, 1))]) as g
          from toks
        )
      )
      select c.doc_id as corpus_doc_id, e.doc_id as eval_doc_id,
             cast(count(distinct c.gh) as bigint) as n_shared
      from grams e
      join grams c on e.gh = c.gh and c.source <> 'src0'
      where e.source = 'src0'
      group by 1, 2
      having count(distinct c.gh) >= {_CONTAM_MIN_SHARED}
    """,
    survey_refs=("J2", "E1"),
)
def llm_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing ≥3
    distinct {n}-word n-grams with any doc of the held-out set (source
    'src0' stands in for an eval benchmark). The industry-standard
    pre-training hygiene check (n-gram overlap á la GPT-3 appendix C /
    PaLM): tokenize → n-gram → md5→60-bit int (identical on both
    engines) → equi-join on the gram hash → count distinct shared grams
    per (corpus_doc, eval_doc) pair.

    100 TB shape: the join is corpus-grams ⨝ eval-grams on an int key —
    the eval side is tiny (a benchmark), so AQE broadcasts it and the
    corpus side never shuffles; the distinct-gram dedup is map-side
    combined on (doc, gram)."""
    from etl_migrate_api_spark.operators.dedup import _spread

    gh = F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("bigint")
    # tokens materialized as an attribute behind _spread's projection
    # barrier, then grams built over the attribute — inlining the
    # tokenizer expression into the gram lambda would re-split the doc
    # once PER GRAM (O(tokens²) per doc, the measured 25× trap)
    tokenized = _spread(
        load(spark, "documents", sf_dir).select(
            "doc_id", "source", _ws_tokens("text").alias("toks")
        )
    )
    base = (
        tokenized.select(
            "doc_id",
            "source",
            F.explode(_word_ngrams("toks", _CONTAM_N)).alias("g"),
        )
        .select("doc_id", "source", gh.alias("gh"))
        .distinct()
    )
    ev = base.where(F.col("source") == "src0").select(
        F.col("doc_id").alias("eval_doc_id"), "gh"
    )
    corpus = base.where(F.col("source") != "src0").select(
        F.col("doc_id").alias("corpus_doc_id"), "gh"
    )
    return (
        corpus.join(F.broadcast(ev), "gh")
        .groupBy("corpus_doc_id", "eval_doc_id")
        .agg(F.count_distinct("gh").alias("n_shared"))
        .where(F.col("n_shared") >= _CONTAM_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# Repetition-based quality filtering (Gopher-style)
# ---------------------------------------------------------------------------


@register(
    "llm_quality_repetition",
    oracle="""
      with words as (
        select doc_id, unnest(list_filter(
                 string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'), x -> x <> '')) as w
        from documents
      ),
      freq as (
        select doc_id, w, count(*) as c from words group by doc_id, w
      )
      select doc_id,
             cast(sum(c) as bigint) as n_words,
             cast(count(*) as bigint) as n_distinct,
             1.0 - cast(count(*) as double) / cast(sum(c) as double)
               as dup_word_frac,
             cast(max(c) as double) / cast(sum(c) as double) as top_word_frac,
             (1.0 - cast(count(*) as double) / cast(sum(c) as double)) > 0.8
               or cast(max(c) as double) / cast(sum(c) as double) > 0.2
               as flagged
      from freq
      group by doc_id
    """,
    survey_refs=("A3", "A4"),
)
def llm_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-
    word fraction and most-frequent-word fraction, with the filter flag
    (Rae et al. 2021 §A1.1 use these to drop boilerplate/spam docs
    whose token loops poison training). Two-level aggregate — explode
    words → count per (doc, word) → per-doc stats — one shuffle on the
    (doc, word) key, fully map-side combinable, no skew (keys are
    per-doc). The fractions are single-division IEEE doubles: bit-
    identical across engines, no rounding needed."""
    words = load(spark, "documents", sf_dir).select(
        "doc_id", F.explode(_ws_tokens("text")).alias("w")
    )
    freq = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c").cast("bigint")
    dup_frac = F.lit(1.0) - F.count(F.lit(1)).cast("double") / total.cast("double")
    top_frac = F.max("c").cast("double") / total.cast("double")
    return freq.groupBy("doc_id").agg(
        total.alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_word_frac"),
        ((dup_frac > 0.8) | (top_frac > 0.2)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------


def _planted_url_sql() -> str:
    return """
      'https://'
      || case doc_id % 4 when 0 then 'WWW.Example.COM'
                         when 1 then 'www.example.com:443'
                         when 2 then 'blog.example.org'
                         else 'Example.Net' end
      || '/p/' || cast(doc_id % 50 as varchar)
      || case when doc_id % 3 = 0 then '/' else '' end
      || case when doc_id % 2 = 0
              then '?utm_source=feed&id=' || cast(doc_id % 7 as varchar)
              when doc_id % 5 = 1 then '?id=' || cast(doc_id % 7 as varchar)
              else '' end
      || case when doc_id % 6 = 0 then '#frag' else '' end
    """


def _planted_url_col() -> F.Column:
    did = F.col("doc_id")
    host = (
        F.when(did % 4 == 0, F.lit("WWW.Example.COM"))
        .when(did % 4 == 1, F.lit("www.example.com:443"))
        .when(did % 4 == 2, F.lit("blog.example.org"))
        .otherwise(F.lit("Example.Net"))
    )
    query = (
        F.when(
            did % 2 == 0,
            F.concat(F.lit("?utm_source=feed&id="), (did % 7).cast("string")),
        )
        .when(did % 5 == 1, F.concat(F.lit("?id="), (did % 7).cast("string")))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("https://"),
        host,
        F.lit("/p/"),
        (did % 50).cast("string"),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        query,
        F.when(did % 6 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


# canonicalization pipeline (identical order both engines):
# strip #fragment → strip utm_* params → strip dangling ?/& → drop
# default :443 port (literal replace — no backrefs, $1 vs \1 differs
# across engines) → lowercase → strip trailing slash. 'www.' is NOT
# stripped: www and apex may serve different content.
_URL_STEPS = [
    ("re", r"#.*$", ""),
    ("re", r"utm_[^&#]*&?", ""),
    ("re", r"[?&]$", ""),
    ("lit", ":443/", "/"),
    ("lower", "", ""),
    ("re", r"/$", ""),
]


def _canon_url(col: F.Column) -> F.Column:
    """THE canonicalization chain, driven entirely by ``_URL_STEPS`` —
    the registered query and the idempotence property test exercise this
    same function; the oracle SQL mirrors the list step-for-step."""
    url = col
    for kind, pat, repl in _URL_STEPS:
        if kind == "re":
            url = F.regexp_replace(url, pat, repl)
        elif kind == "lit":
            url = F.replace(url, F.lit(pat), F.lit(repl))
        else:
            url = F.lower(url)
    return url


@register(
    "llm_url_canonical_dedup",
    oracle=f"""
      with urls as (
        select doc_id, {_planted_url_sql()} as url from documents
      ),
      canon as (
        select doc_id,
               regexp_replace(
                 lower(replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(url, '#.*$', ''),
                       'utm_[^&#]*&?', '', 'g'),
                     '[?&]$', ''),
                   ':443/', '/')),
                 '/$', '') as curl
        from urls
      )
      select curl, cast(count(*) as bigint) as n_dups,
             cast(min(doc_id) as bigint) as keeper_doc_id
      from canon
      group by curl
      having count(*) > 1
    """,
    survey_refs=("E1", "T2"),
)
def llm_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL dedup: canonicalize (strip fragment, tracking
    params, dangling separators, default port; lowercase; strip
    trailing slash — the CommonCrawl-style normalization) and group
    exact duplicates, electing min(doc_id) as the keeper. URLs are
    planted deterministically (corpus docs carry none) with the same
    expression on both engines. Pure projection + one hash aggregate on
    the canonical URL — the exact-dedup shape at web scale."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", _canon_url(_planted_url_col()).alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .where(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# Embedding storage quantization
# ---------------------------------------------------------------------------

_EMB_DIM = 64


@register(
    "llm_embedding_quantize",
    oracle=f"""
      with scaled as (
        select vec_id, embedding,
               127.0 / greatest(list_max(list_transform(embedding, x -> abs(x))),
                                1e-12) as scale
        from embeddings
      ),
      quant as (
        select vec_id, embedding, scale,
               list_transform(embedding,
                              x -> cast(floor(x * scale + 0.5) as int)) as q
        from scaled
      )
      select vec_id,
             list_aggregate(list_transform(q, x -> cast(x as varchar)),
                            'string_agg', ',') as q_csv,
             scale,
             list_reduce(
               list_transform(range(1, {_EMB_DIM + 1}),
                              i -> abs(embedding[i] - q[i] / scale)),
               (a, b) -> a + b) / {_EMB_DIM}.0 as mean_abs_err
      from quant
    """,
    survey_refs=("T8", "U1"),
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the 4× storage/bandwidth cut applied before shipping a 100 TB vector
    corpus to an ANN index (faiss-style scalar quantization). Per
    vector: scale = 127/max|x| (epsilon-guarded with greatest(), no
    division-by-zero branch whose inf/NULL semantics differ between
    engines), q = floor(x·scale + 0.5) — identical round-half-up on
    both engines, unlike round() (Spark half-up vs DuckDB half-even) —
    plus the mean |x − q/scale| reconstruction error as a strict
    left-fold (order-identical to the oracle's list_reduce). Pure
    narrow projections: zero shuffles, scan-speed."""
    emb = load(spark, "embeddings", sf_dir)
    scale = F.lit(127.0) / F.greatest(
        F.array_max(F.transform(F.col("embedding"), F.abs)), F.lit(1e-12)
    )
    with_scale = emb.select("vec_id", "embedding", scale.alias("scale"))
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("int"),
    )
    with_q = with_scale.withColumn("q", q)
    abs_diffs = F.zip_with(
        F.col("embedding"),
        F.col("q"),
        lambda x, qq: F.abs(x - qq / F.col("scale")),
    )
    err = (
        F.aggregate(abs_diffs, F.lit(0.0), lambda a, x: a + x) / float(_EMB_DIM)
    ).alias("mean_abs_err")
    # q is emitted as a CSV string, not array<int>: the driver's oracle
    # compare canonicalizes via a pandas lexsort which cannot factorize
    # array cells (unhashable ndarray) — the *values* matched for two
    # rounds while the column type alone failed the check. A string round-
    # trips losslessly for int8 codes and stays a narrow projection.
    return with_q.select(
        "vec_id", F.array_join("q", ",").alias("q_csv"), "scale", err
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

_PACK_CTX = 256  # tokens per training sequence


@register(
    "llm_sequence_pack",
    oracle=f"""
      with toks as (
        select lang, doc_id,
               cast(len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'),
                                    x -> x <> '')) as bigint) as tok
        from documents
      ),
      offsets as (
        select lang, doc_id, tok,
               sum(tok) over (partition by lang order by doc_id
                              rows between unbounded preceding and current row)
                 as cum
        from toks
      )
      select lang, cast((cum - tok) // {_PACK_CTX} as bigint) as seq_id,
             cast(count(*) as bigint) as n_docs,
             cast(sum(tok) as bigint) as seq_tokens,
             cast(min(doc_id) as bigint) as first_doc,
             cast(max(doc_id) as bigint) as last_doc
      from offsets
      group by lang, cast((cum - tok) // {_PACK_CTX} as bigint)
    """,
    survey_refs=("W2", "A3"),
)
def llm_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in
    deterministic order and assign each to the {ctx}-token training
    sequence containing its start offset — the standard pretraining
    batching layout (GPT-style packing). Per-sequence doc counts, token
    sums and doc-id spans come out for the loader manifest.

    100 TB shape: the running offset is a window cumsum PER LANGUAGE
    shard (monolingual sequences — and no global single-partition
    window; shard further by any coarse key for more parallelism, the
    packing is embarrassingly parallel across shards). All integer
    arithmetic — bit-exact on any engine."""
    from pyspark.sql import Window

    toks = load(spark, "documents", sf_dir).select(
        "lang",
        "doc_id",
        F.size(_ws_tokens("text")).cast("bigint").alias("tok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = toks.withColumn("cum", F.sum("tok").over(w))
    seq_id = F.expr(f"(cum - tok) div {_PACK_CTX}").alias("seq_id")
    return (
        offsets.select("lang", "doc_id", "tok", seq_id)
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("seq_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-weighted domain mixing
# ---------------------------------------------------------------------------


@register(
    "llm_domain_mix_sample",
    oracle="""
      with quota as (
        select lang, cast(floor(4.0 * sqrt(cast(count(*) as double))) as bigint) as q
        from documents group by lang
      ),
      ranked as (
        select lang, doc_id,
               row_number() over (partition by lang
                                  order by md5(cast(doc_id as varchar)), doc_id) as rn
        from documents
      )
      select r.lang, cast(r.doc_id as bigint) as doc_id
      from ranked r join quota using (lang)
      where r.rn <= quota.q
    """,
    survey_refs=("W1", "A3"),
)
def llm_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened domain mixing (T=0.5): per-language quota
    ∝ √count, so low-resource languages are up-weighted relative to
    their share — the standard multilingual pretraining re-balance
    (e.g. mT5's α-sampling with α=0.5). √ via IEEE sqrt (correctly
    rounded — bit-identical across engines, unlike pow(x, 0.7));
    selection is the md5-rank deterministic draw shared with
    sample_class_balanced. One shuffle on the class key; the quota side
    is a per-class scalar broadcast. Full normalized mixing (quota ∝
    N·wᵢ/Σw) is this same plan with the Σw normalizer computed as a
    driver-side scalar, like the watermark reads."""
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    quota = docs.groupBy("lang").agg(
        F.floor(F.lit(4.0) * F.sqrt(F.count(F.lit(1)).cast("double")))
        .cast("bigint")
        .alias("q")
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "lang", "doc_id", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quota), "lang")
        .where(F.col("rn") <= F.col("q"))
        .select("lang", F.col("doc_id").cast("bigint").alias("doc_id"))
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling + split assignment
# ---------------------------------------------------------------------------
# Both use the same primitive: an md5-derived uniform draw compared
# lexicographically against a HEX-STRING threshold. Lowercase hex is
# order-isomorphic to the number it encodes, and Spark's md5() and
# DuckDB's md5() produce identical digests — so the sample is
# deterministic, seed-stable, engine-portable, and needs no numeric
# hex parse (Spark's conv() has no DuckDB twin). At 100 TB this is the
# only sampling shape that works: no global count, no orderBy, no rand()
# (which breaks retry idempotency — a re-executed task would draw a
# different sample); a pure narrow filter the scan can stream through.

# floor(rate * 16^8) rendered as 8 lowercase hex chars
_STRAT_THRESHOLDS = {"en": "0ccccccc", "_other": "40000000"}  # 5% / 25%


@register(
    "llm_stratified_sample",
    oracle="""
      select lang, cast(doc_id as bigint) as doc_id
      from documents
      where substring(md5('strat' || cast(doc_id as varchar)), 1, 8) <
            case when lang = 'en' then '0ccccccc' else '40000000' end
    """,
    survey_refs=("F1", "T8"),
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — downsample the
    head domain (en: 5%) while keeping the tail (25%), the everyday
    re-balance before pretraining-mix assembly. The draw for a doc is
    fixed by its id alone: re-runs, task retries, and both engines
    select the SAME rows (no rand(), no global count, no sort). Plan is
    a narrow filter fused into the parquet scan."""
    docs = load(spark, "documents", sf_dir)
    draw = F.substring(
        F.md5(F.concat(F.lit("strat"), F.col("doc_id").cast("string"))), 1, 8
    )
    thr = F.when(
        F.col("lang") == "en", F.lit(_STRAT_THRESHOLDS["en"])
    ).otherwise(F.lit(_STRAT_THRESHOLDS["_other"]))
    return docs.where(draw < thr).select(
        "lang", F.col("doc_id").cast("bigint").alias("doc_id")
    )


@register(
    "llm_split_assign",
    oracle="""
      with assigned as (
        select lang,
               case when substring(md5('split' || cast(doc_id as varchar)), 1, 2) < 'f6'
                    then 'train'
                    when substring(md5('split' || cast(doc_id as varchar)), 1, 2) < 'fb'
                    then 'val'
                    else 'test' end as split
        from documents
      )
      select lang, split, cast(count(*) as bigint) as n_docs
      from assigned group by lang, split
    """,
    survey_refs=("A3", "F3"),
)
def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assigned train/val/test split (246/5/5 of 256 ≈ 96/2/2%)
    with per-(lang, split) counts. Membership is a pure function of
    doc_id — adding documents never reshuffles existing assignments
    (the property that keeps eval sets uncontaminated across dataset
    versions). One map-side-combined aggregation; no other shuffle."""
    docs = load(spark, "documents", sf_dir)
    b = F.substring(
        F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 2
    )
    split = (
        F.when(b < "f6", "train").when(b < "fb", "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@register(
    "llm_span_dedup",
    oracle="""
      with toks as (
        select doc_id, string_split(text, ' ') as tk from documents
      ),
      spans as (
        select doc_id, cast(i as int) as span_idx,
               array_to_string(tk[(i*10+1):(i*10+10)], ' ') as span
        from toks cross join unnest(range(cast(ceil(len(tk) / 10.0) as bigint))) as t(i)
      ),
      kept as (
        select doc_id, span_idx, span,
               row_number() over (partition by span order by doc_id, span_idx) as rn,
               count(*) over (partition by doc_id) as n_spans_total
        from spans
      )
      select doc_id,
             string_agg(span, ' ' order by span_idx) as text_dedup,
             cast(count(*) as int) as n_spans_kept,
             cast(max(n_spans_total) as int) as n_spans_total
      from kept where rn = 1
      group by doc_id
    """,
    headline=True,
    survey_refs=("E1", "E2", "W1", "T3", "T4"),
)
def llm_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sub-document span dedup: split each doc into consecutive
    10-word spans, drop every repeat of a span already seen anywhere in
    the corpus (first occurrence by (doc_id, span_idx) wins), reassemble
    the surviving spans in order. Docs whose every span is boilerplate
    vanish entirely — the C4 semantics.

    Scale: two shuffles, both on well-distributed keys — the
    first-occurrence window partitions by the span text itself (hash
    partitioning; the span column must travel anyway for reassembly),
    the reassembly groups by doc_id. Span explode is a pure expression
    (transform over sequence + slice), no Python. Boilerplate-heavy
    corpora make single hot spans; those stay one-partition-bounded
    because a span's duplicate set IS the partition, and AQE skew-split
    handles the pathological all-docs-share-one-span case. Shared
    machinery: operators/dedup.py doc_spans / span_first_occurrence /
    reassemble_spans (the streaming ingest pass rides the same code)."""
    from etl_migrate_api_spark.operators.dedup import (
        doc_spans,
        reassemble_spans,
        span_first_occurrence,
    )

    docs = load(spark, "documents", sf_dir)
    return reassemble_spans(span_first_occurrence(doc_spans(docs)))


@register(
    "llm_span_dedup_incremental",
    oracle="""
      with toks as (
        select doc_id, string_split(text, ' ') as tk from documents
      ),
      spans as (
        select doc_id, cast(i as int) as span_idx,
               array_to_string(tk[(i*10+1):(i*10+10)], ' ') as span
        from toks cross join unnest(range(cast(ceil(len(tk) / 10.0) as bigint))) as t(i)
      ),
      store as (
        select distinct md5(span) as h from spans where doc_id % 2 = 0
      ),
      batch as (
        select doc_id, span_idx, span,
               count(*) over (partition by doc_id) as n_spans_total
        from spans where doc_id % 2 = 1
      ),
      fresh as (
        select b.doc_id, b.span_idx, b.span, b.n_spans_total,
               row_number() over (partition by b.span
                                  order by b.doc_id, b.span_idx) as rn
        from batch b anti join store s on md5(b.span) = s.h
      )
      select doc_id,
             string_agg(span, ' ' order by span_idx) as text_dedup,
             cast(count(*) as int) as n_spans_kept,
             cast(max(n_spans_total) as int) as n_spans_total
      from fresh where rn = 1
      group by doc_id
    """,
    survey_refs=("E1", "E2", "J1", "W1"),
)
def llm_span_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental span dedup: a new batch (odd doc_ids) cleaned against
    the persisted span store of the already-ingested corpus (even
    doc_ids) — the streaming-ingest shape of llm_span_dedup. The store
    is 16-byte md5 hashes, NOT raw spans (at 100 TB the store is ~2% of
    corpus bytes and the anti-join shuffles hashes only); corpus text is
    never rescanned. Batch spans then first-occurrence-dedup among
    themselves, exactly like the batch operator (shared machinery:
    operators/dedup.py span_dedup_incremental — the streaming ingest
    pass in streaming/pipeline.py rides the same function)."""
    from etl_migrate_api_spark.operators.dedup import (
        doc_spans,
        span_dedup_incremental,
    )

    docs = load(spark, "documents", sf_dir)
    # materialized store contract (see llm_minhash_incremental_dedup):
    # a deployment reads this from its parquet/Delta store table
    store = (
        doc_spans(docs.where(F.col("doc_id") % 2 == 0))
        .select(F.md5("span").alias("h"))
        .distinct()
        .persist()
    )
    batch = docs.where(F.col("doc_id") % 2 == 1)
    cleaned, _fresh = span_dedup_incremental(batch, store)
    # the persist is released by bench.py's clearCache between queries;
    # callers composing this into a pipeline own the unpersist
    return cleaned


# ---------------------------------------------------------------------------
# Unicode normalization (NFC) — pre-hash canonicalization
# ---------------------------------------------------------------------------


@register(
    "llm_unicode_normalize",
    oracle="""
      with planted as (
        select doc_id, text from documents
        union all
        select doc_id + 300000,
               text || ' cafe' || chr(769) || ' A' || chr(778) || 'ngstrom'
        from documents where doc_id % 50 = 0
      )
      select doc_id,
             text <> nfc_normalize(text) as changed,
             md5(nfc_normalize(text)) as norm_fp,
             cast(length(nfc_normalize(text)) as bigint) as n_chars_norm
      from planted
    """,
)
def llm_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC Unicode normalization before fingerprinting — the C4/CCNet
    canonicalization step that keeps 'café' (precomposed) and 'café'
    (combining accent) from hashing apart. The corpus is ASCII, so
    decomposed-accent rows are PLANTED (doc_id % 50, +300000 — the same
    deterministic-plant pattern as the dedup family) and the oracle is
    DuckDB's utf8proc ``nfc_normalize``; both implement the same
    Unicode normal form, and the changed flag proves the planted rows
    (and only those) transform.

    Scale shape: normalization is inherently per-row string work with
    no JVM builtin — the sanctioned Python path is an Arrow-batched
    pandas UDF (one zero-copy batch transfer, `str.normalize` is
    vectorized C inside pandas), composed INTO column expressions
    (md5/length stay JVM-side on the returned column). No shuffle at
    all: the plan is scan → project."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def nfc(s):
        return s.str.normalize("NFC")

    nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    nfc_udf = pandas_udf("string")(nfc)

    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    planted = docs.unionByName(
        docs.where(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.lit(" cafe\u0301 A\u030angstrom"),  # decomposed (NFD) on purpose
            ).alias("text"),
        )
    )
    norm = planted.withColumn("norm", nfc_udf(F.col("text")))
    return norm.select(
        "doc_id",
        (F.col("text") != F.col("norm")).alias("changed"),
        F.md5("norm").alias("norm_fp"),
        F.length("norm").cast("bigint").alias("n_chars_norm"),
    )


@register(
    "llm_fixed_k_group_sample",
    oracle="""
      with ranked as (
        select doc_id, lang,
               row_number() over (partition by lang
                                  order by md5(cast(doc_id as varchar)), doc_id)
                 as rnk
        from documents
      )
      select lang, doc_id, cast(rnk as int) as rnk
      from ranked where rnk <= 20
    """,
    survey_refs=("W1", "F2", "O2"),
)
def llm_fixed_k_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-SIZE per-group sample: exactly k=20 docs per
    language, chosen by md5(doc_id) order — the fixed-quota counterpart
    of the rate-based llm_stratified_sample (a rate can't promise 'give
    me exactly 20 eval docs per language'; a quota can't promise a
    fixed fraction — pipelines need both). Same engine-portable
    determinism argument: the md5 hex order is a seeded shuffle both
    engines compute identically, so the sample is retry- and
    engine-stable. Scale: ONE shuffle on the group key; row_number
    stops mattering past k per partition (Spark's WindowExec
    short-circuits nothing, but the k rows per group that survive the
    filter bound all downstream cost — for very hot groups swap in a
    per-partition top-k aggregate)."""
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 20)
        .select("lang", "doc_id", F.col("rnk").cast("int"))
    )


# ---------------------------------------------------------------------------
# Curriculum ordering — difficulty-phased training order
# ---------------------------------------------------------------------------

_CURR_PHASES = 4
_CURR_SALT = "curr"


@register(
    "llm_curriculum_order",
    oracle=f"""
      with toks as (
        select doc_id,
               len(list_filter(string_split_regex(lower(trim(text)),
                   '[ \\t\\r\\n\\f]+'), x -> x <> '')) as n_tok
        from documents
      ),
      phased as (
        select doc_id, n_tok,
               ntile({_CURR_PHASES}) over (order by n_tok, doc_id) as phase
        from toks
      )
      select cast(doc_id as bigint) as doc_id,
             cast(n_tok as int) as n_tok,
             cast(phase as int) as phase,
             cast(row_number() over (
               partition by phase
               order by md5('{_CURR_SALT}' || cast(doc_id as varchar)), doc_id
             ) as bigint) as pos
      from phased
    """,
    survey_refs=("W2", "O2", "T8"),
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order (Bengio et al. 2009 easy→hard pacing):
    bucket the corpus into 4 difficulty phases by token count (ntile
    over (n_tok, doc_id) — the tiebreak makes ntile's equal-split
    engine-deterministic), then order WITHIN each phase by a salted
    md5 of doc_id (the deterministic-shuffle discipline of
    llm_global_shuffle: reproducible across runs, engines, and
    partitionings — no rand()). A trainer reads phase 1 in pos order,
    then phase 2, … Output (doc_id, n_tok, phase, pos).

    Scale: one tokenize-and-count projection, one global ntile (rank
    over a 2-column sort — at 100 TB swap for the exact-percentile
    cut table of agg_quantile_battery: 3 boundary values, broadcast,
    no global window), one per-phase shuffle for pos. The md5 order
    also makes the within-phase stream i.i.d.-like, so sequential
    readers see no length gradient inside a phase."""
    from pyspark.sql import Window

    from etl_migrate_api_spark.functions.text import ws_tokens

    docs = load(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.size(ws_tokens("text")).alias("n_tok")
    )
    phased = toks.select(
        "doc_id",
        "n_tok",
        F.ntile(_CURR_PHASES)
        .over(Window.orderBy("n_tok", "doc_id"))
        .alias("phase"),
    )
    wpos = Window.partitionBy("phase").orderBy(
        F.md5(F.concat(F.lit(_CURR_SALT), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return phased.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_tok").cast("int").alias("n_tok"),
        F.col("phase").cast("int").alias("phase"),
        F.row_number().over(wpos).cast("bigint").alias("pos"),
    )


# ---------------------------------------------------------------------------
# HTML boilerplate strip — web-corpus text extraction
# ---------------------------------------------------------------------------


def _html_of_sql(text: str) -> str:
    return (
        "concat('<html><head><title>d', cast(doc_id as varchar), "
        "'</title><script>var x=1; if(a<b){track();}</script>"
        "<style>.m{color:red}</style></head><body>"
        "<nav>home | about | contact</nav><p>', "
        + text
        + ", '</p><footer>&copy; corp &amp; co</footer></body></html>')"
    )


_HTML_STRIP_SQL = """
      trim(regexp_replace(
        replace(replace(replace(replace(replace(
          regexp_replace(
            regexp_replace(
              regexp_replace({h}, '(?s)<script.*?</script>', ' ', 'g'),
              '(?s)<style.*?</style>', ' ', 'g'),
            '<[^>]*>', ' ', 'g'),
          '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
          '&#39;', ''''),
        '[ \\t\\r\\n\\f]+', ' ', 'g'))
"""


def _planted_html_col() -> F.Column:
    """The deterministic page plant — Spark twin of _html_of_sql; both
    the extraction query and the web capstone build pages from it so
    the two cannot drift."""
    return F.concat(
        F.lit("<html><head><title>d"),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><script>var x=1; if(a<b){track();}</script>"
            "<style>.m{color:red}</style></head><body>"
            "<nav>home | about | contact</nav><p>"
        ),
        F.col("text"),
        F.lit("</p><footer>&copy; corp &amp; co</footer></body></html>"),
    )


def _html_strip_col(h: F.Column) -> F.Column:
    """Spark twin of _HTML_STRIP_SQL — one shared chain."""
    no_script = F.regexp_replace(h, r"(?s)<script.*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?s)<style.*?</style>", " ")
    decoded = F.regexp_replace(no_style, r"<[^>]*>", " ")
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"),
    ):
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(decoded, r"[ \t\r\n\f]+", " "))


@register(
    "llm_html_extract",
    oracle=f"""
      with pages as (
        select doc_id, {_html_of_sql('text')} as html from documents
      )
      select doc_id,
             {_HTML_STRIP_SQL.format(h='html')} as clean,
             cast(length(html) as bigint) as n_raw,
             cast(length({_HTML_STRIP_SQL.format(h='html')}) as bigint)
               as n_clean
      from pages
    """,
    survey_refs=("T1", "T2", "P3", "T8"),
)
def llm_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus text extraction — the step every Common-Crawl-shaped
    pipeline runs before any quality/dedup pass: drop <script>/<style>
    blocks wholesale (their CONTENT is code, not prose — a tag-only
    strip would leak `var x=1` into the corpus), replace remaining
    tags with a space (tag boundaries are word boundaries), decode the
    five core entities, collapse whitespace. Pure JVM regexp chain —
    the same expressions DuckDB's RE2 runs, so the oracle matches
    byte-for-byte (lazy `.*?` + `(?s)` behave identically on both
    engines; pinned here by the hash gate). Pages are planted
    deterministically around documents.text (nav/footer text remains —
    DOM-aware boilerplate scoring is the quality stage's job, and the
    retained '(c) corp' boilerplate is exactly what llm_span_dedup and
    the Gopher repetition signals then catch). Output keeps the
    raw→clean length drop as the extraction-ratio metric. One narrow
    projection — fuses into the scan, shuffle-free at any scale."""
    docs = load(spark, "documents", sf_dir)
    strip = _html_strip_col
    pages = docs.select("doc_id", _planted_html_col().alias("html"))
    return pages.select(
        "doc_id",
        strip(F.col("html")).alias("clean"),
        F.length("html").cast("bigint").alias("n_raw"),
        F.length(strip(F.col("html"))).cast("bigint").alias("n_clean"),
    )


# ---------------------------------------------------------------------------
# Web-corpus capstone: extract → gate → exact dedup → near-dup drop →
# split → per-split accounting
# ---------------------------------------------------------------------------

_WEB_MIN_TOK = 20


def _web_pipeline_oracle() -> str:
    from etl_migrate_api_spark.plans.llm_ops import _simhash_chain_sql

    strip = _HTML_STRIP_SQL.format(h="html")
    return f"""
      with pages as (
        select doc_id, {_html_of_sql('text')} as html from documents
      ),
      clean as (
        select doc_id, {strip} as text from pages
      ),
      gated as (
        select doc_id, text,
               len(list_filter(string_split_regex(lower(trim(text)),
                   '[ \\t\\r\\n\\f]+'), x -> x <> '')) as n_tok
        from clean
        where len(list_filter(string_split_regex(lower(trim(text)),
              '[ \\t\\r\\n\\f]+'), x -> x <> '')) >= {_WEB_MIN_TOK}
      ),
      keep1 as (
        select doc_id, text, n_tok from (
          select doc_id, text, n_tok,
                 row_number() over (
                   partition by md5(lower(regexp_replace(trim(text),
                     '[ \\t\\r\\n\\f]+', ' ', 'g')))
                   order by doc_id) as rn
          from gated) where rn = 1
      ),
      {_simhash_chain_sql("keep1")},
      drops as (
        select distinct b.id as doc_id
        from sig a join sig b
          on a.id < b.id
         and bit_count(xor(a.simhash_lo, b.simhash_lo))
           + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
      ),
      survivors as (
        select k.doc_id, k.n_tok from keep1 k
        where not exists (select 1 from drops d where d.doc_id = k.doc_id)
      ),
      assigned as (
        select n_tok,
               case when substring(md5('split' || cast(doc_id as varchar)), 1, 2) < 'f6'
                    then 'train'
                    when substring(md5('split' || cast(doc_id as varchar)), 1, 2) < 'fb'
                    then 'val'
                    else 'test' end as split
        from survivors
      )
      select split,
             cast(count(*) as bigint) as n_docs,
             cast(sum(n_tok) as bigint) as n_tok_total
      from assigned group by split
    """


@register(
    "llm_web_pipeline",
    oracle=_web_pipeline_oracle(),
    survey_refs=("T1", "F1", "E1", "E2", "W1", "A3"),
)
def llm_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WEB-corpus capstone — raw pages to training-ready splits in
    ONE plan, each stage the already-verified operator: HTML extraction
    (llm_html_extract's shared strip chain) → minimum-length gate
    (≥ 20 ws-tokens of the CLEAN text — gates must run on what survives
    extraction, not on markup length) → exact dedup (first occurrence
    per content fingerprint) → SimHash near-dup drop (hamming ≤ 3 over
    survivors only — the filters-first ordering that keeps near-dup
    cost proportional to what passes the cheap gates) → hash train/
    val/test split → per-split doc + token accounting. Composition is
    what the oracle pins: the CTE chain reuses _html_of_sql /
    _HTML_STRIP_SQL / _simhash_chain_sql verbatim, so capstone and
    stage oracles cannot drift. 100 TB shape: extraction and the gate
    fuse into the scan; the fingerprint window and the banded near-dup
    join run on monotonically shrinking survivor sets; the final
    accounting is a 3-row aggregate."""
    from pyspark.sql import Window

    from etl_migrate_api_spark.functions.text import fingerprint, ws_tokens
    from etl_migrate_api_spark.operators import dedup as dd

    docs = load(spark, "documents", sf_dir)
    clean = docs.select(
        "doc_id", _html_strip_col(_planted_html_col()).alias("text")
    )
    gated = clean.withColumn("n_tok", F.size(ws_tokens("text"))).where(
        F.col("n_tok") >= _WEB_MIN_TOK
    )
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    keep1 = (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "text", "n_tok")
    )
    keep1 = keep1.persist()
    keep1.count()
    pairs = dd.simhash_neardup_pairs(keep1, "text", "doc_id", max_hamming=3)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = keep1.join(drops, "doc_id", "left_anti")
    b = F.substring(
        F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 2
    )
    assigned = survivors.select(
        "n_tok",
        F.when(b < "f6", "train").when(b < "fb", "val").otherwise("test")
        .alias("split"),
    )
    out = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tok_total"),
    )
    out = out.persist()
    out.count()
    keep1.unpersist()
    pairs.unpersist()
    return out


# ---------------------------------------------------------------------------
# Sentence segmentation stats (pre-chunking diagnostics)
# ---------------------------------------------------------------------------

#: sentence boundary = 1+ terminal punctuation then 1+ whitespace — the
#: same explicit whitespace class as WS_CLASS (Java \s and RE2 \s
#: disagree on \x0B, so neither side may use \s)
_SENT_SPLIT = r"[.!?]+[ \t\r\n\f]+"
_SENT_SPLIT_SQL = "[.!?]+[ \\t\\r\\n\\f]+"


@register(
    "llm_sentence_split",
    oracle=f"""
      with s as (
        select lang,
               list_filter(
                 string_split_regex(trim(text), '{_SENT_SPLIT_SQL}'),
                 x -> x <> '') as sents
        from documents
      ),
      m as (
        select lang,
               len(sents) as n_sent,
               coalesce(list_sum(list_transform(sents, st ->
                 len(list_filter(
                   string_split_regex(st, '[ \\t\\r\\n\\f]+'),
                   x -> x <> '')))), 0) as n_words,
               list_max(list_transform(sents, st ->
                 len(list_filter(
                   string_split_regex(st, '[ \\t\\r\\n\\f]+'),
                   x -> x <> '')))) as mx
        from s
      )
      select lang,
             cast(count(*) as bigint) as n_docs,
             cast(sum(n_sent) as bigint) as n_sentences,
             cast(sum(n_words) as bigint) as n_words,
             cast(max(mx) as int) as max_sentence_words
      from m
      group by lang
      order by lang
    """,
    survey_refs=("T1", "A3"),
)
def llm_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation over the corpus — the diagnostic a
    chunking/packing pipeline runs before choosing sequence lengths:
    split each doc on terminal-punctuation+whitespace boundaries
    (case-preserving, pure column expressions — split / filter /
    transform / aggregate, no UDF), count sentences and
    words-per-sentence per doc, and roll up per language: doc count,
    sentence count, in-sentence word count, and the longest sentence
    in words. Everything stays a narrow projection until the final
    k-group aggregate — at 100 TB this runs at scan speed with
    map-side partial aggregation, shuffling one row per language."""
    docs = load(spark, "documents", sf_dir)
    sents = F.filter(
        F.split(F.trim(F.col("text")), _SENT_SPLIT),
        lambda s: s != F.lit(""),
    )
    wc = lambda st: F.size(  # noqa: E731
        F.array_remove(F.split(st, r"[ \t\r\n\f]+"), "")
    )
    per_doc = docs.select(
        "lang",
        F.size(sents).alias("n_sent"),
        F.aggregate(
            F.transform(sents, wc), F.lit(0), lambda a, x: a + x
        ).alias("n_words"),
        F.array_max(F.transform(sents, wc)).alias("mx"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sent").alias("n_sentences"),
            F.sum("n_words").alias("n_words"),
            F.max("mx").cast("int").alias("max_sentence_words"),
        )
        .orderBy("lang")
    )
