"""Data-selection and corpus-statistics operators — the "which docs do
we train on, in what order" layer of a pretraining pipeline:

- DSIR importance resampling (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed-bigram bucket
  log-likelihood ratios between a target domain and the raw corpus.
- PageRank over the document host graph — the classic web-corpus
  quality prior (OpenWebText/CCNet-style "keep well-linked hosts").
- Deterministic global shuffle + shard assignment — the last step
  before writing training shards.
- Exact per-group order statistics (p50/p90/p99) — corpus length
  profiling without approx-percentile drift.
- Okapi BM25 retrieval ranking — the contamination-check / RAG-audit
  scorer (TF-IDF's retrieval twin).
- Epoch-repeat mixture assembly — up-sample low-resource domains by
  repetition to a common target count (LLaMA-style epoch factors).
- Content-defined chunk dedup — rsync/LBFS-style boundaries from local
  bigram hashes, the shift-robust member of the dedup family.
- Distributed BPE tokenizer training — the count-merge loop over the
  weighted distinct-word table (rows-only; python-reference-exact).
- The selection-pipeline capstone: gate → DSIR score → per-lang quota
  → shard assignment, one oracle-checked composed plan.

Engine-exactness rules (these queries are hash-compared against DuckDB
by the driver, with NO float rounding — see tools/driver_sim.py):

- Float SUMS are forbidden (addition order differs per engine/run).
  DSIR sums ``decimal(18,9)`` bucket weights; PageRank runs entirely in
  scaled INTEGER arithmetic (rank in 1e-12 units, floor division) so
  every iteration is bit-exact on both engines.
- ``ln`` is evaluated once per BUCKET (4096 values), not per row, and
  immediately quantized to ``decimal(18,9)`` — the only non-correctly-
  rounded op in this module, verified stable across all test SFs.
- Rank cut-offs use integer formulas (``(9n+9) div 10``), never
  ``ceil(0.9 * n)`` on doubles.

Driver-window placement is owned by registry.DRIVER_WINDOW, not by this
module: as of round 8 most of this family (DSIR, the capstone, BM25,
mixture epochs, CDC chunking, global shuffle, split/fixed-k sampling,
PageRank, k-core, triangles, BPE) sits INSIDE the 50-slot window; the
rest is tail-checked. Either way every oracle here is hash-verified by
tests/test_oracle_parity.py and tools/driver_sim.py on every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.functions.text import (
    SQL_WS_TOKENS as _SQL_TOKS,
    ws_tokens as _ws_tokens,
)
from etl_migrate_api_spark.plans.llm_curation import _word_ngrams
from etl_migrate_api_spark.plans.registry import register
from etl_migrate_api_spark.localdf import local_df


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096  # first 3 md5 hex chars of the bigram
_DSIR_TOP_K = 100
_DSIR_TARGET_LANG = "en"  # stands in for the curated target domain


def _dsir_scored_sql(source_sql: str) -> str:
    """The DSIR scoring CTE chain (toks → grams → buckets → totals →
    bucket_w → scored) over an arbitrary document source — shared by
    llm_dsir_sample (whole corpus) and llm_selection_pipeline (gated
    corpus) so the two oracles can never drift."""
    return f"""
      toks as (
        select doc_id, lang, {_SQL_TOKS} as t from ({source_sql})
      ),
      grams as (
        select doc_id, lang,
               cast(concat('0x', substr(md5(g), 1, 3)) as bigint) as b
        from (
          select doc_id, lang,
                 unnest([array_to_string(t[i:i+1], ' ')
                         for i in range(1, greatest(len(t), 1))]) as g
          from toks
        )
      ),
      buckets as (
        select b, count(*) as cr,
               count(*) filter (where lang = '{_DSIR_TARGET_LANG}') as ct
        from grams group by b
      ),
      totals as (
        select sum(cr) as r_total, sum(ct) as t_total from buckets
      ),
      bucket_w as (
        select b,
               cast(ln(cast((ct + 1) * (r_total + {_DSIR_BUCKETS}) as double)
                       / cast((cr + 1) * (t_total + {_DSIR_BUCKETS}) as double))
                    as decimal(18,9)) as lw
        from buckets cross join totals
      ),
      scored as (
        select g.doc_id, min(g.lang) as lang,
               cast(count(*) as bigint) as n_grams,
               sum(lw) as w
        from grams g join bucket_w using (b)
        group by g.doc_id
      )"""


def _dsir_scored(docs: DataFrame) -> DataFrame:
    """Spark twin of :func:`_dsir_scored_sql`: (doc_id, lang, n_grams,
    w[decimal]) for an arbitrary ``(doc_id, lang, text)`` source."""
    from etl_migrate_api_spark.operators.dedup import _spread

    tokenized = _spread(
        docs.select("doc_id", "lang", _ws_tokens("text").alias("toks"))
    )
    grams = tokenized.select(
        "doc_id",
        "lang",
        F.explode(_word_ngrams("toks", 2)).alias("g"),
    ).select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.col("g")), 1, 3), 16, 10)
        .cast("bigint")
        .alias("b"),
    )
    is_target = (F.col("lang") == _DSIR_TARGET_LANG).cast("bigint")
    buckets = grams.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(is_target).alias("ct"),
    )
    # corpus totals are exactly the bucket-count sums — derive them from
    # the 4096-row aggregate instead of a third full scan of the gram
    # stream (one entire tokenize+hash+explode pass saved on both engines)
    totals = buckets.agg(
        F.sum("cr").alias("r_total"), F.sum("ct").alias("t_total")
    )
    b = _DSIR_BUCKETS
    bucket_w = buckets.crossJoin(F.broadcast(totals)).select(
        "b",
        F.log(
            ((F.col("ct") + 1) * (F.col("r_total") + b)).cast("double")
            / ((F.col("cr") + 1) * (F.col("t_total") + b)).cast("double")
        )
        .cast("decimal(18,9)")
        .alias("lw"),
    )
    return (
        grams.join(F.broadcast(bucket_w), "b")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("lw").alias("w"),
        )
    )


@register(
    "llm_dsir_sample",
    oracle=f"""
      with {_dsir_scored_sql("select * from documents")}
      select cast(doc_id as bigint) as doc_id, lang, n_grams,
             cast(w as double) as weight
      from scored
      order by w desc, doc_id
      limit {_DSIR_TOP_K}
    """,
    headline=True,
    survey_refs=("A3", "J2", "O2", "T8"),
)
def llm_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score each document by the
    log-likelihood ratio of a hashed-bigram bag-of-ngrams model of the
    TARGET domain (here lang='en' stands in for the curated target)
    against the RAW corpus, with add-one smoothing over
    4096 hash buckets; keep the top-100.

    score(doc) = Σ_grams ln( p_target(bucket) / p_raw(bucket) )
               = Σ_grams ln( (ct+1)(R+B) / ((cr+1)(T+B)) )

    Engine-exactness: the ln runs once per BUCKET on a correctly-rounded
    double ratio of exact integer products, then is quantized to
    decimal(18,9); the per-doc score is an exact decimal SUM of those
    quantized weights — no float accumulation anywhere, so Spark and
    DuckDB agree bit-for-bit. Docs with <2 tokens have no bigrams and
    are (documentedly) not candidates.

    100 TB shape: bucket stats are one map-side-combined aggregate to
    4096 rows; the weight table broadcasts back onto the
    gram stream (no shuffle of the corpus); the per-doc sum shuffles on
    doc_id once; top-k is TakeOrderedAndProject (per-partition heaps +
    driver merge of 100). The paper's full pipeline resamples
    with Gumbel noise; the deterministic top-k here is its seed-stable
    variant (same shape: rank by weight, cut at the quota).
    """
    scored = _dsir_scored(load(spark, "documents", sf_dir))
    return (
        scored.orderBy(F.col("w").desc(), "doc_id")
        .limit(_DSIR_TOP_K)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "lang",
            "n_grams",
            F.col("w").cast("double").alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the planted host graph
# ---------------------------------------------------------------------------
# The corpus documents carry no hyperlinks, so — like the planted URLs
# of llm_url_canonical_dedup — the host graph is derived
# deterministically from doc_id with the SAME expression on both
# engines: each doc links its host (doc_id mod 50) to host
# (7*doc_id+3 mod 50). 6d ≡ 47 (mod 50) has no solution (gcd(6,50)=2,
# 47 odd), so the construction never emits a self-loop; the filter
# stays anyway as graph hygiene.

_PR_HOSTS = 50
_PR_ITERS = 8
_PR_SCALE = 10**12  # rank unit = 1e-12
_PR_INIT = _PR_SCALE // _PR_HOSTS  # 1/N exactly, in units
_PR_TELEPORT = (15 * _PR_SCALE) // (100 * _PR_HOSTS)  # (1-d)/N in units


def _pr_oracle() -> str:
    """Unrolled power iteration, all in scaled-integer arithmetic:
    rank is a bigint in 1e-12 units; per-edge contribution is
    ``rank div outdeg`` (floor); the damped update is
    ``teleport + (85 * Σcontrib) div 100``. Every op is exact integer
    math — bit-identical on Spark and DuckDB by construction."""
    steps = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""r{i} as (
        select h.host,
               {_PR_TELEPORT} + (85 * coalesce(s.contrib, 0)) // 100
                 as rank_u
        from hosts h left join (
          select e.dst as host, sum({prev}.rank_u // e.outdeg) as contrib
          from edges e join {prev} on {prev}.host = e.src
          group by e.dst
        ) s on s.host = h.host
      )"""
        )
        prev = f"r{i}"
    chain = ",\n      ".join(steps)
    return f"""
      with links as (
        select doc_id % {_PR_HOSTS} as src,
               (7 * doc_id + 3) % {_PR_HOSTS} as dst
        from documents
      ),
      dedup as (
        select distinct src, dst from links where src <> dst
      ),
      outdegs as (
        select src, count(*) as outdeg from dedup group by src
      ),
      edges as (
        select d.src, d.dst, o.outdeg from dedup d join outdegs o using (src)
      ),
      hosts as (
        select src as host from dedup union select dst from dedup
      ),
      r0 as (
        select host, cast({_PR_INIT} as bigint) as rank_u from hosts
      ),
      {chain}
      select cast(host as bigint) as host,
             cast(rank_u as bigint) as rank_u,
             cast(rank_u as double) / {_PR_SCALE} as rank
      from {prev}
    """


@register(
    "graph_pagerank_hosts",
    oracle=_pr_oracle(),
    survey_refs=("J2", "A3", "X1"),
)
def graph_pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 8 iterations) over the planted host
    graph — the web-corpus quality prior, and the second ITERATIVE
    operator in the engine next to label-propagation clustering
    (operators/dedup.py). Unlike that one, this is fully
    ORACLE-CHECKED: the whole iteration runs in scaled-integer
    arithmetic (rank = bigint count of 1e-12 units, per-edge share =
    floor division, damping = ``(85*s) div 100``), so the unrolled
    DuckDB twin reproduces every intermediate bit. Dangling hosts
    (none under this construction) would leak their mass — identically
    on both engines.

    100 TB shape: ranks is |hosts| rows — always ≪ corpus — so each
    iteration is a broadcast join of ranks ONTO the edge table followed
    by one map-side-combined integer aggregate on dst; the edge table
    never re-shuffles. At web scale (1e8 hosts) the same plan flips to
    a shuffled sort-merge join on src — still one shuffle per
    iteration, which is PageRank's lower bound. The unrolled lineage
    (8 stages) is fine at this depth; checkpoint every ~20 iterations
    if extended (see the convergence guard in operators/dedup.py).
    """
    docs = load(spark, "documents", sf_dir)
    links = docs.select(
        (F.col("doc_id") % _PR_HOSTS).alias("src"),
        ((7 * F.col("doc_id") + 3) % _PR_HOSTS).alias("dst"),
    )
    dedup = links.where(F.col("src") != F.col("dst")).distinct()
    outdegs = dedup.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = dedup.join(outdegs, "src").persist()
    hosts = (
        dedup.select(F.col("src").alias("host"))
        .union(dedup.select(F.col("dst").alias("host")))
        .distinct()
    )
    ranks = hosts.select(
        "host", F.lit(_PR_INIT).cast("bigint").alias("rank_u")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(F.broadcast(ranks), edges.src == ranks.host)
            .select(
                F.col("dst").alias("host"),
                F.expr("rank_u div outdeg").alias("share"),
            )
            .groupBy("host")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = hosts.join(contrib, "host", "left").select(
            "host",
            (
                F.lit(_PR_TELEPORT)
                + F.expr("85 * coalesce(contrib, 0) div 100")
            )
            .cast("bigint")
            .alias("rank_u"),
        )
    out = ranks.select(
        F.col("host").cast("bigint").alias("host"),
        F.col("rank_u").cast("bigint").alias("rank_u"),
        (F.col("rank_u").cast("double") / _PR_SCALE).alias("rank"),
    )
    # materialize the |hosts|-row result, then release the edge cache —
    # the q15_top_supplier persist discipline (never leak intermediates
    # into the rest of the session)
    out = out.persist()
    out.count()
    edges.unpersist()
    return out


# ---------------------------------------------------------------------------
# Deterministic global shuffle → training shards
# ---------------------------------------------------------------------------

_SHUF_SALT = "shuf"

# The ONE shard/pos scheme, shared by llm_global_shuffle and the
# llm_selection_pipeline capstone in BOTH engines — a salt or nibble
# change lands everywhere or nowhere (the _dsir_scored_sql no-drift
# discipline).
_H_SQL = f"md5('{_SHUF_SALT}' || cast(doc_id as varchar))"
_SHARD_SQL = "cast(cast(concat('0x', substr(h, 1, 1)) as bigint) as int)"
_POS_SQL = (
    "cast(row_number() over ("
    "partition by substr(h, 1, 1) order by h, doc_id) as bigint)"
)


def _with_shard_pos(df: DataFrame, *keep: str) -> DataFrame:
    """Append the deterministic (shard int, pos bigint) assignment to a
    DataFrame carrying ``doc_id`` — Spark twin of _H_SQL/_SHARD_SQL/
    _POS_SQL. ``keep`` columns pass through unchanged."""
    h = F.md5(F.concat(F.lit(_SHUF_SALT), F.col("doc_id").cast("string")))
    keyed = df.select(
        *keep, F.col("doc_id").cast("bigint").alias("doc_id"), h.alias("h")
    )
    w = Window.partitionBy(F.substring("h", 1, 1)).orderBy("h", "doc_id")
    return keyed.select(
        *keep,
        "doc_id",
        F.conv(F.substring("h", 1, 1), 16, 10).cast("int").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "llm_global_shuffle",
    oracle=f"""
      with keyed as (
        select doc_id, {_H_SQL} as h
        from documents
      )
      select cast(doc_id as bigint) as doc_id,
             {_SHARD_SQL} as shard,
             {_POS_SQL} as pos
      from keyed
    """,
    survey_refs=("W2", "T8"),
)
def llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 16 training shards — the final
    step before writing pretraining data, where example order must be
    (a) uniformly random-looking, (b) reproducible across re-runs and
    task retries, and (c) assembled WITHOUT a global sort. The md5 draw
    gives (a)+(b); sharding by the first hex nibble turns the global
    permutation into 16 independent per-shard sorts (c): at 100 TB this
    is a hash repartition on shard + per-shard sort — embarrassingly
    parallel, no single-partition row_number anywhere. A reader that
    walks shards 0..15 in pos order sees exactly the global
    md5-permutation."""
    return _with_shard_pos(load(spark, "documents", sf_dir))


# ---------------------------------------------------------------------------
# Exact per-group order statistics
# ---------------------------------------------------------------------------


@register(
    "agg_quantile_battery",
    oracle="""
      with ranked as (
        select source, n_chars,
               row_number() over (partition by source
                                  order by n_chars, doc_id) as rn,
               count(*) over (partition by source) as n
        from documents
      )
      select source,
             cast(max(n) as bigint) as n_docs,
             cast(min(n_chars) as bigint) as min_chars,
             cast(max(case when rn = (n + 1) // 2 then n_chars end)
                  as bigint) as p50,
             cast(max(case when rn = (9 * n + 9) // 10 then n_chars end)
                  as bigint) as p90,
             cast(max(case when rn = (99 * n + 99) // 100 then n_chars end)
                  as bigint) as p99,
             cast(max(n_chars) as bigint) as max_chars
      from ranked
      group by source
    """,
    survey_refs=("W2", "A3", "O1"),
)
def agg_quantile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source length percentiles (p50/p90/p99 as order
    statistics at rank ceil(p·n)) — corpus length profiling for
    sequence-length budgeting. approx_percentile is the 100 TB default
    but its t-digest answer is engine- and merge-order-specific; this
    battery pins the EXACT statistic so both engines agree bit-for-bit,
    and the ranks use integer formulas ((9n+9) div 10), never
    ceil(0.9*n) on a double. Shape: one shuffle on source for the
    window, then a map-side-combined conditional aggregate. Per-group
    sort cost is the exact-percentile price; the sketch variant
    (percentile_approx, mergeable partials) is the documented swap at
    scale."""
    docs = load(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )

    def pick(rank_expr: str) -> F.Column:
        return F.max(
            F.when(F.col("rn") == F.expr(rank_expr), F.col("n_chars"))
        ).cast("bigint")

    return ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        pick("(n + 1) div 2").alias("p50"),
        pick("(9 * n + 9) div 10").alias("p90"),
        pick("(99 * n + 99) div 100").alias("p99"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval ranking
# ---------------------------------------------------------------------------
# Okapi BM25 with the Lucene-style always-positive idf. Query terms are
# fixed constants from the corpus vocabulary; k1/b are the textbook
# defaults. Engine-exactness: idf is ln once per TERM then quantized to
# decimal(18,9); the per-(doc, term) saturation ratio uses only
# correctly-rounded IEEE ops (+,-,*,/) on identical inputs, and the
# per-doc score is a SUM of per-term DECIMALS (never a float sum).

_BM25_TERMS = ("hash", "join", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20


def _bm25_ranked_cte() -> str:
    """The shared CTE chain up to per-doc BM25 scores — reused by the
    plain search oracle and by the RRF-fusion oracle below."""
    terms = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
      with toks as (
        select doc_id, {_SQL_TOKS} as t from documents
      ),
      lens as (
        select doc_id, len(t) as dl from toks
      ),
      stats as (
        select count(*) as n_docs, sum(dl) as n_toks from lens
      ),
      q(term) as (values {terms}),
      tf as (
        select doc_id, w as term, count(*) as tf
        from (select doc_id, unnest(t) as w from toks)
        where w in (select term from q)
        group by doc_id, w
      ),
      df as (
        select term, count(*) as df from tf group by term
      ),
      idf as (
        select term,
               cast(ln(1.0 + (cast(n_docs - df as double) + 0.5)
                             / (cast(df as double) + 0.5))
                    as decimal(18,9)) as idf
        from df cross join stats
      ),
      scored as (
        select tf.doc_id,
               cast(cast(idf.idf as double)
                    * (tf.tf * cast({_BM25_K1} + 1.0 as double))
                    / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                       + {_BM25_B} * lens.dl
                         * (cast(stats.n_docs as double)
                            / cast(stats.n_toks as double))))
                    as decimal(18,9)) as s
        from tf
        join idf using (term)
        join lens using (doc_id)
        cross join stats
      ),
      ranked as (
        select doc_id, sum(s) as score, count(*) as n_terms
        from scored group by doc_id
      )"""


def _bm25_oracle() -> str:
    return (
        _bm25_ranked_cte()
        + f"""
      select cast(doc_id as bigint) as doc_id,
             cast(n_terms as bigint) as n_terms,
             cast(score as double) as score
      from ranked
      order by score desc, doc_id
      limit {_BM25_TOP}
    """
    )


@register(
    "llm_bm25_search",
    oracle=_bm25_oracle(),
    survey_refs=("A3", "J2", "O2"),
)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for the fixed query ('hash', 'join', 'merge') —
    the retrieval ranking every contamination check, eval-set builder,
    and RAG corpus audit reaches for (TF-IDF's retrieval twin; the
    registered llm_tfidf_keywords is the per-doc keyword direction).

      score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))

    with the Lucene always-positive idf = ln(1 + (N−df+0.5)/(df+0.5)),
    k1=1.2, b=0.75. Engine-exactness: idf is quantized to
    decimal(18,9) once per TERM; the saturation ratio uses only
    correctly-rounded IEEE ops on identical inputs (dl/avgdl is
    expressed as dl·(N/Σdl) so both engines chain the same three
    operations); each per-(doc,term) contribution is quantized to
    decimal before the per-doc SUM — no float accumulation.

    100 TB shape: the tf table is one explode→filter→agg whose filter
    (term IN query) prunes the token stream at the scan; idf and the
    corpus stats are scalar/3-row broadcasts; the per-doc sum shuffles
    only docs that contain ≥1 query term; top-k is
    TakeOrderedAndProject."""
    ranked = _bm25_doc_ranked(spark, sf_dir)
    return (
        ranked.orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOP)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_terms").cast("bigint").alias("n_terms"),
            F.col("score").cast("double").alias("score"),
        )
    )


def _text_index_shared_path(sf_dir: str) -> str:
    """Process-scoped inverted-index location (the _ivf_shared_path
    pattern): keyed by (sf tag, pid) — fresh per interpreter so a run
    can never read an index stale code wrote, shared within a session
    so the build amortizes over every from-index query."""
    import os
    import tempfile

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_textidx")
    return os.path.join(root, f"index_{tag}_pid{os.getpid()}")


def _text_index_sweep_stale(root: str) -> None:
    from etl_migrate_api_spark.tmputil import sweep_stale_dirs

    sweep_stale_dirs(root)


_TEXT_INDEX_BUCKETS = 64


@register(
    "llm_bm25_index_build",
    headline=True,
    oracle=f"""
      with toks as (
        select doc_id, {_SQL_TOKS} as tk from documents
      ),
      postings as (
        select term, doc_id from (
          select doc_id, unnest(tk) as term from toks)
        group by term, doc_id
      )
      select cast(cast(concat('0x', substr(md5(term), 1, 8)) as bigint)
                  % {_TEXT_INDEX_BUCKETS} as int) as bucket,
             cast(count(*) as bigint) as n_postings,
             cast(count(distinct term) as bigint) as n_terms
      from postings
      group by bucket
      order by bucket
    """,
    survey_refs=("K2", "E1", "A3"),
)
def llm_bm25_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index BUILD, hash-gated: tokenize the corpus once,
    write posting lists (term, doc_id, tf, dl) parquet-PARTITIONED by
    the term's md5 bucket (operators/text_index.py), and return the
    per-bucket inventory read back FROM the written index — posting
    and distinct-term counts per bucket, which the oracle recomputes
    from raw text (the md5 bucketing is plain SQL). Unlike the IVF
    build (float k-means → rows-only), EVERYTHING here is integer/
    string-exact, so the build itself rides the hash gate: a match
    proves tokenization, tf/dl aggregation, bucket assignment, and
    that the partitioned write dropped nothing.

    100 TB: one explode → one partial-combined agg → one bucket-keyed
    shuffle; bucket directories are the retrieval unit (a query opens
    only its terms' buckets — see llm_bm25_index_query)."""
    import os
    import shutil

    from etl_migrate_api_spark.operators.text_index import build_text_index

    docs = load(spark, "documents", sf_dir)
    path = _text_index_shared_path(sf_dir)
    _text_index_sweep_stale(os.path.dirname(path))
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(f"{path}.stats", ignore_errors=True)
    shutil.rmtree(f"{path}.doclens", ignore_errors=True)
    shutil.rmtree(f"{path}.tombstones", ignore_errors=True)
    build_text_index(docs, path, n_buckets=_TEXT_INDEX_BUCKETS)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
        )
        .orderBy("bucket")
    )


@register(
    "llm_bm25_index_query",
    headline=True,
    oracle=_bm25_oracle(),
    survey_refs=("J2", "O2", "A3"),
)
def llm_bm25_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 answered FROM the persisted inverted index — the
    amortized per-query cost at scale, and it shares llm_bm25_search's
    oracle VERBATIM: the from-index path must be bit-identical to the
    inline computation (same decimal-quantized idf and contribution
    shapes), while touching only the ≤3 bucket directories the query
    terms hash to (file-listing-time partition pruning, plan-asserted
    in tests/test_text_index.py). Builds the index first only if this
    session hasn't yet; in the bench llm_bm25_index_build has already
    paid that, so this number is the pruned probe alone.

    100 TB: a 3-term query reads 3/64ths of a posting table that is
    itself a few percent of the raw text — milliseconds of I/O against
    a corpus the inline scan would re-tokenize in full."""
    import os

    from etl_migrate_api_spark.operators.text_index import (
        bm25_from_index,
        build_text_index,
    )

    path = _text_index_shared_path(sf_dir)
    if not os.path.isdir(f"{path}.stats"):
        _text_index_sweep_stale(os.path.dirname(path))
        build_text_index(
            load(spark, "documents", sf_dir),
            path,
            n_buckets=_TEXT_INDEX_BUCKETS,
        )
    return bm25_from_index(
        spark, path, _BM25_TERMS, k=_BM25_TOP, k1=_BM25_K1, b=_BM25_B
    )


@register(
    "llm_bm25_stream_index",
    oracle=_bm25_oracle(),
    survey_refs=("X1", "J2", "O2"),
)
def llm_bm25_stream_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING through the DuckDB gate — the first
    driver-gated streaming query: the corpus lands as three file waves,
    text_index_stream ingests them as availableNow micro-batches
    (maxFilesPerTrigger=1 forces a real multi-batch run) into the
    streamed inverted-index layout, and the SAME from-index BM25 runs
    against what the stream built. The oracle is llm_bm25_search's,
    VERBATIM — a hash match proves the streaming path end to end:
    micro-batch boundaries, the exactly-once batch-dir writes, the
    per-batch stats deltas summing to the corpus scalars, and
    bit-identical scores vs the inline computation the oracle mirrors.
    (The live-trigger/watermark behaviors that can't run under a gate —
    replay after kill -9, late data — stay pinned in
    tests/test_text_index.py and tests/test_kill9_recovery.py.)

    100 TB: continuous retrieval-index ingest costs each micro-batch
    one tokenize + one bucket shuffle of its OWN postings; queries pay
    file-listing pruning regardless of how many batches landed."""
    import os
    import shutil

    from etl_migrate_api_spark.operators.text_index import bm25_from_index
    from etl_migrate_api_spark.plans.extras import _roundtrip_tmpdir
    from etl_migrate_api_spark.streaming.pipeline import text_index_stream

    docs = load(spark, "documents", sf_dir)
    root = _roundtrip_tmpdir("bm25stream", sf_dir)
    landing = os.path.join(root, "landing")
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    idx = os.path.join(root, "index")
    q = text_index_stream(
        spark,
        landing,
        os.path.join(root, "ckpt"),
        idx,
        n_buckets=_TEXT_INDEX_BUCKETS,
        max_files_per_trigger=1,
    )
    # awaitTermination(timeout) returns False on timeout, it does NOT
    # raise — proceeding would score a partially-built index while the
    # stream keeps writing under us
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(
            "text_index_stream did not finish within 600 s — refusing "
            "to score a partially built index"
        )
    out = bm25_from_index(
        spark, idx, _BM25_TERMS, k=_BM25_TOP, k1=_BM25_K1, b=_BM25_B
    )
    out = out.persist()
    out.count()  # materialize before the landing/index dirs can age out
    shutil.rmtree(os.path.join(root, "ckpt"), ignore_errors=True)
    return out


def _bm25_doc_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 (doc_id, score decimal(18,9)-summed, n_terms) for
    the fixed query — the shared lexical leg of llm_bm25_search and
    llm_rrf_fusion (mirrors _bm25_ranked_cte the same way)."""
    from etl_migrate_api_spark.operators.dedup import _spread

    docs = load(spark, "documents", sf_dir)
    tokenized = _spread(
        docs.select("doc_id", _ws_tokens("text").alias("toks"))
    )
    lens = tokenized.select("doc_id", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("n_toks")
    )
    tf = (
        tokenized.select("doc_id", F.explode("toks").alias("w"))
        .where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0
            + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
        )
        .cast("decimal(18,9)")
        .alias("idf"),
    )
    k1, b = _BM25_K1, _BM25_B
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf").cast("double")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        (1.0 - b)
                        + b
                        * F.col("dl")
                        * (
                            F.col("n_docs").cast("double")
                            / F.col("n_toks").cast("double")
                        )
                    )
                )
            )
            .cast("decimal(18,9)")
            .alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("s").alias("score"), F.count(F.lit(1)).alias("n_terms")
    )


_RRF_K = 60
_RRF_QUERY_VEC = 7
_RRF_TOP = 10


def _rrf_oracle() -> str:
    return (
        _bm25_ranked_cte()
        + f""",
      lex as (
        select doc_id, r from (
          select doc_id,
                 row_number() over (order by score desc, doc_id) as r
          from ranked) where r <= {_BM25_TOP}
      ),
      dq as (
        select embedding as qv from embeddings where vec_id = {_RRF_QUERY_VEC}
      ),
      dscored as (
        select c.vec_id, list_cosine_similarity(c.embedding, dq.qv) as sim
        from embeddings c, dq where c.vec_id <> {_RRF_QUERY_VEC}
      ),
      dense as (
        select vec_id as doc_id, r from (
          select vec_id,
                 row_number() over (order by sim desc, vec_id) as r
          from dscored) where r <= {_BM25_TOP}
      ),
      fused as (
        select coalesce(l.doc_id, d.doc_id) as doc_id,
               coalesce(l.r, 0) as r_lex,
               coalesce(d.r, 0) as r_dense
        from lex l full outer join dense d on l.doc_id = d.doc_id
      )
      select cast(doc_id as bigint) as doc_id,
             cast(r_lex as int) as r_lex,
             cast(r_dense as int) as r_dense,
             cast(round(
               (case when r_lex > 0 then 1.0 / ({_RRF_K} + r_lex) else 0.0 end)
             + (case when r_dense > 0 then 1.0 / ({_RRF_K} + r_dense) else 0.0 end),
               9) as double) as rrf
      from fused
      order by rrf desc, doc_id
      limit {_RRF_TOP}
    """
    )


@register(
    "llm_rrf_fusion",
    oracle=_rrf_oracle(),
    survey_refs=("J2", "O2", "T8"),
)
def llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of a lexical and a
    dense retrieval run — THE standard hybrid-search combiner:
    rrf(d) = Σ_runs 1/(k + rank_run(d)), k=60, over the BM25 top-20
    (shared _bm25_doc_ranked leg, fixed 3-term query) and the exact-
    cosine top-20 around a fixed query embedding (vec_id 7; the
    doc_id↔vec_id identification is the dataset's embedding-per-
    document convention). Engine-exactness comes free: both legs
    reduce to INTEGER ranks before fusion (the cosine itself never
    leaves the ranking), so the fused score is two correctly-rounded
    divisions of identical integers plus one addition — bit-equal on
    any IEEE engine; absent-from-run is rank 0 contributing 0.0.
    Scale: each leg is its own top-k (TakeOrderedAndProject); the
    fusion is a full outer join of two ≤20-row tables."""
    from etl_migrate_api_spark.functions.vectors import cosine_similarity

    lex = (
        _bm25_doc_ranked(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOP)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .alias("r"),
        )
    )
    emb = load(spark, "embeddings", sf_dir)
    qv = F.broadcast(
        emb.where(F.col("vec_id") == _RRF_QUERY_VEC).select(
            F.col("embedding").alias("qv")
        )
    )
    dscored = (
        emb.where(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(qv)
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    dense = (
        dscored.orderBy(F.col("sim").desc(), "vec_id")
        .limit(_BM25_TOP)
        .select(
            F.col("vec_id").cast("bigint").alias("doc_id"),
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), "vec_id"))
            .alias("r"),
        )
    )
    fused = lex.withColumnRenamed("r", "rl").join(
        dense.withColumnRenamed("r", "rd"), "doc_id", "full_outer"
    )
    r_lex = F.coalesce(F.col("rl"), F.lit(0))
    r_dense = F.coalesce(F.col("rd"), F.lit(0))
    contrib = lambda r: F.when(  # noqa: E731
        r > 0, F.lit(1.0) / (F.lit(_RRF_K) + r)
    ).otherwise(F.lit(0.0))
    return (
        fused.select(
            "doc_id",
            r_lex.cast("int").alias("r_lex"),
            r_dense.cast("int").alias("r_dense"),
            F.round(contrib(r_lex) + contrib(r_dense), 9)
            .cast("double")
            .alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOP)
    )


# ---------------------------------------------------------------------------
# RAG context assembly capstone: chunk → passage-BM25 → per-doc cap →
# top-k → token-budget pack
# ---------------------------------------------------------------------------

_RAG_CHUNK = 32  # tokens per passage (non-overlapping)
_RAG_TOP = 8  # candidate passages after the per-doc cap
_RAG_BUDGET = 128  # context token budget


def _rag_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
      with toks as (
        select doc_id, {_SQL_TOKS} as t from documents
      ),
      pos as (
        select doc_id, cast((i - 1) // {_RAG_CHUNK} as int) as chunk_idx, t[i] as w
        from toks, unnest(generate_series(1, len(t))) as g(i)
        where len(t) > 0
      ),
      chunks as (
        select doc_id, chunk_idx, count(*) as n_tok
        from pos group by doc_id, chunk_idx
      ),
      stats as (select count(*) as n_chunks, sum(n_tok) as n_toks from chunks),
      q(term) as (values {terms}),
      tf as (
        select doc_id, chunk_idx, w as term, count(*) as tf
        from pos where w in (select term from q)
        group by doc_id, chunk_idx, w
      ),
      df as (select term, count(*) as df from tf group by term),
      idf as (
        select term,
               cast(ln(1.0 + (cast(n_chunks - df as double) + 0.5)
                             / (cast(df as double) + 0.5))
                    as decimal(18,9)) as idf
        from df cross join stats
      ),
      scored as (
        select tf.doc_id, tf.chunk_idx,
               cast(cast(idf.idf as double)
                    * (tf.tf * cast({_BM25_K1} + 1.0 as double))
                    / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                       + {_BM25_B} * c.n_tok
                         * (cast(stats.n_chunks as double)
                            / cast(stats.n_toks as double))))
                    as decimal(18,9)) as s
        from tf
        join idf using (term)
        join chunks c using (doc_id, chunk_idx)
        cross join stats
      ),
      chunk_scores as (
        select doc_id, chunk_idx, sum(s) as score
        from scored group by doc_id, chunk_idx
      ),
      best_per_doc as (
        select doc_id, chunk_idx, score from (
          select cs.*,
                 row_number() over (partition by doc_id
                                    order by score desc, chunk_idx) as rd
          from chunk_scores cs) where rd = 1
      ),
      top_k as (
        select doc_id, chunk_idx, score from best_per_doc
        order by score desc, doc_id, chunk_idx limit {_RAG_TOP}
      ),
      ranked as (
        select t.doc_id, t.chunk_idx, t.score, c.n_tok,
               row_number() over (order by t.score desc, t.doc_id,
                                  t.chunk_idx) as rnk
        from top_k t join chunks c using (doc_id, chunk_idx)
      ),
      packed as (
        select *, sum(n_tok) over (order by rnk rows between unbounded
                                   preceding and current row) as cum_tok
        from ranked
      )
      select cast(rnk as int) as ctx_rank,
             cast(doc_id as bigint) as doc_id,
             cast(chunk_idx as int) as chunk_idx,
             cast(n_tok as bigint) as n_tok,
             cast(cum_tok as bigint) as cum_tok,
             cast(score as double) as score
      from packed where cum_tok <= {_RAG_BUDGET}
    """


@register(
    "llm_rag_context_pack",
    oracle=_rag_oracle(),
    headline=True,
    survey_refs=("A3", "J2", "O2", "W2"),
)
def llm_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval-side capstone (curation and selection have theirs):
    assemble a RAG context window as ONE plan — chunk every document
    into non-overlapping 32-token passages, score passages with
    chunk-level BM25 (same Lucene idf + decimal discipline as
    llm_bm25_search), cap at ONE passage per document (cheap diversity
    — five near-identical passages must not fill the prompt; the
    score-aware version is llm_mmr_rerank), take the global top-8, and
    pack them in rank order until the 128-token budget: cum n_tok is
    nondecreasing, so ``cum ≤ budget`` IS stop-at-first-overflow.

    100 TB shape: chunking is posexplode + two integer ops (no
    shuffle); the term filter prunes the token stream before the tf
    aggregate; idf/stats ride broadcasts; the per-doc cap is one
    window on doc_id; the global top-8 is TakeOrderedAndProject (never
    a global sort); the budget window runs on 8 rows."""
    from etl_migrate_api_spark.operators.dedup import _spread

    docs = load(spark, "documents", sf_dir)
    toks = _spread(docs.select("doc_id", _ws_tokens("text").alias("t"))).where(
        F.size("t") > 0
    )
    pos = toks.select(
        "doc_id", F.posexplode("t").alias("p", "w")
    ).select("doc_id", F.expr(f"cast(p div {_RAG_CHUNK} as int)").alias("chunk_idx"), "w")
    chunks = pos.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    chunks = chunks.persist()
    stats = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum("n_tok").alias("n_toks")
    )
    tf = (
        pos.where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "chunk_idx", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0
            + ((F.col("n_chunks") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
        )
        .cast("decimal(18,9)")
        .alias("idf"),
    )
    k1, b = _BM25_K1, _BM25_B
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(chunks, ["doc_id", "chunk_idx"])
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "chunk_idx",
            (
                F.col("idf").cast("double")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        (1.0 - b)
                        + b
                        * F.col("n_tok")
                        * (
                            F.col("n_chunks").cast("double")
                            / F.col("n_toks").cast("double")
                        )
                    )
                )
            )
            .cast("decimal(18,9)")
            .alias("s"),
        )
    )
    chunk_scores = scored.groupBy("doc_id", "chunk_idx").agg(
        F.sum("s").alias("score")
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "chunk_idx"
    )
    best = (
        chunk_scores.withColumn("rd", F.row_number().over(w_doc))
        .where(F.col("rd") == 1)
        .drop("rd")
    )
    top = (
        best.orderBy(F.col("score").desc(), "doc_id", "chunk_idx")
        .limit(_RAG_TOP)
        .join(chunks, ["doc_id", "chunk_idx"])
    )
    w_rank = Window.orderBy(F.col("score").desc(), "doc_id", "chunk_idx")
    ranked = top.withColumn("rnk", F.row_number().over(w_rank))
    packed = ranked.withColumn(
        "cum_tok",
        F.sum("n_tok").over(
            Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = packed.where(F.col("cum_tok") <= _RAG_BUDGET).select(
        F.col("rnk").cast("int").alias("ctx_rank"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.col("cum_tok").cast("bigint").alias("cum_tok"),
        F.col("score").cast("double").alias("score"),
    )
    out = out.persist()
    out.count()
    chunks.unpersist()
    return out


# ---------------------------------------------------------------------------
# Epoch-repeat mixture sampling
# ---------------------------------------------------------------------------


@register(
    "llm_mixture_epochs",
    oracle="""
      with counts as (
        select lang, count(*) as c from documents group by lang
      ),
      target as (
        select (sum(c) + count(*) - 1) // count(*) as t from counts
      ),
      plan as (
        select lang, c, t,
               (t + c - 1) // c as epochs,
               t - ((t + c - 1) // c - 1) * c as last_take
        from counts cross join target
      ),
      ranked as (
        select d.lang, d.doc_id, p.epochs, p.last_take,
               row_number() over (
                 partition by d.lang
                 order by md5('mix' || cast(d.doc_id as varchar)), d.doc_id
               ) as rn
        from documents d join plan p using (lang)
      )
      select lang, cast(doc_id as bigint) as doc_id,
             cast(e.epoch as bigint) as epoch
      from ranked
      cross join unnest(range(cast(epochs as bigint))) as e(epoch)
      where e.epoch < epochs - 1 or rn <= last_take
    """,
    survey_refs=("A3", "W1", "J2"),
)
def llm_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repeat mixture assembly: bring every language up to the
    SAME target count T = ceil(N/|langs|) by repeating low-resource
    languages for ⌈T/c⌉ epochs (full epochs of all docs + an md5-ranked
    partial last epoch) — the up-sampling-with-repetition recipe of
    real pretraining mixes (LLaMA's 2.45-epoch Wikipedia), and the
    complement of llm_domain_mix_sample's down-weighting. Every doc of
    a rare language appears epochs−1 or epochs times; exactly T rows
    come out per language; membership is a pure function of doc_id
    (version-stable). All-integer arithmetic + the shared md5 rank —
    engine-exact by construction.

    100 TB shape: counts/target/plan are |langs| rows broadcast back;
    the epoch fan-out is a sequence explode (no join against a
    generated table); the only corpus shuffle is the per-lang
    md5-rank window."""
    docs = load(spark, "documents", sf_dir)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    target = counts.agg(
        F.expr("(sum(c) + count(*) - 1) div count(*)").alias("t")
    )
    plan = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        "c",
        F.expr("(t + c - 1) div c").alias("epochs"),
        F.expr("t - ((t + c - 1) div c - 1) * c").alias("last_take"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    ranked = (
        docs.select("lang", "doc_id")
        .join(F.broadcast(plan), "lang")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.select(
            "lang",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "epochs",
            "last_take",
            "rn",
            F.explode(F.sequence(F.lit(0), F.col("epochs") - 1)).alias(
                "epoch"
            ),
        )
        .where(
            (F.col("epoch") < F.col("epochs") - 1)
            | (F.col("rn") <= F.col("last_take"))
        )
        .select("lang", "doc_id", F.col("epoch").cast("bigint").alias("epoch"))
    )


# ---------------------------------------------------------------------------
# Content-defined chunk dedup (shift-robust)
# ---------------------------------------------------------------------------

_CDC_MOD = 16  # expected chunk length ≈ 16 tokens


@register(
    "llm_cdc_chunk_dedup",
    oracle=f"""
      with toks as (
        select doc_id, {_SQL_TOKS} as t from documents
      ),
      pos as (
        select doc_id, i as pos, t[i] as w,
               case when i > 1 and
                    cast('0x' || substr(md5(t[i-1] || ' ' || t[i]), 1, 15)
                         as bigint) % {_CDC_MOD} = 0
                    then 1 else 0 end as boundary
        from toks cross join unnest(range(1, len(t) + 1)) as r(i)
      ),
      chunked as (
        select doc_id, pos, w,
               sum(boundary) over (partition by doc_id order by pos
                                   rows unbounded preceding) as chunk_id
        from pos
      ),
      chunks as (
        select doc_id, chunk_id,
               md5(string_agg(w, ' ' order by pos)) as fp,
               count(*) as n_toks
        from chunked group by doc_id, chunk_id
      )
      select fp,
             cast(count(*) as bigint) as n_copies,
             cast(count(distinct doc_id) as bigint) as n_docs,
             cast(min(doc_id) as bigint) as keeper_doc_id,
             cast(min(n_toks) as bigint) as chunk_toks
      from chunks
      group by fp
      having count(*) > 1
    """,
    survey_refs=("E1", "W2", "A3"),
)
def llm_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: chunk boundaries fall where the
    hash of the local token BIGRAM ≡ 0 (mod 16), so boundaries
    are a function of local content only — inserting or deleting a
    token early in a document re-chunks ONLY the neighborhood of the
    edit, and every other chunk keeps its fingerprint (the
    rsync/LBFS/storage-dedup property). Fixed windows
    (llm_chunk_windows) and fixed spans (llm_span_dedup) both lose all
    alignment after one insertion; CDC is the shift-robust member of
    the dedup family. Expected chunk ≈ 16 tokens.

    Shape: posexplode → ONE (doc_id)-partitioned window (lag-free: the
    boundary flag is computed from the array before exploding, the
    window only runs the cumulative sum) → per-chunk fingerprint agg →
    corpus-wide group on the fingerprint. At 100 TB the fingerprint
    group is the only corpus-wide shuffle, on a well-spread md5 key —
    the exact-dedup shape over ~N/16 chunk rows."""
    from etl_migrate_api_spark.operators.dedup import _spread

    tokenized = _spread(
        load(spark, "documents", sf_dir).select(
            "doc_id", _ws_tokens("text").alias("toks")
        )
    )
    toks = F.col("toks")
    boundary = F.transform(
        F.sequence(F.lit(1), F.size(toks)),
        # i > 1 is the semantic guard; the greatest() clamp keeps
        # element_at's index ≥ 1 even if an evaluation-order change ever
        # stops And from short-circuiting (ANSI element_at(_, 0) throws)
        lambda i: F.when(
            (i > 1)
            & (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.element_at(toks, F.greatest(i - 1, F.lit(1))),
                                F.lit(" "),
                                F.element_at(toks, i),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _CDC_MOD
                == 0
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    exploded = (
        tokenized.where(F.size(toks) > 0)
        .select(
            "doc_id",
            F.posexplode(F.arrays_zip(toks, boundary.alias("b"))).alias(
                "pos0", "z"
            ),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("z.toks").alias("w"),
            F.col("z.b").alias("boundary"),
        )
    )
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = exploded.withColumn("chunk_id", F.sum("boundary").over(w_cum))
    chunks = chunked.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            )
        ).alias("fp"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return (
        chunks.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.min("n_toks").cast("bigint").alias("chunk_toks"),
        )
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training
# ---------------------------------------------------------------------------

_BPE_MERGES = 8
_BPE_EOW = "</w>"


def _bpe_pair_structs() -> F.Column:
    # built lazily: F.expr needs an active SparkContext at call time
    return F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) as l,"
        "            element_at(syms, i + 1) as r))"
    )


def _bpe_pair_rows(df, sign: int) -> "DataFrame":
    """Un-aggregated (l, r, n) adjacent-pair rows over a (cnt, syms)
    table, n = sign·cnt — raw input to a map-side-combined sum, so a
    caller can union several signed streams and pay ONE shuffle."""
    return (
        df.where(F.size("syms") >= 2)
        .select(
            (F.col("cnt") * F.lit(sign)).alias("n"),
            F.explode(_bpe_pair_structs()).alias("p"),
        )
        .select("p.l", "p.r", "n")
    )


def _bpe_pair_counts(df) -> "DataFrame":
    """(l, r, n) adjacent-pair corpus counts over a (cnt, syms) table —
    one map-side-combined aggregate."""
    return _bpe_pair_rows(df, 1).groupBy("l", "r").agg(F.sum("n").alias("n"))


def _bpe_merge_expr(a: str, b: str) -> F.Column:
    """Greedy left-to-right (a,b)→ab merge of the syms array — pure
    column fold, no Python."""
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merge_table_full(
    words, n_merges: int = _BPE_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Reference trainer: per iteration one FULL pair-count aggregate
    over the whole word table. Kept as the simple baseline the delta
    trainer is proven against (tests/test_selection.py); the production
    path is :func:`bpe_merge_table` below."""
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    cur = words.select(
        "cnt", F.concat(chars, F.array(F.lit(_BPE_EOW))).alias("syms")
    ).persist()
    cur.count()
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        best = (
            _bpe_pair_counts(cur)
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((step, a, b, a + b, n))
        nxt = cur.select("cnt", _bpe_merge_expr(a, b).alias("syms"))
        if (step + 1) % 8 == 0:
            # truncate lineage: an unpersist-triggered recompute of a
            # 64-deep nested fold projection StackOverflows the
            # executor (measured); checkpointing bounds the depth
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


_BPE_SEP = "\x1f"  # unit separator — never a corpus-token character


def _bpe_joined(syms: F.Column) -> F.Column:
    """Separator-wrapped flat form ``␟s1␟s2␟…␟sn␟`` of the syms array —
    maintained alongside it so the per-iteration adjacency scan is one
    JVM string ``contains`` instead of a zip_with/exists lambda over
    array slices (the lambda version made the vocab scan the delta
    trainer's bottleneck: profiled ~2× slower end-to-end at 2M vocab)."""
    return F.concat(
        F.lit(_BPE_SEP), F.array_join(syms, _BPE_SEP), F.lit(_BPE_SEP)
    )


def _bpe_has_pair(a: str, b: str) -> F.Column:
    """Does the word contain (a, b) ADJACENT? Exact test via the
    ``joined`` column: ``␟a␟b␟`` occurs in ``␟s1␟…␟sn␟`` iff some i has
    (syms[i], syms[i+1]) == (a, b) — separators delimit whole symbols,
    so no substring false positives (symbols cannot contain the
    separator; bpe_merge_table rejects such input at entry)."""
    return F.col("joined").contains(_BPE_SEP + a + _BPE_SEP + b + _BPE_SEP)


def bpe_merge_table(
    words, n_merges: int = _BPE_MERGES, compact_every: int = 16
) -> list[tuple[int, str, str, str, int]]:
    """Sennrich BPE trained distributed with DELTA updates of BOTH the
    pair-count table and the word table: ``words`` is (word, cnt) — the
    DISTINCT-word count table, which is the whole trick at corpus scale
    (Zipf: a 100 TB corpus has millions of distinct words, not
    billions, so iterations run over the vocab weighted by corpus
    counts, never over raw text).

    The HF-tokenizers optimization, distributed: after picking merge
    (a,b), only words containing ADJACENT (a,b) can change anything.
    The full-reaggregate baseline (:func:`bpe_merge_table_full`) pays
    an O(total pairs) explode+shuffle AND an O(vocab) cache rewrite
    every merge; measured head-to-head that rewrite dominates, so a
    delta that still rewrites the word table per step is NOT faster
    (0.67× at 187k vocab). This trainer therefore never rewrites
    unaffected words:

    - the word table is an immutable localCheckpoint-ed ``base`` plus a
      small ``overrides`` table holding only words rewritten since the
      last compaction; the current view is
      ``base ANTI-JOIN overrides.word ∪ overrides`` — the anti-join is
      broadcast (override keys are small by construction) so the view
      costs one map-side cached scan, zero shuffle, zero rewrite;
    - argmax comes from the persisted global pair table (count desc,
      pair asc tiebreak — one tiny TakeOrdered collect);
    - ``affected = view.where(has adjacent (a,b))`` is checkpointed —
      the iteration's ONE O(vocab) scan, and it is a plain string
      ``contains`` over a maintained separator-joined symbol column
      (an exact adjacency test; the zip_with/exists lambda it replaced
      was the measured bottleneck at 2M vocab); the pair table is
      patched in
      ONE small shuffle: union(old pairs, −cnt pair rows from affected,
      +cnt pair rows from merged affected) → map-side-combined
      groupBy(l, r).sum — no join (a full-outer join would cost two
      sort shuffles and can never broadcast); the merged pair's own old
      count nets out and the n>0 filter drops it;
    - every ``compact_every`` steps the view is materialized into a new
      ``base`` (bounding the broadcast key set and the anti-join
      chain), exactly like LSM compaction.

    Every iterative table is localCheckpoint-ed, never bare-persisted:
    a persist keeps the logical plan, so lineage either doubles per
    step (union-of-unions — driver OOM in explainString at step ~8,
    measured) or nests per step (64-deep fold projections StackOverflow
    the executor on an unpersist-triggered recompute, measured).
    Returns [(step, left, right, merged, pair_count)]; sequence
    bit-identical to :func:`bpe_merge_table_full` and the pure-python
    reference (tests/test_selection.py: 8 merges on the corpus, 64
    merges on a synthetic Zipf vocab; tools/bench_bpe.py A/Bs the two
    trainers at large vocab).
    """
    if words.where(F.col("word").contains(_BPE_SEP)).limit(1).count():
        raise ValueError(
            "bpe_merge_table: input words must not contain the \\x1f "
            "unit separator (reserved for the adjacency index)"
        )
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    syms0 = F.concat(chars, F.array(F.lit(_BPE_EOW)))
    base = words.select(
        "word",
        "cnt",
        syms0.alias("syms"),
        _bpe_joined(syms0).alias("joined"),
    ).localCheckpoint(eager=True)
    # every checkpointed table below is coalesced back to this width:
    # localCheckpoint PRESERVES partitioning and every union ADDS
    # partitions, so without the coalesce the partition count follows
    # p' = 2p + k — exponential task-count growth (measured: ~2× per
    # step until iterations took 30 s on 182 rows)
    n_parts = max(1, base._jdf.queryExecution().toRdd().getNumPartitions())
    pairs = _bpe_pair_counts(base).localCheckpoint(eager=True)
    overrides = None  # (word, cnt, syms) rewritten since last compaction
    merges: list[tuple[int, str, str, str, int]] = []

    def view_df():
        if overrides is None:
            return base
        return base.join(
            F.broadcast(overrides.select("word")), "word", "left_anti"
        ).unionByName(overrides)

    for step in range(n_merges):
        best = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not best or int(best[0]["n"]) <= 0:
            break
        a, b, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((step, a, b, a + b, n))
        affected = (
            view_df()
            .where(_bpe_has_pair(a, b))
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
        merged_syms = _bpe_merge_expr(a, b)
        new_ovr = affected.select(
            "word",
            "cnt",
            merged_syms.alias("syms"),
            _bpe_joined(merged_syms).alias("joined"),
        )
        pairs = (
            pairs.unionByName(_bpe_pair_rows(affected, -1))
            .unionByName(_bpe_pair_rows(new_ovr, 1))
            .groupBy("l", "r")
            .agg(F.sum("n").alias("n"))
            .where(F.col("n") > 0)
            .localCheckpoint(eager=True)
        )
        if overrides is None:
            overrides = new_ovr.coalesce(n_parts).localCheckpoint(eager=True)
        else:
            overrides = (
                overrides.join(
                    F.broadcast(affected.select("word")), "word", "left_anti"
                )
                .unionByName(new_ovr)
                .coalesce(n_parts)
                .localCheckpoint(eager=True)
            )
        if (step + 1) % compact_every == 0:
            base = view_df().coalesce(n_parts).localCheckpoint(eager=True)
            overrides = None
    return merges


@register("llm_bpe_merges", survey_refs=("A3", "X1"))
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges trained on the corpus — tokenizer training as
    a distributed pipeline (the HF-tokenizers count-merge loop,
    re-expressed as per-iteration Spark aggregates over the weighted
    DISTINCT-word table). Rows-only gate: the iterative driver-side
    argmax has no SQL mirror; tests/test_selection.py proves the merge
    sequence IDENTICAL to a pure-python Sennrich reference on the same
    word counts, including the (count desc, pair asc) tiebreak."""
    docs = load(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(_ws_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges = bpe_merge_table(words, _BPE_MERGES)
    return local_df(
        spark,
        merges,
        "step int, left string, right string, merged string,"
        " pair_count bigint",
    )


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained merge list to the DISTINCT-word table →
    ``(word, toks array<string>)`` — the tokenizer APPLY step, which at
    corpus scale is the dominant preprocessing op (every retained byte
    flows through it once per training run).

    Scale shape: encoding is done once per DISTINCT word (Zipf: a
    100 TB corpus has millions of distinct words, not trillions — the
    same asymmetry the trainer exploits), with the merge-rank dict
    shipped in the task closure (a full 32k-merge vocab is ~1 MB — the
    faiss-centroid pattern, not a join). Per-doc token streams are then
    a broadcast-joinable (word → toks) lookup away; corpus-level token
    statistics re-weight by word count with built-in aggregates and
    never touch Python again. The per-word loop is the HF-tokenizers
    algorithm: repeatedly merge the LOWEST-RANK adjacent pair, all
    occurrences left-to-right — proven in tests/test_selection.py to
    produce exactly the tokens of a Sennrich in-training-order replay
    (the two formulations are equivalent when ranks come from the
    greedy trainer: a merge can only create pairs whose rules were
    learned later, so the next applicable rule is always the lowest
    rank present). Words carry the trainer's ``</w>`` end-of-word
    marker — merges learned against it (word-final fusions) must see
    it at encode time too."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for w in pdf["word"]:
                syms = list(w) + [_BPE_EOW]
                while len(syms) > 1:
                    best_rank = None
                    for i in range(len(syms) - 1):
                        r = ranks.get((syms[i], syms[i + 1]))
                        if r is not None and (best_rank is None or r < best_rank):
                            best_rank = r
                    if best_rank is None:
                        break
                    left, right = merges[best_rank]
                    new: list[str] = []
                    i = 0
                    while i < len(syms):
                        if (
                            i < len(syms) - 1
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            new.append(left + right)
                            i += 2
                        else:
                            new.append(syms[i])
                            i += 1
                    syms = new
                out.append(syms)
            yield pd.DataFrame({"word": list(pdf["word"]), "toks": out})

    return words.select("word").mapInPandas(enc, "word string, toks array<string>")


@register("llm_bpe_encode", survey_refs=("A3", "T8"))
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the corpus-trained BPE: train the merge
    table (bpe_merge_table), encode each DISTINCT word once
    (bpe_encode_words), then the corpus token histogram — top 50
    (token, total) weighted by word frequency. Train + apply is the
    complete tokenizer lifecycle; the histogram is the artifact a
    data pipeline publishes with a tokenizer (vocab coverage, token
    fertility). Rows-only: the merge loop has no SQL mirror; encode
    parity, the concat invariant and full-histogram mass conservation
    are pytest gates (tests/test_selection.py)."""
    docs = load(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(_ws_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    words = words.persist()
    merges = bpe_merge_table(words, _BPE_MERGES)
    enc = bpe_encode_words(words, [(m[1], m[2]) for m in merges])
    out = (
        enc.join(words, "word")
        .select(F.explode("toks").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("total"))
        .orderBy(F.desc("total"), "token")
        .limit(50)
    )
    out = out.persist()
    out.count()
    words.unpersist()
    return out


#: pinned merge table for the oracle-checked encode twin: a FIXED
#: tokenizer applied at scale is the realistic production case (train
#: once, encode every corpus refresh); ranks are list order, cascades
#: included so multi-level merges exercise the lowest-rank-first rule
_PINNED_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"),
    ("t", "h"),
    ("th", "e</w>"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("and", "</w>"),
    ("o", "n"),
    ("e", "r"),
    ("er", "</w>"),
    ("o", "r"),
    ("s", "</w>"),
    ("t", "</w>"),
    ("a", "t"),
    ("s", "t"),
    ("r", "e"),
    ("in", "g"),
    ("ing", "</w>"),
    ("o", "u"),
    ("a", "r"),
    ("l", "l"),
    ("c", "h"),
    ("t", "o"),
    ("d", "</w>"),
]


def _bpe_apply_rounds(max_len: int, carry: str) -> str:
    """Shared SQL generator for the unrolled BPE APPLY chain (w0 →
    s{max_len-1}): per round, lowest-rank applicable rule via least()
    over contains() probes, applied with ⌈(max_len+1)/2⌉ stacked
    replaces (single-pass replace shares the boundary space between
    chained matches — property-pinned ≡ the engine list-walk). Every
    round AS MATERIALIZED (chained-CTE inlining goes exponential).
    ``carry`` = the non-state columns threaded through each round."""
    reps = (max_len + 2) // 2

    def rep_n(pat: str, rw: str) -> str:
        e = "state"
        for _ in range(reps):
            e = f"replace({e}, '{pat}', '{rw}')"
        return e

    probes = ",\n                 ".join(
        f"case when contains(state, ' {l} {r} ') then {i} end"
        for i, (l, r) in enumerate(_PINNED_BPE_MERGES)
    )
    cases = "\n                 ".join(
        f"when {i} then {rep_n(f' {l} {r} ', f' {l}{r} ')}"
        for i, (l, r) in enumerate(_PINNED_BPE_MERGES)
    )
    steps = []
    prev = "w0"
    for st in range(max_len):
        steps.append(
            f""",
      s{st} as materialized (
        select {carry},
               case least({probes})
                 {cases}
                 else state end as state
        from {prev}
      )"""
        )
        prev = f"s{st}"
    return "".join(steps)


def _bpe_pinned_oracle(max_len: int = 8, k_top: int = 50) -> str:
    """The BPE APPLY loop as exact SQL: words are capped at ``max_len``
    chars (+ the </w> marker = ≤ max_len+1 symbols), so the
    merge-until-fixpoint loop terminates in ≤ max_len rounds — unroll
    exactly that many. Each round finds the LOWEST-RANK applicable rule
    (least over contains() probes against the space-sentineled symbol
    string) and applies it to all occurrences: plain replace() is
    single-pass left-to-right and a chained run like ``a b a b`` shares
    the boundary space between adjacent matches, so one pass catches
    only the first of a chain — ⌈(max_len+1)/2⌉ stacked replaces reach
    the fixpoint for one rule (proven equal to the production
    list-walk in tests). Every round is AS MATERIALIZED — DuckDB
    inlines chained CTEs by default and the 8-round chain would expand
    exponentially (the unigram-viterbi lesson)."""
    steps_sql = _bpe_apply_rounds(max_len, "word, cnt")
    prev = f"s{max_len - 1}"
    return f"""
      with words as materialized (
        select word, count(*) as cnt from (
          select unnest({_SQL_TOKS}) as word from documents)
        where regexp_matches(word, '^[a-z]{{1,{max_len}}}$')
        group by word
      ),
      w0 as materialized (
        select word, cnt,
               ' ' || array_to_string(
                 list_transform(range(length(word)), i -> word[i+1]),
                 ' ') || ' </w> ' as state
        from words
      ){steps_sql}
      select token, cast(sum(cnt) as bigint) as total
      from (
        select unnest(list_filter(string_split(state, ' '),
                                  x -> x <> '')) as token,
               cnt
        from {prev})
      group by token
      order by total desc, token
      limit {k_top}
    """


def _bpe_train_oracle(
    max_len: int = 8, n_merges: int = 8
) -> str:
    """The Sennrich TRAINER as exact SQL — count-argmax-merge unrolled
    ``n_merges`` rounds. Everything in a BPE training round is integer
    arithmetic: adjacent-pair counts are exact sums of word counts
    (overlapping occurrences each count, mirroring the engine's
    per-index pair rows), the argmax tiebreak is (count desc, l, r) on
    exact values, and the merge application is the same
    stacked-replace fixpoint the encode twin proved equal to the
    production list-walk. Restricting words to [a-z]{1,max_len} bounds
    the symbol strings so the unroll depth is static. Every CTE is AS
    MATERIALIZED (chained-CTE inlining would go exponential)."""
    reps = (max_len + 2) // 2

    def rep_n() -> str:
        e = "w.state"
        pat = "' ' || b.l || ' ' || b.r || ' '"
        rw = "' ' || b.l || b.r || ' '"
        for _ in range(reps):
            e = f"replace({e}, {pat}, {rw})"
        return e

    rounds = []
    for i in range(n_merges):
        rounds.append(
            f""",
      p{i} as materialized (
        select u.pr[1] as l, u.pr[2] as r, sum(cnt) as n
        from (
          select cnt,
                 unnest(list_transform(range(len(tk) - 1),
                        j -> [tk[j+1], tk[j+2]])) as pr
          from (
            select cnt,
                   list_filter(string_split(state, ' '),
                               x -> x <> '') as tk
            from s{i})
        ) u
        group by 1, 2
      ),
      b{i} as materialized (
        select l, r, n from p{i} order by n desc, l, r limit 1
      ),
      s{i + 1} as materialized (
        select w.word, w.cnt, {rep_n()} as state
        from s{i} w cross join b{i} b
      )"""
        )
    rounds_sql = "".join(rounds)
    finals = "\n        union all ".join(
        f"select {i} as step, l as \"left\", r as \"right\","
        f" l || r as merged, cast(n as bigint) as pair_count from b{i}"
        for i in range(n_merges)
    )
    return f"""
      with words as materialized (
        select word, count(*) as cnt from (
          select unnest({_SQL_TOKS}) as word from documents)
        where regexp_matches(word, '^[a-z]{{1,{max_len}}}$')
        group by word
      ),
      s0 as materialized (
        select word, cnt,
               ' ' || array_to_string(
                 list_transform(range(length(word)), i -> word[i+1]),
                 ' ') || ' </w> ' as state
        from words
      ){rounds_sql}
      select * from (
        {finals}
      ) order by step
    """


@register(
    "llm_bpe_merges_restricted",
    oracle=_bpe_train_oracle(),
    survey_refs=("A3", "X1", "U2"),
)
def llm_bpe_merges_restricted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING through the DuckDB gate — the oracle-checked twin
    of llm_bpe_merges, running the PRODUCTION delta trainer
    (bpe_merge_table: LSM-style base+overrides word table, delta pair
    patches, (count desc, pair asc) argmax) on the [a-z]{1,8}
    sub-vocabulary. The domain restriction is what makes the twin
    possible: bounded words give a static unroll depth, so the oracle
    can replay all 8 count→argmax→merge rounds as materialized SQL —
    adjacent-pair counts are exact integer sums (overlapping
    occurrences included, matching the engine's per-index pair rows),
    and merge application reuses the stacked-replace fixpoint the
    encode twin's property test pinned against the list-walk. A hash
    match externalizes the ENTIRE training loop: tokenization,
    weighted pair counting, the tiebreak, delta maintenance (the
    engine side), and cascade merges. The unrestricted production
    variant stays rows-only with its pure-python Sennrich parity test
    (tests/test_selection.py)."""
    docs = load(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(_ws_tokens("text")).alias("word"))
        .where(F.col("word").rlike("^[a-z]{1,8}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges = bpe_merge_table(words, _BPE_MERGES)
    return local_df(
        spark,
        merges,
        "step int, left string, right string, merged string,"
        " pair_count bigint",
    )


@register(
    "llm_bpe_encode_pinned",
    oracle=_bpe_pinned_oracle(),
    survey_refs=("A3", "T8", "U2"),
)
def llm_bpe_encode_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY through the DuckDB gate — the oracle-checked
    twin of llm_bpe_encode (which keeps the corpus-TRAINED merge table
    as the production variant; training's iterated argmax has no SQL
    mirror, but applying a FIXED tokenizer is the dominant real
    workload anyway — train once, encode every refresh). The twin runs
    the PRODUCTION encoder verbatim (bpe_encode_words: lowest-rank
    adjacent pair, all occurrences left-to-right, </w> marker) over
    the distinct [a-z]{1,8} words with the pinned 24-rule merge table,
    then publishes the corpus-weighted top-50 token histogram. The
    oracle unrolls merge-until-fixpoint as 8 materialized SQL rounds
    over a space-sentineled symbol string. Externalizes: tokenization,
    the merge loop's rank discipline, cascade merges (th+e</w>→the</w>),
    the Zipf distinct-word asymmetry, and exact integer reweighting."""
    docs = load(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(_ws_tokens("text")).alias("word"))
        .where(F.col("word").rlike("^[a-z]{1,8}$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    words = words.persist()
    enc = bpe_encode_words(words, _PINNED_BPE_MERGES)
    out = (
        enc.join(words, "word")
        .select(F.explode("toks").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("total"))
        .orderBy(F.desc("total"), "token")
        .limit(50)
    )
    out = out.persist()
    out.count()
    words.unpersist()
    return out


def _bpe_fertility_oracle(max_len: int = 8) -> str:
    """Tokenizer fertility per language: the pinned-BPE encode chain
    runs once per DISTINCT word (the Zipf asymmetry), then per-(lang,
    word) corpus counts reweight piece counts into lang-level totals.
    Fertility (tokens per word) is emitted as exact integer micros —
    (Σ cnt·pieces · 1e6) div Σ cnt — no float division on either
    side."""
    rounds = _bpe_apply_rounds(max_len, "word")
    return f"""
      with wl as materialized (
        select lang, word, count(*) as cnt from (
          select lang, unnest({_SQL_TOKS}) as word from documents)
        where regexp_matches(word, '^[a-z]{{1,{max_len}}}$')
        group by lang, word
      ),
      w0 as materialized (
        select word,
               ' ' || array_to_string(
                 list_transform(range(length(word)), i -> word[i+1]),
                 ' ') || ' </w> ' as state
        from (select distinct word from wl)
      ){rounds},
      pieces as (
        select word,
               len(list_filter(string_split(state, ' '),
                               x -> x <> '')) as np
        from s{max_len - 1}
      )
      select lang,
             cast(sum(cnt) as bigint) as n_words,
             cast(sum(cnt * np) as bigint) as n_tokens,
             cast((sum(cnt * np) * 1000000) // sum(cnt) as bigint)
               as fertility_micro
      from wl join pieces using (word)
      group by lang
      order by lang
    """


@register(
    "llm_tokenizer_fertility",
    oracle=_bpe_fertility_oracle(),
    survey_refs=("A3", "T8"),
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report — the per-language diagnostic a
    training pipeline publishes with a tokenizer (high fertility on a
    language = its text costs more sequence length per word, the
    classic multilingual-tokenizer equity metric): encode each DISTINCT
    [a-z]{1,8} word once with the pinned 24-rule BPE (the production
    encoder), reweight piece counts by per-(lang, word) corpus
    frequency, and emit words / tokens / fertility-in-integer-micros
    per language. Fertility is (Σ cnt·pieces · 1e6) div Σ cnt — exact
    integer arithmetic, no float division, so the whole report rides
    the hash gate on the back of the encode twin's oracle chain.

    100 TB: encode cost ∝ distinct vocab (Zipf), the reweight is one
    broadcast-sized join of (word → n_pieces) onto the (lang, word)
    count table, and the rollup shuffles |langs| rows."""
    docs = load(spark, "documents", sf_dir)
    wl = (
        docs.select("lang", F.explode(_ws_tokens("text")).alias("word"))
        .where(F.col("word").rlike("^[a-z]{1,8}$"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wl = wl.persist()
    enc = bpe_encode_words(
        wl.select("word").distinct(), _PINNED_BPE_MERGES
    ).select("word", F.size("toks").alias("np"))
    out = (
        wl.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("np"))
            .cast("bigint")
            .alias("n_tokens"),
            F.expr("(sum(cnt * np) * 1000000) div sum(cnt)")
            .cast("bigint")
            .alias("fertility_micro"),
        )
        .orderBy("lang")
    )
    out = out.persist()
    out.count()
    wl.unpersist()
    return out


_UNIGRAM_VOCAB = 200
_UNIGRAM_SEED = 1500


@register("llm_unigram_train", survey_refs=("A3", "X1"))
def llm_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer trained on the corpus
    (operators/unigram.py): seed substrings → distributed
    forward-backward EM over the distinct-word table → frequency
    pruning to the target vocab. Returns (piece, count_micro,
    logprob_micro) — the published model artifact. Rows-only gate
    like the BPE trainer (iterative EM has no SQL mirror);
    tests/test_unigram.py proves the distributed trainer BIT-IDENTICAL
    to a sequential replay (expected counts quantized to integer
    millionths make the EM aggregation associative), plus char-closure
    and segmentability properties."""
    from etl_migrate_api_spark.operators.unigram import train_unigram

    docs = load(spark, "documents", sf_dir)
    rows = train_unigram(
        docs, vocab_size=_UNIGRAM_VOCAB, seed_size=_UNIGRAM_SEED
    )
    return local_df(
        spark, rows, "piece string, count_micro bigint, logprob_micro bigint"
    )


@register("llm_unigram_encode", survey_refs=("A3", "T8"))
def llm_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram model, then Viterbi-encode the corpus (once
    per DISTINCT word, model in the task closure) → top-50 corpus
    token histogram weighted by word frequency — the same
    train-then-apply lifecycle as llm_bpe_encode, on the second
    tokenizer family. Rows-only; encode determinism, the concat
    invariant and mass conservation are pytest gates."""
    from etl_migrate_api_spark.operators.unigram import (
        encode_corpus,
        train_unigram,
    )

    docs = load(spark, "documents", sf_dir)
    model = train_unigram(
        docs, vocab_size=_UNIGRAM_VOCAB, seed_size=_UNIGRAM_SEED
    )
    return (
        encode_corpus(docs, model)
        .orderBy(F.desc("n_tokens"), "piece")
        .limit(50)
    )


_VIT_MAX_WORD = 8  # DP unroll bound (and the oracle's CTE count)
_VIT_MAX_PIECE = 3
_VIT_MULTIS = 40  # multi-char vocab size (chars are always kept)


def _unigram_viterbi_oracle() -> str:
    """The Viterbi DP fully unrolled as SQL (r8 verdict #6b): with a
    PINNED vocab (every single char + the top-40 length-2..3
    substrings by weighted count — pure integer counting both engines
    replay) and INTEGER-MICRO log-probs, best-segmentation scores are
    exact bigint sums, so the cross-engine float-summation trap cannot
    bite. One CTE per position i=1..8 carries (best score, argmax
    backpointer) with the engine's tie rule — (score desc, split asc),
    the 'earliest split on exact ties' of operators/unigram.py::
    viterbi_encode — then an unrolled 8-step backpointer walk emits
    the pieces. ln() is the only non-correctly-rounded op; it is
    evaluated once per vocab entry and immediately micro-quantized,
    same as the DSIR/PageRank rules in this module's header."""
    n, ml = _VIT_MAX_WORD, _VIT_MAX_PIECE
    parts = [
        f"""
      docs_w as materialized (
        select unnest(regexp_extract_all(lower(text), '[a-z]+')) as word
        from documents
      ),
      w as materialized (
        select word, cast(count(*) as bigint) as cnt from docs_w
        where len(word) between 1 and {n}
        group by word
      ),
      chars as materialized (
        select substr(word, i, 1) as piece, cast(sum(cnt) as bigint) as c
        from w cross join range(1, {n + 1}) r(i)
        where i <= len(word)
        group by 1
      ),
      multis as materialized (
        select piece, c from (
          select substr(word, i, l) as piece, cast(sum(cnt) as bigint) as c
          from w
          cross join range(1, {n + 1}) r(i)
          cross join range(2, {ml + 1}) rl(l)
          where i + l - 1 <= len(word)
          group by 1)
        order by c desc, piece limit {_VIT_MULTIS}
      ),
      vocab0 as materialized (
        select piece, c from chars union all select piece, c from multis
      ),
      tot as (select sum(c) as t from vocab0),
      v as materialized (
        select piece,
               cast(round(ln(c / t) * 1000000) as bigint) as lpm
        from vocab0, tot
      ),
      b0 as materialized (select word, cast(0 as bigint) as best from w)"""
    ]
    for i in range(1, n + 1):
        cands = " union all ".join(
            f"""
          select b{j}.word, b{j}.best + v.lpm as best, {j} as j, v.piece
          from b{j} join v on v.piece = substr(b{j}.word, {j + 1}, {i - j})
          where len(b{j}.word) >= {i}"""
            for j in range(max(0, i - ml), i)
        )
        parts.append(
            f"""
      b{i} as materialized (
        select word, best, j, piece from (
          select word, best, j, piece,
                 row_number() over (partition by word
                                    order by best desc, j asc) as rn
          from ({cands}) c{i})
        where rn = 1
      )"""
        )
    backs = " union all ".join(
        f"select word, {i} as i, j, piece from b{i}" for i in range(1, n + 1)
    )
    parts.append(f"""
      backs as materialized ({backs}),
      t0 as materialized (select word, cnt, cast(len(word) as int) as pos from w)""")
    for s in range(1, n + 1):
        parts.append(f"""
      t{s} as materialized (
        select t{s - 1}.word, t{s - 1}.cnt, b.j as pos, b.piece
        from t{s - 1} join backs b
          on b.word = t{s - 1}.word and b.i = t{s - 1}.pos
        where t{s - 1}.pos > 0
      )""")
    pieces = " union all ".join(
        f"select piece, cnt from t{s}" for s in range(1, n + 1)
    )
    return (
        "with "
        + ",".join(parts)
        + f""",
      pieces as materialized ({pieces})
      select piece, cast(sum(cnt) as bigint) as n_tokens
      from pieces group by piece
      order by n_tokens desc, piece limit 50"""
    )


@register(
    "llm_unigram_viterbi",
    oracle=_unigram_viterbi_oracle(),
    survey_refs=("A3", "T8"),
)
def llm_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi segmentation through the driver's DuckDB gate — the
    oracle-checked twin of llm_unigram_encode (which keeps the full
    EM-trained model and stays rows-only): the vocab is PINNED by pure
    counting (every single char of the [a-z]+, ≤8-char word table +
    the top-40 length-2..3 substrings by weighted occurrence count —
    ~66 entries, a bounded driver constant), log-probs are integer
    micros (round(ln(count/total)·1e6), computed driver-side with the
    same libm DuckDB links), and the DP runs on EXACT integer-valued
    doubles inside the production encoder
    (operators/unigram.py::viterbi_encode — sums ≤ 2·10⁸ ≪ 2⁵³, so
    comparisons and the earliest-split tie rule are bit-identical to
    the oracle's bigint DP). Output: the corpus piece histogram
    (top-50 by count desc, piece). One Viterbi per DISTINCT word — the
    Zipf-bounded table, never the corpus — and the vocab/count stages
    are plain integer aggregations; at 100 TB this is the
    apply-a-tokenizer shape: scan-level word counting plus a
    broadcast-constant model."""
    import pandas as pd

    from etl_migrate_api_spark.operators.unigram import viterbi_encode

    ml = _VIT_MAX_PIECE
    w, micro = _pinned_unigram_vocab(spark, sf_dir)
    # integer-VALUED floats: viterbi_encode only adds and compares, so
    # the micro scale makes every DP sum exact (≤2·10⁸ ≪ 2⁵³)
    lp = {p: float(m) for p, m in micro.items()}

    def gen(batches):
        for pdf in batches:
            out_p: list[str] = []
            out_n: list[int] = []
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                for p in viterbi_encode(str(word), lp, ml):
                    out_p.append(p)
                    out_n.append(int(cnt))
            if out_p:
                yield pd.DataFrame({"piece": out_p, "n": out_n})

    return (
        w.mapInPandas(gen, schema="piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), "piece")
        .limit(50)
    )


def _pinned_unigram_vocab(
    spark: SparkSession, sf_dir: str
) -> "tuple[DataFrame, dict[str, int]]":
    """Shared vocab pinning for the two gated unigram-APPLY queries
    (llm_unigram_viterbi and llm_unigram_encode_pinned): the restricted
    ``(word, cnt)`` table ([a-z]{1,8} lowercase words) and the pinned
    integer-micro log-prob model (every single char + the top-40
    length-2..3 substrings by weighted count; round(ln(c/t)·1e6)
    HALF_UP — the same libm ln DuckDB links, quantized immediately)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    n, ml = _VIT_MAX_WORD, _VIT_MAX_PIECE
    docs = load(spark, "documents", sf_dir)
    w = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .where(F.length("word").between(1, n))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    chars = (
        w.select(
            "word",
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        )
        .select(F.expr("substring(word, i, 1)").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    multi_parts = [
        w.where(F.length("word") >= L)
        .select(
            "word",
            "cnt",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - L + 1)
            ).alias("i"),
            F.lit(L).alias("l"),
        )
        .select(F.expr("substring(word, i, l)").alias("piece"), "cnt")
        for L in range(2, ml + 1)
    ]
    mu = multi_parts[0]
    for p in multi_parts[1:]:
        mu = mu.unionByName(p)
    multis = (
        mu.groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
        .orderBy(F.desc("c"), "piece")
        .limit(_VIT_MULTIS)
    )
    vocab = [
        (r["piece"], int(r["c"]))
        for r in chars.unionByName(multis).collect()
    ]
    total = sum(c for _, c in vocab)
    # micro-quantized driver-side: HALF_UP == both engines' round();
    # glibc ln on both sides (DuckDB links the same libm as CPython)
    micro = {
        p: int(
            Decimal(math.log(c / total) * 1e6).quantize(
                Decimal(1), ROUND_HALF_UP
            )
        )
        for p, c in vocab
    }
    return w, micro


@register(
    "llm_unigram_encode_pinned",
    oracle=_unigram_viterbi_oracle(),
    survey_refs=("A3", "T8"),
)
def llm_unigram_encode_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION unigram APPLY path (encode_corpus: model_rows →
    broadcast dict → viterbi per distinct word → weighted histogram)
    through the DuckDB gate, under the same pinned integer-micro vocab
    as llm_unigram_viterbi — whose oracle it shares VERBATIM, so a
    hash match proves the production encoder's fold (word_counts
    shape, model-dict plumbing, viterbi_encode, the groupBy-sum join
    back) is bit-identical to the bespoke gen the viterbi twin runs.
    With llm_unigram_train_restricted this closes the r10 verdict's
    'apply joins train in the gated set' item: both halves of the
    unigram lifecycle now have production-path external evidence.
    Exactness trick: encode_corpus divides the model's logprob_micro
    field by 1e6, so the twin passes micro·1e6 — the division is exact
    (m·1e6 ≤ 2e13 ≪ 2⁵³, true quotient representable), leaving
    integer-VALUED doubles in the DP; Viterbi argmax is scale-
    invariant, so the ×1e6 representation changes no segmentation."""
    from etl_migrate_api_spark.operators.unigram import MICRO, encode_corpus

    docs = load(spark, "documents", sf_dir)
    w, micro = _pinned_unigram_vocab(spark, sf_dir)
    model_rows = [(p, 1, m * MICRO) for p, m in micro.items()]
    return (
        encode_corpus(
            docs,
            model_rows,
            max_len=_VIT_MAX_PIECE,
            words=w.select("word", F.col("cnt").alias("n")),
        )
        .select("piece", F.col("n_tokens").cast("bigint").alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), "piece")
        .limit(50)
    )


_UTR_MAX_WORD = 4  # restricted-trainer word bound (static path unroll)
_UTR_MULTIS = 12  # multi-char pieces kept by the one prune round
_UTR_PATTERNS: dict[int, tuple[tuple[int, ...], ...]] = {
    1: ((1,),),
    2: ((1, 1), (2,)),
    3: ((1, 1, 1), (1, 2), (2, 1)),
    4: ((1, 1, 1, 1), (1, 1, 2), (1, 2, 1), (2, 1, 1), (2, 2)),
}  # must stay identical to operators/unigram.py::_R_PATTERNS


def _utr_paths_sql(model: str, tag: str) -> str:
    """Per-round valid-segmentation CTE: one SELECT per (word length,
    pattern), INNER-joining each positional piece against the round's
    model — paths with a pruned piece drop out exactly like the
    engine's lpm.get() miss. Scores are bigint sums of integer-micro
    log-probs (exact, association-free)."""
    sels = []
    for n, pats in _UTR_PATTERNS.items():
        for pid, pat in enumerate(pats):
            joins, terms = [], []
            pos = 1
            for idx, ln in enumerate(pat):
                al = f"v{idx}"
                joins.append(
                    f"join {model} {al} on {al}.piece ="
                    f" substr(w.word, {pos}, {ln})"
                )
                terms.append(f"{al}.lpm")
                pos += ln
            sels.append(
                f"""
        select w.word, w.cnt, {pid} as pid, {' + '.join(terms)} as s
        from w {' '.join(joins)}
        where len(w.word) = {n}"""
            )
    return f"""
      paths{tag} as materialized ({' union all '.join(sels)})"""


def _utr_estep_sql(model: str, tag: str) -> str:
    """One E-step as SQL: per-word max-shifted integer path weights
    w_i = round_even(exp((s_i−mx)/1e6)·1e12), order-free bigint
    numerator/denominator sums over the static piece-position table
    ``pp``, and the production per-word quantization
    round_even(num/den · cnt · 1e6) — every float op replayed on
    identical doubles in the engine (operators/unigram.py::
    _restricted_posteriors)."""
    return f"""{_utr_paths_sql(model, tag)},
      best{tag} as materialized (
        select word, max(s) as mx from paths{tag} group by word
      ),
      wts{tag} as materialized (
        select p.word, p.cnt, p.pid, p.s,
               cast(round_even(exp(cast(p.s - b.mx as double) / 1000000.0)
                               * 1000000000000.0, 0) as bigint) as wgt
        from paths{tag} p join best{tag} b using (word)
      ),
      den{tag} as materialized (
        select word, cast(sum(wgt) as bigint) as den
        from wts{tag} group by word
      ),
      num{tag} as materialized (
        select t.word, pc.piece, cast(sum(t.wgt) as bigint) as num
        from wts{tag} t
        join pp pc on pc.word = t.word and pc.pid = t.pid
        group by 1, 2
      ),
      e{tag} as materialized (
        select nm.piece,
               cast(sum(cast(round_even(
                 cast(nm.num as double) / cast(d.den as double)
                 * t.cnt * 1000000.0, 0) as bigint)) as bigint) as c
        from num{tag} nm
        join den{tag} d using (word)
        join w t using (word)
        group by 1
        having sum(cast(round_even(
                 cast(nm.num as double) / cast(d.den as double)
                 * t.cnt * 1000000.0, 0) as bigint)) > 0
      )"""


def _utr_mstep_sql(counts: str, tag: str) -> str:
    """One integer-micro M-step as SQL: char-floored counts (full join
    against the char closure), bigint total, and
    lpm = round_even((ln(c)−ln(t))·1e6) — the engine's _m_step_micro
    verbatim (one ln per vocab entry, quantized immediately)."""
    return f"""
      f{tag} as materialized (
        select coalesce(e.piece, c.piece) as piece,
               case when len(coalesce(e.piece, c.piece)) = 1
                    then greatest(coalesce(e.c, 0), 1)
                    else e.c end as c
        from {counts} e full join chars c on c.piece = e.piece
      ),
      t{tag} as (select cast(sum(c) as bigint) as t from f{tag}),
      m{tag} as materialized (
        select piece,
               cast(round_even((ln(cast(c as double))
                                - ln(cast(t as double)))
                               * 1000000.0, 0) as bigint) as lpm
        from f{tag}, t{tag} where c > 0
      )"""


def _unigram_train_restricted_oracle() -> str:
    """The unigram EM TRAINER unrolled as exact SQL (r10 verdict #2 —
    the llm_bpe_merges_restricted recipe applied to the second
    tokenizer family): seed-substring counts → E → M → loss-prune to
    |chars|+{n} multis → M → E → M → final model. The [a-z]{{1,4}}
    word domain with 1–2-char pieces gives ≤5 segmentations per word,
    so the lattice enumerates as a static pattern table; integer-micro
    models make every DP score a bigint; max-shifted integer path
    weights make the posterior sums order-free; and losses subtract
    with no rounding at all. Every CTE is AS MATERIALIZED (chained-CTE
    inlining goes exponential — the unigram-viterbi lesson)."""
    n, nm = _UTR_MAX_WORD, _UTR_MULTIS
    pp_sels = []
    for wl, pats in _UTR_PATTERNS.items():
        for pid, pat in enumerate(pats):
            pos = 1
            for ln in pat:
                pp_sels.append(
                    f"select word, {pid} as pid,"
                    f" substr(word, {pos}, {ln}) as piece"
                    f" from w where len(word) = {wl}"
                )
                pos += ln
    return f"""
      with docs_w as materialized (
        select unnest(regexp_extract_all(lower(text), '[a-z]+')) as word
        from documents
      ),
      w as materialized (
        select word, cast(count(*) as bigint) as cnt from docs_w
        where len(word) between 1 and {n}
        group by word
      ),
      pp as materialized ({' union all '.join(pp_sels)}),
      seed as materialized (
        select substr(word, i, l) as piece,
               cast(sum(cnt) as bigint) * 1000000 as c
        from w
        cross join range(1, {n + 1}) r(i)
        cross join range(1, 3) rl(l)
        where i + l - 1 <= len(word)
        group by 1
      ),
      chars as materialized (
        select piece from seed where len(piece) = 1
      ),{_utr_mstep_sql('seed', '0')},{_utr_estep_sql('m0', '1')},
      {_utr_mstep_sql('e1', '1')},{_utr_paths_sql('m1', 'L')},
      bestrow as materialized (
        select word, pid, s from (
          select word, pid, s,
                 row_number() over (partition by word
                                    order by s desc, pid) as rn
          from pathsL)
        where rn = 1
      ),
      bp as materialized (
        select distinct b.word, pc.piece
        from bestrow b
        join pp pc on pc.word = b.word and pc.pid = b.pid
        where len(pc.piece) = 2
      ),
      s2 as materialized (
        select bp.word, bp.piece, max(p2.s) as s2
        from bp join pathsL p2 on p2.word = bp.word
        where not exists (
          select 1 from pp x
          where x.word = p2.word and x.pid = p2.pid
            and x.piece = bp.piece)
        group by 1, 2
      ),
      loss as materialized (
        select s2.piece,
               cast(sum((b.s - s2.s2) * t.cnt) as bigint) as loss
        from s2
        join bestrow b using (word)
        join w t using (word)
        group by 1
        having sum((b.s - s2.s2) * t.cnt) > 0
      ),
      c1p as materialized (
        select piece, c from (
          select e.piece, e.c,
                 row_number() over (
                   order by coalesce(l.loss, 0) desc, e.piece) as rn
          from e1 e left join loss l using (piece)
          where len(e.piece) = 2)
        where rn <= {nm}
        union all
        select c.piece, coalesce(e.c, 1) as c
        from chars c left join e1 e on e.piece = c.piece
      ),{_utr_mstep_sql('c1p', '2')},{_utr_estep_sql('m2', '3')},
      {_utr_mstep_sql('e3', '3f')}
      select f.piece, cast(f.c as bigint) as count_micro,
             m.lpm as logprob_micro
      from f3f f join m3f m using (piece)
      order by count_micro desc, piece
    """


@register(
    "llm_unigram_train_restricted",
    oracle=_unigram_train_restricted_oracle(),
    survey_refs=("A3", "X1"),
)
def llm_unigram_train_restricted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram-LM TRAINING through the DuckDB gate — the oracle-checked
    twin of llm_unigram_train, closing the last tokenizer-training gap
    the way llm_bpe_merges_restricted closed BPE's: the [a-z]{1,4}
    word domain with 1–2-char pieces bounds the lattice at ≤5
    enumerable segmentations per word, so the full EM schedule — seed
    substrings, a distributed E-step with max-shifted integer path
    weights, the integer-micro M-step, SentencePiece's likelihood-loss
    prune (production _prune_by_loss, called verbatim), a post-prune
    re-estimate — replays as static materialized SQL. A hash match on
    (piece, count_micro, logprob_micro) externalizes the whole
    training loop: seeding, posterior expectation + quantization,
    renormalization, the Viterbi loss signal with its (score desc,
    earliest pattern) tie rule, prune ranking, and char-closure
    flooring. The unrestricted production trainer stays rows-only with
    its bit-reproducibility parity suite (tests/test_unigram.py);
    engine/oracle float parity rests on the proven primitives — libm
    ln/exp on identical doubles, round ≡ round_even (half-to-even),
    exact int→double conversion below 2⁵³."""
    from etl_migrate_api_spark.operators.unigram import (
        train_unigram_restricted,
    )

    docs = load(spark, "documents", sf_dir)
    w = (
        docs.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .where(F.length("word").between(1, _UTR_MAX_WORD))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = train_unigram_restricted(w, n_multis=_UTR_MULTIS)
    return local_df(
        spark, rows, "piece string, count_micro bigint, logprob_micro bigint"
    )


# ---------------------------------------------------------------------------
# Selection-pipeline capstone: gate → DSIR score → per-lang quota → shards
# ---------------------------------------------------------------------------

_SEL_MIN_CHARS = 100
_SEL_QUOTA = 20  # per-language keep count


@register(
    "llm_selection_pipeline",
    oracle=f"""
      with {{chain}}
      , ranked as (
        select doc_id, lang, w,
               row_number() over (partition by lang
                                  order by w desc, doc_id) as rnk
        from scored
      ),
      kept as (
        select doc_id, lang, w, {_H_SQL} as h
        from ranked where rnk <= {_SEL_QUOTA}
      )
      select lang, cast(doc_id as bigint) as doc_id,
             cast(w as double) as weight,
             {_SHARD_SQL} as shard,
             {_POS_SQL} as pos
      from kept
    """.format(
        chain=_dsir_scored_sql(
            f"select * from documents where n_chars >= {_SEL_MIN_CHARS}"
        )
    ),
    survey_refs=("F2", "W2", "A3", "J2"),
)
def llm_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection-family capstone — the mirror of
    llm_curation_pipeline for the 'which docs, in what order' layer:

      1. GATE: length filter (n_chars ≥ 100) applied at scan level —
         cheapest first, and it shrinks everything downstream.
      2. SCORE: DSIR hashed-bigram log-likelihood ratios over the
         SURVIVOR set only (the shared _dsir_scored core — statistics
         reflect the gated corpus, as the paper prescribes).
      3. QUOTA: top-20 per language by weight (windowed rank with the
         deterministic doc_id tiebreak) — the mixture step.
      4. SHARD: md5 shard + per-shard position (the shared global-
         shuffle salt) — ready to write as training shards.

    Every stage is the already-oracled primitive; the capstone pins
    their COMPOSITION end-to-end with one DuckDB twin (the CTE chain is
    generated by the same _dsir_scored_sql the standalone query uses,
    so the two oracles cannot drift). 100 TB shape: gate fuses into the
    scan; scoring is the DSIR broadcast plan over survivors; quota is
    one per-lang window; shard assignment re-partitions only the ~20 ×
    |langs| kept rows."""
    docs = load(spark, "documents", sf_dir).where(
        F.col("n_chars") >= _SEL_MIN_CHARS
    )
    scored = _dsir_scored(docs)
    w_rank = Window.partitionBy("lang").orderBy(
        F.col("w").desc(), F.col("doc_id")
    )
    kept = (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= _SEL_QUOTA)
        .select(
            "lang", "doc_id", F.col("w").cast("double").alias("weight")
        )
    )
    return _with_shard_pos(kept, "lang", "weight")


@register(
    "graph_triangle_count",
    oracle=f"""
      with links as (
        select doc_id % {_PR_HOSTS} as x,
               (7 * doc_id + 3) % {_PR_HOSTS} as y
        from documents
      ),
      undirected as (
        select distinct least(x, y) as a, greatest(x, y) as b
        from links where x <> y
      ),
      tri as (
        select e1.a as h1, e1.b as h2, e2.b as h3
        from undirected e1
        join undirected e2 on e2.a = e1.b
        join undirected e3 on e3.a = e1.a and e3.b = e2.b
      ),
      per_host as (
        select host, cast(count(*) as bigint) as n_triangles from (
          select h1 as host from tri
          union all select h2 from tri
          union all select h3 from tri
        ) group by host
      )
      select cast(host as bigint) as host, n_triangles from per_host
    """,
    survey_refs=("J2", "A3", "E1"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle count over the planted host graph — the classic
    distributed graph-analytics benchmark, and the third graph operator
    next to label-propagation clustering and PageRank. The canonical
    a<b<c enumeration: orient every undirected edge low→high, join
    wedge (a,b)+(b,c), close it against (a,c) — each triangle is found
    exactly ONCE, then credited to its three corners. All-integer
    (engine-exact by construction).

    100 TB shape: the oriented-edge trick is also the scale trick
    (node-iterator++): orienting low→high bounds every join key's
    fan-out by the smaller endpoint's degree, which kills the
    hub-vertex quadratic blowup of the naive wedge join; the three
    self-joins shuffle on single int keys and AQE handles residual
    skew. Per-host credit is one union-all + hash aggregate."""
    docs = load(spark, "documents", sf_dir)
    links = docs.select(
        (F.col("doc_id") % _PR_HOSTS).alias("x"),
        ((7 * F.col("doc_id") + 3) % _PR_HOSTS).alias("y"),
    ).where(F.col("x") != F.col("y"))
    und = links.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).distinct()
    e1 = und.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    e2 = und.select(F.col("a").alias("w_a"), F.col("b").alias("w_b"))
    e3 = und.select(F.col("a").alias("c_a"), F.col("b").alias("c_b"))
    tri = (
        e1.join(e2, e1.t_b == e2.w_a)
        .join(e3, (F.col("c_a") == F.col("t_a")) & (F.col("c_b") == F.col("w_b")))
        .select(
            F.col("t_a").alias("h1"),
            F.col("t_b").alias("h2"),
            F.col("w_b").alias("h3"),
        )
    )
    corners = (
        tri.select(F.col("h1").alias("host"))
        .unionAll(tri.select(F.col("h2").alias("host")))
        .unionAll(tri.select(F.col("h3").alias("host")))
    )
    return corners.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    ).select(F.col("host").cast("bigint").alias("host"), "n_triangles")


_KCORE_K = 3
_KCORE_ROUNDS = 12  # fixpoint is idempotent: extra rounds are no-ops


def _kcore_oracle() -> str:
    steps = []
    prev = "n0"
    for i in range(1, _KCORE_ROUNDS + 1):
        # MATERIALIZED: each round references the previous twice — an
        # inlining planner would otherwise double the tree per round
        # (2^12 copies of the base scan)
        steps.append(
            f"""n{i} as materialized (
        select host from (
          select host, count(*) as deg from (
            select e.a as host
            from und e
            join {prev} pa on pa.host = e.a
            join {prev} pb on pb.host = e.b
            union all
            select e.b as host
            from und e
            join {prev} pa on pa.host = e.a
            join {prev} pb on pb.host = e.b
          ) group by host
        ) where deg >= {_KCORE_K}
      )"""
        )
        prev = f"n{i}"
    chain = ",\n      ".join(steps)
    return f"""
      with links as (
        select doc_id % {_PR_HOSTS} as x,
               (7 * doc_id + 3) % {_PR_HOSTS} as y
        from documents
        union all
        select doc_id % {_PR_HOSTS} as x, doc_id % 49 as y
        from documents where doc_id % 7 = 0
      ),
      und as (
        select distinct least(x, y) as a, greatest(x, y) as b
        from links where x <> y
      ),
      n0 as (
        select a as host from und union select b from und
      ),
      {chain}
      select cast(host as bigint) as host from {prev}
    """


@register(
    "graph_kcore_hosts",
    oracle=_kcore_oracle(),
    survey_refs=("J2", "A3", "X1"),
)
def graph_kcore_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosts in the 3-core of the planted graph — iterative peeling
    (drop every node with degree < k among survivors, repeat), the
    graph-quality prior that kicks out weakly-connected spam hosts
    where a plain degree filter cannot (degree is recomputed against
    SURVIVORS each round). Fourth graph operator, and the second
    iterative one with a FULL oracle: both engines run exactly 12
    peel rounds — the fixpoint is idempotent, so once converged the
    extra rounds are no-ops and the unrolled DuckDB twin matches
    bit-for-bit (all-integer throughout). A convergence-guard variant
    at true scale would stop early like label propagation
    (operators/dedup.py); the fixed unroll is what makes the
    cross-engine check exact.

    100 TB shape: each round is one join of the edge table against the
    surviving-host set (broadcast while hosts ≪ edges) plus one
    integer degree aggregate — the same per-round cost envelope as
    PageRank, with the edge table never re-shuffled."""
    docs = load(spark, "documents", sf_dir)
    # two planted edge families: the PageRank permutation cycle (every
    # host degree ~2 — peels away entirely under k=3) PLUS sparse
    # doc%7 cross-links (dst = doc mod 49, NOT a function of doc mod 50,
    # so degrees vary) — giving the peel real work: 43/50 hosts survive
    # at the gate SFs, converging in ≤3 synchronized rounds
    links = docs.select(
        (F.col("doc_id") % _PR_HOSTS).alias("x"),
        ((7 * F.col("doc_id") + 3) % _PR_HOSTS).alias("y"),
    ).unionAll(
        docs.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") % _PR_HOSTS).alias("x"),
            (F.col("doc_id") % 49).alias("y"),
        )
    ).where(F.col("x") != F.col("y"))
    und = links.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).distinct().persist()
    hosts = (
        und.select(F.col("a").alias("host"))
        .union(und.select(F.col("b").alias("host")))
        .distinct()
    )
    # localCheckpoint per round (the connected_components discipline,
    # operators/dedup.py): the peel references the previous round TWICE,
    # so an un-truncated lineage grows EXPONENTIALLY in the optimizer —
    # persist alone does not cut the logical plan the analyzer walks.
    hosts = hosts.localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        alive = und.join(
            F.broadcast(hosts.select(F.col("host").alias("a"))), "a"
        ).join(F.broadcast(hosts.select(F.col("host").alias("b"))), "b")
        degs = (
            alive.select(F.col("a").alias("host"))
            .unionAll(alive.select(F.col("b").alias("host")))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        hosts = (
            degs.where(F.col("deg") >= _KCORE_K)
            .select("host")
            .localCheckpoint()
        )
    out = hosts.select(F.col("host").cast("bigint").alias("host"))
    und.unpersist()
    return out


# ---------------------------------------------------------------------------
# BFS layers from a seed set — crawl-frontier distance
# ---------------------------------------------------------------------------

_BFS_LAYERS = 4
_BFS_SEED_MOD = 17  # seeds = hosts ≡ 0 (mod 17): {0, 17, 34} of the 50


def _bfs_oracle() -> str:
    """Unrolled BFS as DuckDB CTEs (the pagerank/k-core style): one
    (frontier, layer) block per hop, each anti-joining the union of
    all previous layers. Pure integer set algebra — exact on any
    engine."""
    layers = ["l0"]
    parts = [
        f"""
      links as (
        select doc_id % {_PR_HOSTS} as src,
               (7 * doc_id + 3) % {_PR_HOSTS} as dst
        from documents
        union all
        select doc_id % {_PR_HOSTS} as src,
               (11 * doc_id + 5) % {_PR_HOSTS} as dst
        from documents
      ),
      edges as (
        select distinct src, dst from links where src <> dst
      ),
      hosts as (
        select src as host from edges union select dst from edges
      ),
      l0 as (
        select host, 0 as dist from hosts
        where host % {_BFS_SEED_MOD} = 0
      )"""
    ]
    for i in range(1, _BFS_LAYERS + 1):
        seen = " union ".join(f"select host from {s}" for s in layers)
        parts.append(
            f"""
      l{i} as (
        select distinct e.dst as host, {i} as dist
        from edges e join l{i-1} f on f.host = e.src
        where e.dst not in ({seen})
      )"""
        )
        layers.append(f"l{i}")
    union = " union all ".join(f"select host, dist from {s}" for s in layers)
    return (
        "with "
        + ",".join(parts)
        + f"""
      select cast(host as bigint) as host, cast(dist as int) as dist
      from ({union})
    """
    )


@register(
    "graph_bfs_layers",
    oracle=_bfs_oracle(),
    survey_refs=("J1", "J2", "X1", "E1"),
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distance layers from a seed set over the planted host graph
    (directed, ≤ 4 hops) — the crawl-curation operator behind seed-
    based domain trust: dist(h) = min link-hops from any seed host
    (hosts ≡ 0 mod 17), unreached hosts are absent. The fourth graph
    operator next to PageRank / triangles / k-core, and like them
    fully ORACLE-CHECKED: BFS is pure integer set algebra (distinct,
    anti-join, union), so the unrolled DuckDB twin reproduces every
    layer exactly.

    100 TB shape: the frontier and visited sets are |hosts|-bounded —
    always ≪ corpus — so each hop is a broadcast join of the frontier
    ONTO the edge table plus a broadcast anti join against visited;
    the edge table never re-shuffles. At web scale both flip to
    shuffled joins — one shuffle per layer, BFS's lower bound. Layer
    count is fixed (4), so no convergence loop, no lineage blowup."""
    docs = load(spark, "documents", sf_dir)
    # two link families per doc (outdeg ≤ 2 per host) — the single
    # (7d+3) family is a functional graph whose BFS never branches
    links = docs.select(
        (F.col("doc_id") % _PR_HOSTS).alias("src"),
        ((7 * F.col("doc_id") + 3) % _PR_HOSTS).alias("dst"),
    ).unionAll(
        docs.select(
            (F.col("doc_id") % _PR_HOSTS).alias("src"),
            ((11 * F.col("doc_id") + 5) % _PR_HOSTS).alias("dst"),
        )
    )
    edges = links.where(F.col("src") != F.col("dst")).distinct().persist()
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    frontier = (
        hosts.where(F.col("host") % _BFS_SEED_MOD == 0)
        .select("host")
        .localCheckpoint()
    )
    visited = frontier.withColumn("dist", F.lit(0))
    for i in range(1, _BFS_LAYERS + 1):
        # checkpoint the FRONTIER, not just visited: a lazy frontier
        # chains every previous layer's joins into layer i's plan
        # (O(L²) join executions); materialized, each layer is exactly
        # one edges-join + distinct + anti-join — BFS's lower bound
        nxt = (
            edges.join(
                F.broadcast(frontier), edges.src == frontier.host
            )
            .select(F.col("dst").alias("host"))
            .distinct()
            .join(F.broadcast(visited.select("host")), "host", "left_anti")
        ).localCheckpoint()
        frontier = nxt
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(i)))
    out = visited.select(
        F.col("host").cast("bigint").alias("host"),
        F.col("dist").cast("int").alias("dist"),
    )
    out = out.persist()
    out.count()
    edges.unpersist()
    return out
