"""LLM-data-pipeline operators (BASELINE.json north star) over the
documents/embeddings tables: dedup (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force + LSH top-k),
and text analysis (token counting, language-ID, quality scoring).

The raw synthetic corpus contains no duplicates (verified: 0 exact dup
groups, max pairwise cosine 0.51), so dedup queries PLANT deterministic
duplicates via a shared CTE mirrored identically in Spark and the DuckDB
oracle: near-dups (text + tail) for ids % 25 == 0, exact dups for
ids % 20 == 5, scaled embedding copies for vec_id % 40 == 0.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_migrate_api_spark.catalog import load
from etl_migrate_api_spark.functions.text import (
    bpe_ish_token_count,
    rolling_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from etl_migrate_api_spark.operators import dedup as dd
from etl_migrate_api_spark.operators import similarity as sim
from etl_migrate_api_spark.plans.registry import register
from etl_migrate_api_spark.localdf import local_df

# ---------------------------------------------------------------- planted docs

PLANTED_DOCS_SQL = """
  select doc_id, text, lang, source from documents
  union all
  select doc_id + 100000, text || ' near duplicate tail marker', lang, source
  from documents where doc_id % 25 = 0
  union all
  select doc_id + 200000, text, lang, source
  from documents where doc_id % 20 = 5
"""


def planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text", "lang", "source")
    near = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" near duplicate tail marker")).alias("text"),
        "lang",
        "source",
    )
    exact = docs.where(F.col("doc_id") % 20 == 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source"
    )
    return docs.unionByName(near).unionByName(exact)


PLANTED_EMB_SQL = """
  select vec_id, embedding, label from embeddings
  union all
  select vec_id + 100000, list_transform(embedding, x -> x * 1.5), label
  from embeddings where vec_id % 40 = 0
"""


def planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    scaled = emb.where(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
        "label",
    )
    return emb.unionByName(scaled)


# ---------------------------------------------------------------- exact dedup


@register(
    "llm_exact_dedup",
    headline=True,
    oracle=f"""
      with docs as ({PLANTED_DOCS_SQL})
      select md5(lower(regexp_replace(trim(text), '[ \\t\\r\\n\\f]+', ' ', 'g'))) as fp,
             min(doc_id) as keeper_id,
             count(*) as n_dups
      from docs group by 1 having count(*) > 1
    """,
    survey_refs=("E1", "E2"),
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (hash-groupBy, map-side
    partial agg — one shuffle at any scale)."""
    return dd.exact_dedup_groups(planted_docs(spark, sf_dir))


# ---------------------------------------------------------------- minhash LSH

def _minhash_oracle() -> str:
    from etl_migrate_api_spark.operators.dedup import (
        BAND_SIZE,
        MINHASH_P,
        minhash_params_sql_values,
    )

    return f"""
with docs as ({PLANTED_DOCS_SQL}),
norm as (select doc_id, lower(regexp_replace(trim(text), '[ \\t\\r\\n\\f]+', ' ', 'g')) as t from docs),
sh as (
  select distinct doc_id, substr(t, i, 5) as sh
  from norm, lateral (
    select unnest(generate_series(1, greatest(length(t) - 4, 0))) as i) g
  where length(t) >= 5
),
sh_h as (
  select distinct doc_id,
         cast(concat('0x', substr(md5(sh), 1, 15)) as bigint) % {MINHASH_P} as h
  from sh
),
seeds(s, a, b) as (values {minhash_params_sql_values()}),
minh as (
  select doc_id, s, min((a * h + b) % {MINHASH_P}) as mh
  from sh_h cross join seeds
  group by doc_id, s
),
bands as (
  select doc_id, cast(floor(s / {BAND_SIZE}) as int) as band_idx,
         md5(string_agg(cast(mh as string), '|' order by s)) as band_key
  from minh group by doc_id, cast(floor(s / {BAND_SIZE}) as int)
),
pairs as (
  select distinct a.doc_id as id_a, b.doc_id as id_b
  from bands a
  join bands b on a.band_idx = b.band_idx and a.band_key = b.band_key
              and a.doc_id < b.doc_id
),
cnt as (select doc_id, count(*) as n from sh_h group by doc_id),
inter as (
  select p.id_a, p.id_b, count(*) as c
  from pairs p
  join sh_h x on x.doc_id = p.id_a
  join sh_h y on y.doc_id = p.id_b and y.h = x.h
  group by p.id_a, p.id_b
)
select p.id_a, p.id_b,
       cast(coalesce(i.c, 0) as double)
         / cast(ca.n + cb.n - coalesce(i.c, 0) as double) as jaccard
from pairs p
join cnt ca on ca.doc_id = p.id_a
join cnt cb on cb.doc_id = p.id_b
left join inter i on i.id_a = p.id_a and i.id_b = p.id_b
"""


@register("llm_minhash_lsh_dedup", oracle=_minhash_oracle(), headline=True)
def llm_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH banding (2 bands × 8 rows, threshold ≈ 0.92 —
    see operators/dedup.py::BAND_SIZE) near-dup candidates with exact
    shingle-Jaccard verification — deterministic md5 hash family.
    Returns a persisted DataFrame; callers that loop in a long-lived
    session own unpersisting it."""
    return dd.minhash_lsh_candidates(planted_docs(spark, sf_dir))


# ---------------------------------------------------------------- simhash

def _simhash_chain_sql(src: str) -> str:
    """The tok→th→votes→bits2→sig CTE chain computing 64-bit SimHash
    halves over ``src`` (a CTE/table with doc_id, text) — parameterized
    so the curation pipeline can run it over its survivors, not just
    the planted corpus."""
    return f"""tok as (
  select distinct doc_id, t.tok as tok
  from (select doc_id, lower(trim(text)) as s from {src}) d,
       lateral (select unnest(string_split_regex(s, '[ \\t\\r\\n\\f]+')) as tok) t
  where t.tok <> ''
),
th as (select doc_id, md5(tok) as h from tok),
votes as (
  select doc_id, i,
         sum(case when (cast(strpos('0123456789abcdef',
                                    substr(h, (i // 4) % 8 + case when i < 32 then 0 else 8 end + 1, 1)) - 1
                        as int) >> (i % 4)) & 1 = 1
                  then 1 else -1 end) as v
  from th cross join (select unnest(generate_series(0, 63)) as i) bits
  group by doc_id, i
),
bits2 as (select doc_id, i, case when v > 0 then 1 else 0 end as b from votes),
sig as (
  select doc_id as id,
         cast(coalesce(sum(case when i < 32 then cast(b as bigint) << i end), 0) as bigint) as simhash_lo,
         cast(coalesce(sum(case when i >= 32 then cast(b as bigint) << (i - 32) end), 0) as bigint) as simhash_hi
  from bits2 group by doc_id
)"""


_SIMHASH_DOC_SQL = f"""
with docs as ({PLANTED_DOCS_SQL}),
{_simhash_chain_sql("docs")}
"""


@register(
    "llm_simhash_signatures",
    oracle=_SIMHASH_DOC_SQL + "select id, simhash_lo, simhash_hi from sig",
)
def llm_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (two bigint halves), pure expressions."""
    return dd.simhash_df(planted_docs(spark, sf_dir))


@register(
    "llm_simhash_neardup",
    headline=True,
    oracle=_SIMHASH_DOC_SQL
    + """
      select a.id as id_a, b.id as id_b,
             cast(bit_count(xor(a.simhash_lo, b.simhash_lo))
                  + bit_count(xor(a.simhash_hi, b.simhash_hi)) as int) as hamming
      from sig a
      join sig b on a.id < b.id
      where bit_count(xor(a.simhash_lo, b.simhash_lo))
            + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
    """,
)
def llm_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL SimHash near-dup pairs (hamming ≤ 3, the Manku et al. WWW'07
    production threshold): 4×16-bit-chunk pigeonhole blocking with
    guaranteed 100% recall (see operators/dedup.py), so the oracle is
    the plain all-pairs formulation while the Spark plan never
    cross-joins."""
    return dd.simhash_neardup_pairs(planted_docs(spark, sf_dir))


# ---------------------------------------------------------------- ngram jaccard

_NGRAM_ORACLE = f"""
with docs as ({PLANTED_DOCS_SQL}),
norm as (
  select doc_id, source,
         list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'), x -> x <> '') as toks
  from docs
),
grams as (
  select distinct doc_id, source,
         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] as g
  from norm, lateral (
    select unnest(generate_series(1, greatest(len(toks) - 2, 0))) as i) gi
  where len(toks) >= 3
),
cnt as (select doc_id, count(*) as n from grams group by doc_id),
pairs as (
  select x.doc_id as id_a, y.doc_id as id_b, count(*) as c
  from grams x
  join grams y on x.source = y.source and x.g = y.g and x.doc_id < y.doc_id
  group by 1, 2
)
select p.id_a, p.id_b,
       cast(p.c as double) / cast(ca.n + cb.n - p.c as double) as jaccard
from pairs p
join cnt ca on ca.doc_id = p.id_a
join cnt cb on cb.doc_id = p.id_b
where cast(p.c as double) / cast(ca.n + cb.n - p.c as double) >= 0.3
"""


@register("llm_ngram_jaccard_dedup", oracle=_NGRAM_ORACLE, headline=True)
def llm_ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard ≥ 0.3 within a blocking key (source)."""
    return dd.ngram_jaccard_pairs(
        planted_docs(spark, sf_dir), block_col="source", n=3, threshold=0.3
    )


# ---------------------------------------------------------------- embeddings


def _embedding_neardup_oracle() -> str:
    """Mirror of operators/similarity.py::embedding_neardup_pairs: the
    hyperplane sign bits use the SAME md5-derived ±1 literal weights, so
    both engines compute identical band keys; candidates share a (label,
    band) bucket and are then exact-cosine verified."""
    from etl_migrate_api_spark.operators.similarity import (
        NEARDUP_BAND_SIZE,
        NEARDUP_N_BANDS,
        hyperplane_weights_sql,
    )

    ws = hyperplane_weights_sql(NEARDUP_N_BANDS * NEARDUP_BAND_SIZE, 64)
    bit_exprs = " || ".join(
        f"(case when list_dot_product(embedding, {w}) >= 0 then '1' else '0' end)"
        for w in ws
    )
    return f"""
      with emb as ({PLANTED_EMB_SQL}),
      sig as (select vec_id, label, embedding, {bit_exprs} as bits from emb),
      banded as (
        select vec_id, label, b as band_idx,
               substr(bits, b * {NEARDUP_BAND_SIZE} + 1, {NEARDUP_BAND_SIZE}) as band_key
        from sig cross join (
          select unnest(generate_series(0, {NEARDUP_N_BANDS - 1})) as b) g
      ),
      pairs as (
        select distinct a.vec_id as id_a, b.vec_id as id_b
        from banded a
        join banded b on a.label = b.label and a.band_idx = b.band_idx
                     and a.band_key = b.band_key and a.vec_id < b.vec_id
      )
      select p.id_a, p.id_b
      from pairs p
      join emb x on x.vec_id = p.id_a
      join emb y on y.vec_id = p.id_b
      where list_cosine_similarity(x.embedding, y.embedding) > 0.95
    """


@register("llm_embedding_neardup", oracle=_embedding_neardup_oracle(), headline=True)
def llm_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>0.95) within label blocks:
    hyperplane-band candidates, exact cosine verified (never an
    all-pairs join within the block — see operators/similarity.py)."""
    return sim.embedding_neardup_pairs(
        planted_embeddings(spark, sf_dir), threshold=0.95
    ).select("id_a", "id_b")


@register(
    "llm_ann_bruteforce_topk",
    oracle="""
      with q as (select vec_id as query_id, embedding as qv from embeddings where vec_id < 10),
      scored as (
        select q.query_id, c.vec_id as neighbor_id,
               list_cosine_similarity(q.qv, c.embedding) as sim
        from q join embeddings c on c.vec_id <> q.query_id
      ),
      r as (select query_id, neighbor_id,
                   row_number() over (partition by query_id
                                      order by sim desc, neighbor_id) as rank
            from scored)
      select query_id, cast(rank as int) as rank, neighbor_id from r where rank <= 5
    """,
    headline=True,
)
def llm_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors against the corpus
    (broadcast queries × corpus scan — linear, shuffle-free)."""
    emb = load(spark, "embeddings", sf_dir)
    return sim.bruteforce_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "llm_ann_filtered_topk",
    oracle="""
      with q as (
        select vec_id as query_id, embedding as qv, label
        from embeddings where vec_id < 10
      ),
      scored as (
        select q.query_id, c.vec_id as neighbor_id,
               list_cosine_similarity(q.qv, c.embedding) as sim
        from q join embeddings c on c.vec_id <> q.query_id
                                and c.label = q.label
      ),
      r as (select query_id, neighbor_id,
                   row_number() over (partition by query_id
                                      order by sim desc, neighbor_id) as rank
            from scored)
      select query_id, cast(rank as int) as rank, neighbor_id
      from r where rank <= 5
    """,
    survey_refs=("J2", "O2"),
)
def llm_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED similarity search — the vector-DB hybrid query: exact
    cosine top-5 restricted to neighbors sharing the query's label
    (metadata predicate + vector ranking in ONE pass). This is the
    pre-filter strategy: the predicate narrows the candidate set
    BEFORE ranking, so top-k is over qualifying vectors only —
    post-filtering an unfiltered top-k silently returns < k (or worse)
    whenever the filter is selective. The scale path is the same
    predicate pushed inside the IVF index's probed cells
    (operators/similarity.py::ivf_topk_from_index(where=…),
    recall-tested + plan-asserted in tests/test_filtered_ann.py); this
    query is the exact oracle-checked baseline, a broadcast of the 10
    queries against a corpus scan with the label equi-condition IN the
    join — never a corpus shuffle."""
    emb = load(spark, "embeddings", sf_dir)
    q = F.broadcast(
        emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("qlabel"),
        )
    )
    from etl_migrate_api_spark.functions.vectors import cosine_similarity
    from etl_migrate_api_spark.operators.similarity import _rank_topk

    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("clabel"),
    )
    scored = q.join(
        c,
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("qlabel") == F.col("clabel")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    return _rank_topk(scored, 5)


def _mmr_oracle(k: int = 5, n_cand: int = 12, n_queries: int = 5) -> str:
    """Fully-unrolled greedy MMR as DuckDB CTEs (the graph-operator
    oracle style): candidates by double-cosine rank, a pairwise-sim
    table, then one (rem → sc → sel) block per greedy step, each
    anti-joining the union of all previous selections. Doubles stay
    bit-compatible with the Spark path because every cosine is a
    sequential double sum on BOTH engines (list_dot_product over
    DOUBLE[] vs operators/similarity.py::_seq_cosine) and scores are
    rounded to 9dp before each argmax; λ/μ are the parsed literals
    0.7/0.3 on both sides (never 1−0.7, which is a different double)."""
    cos = (
        "list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    parts = [
        f"""
      emb as (select vec_id, cast(embedding as double[]) as v from embeddings),
      q as (select vec_id as query_id, v as qv from emb where vec_id < {n_queries}),
      scored as (
        select q.query_id, e.vec_id as neighbor_id, e.v as cv,
               {cos.format(a='q.qv', b='e.v')} as sim
        from q join emb e on e.vec_id <> q.query_id
      ),
      cand as (
        select * from (
          select query_id, neighbor_id, cv, sim,
                 row_number() over (partition by query_id
                                    order by sim desc, neighbor_id) as rnk
          from scored) where rnk <= {n_cand}
      ),
      pair as (
        select a.query_id, a.neighbor_id as ia, b.neighbor_id as ib,
               {cos.format(a='a.cv', b='b.cv')} as s
        from cand a join cand b on a.query_id = b.query_id
                                and a.neighbor_id <> b.neighbor_id
      ),
      sel1 as (
        select query_id, neighbor_id from (
          select query_id, neighbor_id,
                 row_number() over (partition by query_id
                                    order by round(0.7 * sim, 9) desc,
                                             neighbor_id) as rn
          from cand) where rn = 1
      )"""
    ]
    sels = ["sel1"]
    for step in range(2, k + 1):
        prev_union = " union all ".join(
            f"select query_id, neighbor_id from {s}" for s in sels
        )
        parts.append(
            f"""
      prev{step} as ({prev_union}),
      rem{step} as (
        select c.query_id, c.neighbor_id, c.sim
        from cand c
        left join prev{step} d on d.query_id = c.query_id
                              and d.neighbor_id = c.neighbor_id
        where d.neighbor_id is null
      ),
      sc{step} as (
        select r.query_id, r.neighbor_id,
               round(0.7 * r.sim - 0.3 * max(p.s), 9) as score
        from rem{step} r
        join prev{step} ps on ps.query_id = r.query_id
        join pair p on p.query_id = r.query_id
                   and p.ia = r.neighbor_id and p.ib = ps.neighbor_id
        group by r.query_id, r.neighbor_id, r.sim
      ),
      sel{step} as (
        select query_id, neighbor_id from (
          select query_id, neighbor_id,
                 row_number() over (partition by query_id
                                    order by score desc, neighbor_id) as rn
          from sc{step}) where rn = 1
      )"""
        )
        sels.append(f"sel{step}")
    final = " union all ".join(
        f"select query_id, cast({i + 1} as int) as mmr_rank, neighbor_id from {s}"
        for i, s in enumerate(sels)
    )
    return "with " + ",".join(parts) + "\n" + final


@register("llm_mmr_rerank", oracle=_mmr_oracle(), headline=True)
def llm_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity rerank of similarity-search results: exact-cosine
    top-12 candidates per query (5 queries), then greedy Maximal
    Marginal Relevance (λ=0.7) down to 5 — the step between retrieval
    and a RAG context window that stops five near-duplicate passages
    from filling the prompt. Candidate generation is the distributed
    half (operators/similarity.py::mmr_rerank — broadcast queries ×
    corpus scan, never a corpus shuffle); the O(k·n²) greedy loop runs
    per-query inside one applyInPandas group. Oracle: the greedy
    selection fully unrolled as CTE steps, bit-compatible by
    sequential-double cosines + 9dp score rounding on both engines."""
    emb = load(spark, "embeddings", sf_dir)
    return sim.mmr_rerank(emb, emb.where(F.col("vec_id") < 5), k=5, n_candidates=12)


def _ivf_sweep_stale(root: str) -> None:
    """Bound the index-dir leak: sweep sibling index dirs old enough
    that no live run plausibly still reads them (6 h >> any
    gate/bench/pytest session; dir mtime = build time, so a sweep can
    in principle race an unmaterialized DataFrame held across sessions
    that long — the failure is a clean FileNotFoundException on a
    stale handle)."""
    import shutil
    import time

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


def _ivf_shared_path(sf_dir: str) -> str:
    """Process-scoped persisted-index location. Keyed by (sf tag, pid):
    fresh per interpreter — a new run can never read an index a stale
    code version wrote — but SHARED within one session, so
    llm_ann_ivf_build amortizes over every llm_ann_ivf_query in the
    same bench/driver run, exactly the persisted-index economics the
    operator exists for."""
    import tempfile

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_ivf")
    return os.path.join(root, f"index_{tag}_pid{os.getpid()}")


@register("llm_ann_ivf_build", oracle=None, headline=True)
def llm_ann_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index BUILD, benched on its own: train deterministic
    md5-init k-means and write the corpus parquet-partitioned by
    coarse cell with centroids alongside
    (operators/similarity.py::write_ivf_index). Separated from
    llm_ann_ivf_query so the bench artifact prices the two phases the
    way a cluster pays them — the build once per ingest, the pruned
    probe per query (r8 verdict #3: a combined number hides the
    amortized query cost that is the operator's point). Returns the
    per-cell inventory read back FROM the written index (cell sizes =
    shuffle-partition sizes at scale — the skew signal). Rows-only
    gate: float k-means has no cross-engine SQL mirror; determinism
    and recall are asserted in tests/test_kmeans_ivf.py."""
    import shutil

    emb = load(spark, "embeddings", sf_dir)
    path = _ivf_shared_path(sf_dir)
    _ivf_sweep_stale(os.path.dirname(path))
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(f"{path}.centroids", ignore_errors=True)
    sim.write_ivf_index(emb, path, k=8, n_iter=2)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


@register("llm_ann_ivf_query", oracle=None, headline=True)
def llm_ann_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k answered from the PERSISTED index — the
    amortized per-query cost at scale: assign each query to its nprobe
    nearest cells (centroids are driver-side constants) and scan ONLY
    those cell directories — partition pruning at file-listing time,
    plan-asserted in tests/test_kmeans_ivf.py. At 100 TB a query
    touches nprobe/k of the corpus bytes. Builds the index first only
    if this session hasn't yet (a standalone correctness run); in the
    bench, llm_ann_ivf_build has already paid that cost, so this
    number is the pruned probe alone. Rows-only gate as the build."""
    emb = load(spark, "embeddings", sf_dir)
    path = _ivf_shared_path(sf_dir)
    if not os.path.isdir(f"{path}.centroids"):
        _ivf_sweep_stale(os.path.dirname(path))
        sim.write_ivf_index(emb, path, k=8, n_iter=2)
    return sim.ivf_topk_from_index(
        spark, path, emb.where(F.col("vec_id") < 10), k=5, nprobe=3
    )


@register("llm_ann_ivf_topk", oracle=None)
def llm_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF build+query END-TO-END in one invocation — the gate-
    freshness variant: rebuilds into a unique dir every call so the
    correctness row can never ride a stale index from older code, and
    parity-tests the persisted path against the inline-trained API
    (sim.ivf_topk) in tests/test_kmeans_ivf.py. The BENCH numbers live
    in llm_ann_ivf_build / llm_ann_ivf_query, which split the one-time
    build from the amortized pruned probe."""
    import uuid

    emb = load(spark, "embeddings", sf_dir)
    path = _ivf_shared_path(sf_dir) + f"_{uuid.uuid4().hex[:8]}"
    _ivf_sweep_stale(os.path.dirname(path))
    sim.write_ivf_index(emb, path, k=8, n_iter=2)
    return sim.ivf_topk_from_index(
        spark, path, emb.where(F.col("vec_id") < 10), k=5, nprobe=3
    )


def _lsh_topk_oracle(
    n_bands: int = 4,
    band_size: int = 4,
    dim: int = 64,
    n_queries: int = 10,
    k: int = 5,
) -> str:
    """llm_ann_lsh_topk oracled IN PLACE (the knn_graph_banded lesson,
    r9): the operator is deterministic end to end — md5-derived ±1
    hyperplane weights both engines re-derive as plan constants,
    multi-band candidate union, exact-cosine ranking with
    (sim desc, id) ties, and NO float in the output (rank + the
    first-matching-band bucket string) — so the production query needs
    no pinned twin."""
    from etl_migrate_api_spark.operators.similarity import (
        hyperplane_weights_sql,
    )

    ws = hyperplane_weights_sql(n_bands * band_size, dim)
    bit_exprs = " || ".join(
        f"(case when list_dot_product(v, {w}) >= 0 then '1' else '0' end)"
        for w in ws
    )
    return f"""
      with emb as materialized (
        select vec_id as id, cast(embedding as double[]) as v
        from embeddings
      ),
      sig as materialized (select id, v, {bit_exprs} as bits from emb),
      banded as materialized (
        select id, b as band_idx,
               substr(bits, b * {band_size} + 1, {band_size}) as band_key
        from sig cross join (
          select unnest(generate_series(0, {n_bands - 1})) as b) g
      ),
      q as (
        select id, band_idx, band_key from banded where id < {n_queries}
      ),
      cand as materialized (
        select q.id as query_id, c.id as neighbor_id,
               min(cast(q.band_idx as varchar) || ':' || q.band_key)
                 as bucket
        from q join banded c
          on c.band_idx = q.band_idx and c.band_key = q.band_key
         and c.id <> q.id
        group by 1, 2
      ),
      scored as (
        select c.query_id, c.neighbor_id, c.bucket,
               list_cosine_similarity(x.v, y.v) as sim
        from cand c
        join emb x on x.id = c.query_id
        join emb y on y.id = c.neighbor_id
      )
      select query_id, cast(rank as int) as rank, neighbor_id, bucket
      from (
        select query_id, neighbor_id, bucket,
               row_number() over (partition by query_id
                                  order by sim desc, neighbor_id) as rank
        from scored)
      where rank <= {k}
    """


@register("llm_ann_lsh_topk", oracle=_lsh_topk_oracle())
def llm_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate LSH-bucketed top-k, oracled IN PLACE since r10 (the
    operator is deterministic end to end — md5 hyperplane plan
    constants, exact-cosine rank, no float output column). Recall
    vs the brute-force scan stays measured in tests; the hash gate
    now additionally pins the banding, the multi-band candidate
    union, the first-matching-band bucket attribution, and the rank."""
    emb = load(spark, "embeddings", sf_dir)
    return sim.lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register(
    "llm_fuzzy_match_levenshtein",
    oracle="""
      with names as (
        select p_partkey as id, p_brand as blk, lower(p_name) as nm from part
      )
      select a.id as id_a, b.id as id_b,
             cast(levenshtein(a.nm, b.nm) as int) as dist
      from names a
      join names b on a.blk = b.blk and a.id < b.id
      where levenshtein(a.nm, b.nm) <= 2
    """,
)
def llm_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record matching: Levenshtein distance ≤ 2 within a blocking
    key (brand) — the entity-resolution cousin of near-dup detection.
    Candidates come from the LOSSLESS ED-Join q-gram prefix filter (see
    operators/dedup.py::fuzzy_match_pairs), so the oracle stays the
    plain all-pairs formulation while the plan never cross-joins a hot
    brand block. (ed ≤ 2 is the production matcher for these 7-12-char
    names; at ed ≤ 4 nearly half the string may differ and no lossless
    sub-quadratic filter can exist.)"""
    p = load(spark, "part", sf_dir)
    names = p.select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("blk"),
        F.lower("p_name").alias("nm"),
    )
    return dd.fuzzy_match_pairs(
        names, text_col="nm", id_col="id", block_col="blk", max_edit=2
    )


# ---------------------------------------------------------------- multimodal


@register(
    "llm_multimodal_decode",
    oracle=None,  # Pandas-UDF decode path; plumbing verified in pytest
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image metadata decode over binary media columns (mapInPandas,
    Arrow-batched): real PNG IHDR/BMP header parsing — see
    operators/multimodal.py (full pixel decode lives in
    decode_pixels; audio in llm_multimodal_audio)."""
    from etl_migrate_api_spark.operators.multimodal import (
        decode_images,
        fake_media_table,
    )

    docs = load(spark, "documents", sf_dir)
    return decode_images(fake_media_table(docs))


@register("llm_multimodal_audio", oracle=None)
def llm_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over the media table's WAV rows (mapInPandas):
    fake_media_table plants valid 16-bit mono PCM WAVs (the header is
    pure struct fields, built as a hex literal in SQL), so rate /
    duration / RMS here come from an actual RIFF+PCM decode of every
    row — rows-only check (signal stats have no SQL twin), exactness
    covered by the fixture tests in tests/test_multimodal.py."""
    from etl_migrate_api_spark.operators.multimodal import (
        decode_audio,
        fake_media_table,
    )

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "audio")
    return decode_audio(media).select(
        "media_id", "sample_rate", "n_frames", "duration_s",
        F.round("rms", 6).alias("rms"), "ok",
    )


@register("llm_multimodal_frames", oracle=None)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as pure binary-slice expressions (no Python
    in the executed plan — asserted in tests)."""
    from etl_migrate_api_spark.operators.multimodal import (
        fake_media_table,
        sample_frames,
    )

    docs = load(spark, "documents", sf_dir)
    return sample_frames(fake_media_table(docs)).select(
        "media_id", "frame_idx", F.length("frame").alias("frame_bytes")
    )


@register("llm_multimodal_video", oracle=None)
def llm_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode over the media table's Y4M rows (mapInPandas):
    fake_media_table plants valid YUV4MPEG2 streams (text header + 4
    FRAME-delimited 4x4 mono luma planes built as hex-literal SQL), so
    width/fps/per-frame luma stats here come from an actual container
    walk + frame extraction of every row. Rows-only check (frame CRCs
    have no SQL twin); exactness covered by tests/test_multimodal.py
    (planted rows cross-checked against the pure-python decoder)."""
    from etl_migrate_api_spark.operators.multimodal import fake_media_table
    from etl_migrate_api_spark.operators.video import decode_video

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "video")
    return decode_video(media).select(
        "media_id", "frame_idx", "width", "height", "fps",
        F.round("y_mean", 6).alias("y_mean"), "y_crc32", "ok",
    )


@register("llm_image_resize", oracle=None)
def llm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full executor-side image pipeline: encode the media payload bytes
    into REAL 4x4 RGB PNGs (stdlib zlib writer), then decode + resize to
    8x8 thumbnails — encode→decode→resize entirely in mapInPandas, the
    resolution-normalization step before a vision encoder. Rows-only
    check; exact resized-buffer CRCs verified in tests/test_multimodal.py."""
    from etl_migrate_api_spark.operators.multimodal import (
        encode_images,
        fake_media_table,
        resize_images,
    )

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "image")
    # payload = bytes 34..97 of the planted blob (after the 33-byte
    # PNG signature+IHDR plant); first 48 bytes = 4x4 RGB pixels
    pixels = media.select(
        "media_id", F.substring("content", 34, 48).alias("pixels")
    )
    pngs = encode_images(pixels, 4, 4, "RGB")
    return resize_images(pngs, 8, 8).select(
        "media_id", "src_w", "src_h", "out_w", "out_h",
        "px_crc32", F.round("mean_px", 6).alias("mean_px"), "ok",
    )


@register("llm_model_embed", oracle=None)
def llm_model_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-inference embeddings over real PNG blobs: decode → resize
    → normalize → one batched GEMM per Arrow chunk through the
    env-gated encoder hook (operators/encoder.py). The backend here is
    the deterministic random-projection encoder — the same batched
    matrix-multiply shape as a real model's final layer, dependency-
    free and bit-reproducible; setting SPARK_GRAFT_ONNX_MODEL /
    SPARK_GRAFT_TORCH_MODEL swaps in a real session with NO plan
    change. Rows-only check (float inference has no SQL twin);
    exactness + worker-side batching pinned in tests/test_encoder.py."""
    from etl_migrate_api_spark.operators.encoder import (
        model_embed,
        projection_encoder,
    )
    from etl_migrate_api_spark.operators.multimodal import (
        encode_images,
        fake_media_table,
    )

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "image")
    pixels = media.select(
        "media_id", F.substring("content", 34, 48).alias("pixels")
    )
    pngs = encode_images(pixels, 4, 4, "RGB")
    out = model_embed(pngs, encoder=projection_encoder(dim=16))
    return out.select(
        "media_id",
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
        F.round(F.element_at("embedding", 16), 6).alias("e15"),
        F.size("embedding").alias("dim"),
        "encoder",
        "ok",
    )


# ---------------------------------------------------------------- text analysis

_STOPWORD_SQL_LIST = (
    "['the','a','an','and','or','of','to','in','is','it','that','for','on',"
    "'as','with','was','at','by','be','this']"
)

_TEXT_METRIC_SQL = f"""
  toks as (
    select doc_id,
           list_filter(string_split_regex(trim(text), '[ \\t\\r\\n\\f]+'), x -> x <> '') as tk,
           text as s
    from docs
  ),
  m as (
    select doc_id, s,
           len(tk) as n_tok,
           len(list_filter(list_transform(tk, x -> lower(x)),
                           x -> list_contains({_STOPWORD_SQL_LIST}, x))) as n_stop,
           length(s) as n_char,
           length(regexp_replace(s, '[^A-Za-z0-9\\s]', '', 'g')) as n_nonpunct,
           length(regexp_replace(s, '[^A-Za-z ]', '', 'g')) as n_ascii,
           length(regexp_replace(s, '[ \\t\\r\\n\\f]+', '', 'g')) as n_compact
    from toks
  ),
  r as (
    select doc_id, n_tok,
           case when n_tok > 0 then cast(n_stop as double) / n_tok else 0.0 end as stop_ratio,
           case when n_char > 0 then cast(n_char - n_nonpunct as double) / n_char else 0.0 end as punct_ratio,
           case when n_char > 0 then cast(n_ascii as double) / n_char else 0.0 end as density,
           case when n_tok > 0 then cast(n_compact as double) / n_tok else 0.0 end as mean_word_len,
           n_char
    from m
  )
"""


@register(
    "llm_token_stats",
    oracle=f"""
      with docs as (select doc_id, text from documents),
      toks as (
        select doc_id,
               list_filter(string_split_regex(trim(text), '[ \\t\\r\\n\\f]+'), x -> x <> '') as tk,
               text
        from docs
      )
      select doc_id,
             cast(len(tk) as bigint) as n_tok,
             cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bigint) as n_bpe,
             cast(case when len(tk) = 0 then 0
                  else list_reduce(
                         list_transform(tk, t ->
                           cast(concat('0x', substr(md5(t), 1, 15)) as bigint) % 2147483647),
                         (acc, h) -> (acc * 131 + h) % 2147483647)
                  end as bigint) as fp_roll
      from toks
    """,
)
def llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish word-piece proxy) + the
    order-sensitive rolling-hash document fingerprint."""
    docs = load(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        bpe_ish_token_count("text").alias("n_bpe"),
        rolling_fingerprint("text").alias("fp_roll"),
    )


@register(
    "llm_lang_id",
    oracle=f"""
      with docs as (select doc_id, text, lang from documents),
      {_TEXT_METRIC_SQL}
      select d.lang,
             case when length(coalesce(d.text, '')) = 0 then 'und'
                  when r.density >= 0.6 and r.stop_ratio > 0.05 then 'en'
                  when r.density >= 0.6 then 'latin'
                  else 'other' end as lang_pred,
             count(*) as n
      from docs d join r on r.doc_id = d.doc_id
      group by 1, 2
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID vs the labeled lang column (confusion counts)."""
    docs = load(spark, "documents", sf_dir)
    return docs.groupBy(
        "lang", lang_id("text").alias("lang_pred")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "llm_quality_score",
    oracle=f"""
      with docs as (select doc_id, text from documents),
      {_TEXT_METRIC_SQL}
      select doc_id,
             round((
               (case when n_tok >= 5 and n_tok <= 100000 then 1.0 else 0.0 end)
             + (case when punct_ratio <= 0.2 then 1.0 else 0.0 end)
             + (case when stop_ratio >= 0.01 then 1.0 else 0.0 end)
             + (case when mean_word_len >= 2.0 and mean_word_len <= 12.0 then 1.0 else 0.0 end)
             ) / 4.0, 4) as quality
      from r
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality score per document."""
    docs = load(spark, "documents", sf_dir)
    return docs.select("doc_id", quality_score("text").alias("quality"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS scheme)
# ---------------------------------------------------------------------------

_WINNOW_N = 3  # word n-gram size
_WINNOW_W = 4  # winnowing window (grams per window)
_WINNOW_P = 2_147_483_647  # same 31-bit md5-reduction as shingle_hashes


@register(
    "llm_winnow_fingerprints",
    oracle=f"""
      with toks as (
        select doc_id,
               list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'),
                           x -> x <> '') as t
        from documents
      ),
      hv as (
        select doc_id,
               list_transform(
                 [array_to_string(t[i:i+{_WINNOW_N - 1}], ' ')
                  for i in range(1, greatest(len(t) - {_WINNOW_N - 2}, 1))],
                 g -> cast(concat('0x', substr(md5(g), 1, 15)) as bigint)
                      % {_WINNOW_P}) as h
        from toks
      ),
      wins as (
        select doc_id,
               case when len(h) = 0 then []
                    when len(h) < {_WINNOW_W} then [list_min(h)]
                    else [list_min(h[i:i+{_WINNOW_W - 1}])
                          for i in range(1, greatest(len(h) - {_WINNOW_W - 2}, 1))]
               end as m
        from hv
      )
      select distinct doc_id, unnest(m) as fp
      from wins where len(m) > 0
    """,
)
def llm_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by WINNOWING — per window of
    ``_WINNOW_W`` consecutive word-3-gram hashes keep the minimum
    (Schleimer/Wilkerson/Aiken's MOSS scheme): position-robust LOCAL
    fingerprints that survive insertions/reorderings a whole-document
    hash cannot (guarantee: any shared run of ≥ w+n-1 words yields at
    least one shared fingerprint). Complements the order-sensitive
    rolling hash in ``llm_token_stats`` and the set-similarity families
    — this is the partial-overlap / clone-detection primitive.

    Plan: two projection-barriered narrow maps (tokens → gram hashes →
    window mins; attribute columns between stages so HOF lambdas never
    re-evaluate upstream chains — the measured 25× trap), then
    posexplode+distinct. ONE shuffle (the distinct); fingerprints are
    ints, ~|tokens|/w per doc — at 100 TB this is the cheap first pass
    before any pairwise clone join."""
    docs = load(spark, "documents", sf_dir)
    from etl_migrate_api_spark.functions.text import ws_tokens

    toks = dd._spread(docs.select("doc_id", ws_tokens("text").alias("t")))
    grams = toks.select(
        "doc_id",
        F.when(
            F.size("t") >= _WINNOW_N,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - F.lit(_WINNOW_N - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _WINNOW_N)),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("g"),
    )
    hv = grams.select(
        "doc_id",
        F.transform(
            F.col("g"),
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint")
            % _WINNOW_P,
        ).alias("h"),
    )
    mins = hv.select(
        "doc_id",
        F.when(F.size("h") == 0, F.array().cast("array<bigint>"))
        .when(F.size("h") < _WINNOW_W, F.array(F.array_min("h")))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size("h") - F.lit(_WINNOW_W - 1)),
                lambda i: F.array_min(F.slice(F.col("h"), i, _WINNOW_W)),
            )
        )
        .alias("m"),
    )
    return (
        mins.where(F.size("m") > 0)
        .select("doc_id", F.explode(F.array_distinct("m")).alias("fp"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Unigram LM scoring (CCNet-style perplexity-proxy filtering)
# ---------------------------------------------------------------------------


@register(
    "llm_unigram_logprob_score",
    oracle="""
      with toks as (
        select doc_id,
               list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'),
                           x -> x <> '') as t
        from documents
      ),
      tf as (
        select doc_id, tok, count(*) as f
        from (select doc_id, unnest(t) as tok from toks)
        group by doc_id, tok
      ),
      cnt as (select tok, cast(sum(f) as double) as c from tf group by tok),
      tot as (select cast(sum(f) as double) as n from tf)
      select tf.doc_id,
             cast(sum(tf.f) as bigint) as n_tok,
             round(sum(tf.f * ln(cnt.c / tot.n)) / sum(tf.f), 4) as avg_logprob
      from tf join cnt using (tok) cross join tot
      group by tf.doc_id
    """,
)
def llm_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM score per document — the perplexity-
    proxy quality filter (CCNet trains KenLM and keeps the low-
    perplexity tercile; the unigram LM is the engine-portable,
    oracle-checkable form of the same shape: train = one aggregation
    over the corpus, score = one join + one aggregation).

    Scale shape: per-doc term frequencies FIRST (groupBy(doc_id, tok) —
    shrinks the join input to distinct doc-token pairs), then join the
    vocab counts on tok and fold tf·ln(p) per doc. The tok join is hot
    on stopwords ('the' appears in every doc) — exactly the skew AQE's
    skew-join splitting handles (session.py enables it; the LSH band
    joins' skew tests cover the mechanism). The 1-row total rides a
    broadcast cross join. avg_logprob rounded to 4dp: double summation
    order differs between engines and 1e-12-scale tails must not flip
    the hash."""
    from etl_migrate_api_spark.functions.text import ws_tokens

    docs = load(spark, "documents", sf_dir)
    ex = dd._spread(docs.select("doc_id", ws_tokens("text").alias("t"))).select(
        "doc_id", F.explode("t").alias("tok")
    )
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("f"))
    cnt = tf.groupBy("tok").agg(F.sum("f").cast("double").alias("c"))
    tot = tf.agg(F.sum("f").cast("double").alias("n"))
    return (
        tf.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("f").cast("bigint").alias("n_tok"),
            F.round(
                F.sum(F.col("f") * F.log(F.col("c") / F.col("n"))) / F.sum("f"), 4
            ).alias("avg_logprob"),
        )
    )


@register(
    "llm_bigram_logprob_score",
    headline=True,
    oracle="""
      with toks as (
        select doc_id,
               list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'),
                           x -> x <> '') as t
        from documents
      ),
      big as (
        select doc_id, t[i] as w1, t[i + 1] as w2
        from toks, unnest(generate_series(1, len(t) - 1)) as g(i)
        where len(t) >= 2
      ),
      bf as (
        select doc_id, w1, w2, count(*) as f
        from big group by doc_id, w1, w2
      ),
      cb as (select w1, w2, cast(sum(f) as double) as c from bf group by w1, w2),
      ch as (select w1, cast(sum(c) as double) as h from cb group by w1),
      uni as (
        select tok, cast(count(*) as double) as cu
        from (select unnest(t) as tok from toks) group by tok
      ),
      tot as (select cast(sum(cu) as double) as n from uni)
      select bf.doc_id,
             cast(sum(bf.f) as bigint) as n_bigrams,
             round(sum(bf.f * ln(0.75 * (cb.c / ch.h) + 0.25 * (uni.cu / tot.n)))
                   / sum(bf.f), 4) as avg_logprob
      from bf
      join cb on bf.w1 = cb.w1 and bf.w2 = cb.w2
      join ch on bf.w1 = ch.w1
      join uni on bf.w2 = uni.tok
      cross join tot
      group by bf.doc_id
    """,
)
def llm_bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained INTERPOLATED bigram LM score per document — one
    step up the KenLM ladder from llm_unigram_logprob_score:
    score = mean over a doc's bigrams of
    ln(0.75·P(w2|w1) + 0.25·P(w2)), the Jelinek-Mercer two-level
    interpolation that keeps unseen-in-head contexts finite without a
    discounting table (every bigram in the corpus IS in the model here,
    since train and score run over the same corpus — the interpolation
    weight is what transfers when scoring held-out text against a
    pretrained count table).

    Scale shape mirrors the unigram query: per-doc bigram frequencies
    FIRST (groupBy(doc_id, w1, w2) shrinks every downstream join to
    distinct doc-bigram rows), then equi-joins against the bigram
    count, head-margin and unigram tables. The w1 joins are hot on
    stopword heads ('the …' is a huge key) — AQE skew-join splitting
    territory, same as the unigram tok join. Adjacent pairs come from
    zip_with over two array slices — no posexplode self-join, the
    array never leaves the row. Four aggregates derive from two base
    tables (doc-bigram freqs, token stream); WITHOUT a materialization
    barrier Catalyst expands every derived branch back to its own
    parquet scan — 5 corpus re-tokenizations (measured in the first
    plan). bf and the tokenized corpus are persisted so the plan reads
    the corpus ONCE; at 100 TB both caches are the shrunk artifacts
    (distinct doc-bigrams, doc-token arrays) a real run would
    checkpoint anyway. Rounded to 4dp: double summation order differs
    between engines and 1e-12 tails must not flip the hash."""
    from etl_migrate_api_spark.functions.text import ws_tokens

    docs = load(spark, "documents", sf_dir)
    toks = dd._spread(
        docs.select("doc_id", ws_tokens("text").alias("t"))
    ).persist()
    big = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    bf = big.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("f"))
    bf = bf.persist()
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("cu"))
    )
    uni = uni.persist()
    bf.count()
    uni.count()
    toks.unpersist()
    cb = bf.groupBy("w1", "w2").agg(F.sum("f").cast("double").alias("c"))
    ch = cb.groupBy("w1").agg(F.sum("c").alias("h"))
    tot = uni.agg(F.sum("cu").alias("n"))
    return (
        bf.join(cb, ["w1", "w2"])
        .join(ch, "w1")
        .join(uni, bf["w2"] == uni["tok"])
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("f").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("f")
                    * F.log(
                        0.75 * (F.col("c") / F.col("h"))
                        + 0.25 * (F.col("cu") / F.col("n"))
                    )
                )
                / F.sum("f"),
                4,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------


@register(
    "llm_tfidf_keywords",
    headline=True,
    oracle="""
      with toks as (
        select doc_id,
               list_filter(string_split_regex(lower(trim(text)), '[ \\t\\r\\n\\f]+'),
                           x -> x <> '') as t
        from documents
      ),
      tf as (
        select doc_id, tok, count(*) as f
        from (select doc_id, unnest(t) as tok from toks)
        group by doc_id, tok
      ),
      dfreq as (select tok, count(*) as df from tf group by tok),
      n as (select cast(count(*) as double) as n_docs from documents),
      scored as (
        select tf.doc_id, tf.tok,
               round(tf.f * (ln((n.n_docs + 1) / (dfreq.df + 1)) + 1), 4) as score
        from tf join dfreq using (tok) cross join n
      ),
      ranked as (
        select doc_id, tok, score,
               row_number() over (partition by doc_id
                                  order by score desc, tok) as rnk
        from scored
      )
      select doc_id, tok, score, cast(rnk as int) as rnk
      from ranked where rnk <= 5
    """,
)
def llm_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per document (sklearn-style smoothed idf:
    ln((N+1)/(df+1)) + 1, so a token in every doc still scores > 0).

    Scale shape: per-doc term frequencies first (the groupBy(doc_id,
    tok) shrinks everything downstream to distinct doc-token pairs),
    document frequencies are a second aggregate OVER tf (not over the
    raw explode — df = distinct docs per token is exactly one row per
    tf group), and the corpus size rides a broadcast scalar. The tok
    join is stopword-hot — AQE skew-split territory, same mechanism as
    the unigram-LM join. Ranking happens on the ROUNDED score in both
    engines (ranking raw doubles would let a last-ulp summation
    difference reorder near-ties), with the token itself as the
    deterministic tiebreak; row_number ≤ 5 caps the per-doc output.
    """
    from pyspark.sql import Window

    from etl_migrate_api_spark.functions.text import ws_tokens

    docs = load(spark, "documents", sf_dir)
    ex = dd._spread(docs.select("doc_id", ws_tokens("text").alias("t"))).select(
        "doc_id", F.explode("t").alias("tok")
    )
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("f"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("f")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "tok", "score", F.col("rnk").cast("int"))
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via embedding clustering
# ---------------------------------------------------------------------------


@register("llm_semdedup", headline=True)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup drop list over the planted embeddings: k-means cluster
    the corpus, compare pairs only within each cluster, drop every
    vector with a smaller-id same-cell neighbor at cosine ≥ 0.95
    (operators/similarity.semdedup_drops — the quadratic compare is
    confined to clusters; the planted scaled copies share their
    original's direction, hence its argmax cell, so recall on true
    duplicates is exact). Rows-only: the k-means training is a
    driver-side numpy Lloyd over a deterministic sample — not
    SQL-expressible; precision/recall/determinism are pytest-checked
    against the brute-force all-pairs oracle."""
    return sim.semdedup_drops(
        planted_embeddings(spark, sf_dir), threshold=0.95, k=8
    ).orderBy("vec_id")


_SEMDEDUP_K = 8


def _semdedup_pinned_oracle(k: int = _SEMDEDUP_K, thr: str = "0.95") -> str:
    """SemDeDup with PINNED centroids as exact SQL — the same
    trained-vs-pinned twin pattern as llm_ann_pq_adc: centroids are the
    k md5-first planted rows (pure selection), assignment is argmax of
    the 9dp-rounded sequential-double cosine-to-centroid (|v| constant
    per row, so dot/|c| suffices) with ties to the lowest cent_id, and
    the drop rule is the operator's own order-free contract: b drops
    iff some same-cell a < b has round(cos, 9) ≥ thr; dup_of = the
    smallest such a; sim = that pair's cosine at 6dp."""
    return f"""
      with emb as materialized (
        select vec_id, cast(embedding as double[]) as v
        from ({PLANTED_EMB_SQL})
      ),
      cents as materialized (
        select * from (
          select vec_id as cent_src, v as cv, row_number() over (
                   order by md5(cast(vec_id as varchar)), vec_id) - 1
                 as cent_id
          from emb)
        where cent_id < {k}
      ),
      assigned as materialized (
        select vec_id, v, cent_id as cell from (
          select e.vec_id, e.v, c.cent_id,
                 row_number() over (
                   partition by e.vec_id
                   order by round(list_dot_product(e.v, c.cv)
                                  / sqrt(list_dot_product(c.cv, c.cv)), 9)
                            desc,
                            c.cent_id) as rn
          from emb e cross join cents c)
        where rn = 1
      ),
      pairs as materialized (
        select a.vec_id as ia, b.vec_id as ib, a.cell,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 9) as s9,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) as s6
        from assigned a join assigned b
          on a.cell = b.cell and a.vec_id < b.vec_id
      )
      select ib as vec_id, dup_of, cast(cell as int) as cell, sim
      from (
        select ib, ia as dup_of, cell, s6 as sim,
               row_number() over (partition by ib order by ia) as rn
        from pairs where s9 >= {thr})
      where rn = 1
      order by vec_id
    """


@register(
    "llm_semdedup_pinned",
    oracle=_semdedup_pinned_oracle(),
    survey_refs=("E1", "J2"),
)
def llm_semdedup_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup through the driver's DuckDB gate — the oracle-checked
    twin of llm_semdedup (which keeps the k-means training + per-cell
    GEMM as the production variant): centroids are PINNED to the k=8
    md5-first planted rows (pure deterministic selection, so DuckDB
    rebuilds them from the same parquet), assignment is an argmax over
    9dp-rounded sequential-double cosines to the 8 centroid constants
    (one projection, no shuffle — the pq_adc expression pattern), and
    the within-cell pair compare + order-free drop rule (smallest
    same-cell smaller-id neighbor at cos ≥ 0.95) runs as an equi-join
    on the cell id — the ONE shuffle, exactly the SemDeDup scale shape:
    Σ|cell|² work, never |corpus|². Externalizes the family's
    correctness (cell bucketing, pair rule, drop/representative
    selection) through the hash gate; clustering QUALITY stays pytest-
    checked on the trained variant."""
    import math

    emb = planted_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_SEMDEDUP_K)
        .collect()
    )
    from etl_migrate_api_spark.functions.vectors import (
        cosine_similarity,
        dot as vdot,
    )

    def dot_seq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    cands = []
    for cid, r in enumerate(cents):
        cv = [float(x) for x in r["v"]]
        nrm = math.sqrt(dot_seq(cv, cv))
        score = F.round(
            vdot(F.col("v"), F.array(*[F.lit(t) for t in cv])) / F.lit(nrm),
            9,
        )
        cands.append(F.struct((-score).alias("ns"), F.lit(cid).alias("c")))
    assigned = emb.select(
        "vec_id", "v", F.array_min(F.array(*cands))["c"].alias("cell")
    )
    a = assigned.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"), "cell"
    )
    b = assigned.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"), "cell"
    )
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, "cell")
        .where(F.col("ia") < F.col("ib"))
        .select(
            "ib",
            "ia",
            "cell",
            F.round(cos, 9).alias("s9"),
            F.round(cos, 6).alias("s6"),
        )
        .where(F.col("s9") >= 0.95)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ib").orderBy("ia")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("ib").alias("vec_id"),
            F.col("ia").alias("dup_of"),
            F.col("cell").cast("int").alias("cell"),
            F.col("s6").alias("sim"),
        )
        .orderBy("vec_id")
    )


@register("llm_ann_pq_topk", headline=True)
def llm_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 for 10 query vectors with exact
    re-ranking of the top-100 shortlist (the Jégou two-stage recipe):
    codebooks trained driver-side on the bounded md5-ordered sample,
    corpus encoded to m=32 4-bit codes (16 bytes vs 256 float bytes —
    the 16× shrink that keeps a 100 TB embedding corpus scannable),
    queries scored against the codes via per-query lookup tables in
    one Arrow-batched gather, then only the shortlist rows' exact
    vectors fetched for the final order (measured recall@10 0.99 at
    sf0.1 on the hardest, near-uniform, distribution). Rows-only
    gate: codebook training iterates float means (no cross-engine SQL
    mirror); determinism and recall-vs-exact are asserted in
    tests/test_pq.py."""
    emb = load(spark, "embeddings", sf_dir)
    return sim.pq_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, m=32, ksub=16, rerank=100
    ).orderBy("query_id", "rank")


def _pq_adc_oracle(
    m: int = 8, dsub: int = 8, ksub: int = 16, n_queries: int = 5, k: int = 5
) -> str:
    """PQ/ADC as exact SQL (the HLL-style integer-exact mirror, r8
    verdict #6a): the codebook is PINNED — subvectors of the ksub
    md5-first corpus rows, pure selection, zero float training — so
    encode/score become deterministic arithmetic both engines can
    replay: every dot product is a sequential double sum
    (list_dot_product ≡ the zip_with+aggregate fold, proven
    bit-compatible by the MMR oracle), assignment scores are rounded
    to 9dp before a (score, cent_id) first-min, and the ADC estimate
    is a sum of DECIMAL(20,9) LUT entries — exact and order-
    independent, so the cross-engine float-summation-order trap
    cannot bite."""
    dim = dsub
    return f"""
      with emb as (
        select vec_id, cast(embedding as double[]) as v from embeddings
      ),
      sample as (
        select * from (
          select v, row_number() over (
                   order by md5(cast(vec_id as varchar)), vec_id) - 1
                 as cent_id
          from emb)
        where cent_id < {ksub}
      ),
      cents as (
        select cent_id, j,
               list_slice(v, j*{dim}+1, j*{dim}+{dim}) as cv
        from sample cross join range({m}) r(j)
      ),
      codes as (
        select vec_id, j, cent_id as code from (
          select e.vec_id, c.j, c.cent_id,
                 row_number() over (
                   partition by e.vec_id, c.j
                   order by round(
                     list_dot_product(c.cv, c.cv)
                     - 2 * list_dot_product(
                         list_slice(e.v, c.j*{dim}+1, c.j*{dim}+{dim}), c.cv),
                     9),
                   c.cent_id) as rn
          from emb e cross join cents c)
        where rn = 1
      ),
      q as (
        select vec_id as query_id, v as qv from emb
        where vec_id < {n_queries}
      ),
      lut as (
        select q.query_id, c.j, c.cent_id,
               cast(round(
                 list_dot_product(
                   list_slice(q.qv, c.j*{dim}+1, c.j*{dim}+{dim}), c.cv),
                 9) as decimal(20,9)) as w
        from q cross join cents c
      ),
      est as (
        select l.query_id, cd.vec_id as neighbor_id, sum(l.w) as e
        from codes cd join lut l on l.j = cd.j and l.cent_id = cd.code
        group by 1, 2
      )
      select query_id, cast(rn as int) as rank, neighbor_id,
             cast(e as double) as est_ip
      from (
        select query_id, neighbor_id, e,
               row_number() over (partition by query_id
                                  order by e desc, neighbor_id) as rn
        from est)
      where rn <= {k}
    """


@register("llm_ann_pq_adc", oracle=_pq_adc_oracle(), survey_refs=("J2", "O2"))
def llm_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5 with a PINNED codebook — the
    oracle-checked twin of llm_ann_pq_topk (which keeps the trained
    codebooks and the GEMM fast path as the production variant): the
    codebook is the ksub=16 md5-first corpus rows' subvectors (pure
    deterministic selection — no Lloyd iterations, so DuckDB can
    rebuild it from the same parquet), encode is a per-row expression
    tree (m=8 subspaces × 16 sequential-double scores, 9dp-rounded,
    (score, cent_id) first-min via array_min on structs — one
    projection, NO shuffle, no UDF), and the ADC estimate is an exact
    DECIMAL(20,9) sum of per-subspace LUT literals built driver-side
    from the bounded query set (5 queries × 8 × 16 = 640 decimals —
    broadcast as literals, never a join side). The one shuffle is the
    final per-query top-k window. This externalizes the ADC gather's
    correctness — LUT lookup + sum + rank — through the driver's
    DuckDB gate; quantization QUALITY (recall vs exact) stays pinned
    in tests/test_pq.py against the trained path."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import Window

    m, dsub, ksub, k, n_q = 8, 8, 16, 5, 5
    emb = load(spark, "embeddings", sf_dir)

    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(ksub)
        .collect()
    )
    cents = [
        [
            [float(x) for x in r["embedding"]][j * dsub : (j + 1) * dsub]
            for r in sample
        ]
        for j in range(m)
    ]
    qrows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < n_q)
        .select("vec_id", "embedding")
        .collect()
    )

    def dot_seq(a: list[float], b: list[float]) -> float:
        # left-to-right mul-add — bit-identical to both engines' fold
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    NINE_DP = Decimal("0.000000001")
    lut = [
        [
            [
                Decimal(dot_seq(qv[j * dsub : (j + 1) * dsub], cents[j][c]))
                .quantize(NINE_DP, ROUND_HALF_UP)
                for c in range(ksub)
            ]
            for j in range(m)
        ]
        for _, qv in qrows
    ]

    from etl_migrate_api_spark.functions.vectors import dot as vdot

    code_cols = []
    for j in range(m):
        sub = F.slice(F.col("embedding"), j * dsub + 1, dsub)
        cands = []
        for c in range(ksub):
            cv = cents[j][c]
            cc = dot_seq(cv, cv)  # constant per centroid
            sc = vdot(sub, F.array(*[F.lit(t) for t in cv]))
            score = F.round(F.lit(cc) - F.lit(2.0) * sc, 9)
            cands.append(F.struct(score.alias("s"), F.lit(c).alias("c")))
        code_cols.append(F.array_min(F.array(*cands))["c"].alias(f"c{j}"))

    # materialize codes behind a repartition barrier: the est stage
    # references each code column once per query, and CollapseProject
    # would otherwise inline the 16-way score expression 5× per row
    codes = emb.select(
        F.col("vec_id").alias("neighbor_id"), *code_cols
    ).repartition(spark.sparkContext.defaultParallelism)

    ests = []
    for qi in range(len(qrows)):
        est = None
        for j in range(m):
            arr = F.array(
                *[
                    F.lit(lut[qi][j][c]).cast("decimal(20,9)")
                    for c in range(ksub)
                ]
            )
            term = F.element_at(arr, F.col(f"c{j}") + 1)
            est = term if est is None else est + term
        ests.append(est)

    qid_arr = F.array(*[F.lit(q) for q, _ in qrows])
    scored = codes.select(
        "neighbor_id", F.posexplode(F.array(*ests)).alias("pos", "e")
    ).select(
        F.element_at(qid_arr, F.col("pos") + 1).alias("query_id"),
        "neighbor_id",
        "e",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("e").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            F.col("e").cast("double").alias("est_ip"),
        )
    )


@register("llm_ann_sq8_topk", headline=True)
def llm_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized top-5 for 10 query vectors: per-dimension
    exact min/max bounds (one distributed pass), corpus encoded to
    one byte per dim (64 bytes vs 256 float bytes — the 4× shrink at
    near-exact recall), all queries scored per Arrow batch with ONE
    GEMM against the affine-reconstruction weights, exact rerank of
    the top-50 shortlist. The third point on the RECALL.md frontier
    between raw floats and PQ. Rows-only gate: the byte quantization
    has no cross-engine SQL mirror; recall-vs-exact and determinism
    are asserted in tests/test_sq8.py."""
    emb = load(spark, "embeddings", sf_dir)
    return sim.sq8_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, rerank=50
    ).orderBy("query_id", "rank")


def _sq8_adc_oracle(dim: int = 64, n_queries: int = 5, k: int = 5) -> str:
    """SQ8 quantize+score as exact SQL — the hash-checked twin of
    llm_ann_sq8_topk (same pattern as _pq_adc_oracle): min/max bounds
    are exact (no float summation anywhere in 'training'), the byte
    codes replay numpy's rint via DuckDB round_even (half-to-even,
    verified equal on the .5 lattice), and the asymmetric score is a
    sum of INTEGER-MICRO terms — round(q_d·recon_d · 1e9) as BIGINT —
    so the cross-engine float-summation-order trap cannot bite (the
    unigram-viterbi integer-micro trick applied to ADC)."""
    return f"""
      with emb as (
        select vec_id, cast(embedding as double[]) as v from embeddings
      ),
      stats as (
        select j, min(v[j+1]) as mn, max(v[j+1]) as mx,
               (max(v[j+1]) - min(v[j+1])) / 255.0 as dlt
        from emb cross join range({dim}) r(j)
        group by j
      ),
      codes as (
        select e.vec_id, s.j,
               case when s.mx > s.mn
                    then cast(round_even(
                           255.0 * (e.v[s.j+1] - s.mn) / (s.mx - s.mn), 0)
                         as int)
                    else 0 end as code
        from emb e cross join stats s
      ),
      q as (
        select vec_id as query_id, v as qv from emb
        where vec_id < {n_queries}
      ),
      est as (
        select q.query_id, c.vec_id as neighbor_id,
               sum(cast(round(
                     q.qv[c.j+1] * (s.mn + c.code * s.dlt)
                     * 1000000000.0) as bigint)) as ti
        from codes c join stats s using (j) cross join q
        group by 1, 2
      )
      select query_id, cast(rn as int) as rank, neighbor_id,
             cast(ti as double) / 1000000000.0 as est_ip
      from (
        select query_id, neighbor_id, ti,
               row_number() over (partition by query_id
                                  order by ti desc, neighbor_id) as rn
        from est)
      where rn <= {k}
    """


@register(
    "llm_ann_sq8_adc", oracle=_sq8_adc_oracle(), survey_refs=("J2", "O2")
)
def llm_ann_sq8_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 asymmetric top-5 through the DuckDB gate — the oracle-checked
    twin of llm_ann_sq8_topk (which keeps the GEMM fast path as the
    production variant). What makes SQ8 twin-able with NO pinning at
    all: the 'training' is per-dimension exact min/max (no iterated
    float means, no summation — both engines read identical bounds off
    the same parquet), the byte codes reuse the PRODUCTION
    sim.sq8_minmax + sim.sq8_encode path verbatim (numpy rint ≡ DuckDB
    round_even on identical IEEE doubles), and the asymmetric score
    Σ_d q_d·(lo_d + code_d·Δ_d) is summed as INTEGER MICROS — each term
    rounded to a BIGINT at 1e-9 before the sum, so the result is
    order-independent and bit-equal across engines. This externalizes
    the entire SQ8 pipeline — bounds, quantization, reconstruction,
    scoring, ranking — through the driver's hash gate; GEMM-path parity
    and recall stay pinned in tests/test_sq8.py."""
    from pyspark.sql import Window

    n_q, k = 5, 5
    emb = load(spark, "embeddings", sf_dir)
    lo, hi = sim.sq8_minmax(emb)
    dlt = [(h - l) / 255.0 for l, h in zip(lo, hi)]
    codes = sim.sq8_encode(emb, lo, hi).repartition(
        spark.sparkContext.defaultParallelism
    )
    qrows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < n_q)
        .select("vec_id", "embedding")
        .collect()
    )
    lo_arr = F.array(*[F.lit(x) for x in lo])
    dl_arr = F.array(*[F.lit(x) for x in dlt])

    def est_for(qv: list[float]):
        q_arr = F.array(*[F.lit(x) for x in qv])
        terms = F.transform(
            F.col("codes"),
            lambda c, i: F.round(
                F.element_at(q_arr, i + 1)
                * (
                    F.element_at(lo_arr, i + 1)
                    + c.cast("double") * F.element_at(dl_arr, i + 1)
                )
                * F.lit(1e9)
            ).cast("long"),
        )
        return F.aggregate(
            terms, F.lit(0).cast("long"), lambda a, t: a + t
        )

    qid_arr = F.array(*[F.lit(q) for q, _ in qrows])
    scored = codes.select(
        F.col("vid").alias("neighbor_id"),
        F.posexplode(F.array(*[est_for(qv) for _, qv in qrows])).alias(
            "pos", "ti"
        ),
    ).select(
        F.element_at(qid_arr, F.col("pos") + 1).alias("query_id"),
        "neighbor_id",
        "ti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ti").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            (F.col("ti").cast("double") / F.lit(1e9)).alias("est_ip"),
        )
    )


def _ivfpq_adc_oracle(
    kc: int = 4,
    m: int = 8,
    dsub: int = 8,
    ksub: int = 16,
    n_queries: int = 5,
    k: int = 5,
    nprobe: int = 2,
    dim: int = 64,
) -> str:
    """IVF-PQ (coarse quantizer + product-quantized RESIDUALS + probed
    ADC) as exact SQL — the composite twin: coarse centroids are the
    kc md5-first rows (pure selection), PQ codebooks are subvectors of
    the ksub md5-first rows' residuals, every assignment is a
    9dp-rounded sequential-double argmin, and the ADC estimate is
    q·cent_cell + Σ_j LUT[j][code_j] summed in DECIMAL(20,9) — exact,
    order-free, hash-stable across engines."""
    return f"""
      with emb as (
        select vec_id, cast(embedding as double[]) as v from embeddings
      ),
      ranked as (
        select vec_id, v, row_number() over (
                 order by md5(cast(vec_id as varchar)), vec_id) - 1 as rk
        from emb
      ),
      cents as (select rk as cell_id, v as cv from ranked where rk < {kc}),
      assigned as (
        select vec_id, v, cell from (
          select e.vec_id, e.v, c.cell_id as cell,
                 row_number() over (partition by e.vec_id order by
                   round(list_dot_product(c.cv, c.cv)
                         - 2 * list_dot_product(e.v, c.cv), 9),
                   c.cell_id) as rn
          from emb e cross join cents c)
        where rn = 1
      ),
      resid as (
        select a.vec_id, a.cell,
               list_transform(range({dim}), j -> a.v[j+1] - c.cv[j+1]) as r
        from assigned a join cents c on c.cell_id = a.cell
      ),
      samp as (
        select rr.rk as pq_id, s.r as rv
        from ranked rr join resid s using (vec_id)
        where rr.rk < {ksub}
      ),
      cb as (
        select pq_id, j, list_slice(rv, j*{dsub}+1, j*{dsub}+{dsub}) as cv
        from samp cross join range({m}) g(j)
      ),
      codes as (
        select vec_id, cell, j, pq_id as code from (
          select s.vec_id, s.cell, c.j, c.pq_id,
                 row_number() over (partition by s.vec_id, c.j order by
                   round(list_dot_product(c.cv, c.cv)
                         - 2 * list_dot_product(
                             list_slice(s.r, c.j*{dsub}+1,
                                        c.j*{dsub}+{dsub}), c.cv), 9),
                   c.pq_id) as rn
          from resid s cross join cb c)
        where rn = 1
      ),
      q as (
        select vec_id as query_id, v as qv from emb
        where vec_id < {n_queries}
      ),
      probes as (
        select query_id, cell from (
          select q.query_id, c.cell_id as cell,
                 row_number() over (partition by q.query_id order by
                   round(list_dot_product(c.cv, c.cv)
                         - 2 * list_dot_product(q.qv, c.cv), 9),
                   c.cell_id) as rn
          from q cross join cents c)
        where rn <= {nprobe}
      ),
      qdc as (
        select q.query_id, c.cell_id as cell,
               cast(round(list_dot_product(q.qv, c.cv), 9)
                    as decimal(20,9)) as w0
        from q cross join cents c
      ),
      lut as (
        select q.query_id, c.j, c.pq_id,
               cast(round(list_dot_product(
                      list_slice(q.qv, c.j*{dsub}+1, c.j*{dsub}+{dsub}),
                      c.cv), 9) as decimal(20,9)) as w
        from q cross join cb c
      ),
      est as (
        select l.query_id, cd.vec_id as neighbor_id, cd.cell,
               sum(l.w) as e
        from codes cd
        join probes p on p.cell = cd.cell
        join lut l on l.query_id = p.query_id
                  and l.j = cd.j and l.pq_id = cd.code
        group by 1, 2, 3
      ),
      tot as (
        select e.query_id, e.neighbor_id, e.e + d.w0 as e
        from est e
        join qdc d on d.query_id = e.query_id and d.cell = e.cell
      )
      select query_id, cast(rn as int) as rank, neighbor_id,
             cast(e as double) as est_ip
      from (
        select query_id, neighbor_id, e,
               row_number() over (partition by query_id
                                  order by e desc, neighbor_id) as rn
        from tot)
      where rn <= {k}
    """


@register(
    "llm_ann_ivfpq_adc", oracle=_ivfpq_adc_oracle(), survey_refs=("J2", "O2")
)
def llm_ann_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ probed ADC top-5 with PINNED coarse centroids and PINNED
    residual codebooks — the oracle-checked twin of llm_ann_ivfpq_topk
    (which keeps the trained faiss-shaped path as the production
    variant). Composition of the two proven twin tricks: coarse cells
    and PQ codes are 9dp-rounded sequential-double argmins over
    SELECTED (never trained) codebooks — kc=4 md5-first rows as coarse
    centroids, residual subvectors of the ksub=16 md5-first rows as PQ
    codebooks — and the probed ADC estimate is q·cent_cell plus an
    exact DECIMAL(20,9) LUT sum over the query's nprobe=2 cells only.
    Every stage of the production IVF-PQ shape is externalized: coarse
    assign, residual encode, cell probing, LUT gather, rank. Residuals
    keep the corpus pass local (no shuffle until the final top-k
    window); the probe restriction lands as a broadcast semi-join on
    the cell column. Quantization QUALITY stays pinned in
    tests/test_ivfpq.py against the trained path."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import Window

    from etl_migrate_api_spark.functions.vectors import dot as vdot

    kc, m, dsub, ksub, n_q, k, nprobe = 4, 8, 8, 16, 5, 5, 2
    emb = load(spark, "embeddings", sf_dir)
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(ksub)
        .collect()
    )
    sample_v = [[float(x) for x in r["embedding"]] for r in sample]
    cents = sample_v[:kc]

    def dot_seq(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cell_expr(vcol):
        # (9dp-rounded L2 score, cell_id) first-min — identical shape to
        # the oracle's row_number-over-round ordering
        cands = []
        for cid, cv in enumerate(cents):
            cc = dot_seq(cv, cv)
            sc = vdot(vcol, F.array(*[F.lit(t) for t in cv]))
            cands.append(
                F.struct(
                    F.round(F.lit(cc) - F.lit(2.0) * sc, 9).alias("s"),
                    F.lit(cid).alias("c"),
                )
            )
        return F.array_min(F.array(*cands))["c"]

    # sample-row cells via the ENGINE expression (keeps F.round
    # semantics out of Python), then residual codebooks in pure
    # IEEE-double subtraction
    samp_df = local_df(
        spark,
        [(i, sample_v[i]) for i in range(ksub)],
        "pq_id int, v array<double>",
    )
    samp_cells = {
        r["pq_id"]: int(r["c"])
        for r in samp_df.select(
            "pq_id", cell_expr(F.col("v")).alias("c")
        ).collect()
    }
    resid_v = [
        [x - c for x, c in zip(sample_v[i], cents[samp_cells[i]])]
        for i in range(ksub)
    ]
    cb = [
        [resid_v[c][j * dsub : (j + 1) * dsub] for c in range(ksub)]
        for j in range(m)
    ]

    cents2d = F.array(
        *[F.array(*[F.lit(x) for x in cv]) for cv in cents]
    )
    # two projections so the 4×64-dot coarse assignment runs ONCE per
    # row: Catalyst does not CSE an expression referenced both as a
    # plain column and inside a higher-order-function lambda
    assigned = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        cell_expr(F.col("embedding")).alias("cell"),
    ).repartition(spark.sparkContext.defaultParallelism)
    base = assigned.select(
        "neighbor_id",
        "cell",
        F.zip_with(
            "embedding",
            F.element_at(cents2d, F.col("cell") + 1),
            lambda x, c: x - c,
        ).alias("r"),
    )

    code_cols = []
    for j in range(m):
        sub = F.slice(F.col("r"), j * dsub + 1, dsub)
        cands = []
        for c in range(ksub):
            cv = cb[j][c]
            cc = dot_seq(cv, cv)
            sc = vdot(sub, F.array(*[F.lit(t) for t in cv]))
            cands.append(
                F.struct(
                    F.round(F.lit(cc) - F.lit(2.0) * sc, 9).alias("s"),
                    F.lit(c).alias("c"),
                )
            )
        code_cols.append(F.array_min(F.array(*cands))["c"].alias(f"c{j}"))
    codes = base.select("neighbor_id", "cell", *code_cols).repartition(
        spark.sparkContext.defaultParallelism
    )

    qrows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < n_q)
        .select("vec_id", "embedding")
        .collect()
    )
    # probe cells engine-side on the bounded query set (same rounded
    # argsort the oracle ranks with)
    q_df = local_df(
        spark, [(qid, qv) for qid, qv in qrows], "query_id long, qv array<double>"
    )
    pc = []
    for cid, cv in enumerate(cents):
        cc = dot_seq(cv, cv)
        sc = vdot(F.col("qv"), F.array(*[F.lit(t) for t in cv]))
        pc.append(
            F.struct(
                F.round(F.lit(cc) - F.lit(2.0) * sc, 9).alias("s"),
                F.lit(cid).alias("c"),
            )
        )
    probe_pairs = [
        (int(r["query_id"]), int(r["cell"]))
        for r in q_df.select(
            "query_id",
            F.explode(
                F.slice(F.array_sort(F.array(*pc)), 1, nprobe)
            ).alias("p"),
        )
        .select("query_id", F.col("p")["c"].alias("cell"))
        .collect()
    ]

    NINE_DP = Decimal("0.000000001")

    def dec(x: float) -> Decimal:
        return Decimal(x).quantize(NINE_DP, ROUND_HALF_UP)

    qdc = [
        [dec(dot_seq(qv, cents[c])) for c in range(kc)] for _, qv in qrows
    ]
    lut = [
        [
            [
                dec(dot_seq(qv[j * dsub : (j + 1) * dsub], cb[j][c]))
                for c in range(ksub)
            ]
            for j in range(m)
        ]
        for _, qv in qrows
    ]

    ests = []
    for qi in range(len(qrows)):
        w0 = F.element_at(
            F.array(
                *[F.lit(qdc[qi][c]).cast("decimal(20,9)") for c in range(kc)]
            ),
            F.col("cell") + 1,
        )
        est = w0
        for j in range(m):
            arr = F.array(
                *[
                    F.lit(lut[qi][j][c]).cast("decimal(20,9)")
                    for c in range(ksub)
                ]
            )
            est = est + F.element_at(arr, F.col(f"c{j}") + 1)
        ests.append(est)

    qid_arr = F.array(*[F.lit(q) for q, _ in qrows])
    scored = codes.select(
        "neighbor_id",
        "cell",
        F.posexplode(F.array(*ests)).alias("pos", "e"),
    ).select(
        F.element_at(qid_arr, F.col("pos") + 1).alias("query_id"),
        "neighbor_id",
        "cell",
        "e",
    )
    probe_df = local_df(spark, probe_pairs, "query_id long, cell int")
    scored = scored.join(
        F.broadcast(probe_df), ["query_id", "cell"], "left_semi"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("e").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            F.col("e").cast("double").alias("est_ip"),
        )
    )


def _ivf_probe_pinned_oracle(
    kc: int = 4, n_queries: int = 5, k: int = 5, nprobe: int = 2
) -> str:
    """The persisted-IVF PROBE path as exact SQL (r10 verdict #3): the
    llm_ann_ivfpq_adc recipe minus PQ. Coarse centroids are the kc
    md5-first rows (pure selection, no float training); the BUILD-side
    cell assignment is a 9dp-rounded normalized-dot argmax (ties to the
    lowest cell id — the rounding absorbs sub-9dp float fuzz, the
    proven ADC-twin trick); the PROBE-side assignment replays
    ivf_topk_from_index's driver-side ranking exactly — RAW
    sequential-double dots against unit centroids (list_dot_product ≡
    the Python left-fold), desc, lowest cell id on ties; and the final
    rank is exact-cosine (sim desc, neighbor_id), float-free output —
    the llm_ann_bruteforce_topk contract."""
    return f"""
      with emb as (
        select vec_id, cast(embedding as double[]) as v from embeddings
      ),
      ranked as (
        select vec_id, v, row_number() over (
                 order by md5(cast(vec_id as varchar)), vec_id) - 1 as rk
        from emb
      ),
      units as (
        select rk as cell_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) as uv
        from ranked where rk < {kc}
      ),
      assigned as (
        select vec_id, v, cell from (
          select e.vec_id, e.v, u.cell_id as cell,
                 row_number() over (partition by e.vec_id order by
                   round(list_dot_product(e.v, u.uv), 9) desc,
                   u.cell_id) as rn
          from emb e cross join units u)
        where rn = 1
      ),
      q as (
        select vec_id as query_id, v as qv from emb
        where vec_id < {n_queries}
      ),
      probes as (
        select query_id, cell from (
          select q.query_id, u.cell_id as cell,
                 row_number() over (partition by q.query_id order by
                   list_dot_product(q.qv, u.uv) desc, u.cell_id) as rn
          from q cross join units u)
        where rn <= {nprobe}
      ),
      scored as (
        select q.query_id, a.vec_id as neighbor_id, a.cell,
               list_cosine_similarity(q.qv, a.v) as sim
        from q
        join probes p on p.query_id = q.query_id
        join assigned a on a.cell = p.cell
        where a.vec_id <> q.query_id
      ),
      r as (
        select query_id, neighbor_id, cell,
               row_number() over (partition by query_id
                                  order by sim desc, neighbor_id) as rank
        from scored)
      select query_id, cast(rank as int) as rank, neighbor_id,
             cast(cell as int) as cell
      from r where rank <= {k}
    """


@register(
    "llm_ann_ivf_probe_pinned",
    oracle=_ivf_probe_pinned_oracle(),
    survey_refs=("J2", "O2"),
)
def llm_ann_ivf_probe_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVF index's PRUNED-PROBE path through the DuckDB
    gate — the oracle-checked twin of llm_ann_ivf_query (whose float
    k-means training keeps it rows-only). Centroids are PINNED (kc=4
    md5-first rows, pure selection), the cell layout is written
    through the production partitioned-write shape (repartition on
    cell → partitionBy — the same parquet layout write_ivf_index
    produces), and the query runs the UNMODIFIED production
    ivf_topk_from_index (operators/similarity.py:681): driver-side
    probe assignment over unit-normalized persisted centroids, a
    partition filter on the probed cells (file-listing-time pruning,
    plan-asserted in tests/test_kmeans_ivf.py), exact-cosine rank. A
    hash match externalizes every stage of the production probe —
    centroid read-back, normalization, probe ranking + tie rule,
    partition-pruned scan, cosine scoring, (sim desc, id) top-k —
    leaving k-means training itself as the production path's only
    ungated stage. Build-side assignment is a 9dp-rounded
    normalized-dot argmax (the ADC-twin rounding absorbs float fuzz;
    the production numpy-argmax assigner is recall-tested in
    tests/test_kmeans_ivf.py)."""
    import uuid

    from etl_migrate_api_spark.functions.vectors import dot as vdot

    kc, n_q, k, nprobe = 4, 5, 5, 2
    emb = load(spark, "embeddings", sf_dir)
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(kc)
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in sample]
    units = []
    for cv in cents:
        nrm = sum(x * x for x in cv) ** 0.5
        units.append([x / nrm for x in cv] if nrm > 0 else cv)

    cands = []
    for cid, uv in enumerate(units):
        sc = vdot(F.col("embedding"), F.array(*[F.lit(t) for t in uv]))
        cands.append(
            F.struct((-F.round(sc, 9)).alias("ns"), F.lit(cid).alias("c"))
        )
    cell = F.array_min(F.array(*cands))["c"].cast("int")

    path = _ivf_shared_path(sf_dir) + f"_pinned_{uuid.uuid4().hex[:8]}"
    _ivf_sweep_stale(os.path.dirname(path))
    (
        emb.select("vec_id", "embedding", cell.alias("cell"))
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    local_df(
        spark,
        [(cid, cv) for cid, cv in enumerate(cents)],
        "cent_id int, cent_v array<double>",
    ).write.mode("overwrite").parquet(f"{path}.centroids")
    # the one-shot layout is swept by the next call's _ivf_sweep_stale
    # (the result is collected lazily by the driver — sweeping here
    # would pull the parquet out from under the returned plan), same
    # lifecycle as llm_ann_ivf_topk's unique dirs
    return sim.ivf_topk_from_index(
        spark, path, emb.where(F.col("vec_id") < n_q), k=k, nprobe=nprobe
    )


def _kmeans_micro_oracle(
    k: int = 4, n_iter: int = 2, dim: int = 64
) -> str:
    """Integer-micro Lloyd's as exact SQL: components quantized with
    round_even (≡ Spark bround, both half-to-even on identical
    doubles), L2 assignment scores cc − 2·v·c as integer-valued
    doubles (all sums ≪ 2⁵³ — list_dot_product is exact), per-cell
    per-dim integer sums, truncating `//` mean division (mirrored by
    _trunc_div engine-side), empty cells dropping by inner-join
    absence. One unrolled assign→sum→update block per iteration."""
    blocks = []
    prev = "c0"
    for it in range(1, n_iter + 1):
        blocks.append(
            f""",
      a{it} as materialized (
        select vec_id, v, cell from (
          select e.vec_id, e.v, c.cell_id as cell,
                 row_number() over (partition by e.vec_id order by
                   cast(list_dot_product(cast(c.cv as double[]),
                                         cast(c.cv as double[]))
                        - 2 * list_dot_product(cast(e.v as double[]),
                                               cast(c.cv as double[]))
                        as bigint) asc,
                   c.cell_id) as rn
          from emb e cross join {prev} c)
        where rn = 1
      ),
      s{it} as materialized (
        select cell, r.i as dim,
               cast(sum(v[r.i + 1]) as bigint) as s,
               cast(count(*) as bigint) as n
        from a{it} cross join range({dim}) r(i)
        group by 1, 2
      ),
      c{it} as materialized (
        select cell as cell_id, list(s // n order by dim) as cv
        from s{it} group by cell
      )"""
        )
        prev = f"c{it}"
    return f"""
      with emb as materialized (
        select vec_id,
               list_transform(cast(embedding as double[]),
                 x -> cast(round_even(x * 1000000.0, 0) as bigint)) as v
        from embeddings
      ),
      ranked as materialized (
        select vec_id, v, row_number() over (
                 order by md5(cast(vec_id as varchar)), vec_id) - 1 as rk
        from emb
      ),
      c0 as materialized (
        select rk as cell_id, v as cv from ranked where rk < {k}
      ){''.join(blocks)}
      select cast(cell as int) as cent_id, cast(dim as int) as dim,
             (s // n) as c_micro, n as n_members
      from s{n_iter}
      order by cent_id, dim
    """


@register(
    "llm_ann_kmeans_micro",
    oracle=_kmeans_micro_oracle(),
    survey_refs=("A3", "X1"),
)
def llm_ann_kmeans_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MEANS TRAINING through the DuckDB gate — the last ungated
    stage of the ANN family (the r10 verdict's residual after the ADC
    and probe twins), via the integer-micro recipe that gated the
    unigram trainer. kmeans_micro (operators/similarity.py) runs
    Lloyd's FULLY DISTRIBUTED: quantizing components to integer micros
    makes the assignment scores exact bigints and the mean update an
    order-free integer sum + truncating division, so the cluster-side
    iteration is bit-reproducible on any partitioning — the exact
    property whose ABSENCE forces the production float trainer
    (kmeans_centroids) to iterate driver-side in numpy, as its
    docstring documents. Structure gated end to end: md5-first-k
    seeding, argmin-L2 assignment with lowest-id ties, per-cell means,
    empty-cell drop, n_iter=2 — matching write_ivf_index's schedule.
    Documented deviations from the float path (each forced by integer
    exactness): L2 instead of spherical assignment, truncating mean
    division, no train_cap. The float trainer remains the production
    speed path, determinism/recall-tested in tests/test_kmeans_ivf.py;
    this twin externalizes the ALGORITHM."""
    emb = load(spark, "embeddings", sf_dir)
    return sim.kmeans_micro(emb, k=4, n_iter=2)


@register("llm_image_phash_dedup")
def llm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection by 64-bit DCT perceptual hash: luma →
    32×32 → DCT-II → 8×8 low-band median bits (operators/multimodal.py
    ::phash_images, pure numpy in mapInPandas), then the SAME Manku
    4×16-bit pigeonhole band join as text SimHash
    (dedup.hamming64_pairs — one shared index layout for every 64-bit
    signature). Planted exact pixel copies (media_id+500000) must land
    at hamming 0; distinct md5-derived images sit near the binomial
    mean (~32 bits), so the candidate join stays sparse. Rows-only:
    the DCT/median pipeline has no SQL mirror; determinism,
    perturbation-robustness, and negative controls in
    tests/test_phash.py."""
    from etl_migrate_api_spark.operators.multimodal import (
        fake_media_table,
        phash_images,
    )
    from etl_migrate_api_spark.operators.dedup import hamming64_pairs

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "image")
    pixels = media.select(
        "media_id", F.substring("content", 34, 48).alias("pixels")
    )
    planted = pixels.unionByName(
        pixels.where(F.col("media_id") % 5 == 0).select(
            (F.col("media_id") + 500000).alias("media_id"), "pixels"
        )
    )
    sigs = phash_images(planted, 4, 4).persist()
    sigs.count()
    out = hamming64_pairs(sigs, max_hamming=3).orderBy("id_a", "id_b")
    out = out.persist()
    out.count()
    sigs.unpersist()
    return out


@register("llm_jpeg_phash_dedup")
def llm_jpeg_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup over REAL JPEG blobs with ZERO third-party codecs:
    deterministic baseline JPEGs (operators/jpeg.py encoder — ids cycle
    4:4:4 / 4:2:0 and restart intervals) → full entropy decode via the
    repo's own pure-python Huffman+IDCT baseline decoder (PIL is only
    an env-gated fast path; this container runs the stdlib path) →
    luma pHash → the shared Manku pigeonhole band join. Planted exact
    byte copies (media_id+600000) decode identically → hamming 0;
    distinct seeded textures sit near the binomial mean. Rows-only:
    the codec has no SQL mirror; CRC-exactness, roundtrip and
    corrupt-input gates live in tests/test_jpeg.py."""
    from etl_migrate_api_spark.operators.dedup import _spread, hamming64_pairs
    from etl_migrate_api_spark.operators.multimodal import (
        fake_jpeg_table,
        jpeg_phash_table,
    )

    docs = load(spark, "documents", sf_dir)
    # _spread: the small-SF parquet arrives in 1-2 splits; the encode +
    # entropy-decode work is pure CPU and must cover every core
    ids = _spread(
        docs.where(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("media_id")
        )
    )
    jpegs = fake_jpeg_table(ids)
    planted = jpegs.unionByName(
        jpegs.where(F.col("media_id") % 5 == 0).select(
            (F.col("media_id") + 600000).alias("media_id"), "content"
        )
    )
    sigs = jpeg_phash_table(planted).persist()
    sigs.count()
    out = hamming64_pairs(sigs, max_hamming=3).orderBy("id_a", "id_b")
    out = out.persist()
    out.count()
    sigs.unpersist()
    return out


@register("llm_audio_fingerprint_dedup")
def llm_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection: 64-bit energy-contour fingerprint over
    the REAL decoded PCM (operators/multimodal.py::audio_hash64_one —
    amplitude-scale-invariant sign-of-delta windows), then the shared
    Manku pigeonhole band join (dedup.hamming64_pairs). The query
    plants exact copies (media_id+600000, pure Spark — found at
    hamming 0); the property the contour hash adds over byte hashing —
    GAIN invariance (a re-mastered copy has identical sign-of-delta
    contours) — is proven on constructed PCM in
    tests/test_audio_hash.py. Rows-only."""
    from etl_migrate_api_spark.operators.dedup import hamming64_pairs
    from etl_migrate_api_spark.operators.multimodal import (
        audio_hash_table,
        fake_media_table,
    )

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "audio")
    planted = media.select("media_id", "content").unionByName(
        media.where(F.col("media_id") % 7 == 1).select(
            (F.col("media_id") + 600000).alias("media_id"), "content"
        )
    )
    sigs = audio_hash_table(planted).persist()
    sigs.count()
    out = hamming64_pairs(sigs, max_hamming=3).orderBy("id_a", "id_b")
    out = out.persist()
    out.count()
    sigs.unpersist()
    return out


@register("llm_ann_ivfpq_topk")
def llm_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite top-k over a PERSISTED index (faiss IndexIVFPQ
    shape — the actual 100 TB ANN layout): coarse cells partition the
    codes table (file-listing-time pruning, plan-asserted in
    tests/test_ivfpq.py), rows inside are 16-byte PQ codes, queries
    probe nprobe cells, ADC-score only those codes, and the shortlist
    reranks exactly against the source table. The timed number includes
    the index build (both trainers are bounded deterministic md5-sample
    Lloyds). Rows-only gate: iterated float means have no SQL mirror;
    recall/determinism/pruning in tests/test_ivfpq.py."""
    import shutil
    import tempfile
    import time
    import uuid

    emb = load(spark, "embeddings", sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(tempfile.gettempdir(), "spark_graft_ivfpq")
    cutoff = time.time() - 6 * 3600
    for stale in (
        os.path.join(root, d) for d in (os.listdir(root) if os.path.isdir(root) else [])
    ):
        try:
            if os.path.getmtime(stale) < cutoff:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass
    path = os.path.join(root, f"index_{tag}_{uuid.uuid4().hex[:8]}")
    try:
        sim.write_ivfpq_index(emb, path, k=8, m=32, ksub=16)
        out = sim.ivfpq_topk(
            spark,
            path,
            emb.where(F.col("vec_id") < 10),
            k=5,
            nprobe=3,
            rerank_corpus=emb,
            rerank=50,
        ).orderBy("query_id", "rank")
        # materialize the (tiny: n_queries×k) result onto the driver so
        # the returned DataFrame carries no lazy read of the index path,
        # then drop the just-built index — repeated bench/test runs must
        # not accumulate dirs for 6 h (the stale sweep above stays as a
        # backstop for crashed runs only)
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        # the index is three sibling dirs: codes + .centroids/.codebooks
        # sidecars (write_ivfpq_index layout)
        for d in (path, path + ".centroids", path + ".codebooks"):
            shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Capstone: the full curation pipeline as ONE query
# ---------------------------------------------------------------------------


_PIPELINE_ORACLE = f"""
with planted as ({PLANTED_DOCS_SQL}),
docs as (select doc_id, text from planted),
{_TEXT_METRIC_SQL},
q as (
  select r.doc_id,
         round((
           (case when n_tok >= 5 and n_tok <= 100000 then 1.0 else 0.0 end)
         + (case when punct_ratio <= 0.2 then 1.0 else 0.0 end)
         + (case when stop_ratio >= 0.01 then 1.0 else 0.0 end)
         + (case when mean_word_len >= 2.0 and mean_word_len <= 12.0 then 1.0 else 0.0 end)
         ) / 4.0, 4) as quality
  from r
),
pass1 as (
  select p.doc_id, p.text, q.quality
  from planted p join q on p.doc_id = q.doc_id
  where q.quality >= 0.75 and p.lang = 'en'
),
fp as (
  select doc_id, text, quality,
         md5(lower(regexp_replace(trim(text), '[ \\t\\r\\n\\f]+', ' ', 'g'))) as f
  from pass1
),
keep1 as (
  select doc_id, text, quality
  from (select *, row_number() over (partition by f order by doc_id) as rn from fp)
  where rn = 1
),
{_simhash_chain_sql("keep1")},
drops as (
  select distinct b.id as doc_id
  from sig a join sig b
    on a.id < b.id
   and bit_count(xor(a.simhash_lo, b.simhash_lo))
     + bit_count(xor(a.simhash_hi, b.simhash_hi)) <= 3
)
select k.doc_id, cast(k.quality as double) as quality
from keep1 k
where not exists (select 1 from drops d where d.doc_id = k.doc_id)
"""


@register(
    "llm_curation_pipeline",
    oracle=_PIPELINE_ORACLE,
    headline=True,
    survey_refs=("F1", "W1", "E1", "E2", "E3", "A3"),
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone: a training-data curation pipeline as ONE plan —
    quality gate (Gopher heuristics) → language filter → exact dedup
    (first-occurrence per content fingerprint) → SimHash near-dup drop
    (hamming ≤ 3, pigeonhole-banded) → surviving (doc_id, quality).
    Every stage is the already-verified operator; the pipeline verifies
    their COMPOSITION end-to-end against one composed oracle.

    Scale shape: the gates run before any shuffle (scan-level
    filters), the fingerprint dedup is one hash window, and the
    near-dup stage runs on the REDUCED survivor set (filters-first
    ordering is the pipeline-level optimization that matters at
    100 TB — near-dup cost scales with what passes the cheap gates,
    not the raw corpus)."""
    from pyspark.sql import Window

    from etl_migrate_api_spark.functions.text import fingerprint

    docs = planted_docs(spark, sf_dir)
    scored = docs.select(
        "doc_id", "text", "lang", quality_score("text").alias("quality")
    )
    pass1 = scored.where((F.col("quality") >= 0.75) & (F.col("lang") == "en"))
    w = Window.partitionBy("f").orderBy("doc_id")
    keep1 = (
        pass1.withColumn("f", fingerprint("text"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "text", "quality")
    )
    keep1 = keep1.persist()
    keep1.count()
    pairs = dd.simhash_neardup_pairs(keep1, "text", "doc_id", max_hamming=3)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    out = (
        keep1.join(drops, "doc_id", "left_anti")
        .select("doc_id", F.col("quality").cast("double"))
    )
    out = out.persist()
    out.count()
    keep1.unpersist()
    pairs.unpersist()
    return out


@register("llm_video_phash_dedup")
def llm_video_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup by KEYFRAME perceptual hash: real Y4M container
    decode → first frame's luma plane → DCT pHash
    (operators/video.py::video_phash_table) → the shared Manku
    pigeonhole band join. With this, all four modalities (text SimHash,
    image pHash, audio energy contour, video keyframe) dedup through
    ONE 64-bit-signature index layout (dedup.hamming64_pairs). Planted
    exact copies (media_id+700000) land at hamming 0. Rows-only; the
    DCT path's gates live in tests/test_phash.py (shared phash64_one)
    and tests/test_video_hash.py."""
    from etl_migrate_api_spark.operators.dedup import hamming64_pairs
    from etl_migrate_api_spark.operators.multimodal import fake_media_table
    from etl_migrate_api_spark.operators.video import video_phash_table

    docs = load(spark, "documents", sf_dir)
    media = fake_media_table(docs).where(F.col("media_type") == "video")
    planted = media.select("media_id", "content").unionByName(
        media.where(F.col("media_id") % 9 == 2).select(
            (F.col("media_id") + 700000).alias("media_id"), "content"
        )
    )
    sigs = video_phash_table(planted).persist()
    sigs.count()
    out = hamming64_pairs(sigs, max_hamming=3).orderBy("id_a", "id_b")
    out = out.persist()
    out.count()
    sigs.unpersist()
    return out


@register("llm_audio_resample_dedup")
def llm_audio_resample_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-RATE audio dedup: the same recording published at 8 kHz
    and 16 kHz has energy-contour fingerprints many bits apart (the
    hash windows over sample counts — measured in
    tests/test_resample.py), so the dedup pass rate-normalizes first
    (operators/multimodal.py::resample_audio, linear-interp to 8 kHz)
    and THEN fingerprints. Corpus: fake_wav_table's mixed-rate seeded
    noise recordings (800–1600 samples — rich enough that every
    contour is distinct, unlike fake_media_table's 32-sample
    header-parse plants); every 8 kHz recording is also republished at
    16 kHz (media_id+900000, produced by the same resampler — a 2×
    up/down round trip is byte-exact on surviving samples) and lands
    at hamming 0 after normalization, while the native-16 kHz
    recordings downsample to unique contours. Rows-only: DSP has no
    SQL mirror; resample gates (identity, round-trip exactness, sine
    frequency, bit-depth mapping, the raw-fingerprints-diverge
    negative) live in tests/test_resample.py."""
    from etl_migrate_api_spark.operators.dedup import _spread, hamming64_pairs
    from etl_migrate_api_spark.operators.multimodal import (
        audio_hash_table,
        fake_wav_table,
        resample_audio,
    )

    docs = load(spark, "documents", sf_dir)
    # % 5 keeps this planted corpus a disjoint slice from the JPEG
    # (% 3) and MJPEG (% 4) queries'; _spread covers every core with
    # the synth + resample + hash CPU
    ids = _spread(
        docs.where(F.col("doc_id") % 5 == 2).select(
            F.col("doc_id").alias("media_id")
        )
    )
    # persist: wavs feeds both the republish branch and the union —
    # unpersisted, the per-row synth + RIFF mux runs twice (the CPU
    # the _spread above exists to spread)
    wavs = fake_wav_table(ids).persist()
    wavs.count()
    # ids ≡ 2 (mod 5): the even ones are ≡ 2 (mod 10) — exactly the
    # 8 kHz recordings; republish each at 16 kHz
    cross = (
        resample_audio(wavs.where(F.col("media_id") % 10 == 2), 16000)
        .where("ok")
        .select((F.col("media_id") + 900000).alias("media_id"), "content")
    )
    normalized = (
        resample_audio(wavs.unionByName(cross), 8000)
        .where("ok")
        .select("media_id", "content")
    )
    sigs = audio_hash_table(normalized).persist()
    sigs.count()
    wavs.unpersist()
    out = hamming64_pairs(sigs, max_hamming=3).orderBy("id_a", "id_b")
    out = out.persist()
    out.count()
    sigs.unpersist()
    return out


@register("llm_mjpeg_keyframe_dedup")
def llm_mjpeg_keyframe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup over a COMPRESSED codec with zero third-party
    decoders: deterministic Motion-JPEG AVIs (operators/video.py::
    fake_avi_table — RIFF mux of per-frame baseline JPEGs, ids cycling
    4:4:4/4:2:0) → real container walk + per-frame Huffman+IDCT entropy
    decode (decode_avi_mjpeg_one over the repo's own jpeg.py) → first-
    keyframe luma pHash → the shared Manku pigeonhole band join. The
    same video_phash_table dispatches Y4M and AVI blobs by magic bytes,
    so a mixed-container corpus dedups in ONE pass. Planted exact byte
    copies (media_id+800000) land at hamming 0. Rows-only: the codec
    has no SQL mirror; mux/walk/decode gates live in
    tests/test_video_avi.py (pinned CRCs, idx1 offsets, luma fidelity,
    corrupt-input rejection)."""
    from etl_migrate_api_spark.operators.dedup import _spread, hamming64_pairs
    from etl_migrate_api_spark.operators.video import (
        fake_avi_table,
        video_phash_table,
    )

    docs = load(spark, "documents", sf_dir)
    # the encode+decode work is pure CPU — cover every core (see
    # llm_jpeg_phash_dedup); % 4 keeps the planted corpus a disjoint
    # slice from the JPEG query's % 3 so the two don't cache-collide
    ids = _spread(
        docs.where(F.col("doc_id") % 4 == 1).select(
            F.col("doc_id").alias("media_id")
        )
    )
    avis = fake_avi_table(ids)
    planted = avis.unionByName(
        avis.where(F.col("media_id") % 5 == 1).select(
            (F.col("media_id") + 800000).alias("media_id"), "content"
        )
    )
    sigs = video_phash_table(planted).persist()
    sigs.count()
    out = hamming64_pairs(sigs, max_hamming=3).orderBy("id_a", "id_b")
    out = out.persist()
    out.count()
    sigs.unpersist()
    return out


@register(
    "llm_dataset_card",
    oracle=f"""
      with docs as (select doc_id, text from documents),
      {_TEXT_METRIC_SQL},
      q as (
        select r.doc_id, r.n_tok,
               round((
                 (case when n_tok >= 5 and n_tok <= 100000 then 1.0 else 0.0 end)
               + (case when punct_ratio <= 0.2 then 1.0 else 0.0 end)
               + (case when stop_ratio >= 0.01 then 1.0 else 0.0 end)
               + (case when mean_word_len >= 2.0 and mean_word_len <= 12.0 then 1.0 else 0.0 end)
               ) / 4.0, 4) as quality
        from r
      )
      select d.source,
             count(*) as n_docs,
             cast(sum(q.n_tok) as bigint) as total_tokens,
             round(sum(q.quality) / count(*), 4) as mean_quality,
             count(distinct d.lang) as n_langs,
             cast(count(*) - count(distinct
                    md5(lower(regexp_replace(trim(d.text), '[ \\t\\r\\n\\f]+', ' ', 'g'))))
                  as bigint) as n_exact_dups
      from documents d join q on d.doc_id = q.doc_id
      group by d.source
    """,
    survey_refs=("A3", "E1", "T6"),
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per-source corpus summary a pipeline publishes
    with every release — doc/token counts, mean heuristic quality,
    language breadth, exact-dup count (docs minus distinct content
    fingerprints). ONE aggregation over per-doc signals that are
    themselves pure column expressions; quality values are exact
    multiples of 0.25, so the double mean is summation-order-safe.
    Scale: a single source-keyed hash aggregate; the count distinct
    pair plans as one Expand over the same scan."""
    from etl_migrate_api_spark.functions.text import fingerprint, token_count

    docs = load(spark, "documents", sf_dir)
    per_doc = docs.select(
        "source",
        "lang",
        token_count("text").alias("n_tok"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(F.sum("quality") / F.count(F.lit(1)), 4).alias("mean_quality"),
        F.count_distinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.count_distinct("fp"))
        .cast("bigint")
        .alias("n_exact_dups"),
    )


@register(
    "llm_hard_negative_mining",
    oracle="""
      with q as (select vec_id as query_id, label as ql, embedding as qv
                 from embeddings where vec_id < 10),
      scored as (
        select q.query_id, c.vec_id as neighbor_id,
               list_cosine_similarity(q.qv, c.embedding) as sim
        from q join embeddings c
          on c.vec_id <> q.query_id and c.label <> q.ql
      ),
      r as (select query_id, neighbor_id,
                   row_number() over (partition by query_id
                                      order by sim desc, neighbor_id) as rank
            from scored)
      select query_id, cast(rank as int) as rank, neighbor_id
      from r where rank <= 3
    """,
)
def llm_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-3 most-similar vectors with a DIFFERENT label —
    near-misses are the negatives that actually teach the margin
    (random negatives are trivially separable). Same broadcast-query /
    corpus-never-shuffles shape as bruteforce_topk with the label
    disequality folded into the join condition (the filter prunes
    before scoring, not after ranking — ranking then filtering would
    under-fill k). At scale the brute-force scorer swaps for the IVF/PQ
    shortlist with the same label filter on the rerank."""
    emb = load(spark, "embeddings", sf_dir)
    from etl_migrate_api_spark.functions.vectors import cosine_similarity

    q = F.broadcast(
        emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("ql"),
            F.col("embedding").alias("qv"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cl"),
        F.col("embedding").alias("cv"),
    )
    scored = q.join(
        c,
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("cl") != F.col("ql")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    return sim._rank_topk(scored, 3).select("query_id", "rank", "neighbor_id")


@register(
    "llm_contrastive_triplets",
    oracle="""
      with q as (select vec_id as query_id, label as ql, embedding as qv
                 from embeddings where vec_id < 10),
      scored as (
        select q.query_id, c.vec_id as neighbor_id,
               c.label = q.ql as same_label,
               list_cosine_similarity(q.qv, c.embedding) as sim
        from q join embeddings c on c.vec_id <> q.query_id
      ),
      pos as (
        select query_id, neighbor_id as positive_id
        from (select query_id, neighbor_id,
                     row_number() over (partition by query_id
                                        order by sim desc, neighbor_id) as r
              from scored where same_label) where r = 1
      ),
      neg as (
        select query_id,
               max(case when r = 1 then neighbor_id end) as neg1_id,
               max(case when r = 2 then neighbor_id end) as neg2_id
        from (select query_id, neighbor_id,
                     row_number() over (partition by query_id
                                        order by sim desc, neighbor_id) as r
              from scored where not same_label) where r <= 2
        group by query_id
      )
      select p.query_id, p.positive_id, n.neg1_id, n.neg2_id
      from pos p join neg n on p.query_id = n.query_id
    """,
)
def llm_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training dataset assembly: (anchor, positive, hard
    negatives) per query — positive = nearest SAME-label vector, hard
    negatives = two nearest DIFFERENT-label vectors (the rows a
    contrastive loss actually consumes; composition of the bruteforce
    and hard-negative shapes). ONE scored pass feeds both rankings —
    the same_label flag splits it, so the corpus is scanned and scored
    once, not twice. Scale: broadcast query side, corpus never
    shuffles; the two row_number windows partition by query_id (tiny:
    |Q|·|corpus| scored rows reduce to |Q| rows before the join)."""
    from etl_migrate_api_spark.functions.vectors import cosine_similarity
    from pyspark.sql import Window

    emb = load(spark, "embeddings", sf_dir)
    q = F.broadcast(
        emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("ql"),
            F.col("embedding").alias("qv"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cl"),
        F.col("embedding").alias("cv"),
    )
    scored = (
        q.join(c, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.col("cl") == F.col("ql")).alias("same_label"),
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
        .persist()
    )
    scored.count()
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    pos = (
        scored.where(F.col("same_label"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("query_id", F.col("neighbor_id").alias("positive_id"))
    )
    neg = (
        scored.where(~F.col("same_label"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 2)
        .groupBy("query_id")
        .agg(
            F.max(F.when(F.col("r") == 1, F.col("neighbor_id"))).alias("neg1_id"),
            F.max(F.when(F.col("r") == 2, F.col("neighbor_id"))).alias("neg2_id"),
        )
    )
    out = pos.join(neg, "query_id")
    out = out.persist()
    out.count()
    scored.unpersist()
    return out
