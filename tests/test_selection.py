"""Property tests for plans/llm_selection.py — DSIR, PageRank, global
shuffle, quantile battery, BM25, epoch-repeat mixture. Oracle parity is
covered by tests/test_oracle_parity.py (all six are fully oracled);
these pin the semantic properties the hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_migrate_api_spark.plans.llm_selection import (
    _PR_HOSTS,
    _PR_SCALE,
    agg_quantile_battery,
    graph_pagerank_hosts,
    llm_dsir_sample,
    llm_global_shuffle,
)


def test_dsir_prefers_target_domain(spark, sf_dir):
    """The whole point of DSIR: docs from the target domain (en) must be
    over-represented in the selected set relative to the corpus."""
    sel = llm_dsir_sample(spark, sf_dir).toPandas()
    assert len(sel) <= 100
    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    corpus_en = corpus.get("en", 0) / corpus.sum()
    sel_en = (sel["lang"] == "en").mean()
    assert sel_en > corpus_en, (sel_en, corpus_en)
    # descending-weight order with doc_id tiebreak is deterministic
    again = llm_dsir_sample(spark, sf_dir).toPandas()
    assert sel.equals(again)


def test_pagerank_mass_conserved_within_floor_leak(spark, sf_dir):
    """Integer PageRank loses <1 unit per (edge, iteration) to floor
    division and <1 to the damping div — total leak is tightly bounded,
    and rank never goes negative or above the whole mass."""
    pr = graph_pagerank_hosts(spark, sf_dir).toPandas()
    assert len(pr) == _PR_HOSTS
    total = int(pr["rank_u"].sum())
    # teleport contributes exactly hosts * floor(0.15*SCALE/hosts)
    assert total <= _PR_SCALE
    n_edges = _PR_HOSTS * _PR_HOSTS  # loose upper bound on distinct edges
    assert total >= _PR_SCALE - (n_edges + _PR_HOSTS) * 10
    assert (pr["rank_u"] > 0).all()
    # float projection is consistent with the integer source of truth
    assert (abs(pr["rank"] - pr["rank_u"] / _PR_SCALE) < 1e-15).all()


def test_pagerank_favors_in_degree(spark, sf_dir):
    """Hosts with more distinct in-links should (weakly) rank higher:
    compare mean rank of top-quartile in-degree hosts vs bottom."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    links = docs.select(
        (F.col("doc_id") % _PR_HOSTS).alias("src"),
        ((7 * F.col("doc_id") + 3) % _PR_HOSTS).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    indeg = (
        links.groupBy("dst").count().toPandas().set_index("dst")["count"]
    )
    pr = graph_pagerank_hosts(spark, sf_dir).toPandas().set_index("host")
    joined = pr.join(indeg.rename("indeg"), how="left").fillna(0)
    hi = joined[joined.indeg >= joined.indeg.quantile(0.75)]["rank"].mean()
    lo = joined[joined.indeg <= joined.indeg.quantile(0.25)]["rank"].mean()
    assert hi >= lo


def test_global_shuffle_is_a_permutation(spark, sf_dir):
    out = llm_global_shuffle(spark, sf_dir).toPandas()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    assert out["shard"].between(0, 15).all()
    # pos is 1..count within each shard, no gaps
    for shard, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


def test_quantile_battery_matches_numpy_rank_selection(spark, sf_dir):
    got = agg_quantile_battery(spark, sf_dir).toPandas().set_index("source")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "n_chars", "doc_id")
        .toPandas()
    )
    for source, grp in docs.groupby("source"):
        vals = grp.sort_values(["n_chars", "doc_id"])["n_chars"].tolist()
        n = len(vals)
        row = got.loc[source]
        assert row["n_docs"] == n
        assert row["min_chars"] == vals[0]
        assert row["max_chars"] == vals[-1]
        assert row["p50"] == vals[(n + 1) // 2 - 1]
        assert row["p90"] == vals[(9 * n + 9) // 10 - 1]
        assert row["p99"] == vals[(99 * n + 99) // 100 - 1]


def test_bm25_scores_reflect_term_frequency(spark, sf_dir):
    """The top BM25 hit must actually contain query terms, scores must
    be positive and descending, and one doc's score must match a
    hand-computed python BM25 on the same tokenization."""
    import math

    from etl_migrate_api_spark.plans.llm_selection import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        llm_bm25_search,
    )

    got = llm_bm25_search(spark, sf_dir).toPandas()
    assert len(got) == 20
    assert (got["score"] > 0).all()
    assert list(got["score"]) == sorted(got["score"], reverse=True)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    toks = {
        r.doc_id: [w for w in r.text.lower().strip().split() if w]
        for r in docs.itertuples()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    dfs = {
        t: sum(1 for d in toks.values() if t in d) for t in _BM25_TERMS
    }

    def score(d):
        s = 0.0
        dl = len(toks[d])
        for t in _BM25_TERMS:
            tf = toks[d].count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (_BM25_K1 + 1) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl)
            )
        return s

    top = got.iloc[0]
    assert any(t in toks[top.doc_id] for t in _BM25_TERMS)
    assert abs(score(int(top.doc_id)) - top.score) < 1e-6


def test_mixture_epochs_hits_exact_target_per_lang(spark, sf_dir):
    from etl_migrate_api_spark.plans.llm_selection import llm_mixture_epochs

    out = llm_mixture_epochs(spark, sf_dir).toPandas()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "doc_id")
        .toPandas()
    )
    n, n_langs = len(docs), docs["lang"].nunique()
    target = -(-n // n_langs)  # ceil
    per_lang = out.groupby("lang").size()
    assert (per_lang == target).all(), per_lang.to_dict()
    # each doc appears floor or ceil of (target / lang_count) times
    counts = docs.groupby("lang").size()
    reps = out.groupby(["lang", "doc_id"]).size().reset_index(name="r")
    for lang, grp in reps.groupby("lang"):
        epochs = -(-target // counts[lang])
        assert set(grp["r"]) <= {epochs - 1, epochs}, lang
    # epochs are dense 0..max per (lang, doc)
    assert out["epoch"].min() == 0


def _cdc_chunks_py(tokens):
    """Pure-python mirror of the CDC chunking rule (md5 bigram gate)."""
    import hashlib

    fps, cur = [], []
    for i, w in enumerate(tokens):
        if i > 0:
            h = int(
                hashlib.md5(f"{tokens[i-1]} {w}".encode()).hexdigest()[:15],
                16,
            )
            if h % 16 == 0:
                fps.append(hashlib.md5(" ".join(cur).encode()).hexdigest())
                cur = []
        cur.append(w)
    if cur:
        fps.append(hashlib.md5(" ".join(cur).encode()).hexdigest())
    return fps


def test_cdc_chunking_is_shift_robust():
    """The CDC property: prepending tokens to a document changes only
    the chunks near the edit — most fingerprints survive. A fixed
    window (llm_chunk_windows) would lose ALL of them. (Synthetic long
    token stream: corpus docs are too short to carry many chunks.)"""
    toks = [f"w{(i * i + i) % 9973}" for i in range(2000)]  # aperiodic
    orig = set(_cdc_chunks_py(toks))
    assert len(orig) > 50  # the mod-16 gate actually fires
    shifted = set(_cdc_chunks_py(["inserted", "prefix"] + toks))
    surviving = len(orig & shifted) / len(orig)
    assert surviving >= 0.9, surviving
    # the fixed-window baseline for contrast: chunk [i:i+16) grids of the
    # shifted doc share (essentially) nothing with the original grid
    import hashlib

    grid = lambda t: {
        hashlib.md5(" ".join(t[i : i + 16]).encode()).hexdigest()
        for i in range(0, len(t), 16)
    }
    fixed_surviving = len(grid(toks) & grid(["inserted", "prefix"] + toks)) / len(
        grid(toks)
    )
    assert fixed_surviving < surviving


def test_cdc_dedup_finds_planted_duplicate_chunks(spark, sf_dir):
    """Exact duplicate docs (the corpus plants them) must share every
    chunk: some fp must appear with n_docs >= 2."""
    from etl_migrate_api_spark.plans.llm_selection import llm_cdc_chunk_dedup

    out = llm_cdc_chunk_dedup(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["n_copies"] > 1).all()
    assert (out["n_docs"] >= 1).all()
    assert out["fp"].is_unique


def test_bpe_merges_match_python_reference(spark, sf_dir):
    """The distributed BPE trainer must produce the EXACT merge
    sequence (pairs, order, counts) of a pure-python Sennrich
    reference on the same word-count table, including the
    (count desc, pair asc) tiebreak."""
    from collections import Counter

    from etl_migrate_api_spark.plans.llm_selection import (
        _BPE_EOW,
        llm_bpe_merges,
    )

    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in llm_bpe_merges(spark, sf_dir).orderBy("step").collect()
    ]
    assert len(got) == 8

    import re

    from etl_migrate_api_spark.functions.text import WS_CLASS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    wc = Counter()
    # mirror ws_tokens exactly (WS_CLASS, not python str.split — str.split
    # treats ALL unicode whitespace, the divergence WS_CLASS exists to kill)
    for r in docs.toPandas().itertuples():
        for w in re.split(WS_CLASS, r.text.lower().strip()):
            if w:
                wc[w] += 1
    vocab = {w: list(w) + [_BPE_EOW] for w in wc}

    want = []
    for step in range(8):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((step, a, b, a + b, n))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    assert got == want, (got[:3], want[:3])


def test_bpe_delta_matches_full_and_python_at_64_merges(spark):
    """The production delta-update trainer must stay bit-identical to
    the full-reaggregate baseline AND a pure-python Sennrich reference
    over a LONG merge run (64 — where plan-lineage bugs and delta-patch
    drift would compound), on a synthetic multi-length vocab with a
    Zipf-ish count skew. Also regression-pins the two failure modes
    found building this: union-per-step plan doubling (driver OOM in
    explainString at step ~8) and unpersist-triggered recompute of a
    64-deep fold lineage (executor StackOverflow)."""
    from collections import Counter

    from etl_migrate_api_spark.plans.llm_selection import (
        _BPE_EOW,
        bpe_merge_table,
        bpe_merge_table_full,
    )

    wc = Counter()
    for i in range(500):
        w = "".join("abcdefgh"[(i * j + j * j) % 8] for j in range(2 + i % 7))
        wc[w] += 1 + (9973 // (i + 1))
    df = spark.createDataFrame(list(wc.items()), "word string, cnt long")

    vocab = {w: list(w) + [_BPE_EOW] for w in wc}
    want = []
    for step in range(64):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((step, a, b, a + b, n))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out

    assert bpe_merge_table(df, 64) == want
    assert bpe_merge_table_full(df, 64) == want


def test_selection_pipeline_composes_its_stages(spark, sf_dir):
    """Capstone: every kept doc passed the gate, per-lang keeps respect
    the quota, shard/pos is a valid dense assignment."""
    from etl_migrate_api_spark.plans.llm_selection import (
        _SEL_MIN_CHARS,
        _SEL_QUOTA,
        llm_selection_pipeline,
    )

    out = llm_selection_pipeline(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.groupby("lang").size() <= _SEL_QUOTA).all()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .toPandas()
        .set_index("doc_id")["n_chars"]
    )
    assert (docs.loc[out["doc_id"]] >= _SEL_MIN_CHARS).all()
    assert out["shard"].between(0, 15).all()
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    """Each from_type's outgoing probabilities must sum to 1 and match
    the count ratios exactly."""
    from etl_migrate_api_spark.plans.extras import events_transition_matrix

    out = events_transition_matrix(spark, sf_dir).toPandas()
    assert len(out) > 0
    for _, grp in out.groupby("from_type"):
        assert abs(grp["prob"].sum() - 1.0) < 1e-9
        tot = grp["n"].sum()
        assert (abs(grp["prob"] - grp["n"] / tot) < 1e-15).all()


def test_triangle_count_matches_python_reference(spark, sf_dir):
    """Per-host triangle counts must equal a brute-force python count
    over the same planted graph, and sum to 3x the triangle total."""
    from itertools import combinations

    from etl_migrate_api_spark.plans.llm_selection import (
        _PR_HOSTS,
        graph_triangle_count,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    edges = {
        tuple(sorted((int(d) % _PR_HOSTS, (7 * int(d) + 3) % _PR_HOSTS)))
        for d in docs
        if int(d) % _PR_HOSTS != (7 * int(d) + 3) % _PR_HOSTS
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    n_total = 0
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n_total += 1
            for h in (a, b, c):
                want[h] = want.get(h, 0) + 1
    got = {
        int(r["host"]): int(r["n_triangles"])
        for r in graph_triangle_count(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(got.values()) == 3 * n_total


def test_kcore_matches_python_fixpoint(spark, sf_dir):
    """The 12-round synchronized peel must land on the asynchronous
    python fixpoint (idempotence at convergence), and every survivor
    must have >= 3 neighbors among survivors."""
    from etl_migrate_api_spark.plans.llm_selection import (
        _KCORE_K,
        _PR_HOSTS,
        graph_kcore_hosts,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .toPandas()["doc_id"]
    )
    E = set()
    for d in docs:
        d = int(d)
        x, y = d % _PR_HOSTS, (7 * d + 3) % _PR_HOSTS
        if x != y:
            E.add(tuple(sorted((x, y))))
        if d % 7 == 0:
            x2, y2 = d % _PR_HOSTS, d % 49
            if x2 != y2:
                E.add(tuple(sorted((x2, y2))))
    adj: dict[int, set[int]] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for h in list(alive):
            if len(adj[h] & alive) < _KCORE_K:
                alive.discard(h)
                changed = True
    got = {int(r["host"]) for r in graph_kcore_hosts(spark, sf_dir).collect()}
    assert got == alive
    for h in got:
        assert len(adj[h] & got) >= _KCORE_K


def test_bpe_encode_parity_and_mass_conservation(spark, sf_dir):
    """bpe_encode_words (HF-style lowest-rank-pair loop) must produce
    EXACTLY the tokens of a Sennrich in-training-order replay of the
    same merge list on every corpus word; every encoding must
    concatenate back to word + </w>; and the full (un-limited) corpus
    token histogram must conserve token mass:
    sum(token totals) == sum(word_cnt · len(toks))."""
    from pyspark.sql import functions as F

    from etl_migrate_api_spark.functions.text import ws_tokens
    from etl_migrate_api_spark.plans.llm_selection import (
        _BPE_EOW,
        bpe_encode_words,
        bpe_merge_table,
        llm_bpe_encode,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (
        docs.select(F.explode(ws_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    merges = bpe_merge_table(words, 8)
    pairs = [(m[1], m[2]) for m in merges]

    enc = {
        r["word"]: list(r["toks"])
        for r in bpe_encode_words(words, pairs).collect()
    }
    counts = {r["word"]: r["cnt"] for r in words.collect()}
    assert set(enc) == set(counts)
    for w, toks in enc.items():
        # Sennrich replay: apply each merge in training order, all
        # occurrences left-to-right (the trainer's own update rule)
        syms = list(w) + [_BPE_EOW]
        for a, b in pairs:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        assert toks == syms, (w, toks, syms)
        assert "".join(toks) == w + _BPE_EOW

    hist = (
        bpe_encode_words(words, pairs)
        .join(words, "word")
        .select(F.explode("toks").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    )
    mass = sum(r["total"] for r in hist)
    want_mass = sum(counts[w] * len(t) for w, t in enc.items())
    assert mass == want_mass

    out = llm_bpe_encode(spark, sf_dir).collect()
    # 8 merges over a lowercase-ascii corpus: the token inventory is
    # chars + </w> + 8 merged symbols — may be under the top-50 cap
    assert len(out) == min(50, len(hist))
    totals = [r["total"] for r in out]
    assert totals == sorted(totals, reverse=True)
    top = {r["token"]: r["total"] for r in out}
    by_tok = {r["token"]: r["total"] for r in hist}
    for tok, tot in top.items():
        assert by_tok[tok] == tot
    words.unpersist()


def test_rag_context_pack_contracts(spark, sf_dir):
    """Budget prefix (cum ≤ 128 and ranks contiguous from 1), per-doc
    diversity cap (no document contributes two passages), rank order =
    score desc, and cum_tok really is the running sum of n_tok."""
    from etl_migrate_api_spark.plans.llm_selection import (
        _RAG_BUDGET,
        llm_rag_context_pack,
    )

    rows = sorted(
        llm_rag_context_pack(spark, sf_dir).collect(),
        key=lambda r: r["ctx_rank"],
    )
    assert rows, "context must not be empty on the test corpus"
    assert [r["ctx_rank"] for r in rows] == list(range(1, len(rows) + 1))
    docs = [r["doc_id"] for r in rows]
    assert len(set(docs)) == len(docs)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    cum = 0
    for r in rows:
        cum += r["n_tok"]
        assert r["cum_tok"] == cum
        assert 1 <= r["n_tok"] <= 32
    assert cum <= _RAG_BUDGET


def test_rrf_fusion_contracts(spark, sf_dir):
    """RRF output is internally consistent: ranks are within the top-20
    legs, the fused score is exactly 1/(60+r_lex)+1/(60+r_dense) with
    rank-0 (absent) contributing nothing, ordering is (rrf desc,
    doc_id), and a doc present in BOTH legs outranks the same best
    single-leg rank."""
    from etl_migrate_api_spark.plans.llm_selection import llm_rrf_fusion

    rows = llm_rrf_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert 0 <= r["r_lex"] <= 20 and 0 <= r["r_dense"] <= 20
        assert r["r_lex"] > 0 or r["r_dense"] > 0
        want = round(
            (1.0 / (60 + r["r_lex"]) if r["r_lex"] else 0.0)
            + (1.0 / (60 + r["r_dense"]) if r["r_dense"] else 0.0),
            9,
        )
        assert r["rrf"] == want
    key = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    both = [r for r in rows if r["r_lex"] and r["r_dense"]]
    single = [r for r in rows if not (r["r_lex"] and r["r_dense"])]
    if both and single:
        # any doc on both lists beats any single-list doc whose one
        # rank is not better than both of its ranks
        b = both[0]
        for s in single:
            sr = max(s["r_lex"], s["r_dense"])  # its only rank
            if sr >= max(b["r_lex"], b["r_dense"]):
                assert b["rrf"] > s["rrf"]


def test_leakage_safe_split_no_cluster_straddles(spark, sf_dir):
    """The property the query exists for: every near-dup cluster lands
    in ONE split; singletons agree with the naive doc_id-hash split
    (same salt/thresholds), so the two assignments differ only inside
    clusters."""
    import pyspark.sql.functions as F

    from etl_migrate_api_spark.plans.extras import llm_leakage_safe_split

    out = llm_leakage_safe_split(spark, sf_dir)
    # 1. one split per rep — no cluster straddles a split boundary
    straddle = (
        out.groupBy("rep_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    # 2. planted exact copies (doc_id+200000 twins) share their twin's split
    twins = (
        out.alias("a")
        .join(
            out.alias("b"),
            F.col("a.doc_id") + 200000 == F.col("b.doc_id"),
        )
        .where(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert twins == 0
    # 3. singletons (rep == self AND nobody else maps to this rep) get
    # the naive assignment
    sizes = out.groupBy("rep_id").agg(F.count(F.lit(1)).alias("n"))
    singles = (
        out.join(sizes, "rep_id")
        .where((F.col("n") == 1) & (F.col("rep_id") == F.col("doc_id")))
    )
    b = F.substring(
        F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 2
    )
    naive = F.when(b < "f6", "train").when(b < "fb", "val").otherwise("test")
    assert singles.where(F.col("split") != naive).count() == 0
    # 4. and the clusters are where naive WOULD have leaked: at least
    # one multi-member cluster exists whose members' naive splits differ
    clustered = out.join(sizes, "rep_id").where(F.col("n") > 1)
    assert (
        clustered.select("rep_id", naive.alias("naive"))
        .groupBy("rep_id")
        .agg(F.countDistinct("naive").alias("k"))
        .where(F.col("k") > 1)
        .count()
        > 0
    )


def _replace_encode(word: str, merges, reps: int) -> list[str]:
    """The oracle's formulation of one BPE apply: space-sentineled
    symbol string, lowest-rank applicable rule per round, `reps`
    stacked plain replaces per round (single-pass replace shares the
    boundary space between chained matches, so one pass only catches
    the first of a run like 'a b a b')."""
    state = " " + " ".join(list(word) + ["</w>"]) + " "
    for _ in range(len(word)):
        best = None
        for i, (left, right) in enumerate(merges):
            if f" {left} {right} " in state and (best is None or i < best):
                best = i
        if best is None:
            break
        left, right = merges[best]
        for _ in range(reps):
            state = state.replace(f" {left} {right} ", f" {left}{right} ")
    return [t for t in state.split(" ") if t]


def test_bpe_pinned_oracle_replace_equals_list_walk(spark):
    """The llm_bpe_encode_pinned oracle applies each round's rule with
    stacked string replaces; the production encoder walks the symbol
    list once. These must agree on every adversarial shape: chained
    runs ('ababab' with rule (a,b)), self-overlap ('aaaa' with (a,a)),
    cascades, and EOW fusions — for the pinned table AND a hostile
    synthetic one."""
    from etl_migrate_api_spark.plans.llm_selection import (
        _PINNED_BPE_MERGES,
        bpe_encode_words,
    )

    words = [
        "ababab", "aaaa", "aaa", "abab", "baba", "the", "then",
        "and", "sand", "ing", "sting", "rest", "tttt", "erer",
        "a", "z", "to", "too", "chart", "stand",
    ]
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    for merges in (
        _PINNED_BPE_MERGES,
        [("a", "b"), ("a", "a"), ("ab", "ab"), ("b", "a"), ("t", "t")],
    ):
        got = {
            r["word"]: list(r["toks"])
            for r in bpe_encode_words(wdf, merges).collect()
        }
        for w in words:
            reps = (len(w) + 2) // 2  # the oracle uses (max_len+2)//2
            assert got[w] == _replace_encode(w, merges, reps), (
                w,
                merges,
                got[w],
                _replace_encode(w, merges, reps),
            )
            assert "".join(got[w]) == w + "</w>"  # concat invariant
