"""MMR rerank gates: the diversity flip on constructed vectors (an
exact duplicate of the top hit loses rank 2 to a farther-but-diverse
candidate), equality with an explicit greedy replay, tie-break by
neighbor_id, determinism, and the no-repeat/shape contracts."""

from __future__ import annotations

import math

from etl_migrate_api_spark.operators.similarity import (
    MMR_LAMBDA,
    MMR_MU,
    _seq_cosine,
    mmr_rerank,
)


def _unit(angle_deg: float) -> list[float]:
    a = math.radians(angle_deg)
    return [math.cos(a), math.sin(a), 0.0, 0.0]


def _replay(query, cands, k):
    """Explicit greedy MMR over (id → vector), the operator's contract."""
    sims = {i: _seq_cosine(query, v) for i, v in cands.items()}
    chosen: list[int] = []
    remaining = sorted(cands)
    while remaining and len(chosen) < k:
        best = None
        for i in remaining:
            pen = max(
                (_seq_cosine(cands[i], cands[j]) for j in chosen), default=0.0
            )
            key = (-round(MMR_LAMBDA * sims[i] - MMR_MU * pen, 9), i)
            if best is None or key < best[0]:
                best = (key, i)
        chosen.append(best[1])
        remaining.remove(best[1])
    return chosen


def test_mmr_diversity_flip_and_tiebreak(spark):
    # query at 0°; ids 1 and 2 are EXACT duplicates at 8° (best sim),
    # id 3 sits at −18°. Plain top-3 order is (1, 2, 3) — but after
    # picking 1, the duplicate's penalty is cos(0°) = 1:
    #   score(2) = .7·cos 8° − .3·1       ≈ .393
    #   score(3) = .7·cos 18° − .3·cos 26° ≈ .396  → 3 takes rank 2.
    # Rank 1 breaks the sim tie between the duplicates by id (1 < 2).
    cands = {1: _unit(8.0), 2: _unit(8.0), 3: _unit(-18.0)}
    corpus = spark.createDataFrame(
        [(i, v, 0) for i, v in cands.items()],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, _unit(0.0), 0)], "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["mmr_rank"]: r["neighbor_id"]
        for r in mmr_rerank(corpus, queries, k=3, n_candidates=3).collect()
    }
    assert got == {1: 1, 2: 3, 3: 2}
    assert [got[r] for r in (1, 2, 3)] == _replay(_unit(0.0), cands, 3)


def test_mmr_matches_replay_on_spread_fan(spark):
    # a 10-candidate fan every 9° — no hand-picked geometry, the gate
    # is exact agreement with the explicit greedy replay per query
    cands = {i: _unit(3.0 + i * 9.0) for i in range(10)}
    corpus = spark.createDataFrame(
        [(i, v, 0) for i, v in cands.items()],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, _unit(0.0), 0), (101, _unit(90.0), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = mmr_rerank(corpus, queries, k=4, n_candidates=8).collect()
    per_q: dict[int, dict[int, int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], {})[r["mmr_rank"]] = r["neighbor_id"]
    assert set(per_q) == {100, 101}
    for qid, qvec in ((100, _unit(0.0)), (101, _unit(90.0))):
        sims = sorted(
            cands, key=lambda i: (-_seq_cosine(qvec, cands[i]), i)
        )[:8]
        want = _replay(qvec, {i: cands[i] for i in sims}, 4)
        assert [per_q[qid][r] for r in (1, 2, 3, 4)] == want
        assert len(set(per_q[qid].values())) == 4  # never repeats a pick

    again = mmr_rerank(corpus, queries, k=4, n_candidates=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
