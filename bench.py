"""Benchmark runner — the driver's BENCH gate.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full execution, no
driver collect, no result-size bias).

Isolation mode (the container CPU is noisy — cgroup burst/throttle can
swing totals 2× between identical runs): ``python bench.py q1 q2``
times only the named queries; ``--repeat N`` re-times each N times and
reports the MINIMUM (the least-throttled run is the real cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

# -- host-health probe -------------------------------------------------------
# The container fleet's CPU is shared and burst-scheduled: r8 recorded a
# uniform 3.4x fleet-wide slowdown (identical code and parquet) that was
# indistinguishable, from the BENCH artifact alone, from a code
# regression. So every bench emission carries its own environment
# evidence: a sampler thread times a fixed PARALLEL md5 block at ~1 Hz
# for the whole run (hashlib releases the GIL on MB buffers, so the
# probe sees neighbor-quota squeezes that leave one thread fast — the
# r8 failure signature). The JSON reports the median sample, the
# fraction of degraded samples, and the factor vs the healthy-idle
# reference so a throttled recording is adjudicable from the artifact.

_CALIB_MB = 16  # per thread
_CALIB_THREADS = 6
# healthy idle host measures 0.031-0.040 s for 6 threads x 16 MB md5
CALIB_HEALTHY_SEC = 0.035  # reference point for env_factor
CALIB_BASELINE_SEC = 0.05  # degraded-threshold base (headroom for fair-share)
CALIB_DEGRADED_X = 2.5  # a sample slower than 2.5x baseline is degraded


def _calib_once() -> float:
    """One parallel md5 throughput sample (seconds — lower is faster)."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    buf = b"\xab" * (1 << 20)

    def one(_):
        for _ in range(_CALIB_MB):
            hashlib.md5(buf).digest()

    with ThreadPoolExecutor(_CALIB_THREADS) as ex:
        t0 = time.perf_counter()
        list(ex.map(one, range(_CALIB_THREADS)))
        return time.perf_counter() - t0


# the probe itself costs CPU (6 threads of md5 per sample); cap its
# steady-state consumption at 1% of the host so it annotates timings
# without materially inflating them on small-core hosts (ADVICE r9)
_PROBE_DUTY_TARGET = 0.01


class EnvProbe:
    """Background sampler of host CPU throughput during the run. The
    sampling interval self-scales so the probe's own core-seconds stay
    under ``_PROBE_DUTY_TARGET`` of the host (~1 Hz on a 32-core box,
    sparser on small hosts or when samples slow down), and the emitted
    summary records the realized ``probe_duty`` so round-over-round
    comparisons can account for the probe's overhead."""

    def __init__(self):
        import threading

        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._ncpu = os.cpu_count() or 1
        self._busy_core_sec = 0.0
        self._elapsed = 0.0

    def _loop(self):
        while not self._stop.is_set():
            s = _calib_once()
            self.samples.append(s)
            self._busy_core_sec += s * _CALIB_THREADS
            wait = max(
                1.0, (s * _CALIB_THREADS) / (_PROBE_DUTY_TARGET * self._ncpu)
            )
            self._stop.wait(wait)

    def __enter__(self):
        self._t0 = time.perf_counter()
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=5)
        self._elapsed = time.perf_counter() - self._t0

    def summary(self) -> dict:
        if not self.samples:
            return {"samples": 0}
        xs = sorted(self.samples)
        mid = len(xs) // 2
        med = xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2
        bad = sum(s > CALIB_DEGRADED_X * CALIB_BASELINE_SEC for s in xs)
        elapsed = self._elapsed or (time.perf_counter() - self._t0)
        return {
            "samples": len(xs),
            "probe_sec_median": round(med, 4),
            "degraded_frac": round(bad / len(xs), 3),
            # >1 = slower than a healthy idle host by this much
            "env_factor": round(med / CALIB_HEALTHY_SEC, 2),
            # fraction of host CPU the probe itself consumed
            "probe_duty": round(
                self._busy_core_sec / max(elapsed * self._ncpu, 1e-9), 4
            ),
        }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from etl_migrate_api_spark.session import get_spark
    from etl_migrate_api_spark.plans.registry import QUERIES, headline_names

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session once, untimed: JVM/codegen, the Python worker
    # pool (first pandas_udf pays ~1 spawn+numpy import per core), and
    # HOF codegen — so per-query numbers measure steady-state
    # throughput, not one-time session setup
    import pandas as pd
    from pyspark.sql import functions as F

    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    except Exception:
        pass  # warm-up only — a missing table fails per-query below, not here

    def _identity(s):
        return s

    _identity.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _warm_udf = F.pandas_udf("long")(_identity)
    spark.range(1024).repartition(32).select(
        _warm_udf(F.col("id")).alias("x")
    ).agg(F.sum("x")).collect()
    spark.range(128).select(
        F.aggregate(
            F.transform(F.array(F.col("id").cast("double")), lambda x: x * 2.0),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("s")
    ).agg(F.sum("s")).collect()

    args = sys.argv[1:]
    # default best-of-2: the container CPU throttles in bursts (measured
    # 2x swings on identical code), so a single timing is a coin flip —
    # the minimum of two is the better throughput estimate
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    if "--repeat" in args:
        i = args.index("--repeat")
        try:
            repeat = int(args[i + 1])
        except (IndexError, ValueError):
            raise SystemExit("usage: bench.py [query ...] [--repeat N]")
        args = args[:i] + args[i + 2 :]
    # repeat < 1 would leave best=inf and emit non-RFC 'Infinity' JSON
    repeat = max(1, repeat)
    names = headline_names()
    if args:
        unknown = [a for a in args if a not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        names = args

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    with EnvProbe() as probe:
        for name in names:
            fn = QUERIES[name].fn
            best = float("inf")
            for _ in range(repeat):
                # per-query isolation: one broken query must not zero the
                # whole bench run (a single uncaught exception here erased
                # the round-5 perf signal for 14 healthy queries)
                try:
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                except Exception as exc:  # noqa: BLE001 — record, keep benching
                    errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                    break
                finally:
                    # release blocks the query's operators left persisted
                    # (their contract: callers own the unpersist) — each
                    # query's number must measure that query, not earlier
                    # queries' cache pressure, and no query may ride an
                    # earlier query's cache. localCheckpoint() blocks
                    # (iterative ops' lineage fences) survive
                    # clearCache, so sweep the JVM registry too — safe,
                    # the result was fully materialized by the noop sink
                    spark.catalog.clearCache()
                    m = spark.sparkContext._jsc.getPersistentRDDs()
                    for rid in list(m.keySet().toArray()):
                        r = m.get(rid)
                        if r is not None:
                            r.unpersist()
            if name not in errors:
                timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    payload: dict = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # host-health evidence sampled DURING the run — see header
        "env": probe.summary(),
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
