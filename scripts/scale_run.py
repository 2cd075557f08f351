"""Scale validation: multiply the driver testdata 10x/100x and a synthetic
market corpus to 50k markets, then measure the suite + ETL at each point.

The sfN directories are built from /root/testdata/sf0.1 by unioning N
key-shifted replicas (every join key shifted by rep * keyspan, so join
cardinalities scale linearly and no key collides across replicas — the
same shape TPC-H dbgen produces at higher SF). Dimensions (nation, region)
stay fixed, like real dims.

Usage:
    python scripts/scale_run.py gen 10 .scratch/scale/sf1
    python scripts/scale_run.py bench .scratch/scale/sf1 [q1 q3 ...]
    python scripts/scale_run.py gen-corpus 50000 .scratch/scale/corpus50k
    python scripts/scale_run.py etl .scratch/scale/corpus50k
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BASE = "/root/testdata/sf0.1"

# (table, [key columns to shift by rep * span])
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key -> span source (table, col); customer/order/part/supplier keys must use
# ONE span per key family so fact and dim shift identically
SPAN_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("customer", "c_custkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _spark():
    from betfair_database_spark.session import get_spark

    return get_spark("scale-run")


def gen(mult: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    spark = _spark()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    spans = {}
    for key, (tbl, col) in SPAN_OF.items():
        df = spark.read.parquet(f"{BASE}/{tbl}.parquet")
        spans[key] = int(df.agg(F.max(col)).first()[0]) + 1
    reps = spark.range(mult).withColumnRenamed("id", "_rep")
    for tbl, keys in SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{tbl}.parquet")
        if keys:
            df = df.crossJoin(reps)
            for k in keys:
                df = df.withColumn(k, (F.col(k) + F.col("_rep") * spans[k]).cast(df.schema[k].dataType))
            df = df.drop("_rep")
        df.write.mode("overwrite").parquet(str(out / f"{tbl}.parquet"))
        print(f"gen {tbl}: {mult}x done", flush=True)


def bench(sf_dir: str, names: list[str]) -> None:
    from betfair_database_spark.suite import SUITE

    spark = _spark()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            SUITE[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"bench {name}: {timings[name]}s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings, "total": round(sum(timings.values()), 3)}))


def gen_corpus(n: int, out_dir: str) -> None:
    """n market (catalogue .json + NDJSON data) pairs, 1000 per subdir —
    the betfair_historical directory shape at bulk size."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from tests.corpus import _cat

    out = Path(out_dir)
    t0 = time.perf_counter()
    for i in range(n):
        sub = out / f"batch_{i // 1000:03d}"
        if i % 1000 == 0:
            sub.mkdir(parents=True, exist_ok=True)
        mid = f"1.{300000000 + i}"
        cat = _cat(
            mid,
            f"Match Odds {i}",
            "2023-08-02T14:30:00.000Z",
            venue="Lord's" if i % 3 == 0 else None,
            country="GB" if i % 2 == 0 else None,
            runners=2 + i % 3,
        )
        (sub / f"{mid}.json").write_text(json.dumps(cat, separators=(",", ":")))
        (sub / mid).write_text(
            '{"op":"mcm","clk":"1","pt":1690988400000,"mc":[{"id":"%s","rc":[]}]}\n' % mid
        )
    print(f"gen-corpus {n} markets in {time.perf_counter() - t0:.1f}s", flush=True)


def etl(corpus_dir: str) -> None:
    import shutil
    import tempfile

    from betfair_database_spark.database import BetfairDatabase

    spark = _spark()
    # index in place on a COPY (index() mutates the dir with its index file)
    tmp = Path(tempfile.mkdtemp(prefix="bfdb_scale_"))
    try:
        dst = tmp / "db"
        t0 = time.perf_counter()
        shutil.copytree(corpus_dir, dst)
        copy_s = time.perf_counter() - t0
        db = BetfairDatabase(dst, spark=spark)
        t0 = time.perf_counter()
        n = db.index()
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "markets": n,
                    "index_seconds": round(dt, 2),
                    "markets_per_sec": round(n / dt, 1),
                    "copy_seconds": round(copy_s, 1),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "gen":
        gen(int(sys.argv[2]), sys.argv[3])
    elif cmd == "bench":
        bench(sys.argv[2], sys.argv[3:])
    elif cmd == "gen-corpus":
        gen_corpus(int(sys.argv[2]), sys.argv[3])
    elif cmd == "etl":
        etl(sys.argv[2])
    else:
        raise SystemExit(f"unknown command {cmd}")
