"""Incrementally-maintained materialized rollup over the market index.

A continuous-aggregate (hypertable-rollup) analogue for the index: a
small at-rest summary table of per-(eventTypeId, start date) market
statistics that ``insert()``/``clean()`` keep in sync without re-scanning
the index. The reference has no such feature (its SQLite index is always
queried live); this is an engine-level extension for the 100 TB shape,
where "how many markets per sport per day" should not cost an index scan.

Maintenance contract
--------------------
Index maintenance rewrites whole ``eventTypeId=`` partitions
(``database._upsert_partitions``), so the rollup updates at the same
granularity: summary rows for TOUCHED partitions are recomputed from the
replacement frame (already checkpointed in memory by the upsert), summary
rows for untouched partitions are carried over from the previous rollup
file. The index parquet is never re-read during an incremental update —
pinned by ``test_maintenance.py`` (``_read_index`` patched to raise).
Compute is O(replacement rows + rollup size); the at-rest rollup is
bounded by |eventTypeId| x |days|, never by market count.

Consistency
-----------
Every rollup commit records the index manifest snapshot number it was
derived from (``_rollup_meta.json`` inside the rollup directory — the
leading underscore hides it from Spark's file listing). The rollup swap
happens strictly AFTER the index commit, so a crash in between leaves a
rollup one snapshot behind; ``rollup()`` compares snapshot numbers and
raises ``StaleRollupError`` instead of serving stale aggregates, and
``create_rollup()`` is the (full-rebuild) heal. The swap itself is
temp-write + directory replace: a crash mid-swap can only lose the rollup
entirely (detected as missing), never serve a torn file set.

All aggregates are additive/mergeable (counts, sums, min/max) so the
carry-over + recompute composition is exact. marketStartTime is the
index's ISO-8601 string; ISO-8601 min/max under string ordering equals
chronological min/max.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROLLUP_DIRNAME = ".betfairdatabaserollup.parquet"
_META_NAME = "_rollup_meta.json"

ROLLUP_SCHEMA = StructType(
    [
        StructField("eventTypeId", StringType()),
        StructField("startDate", DateType()),
        StructField("markets", LongType()),
        StructField("bspMarkets", LongType()),
        StructField("inPlayMarkets", LongType()),
        StructField("settledMarkets", LongType()),
        StructField("runnersTotal", LongType()),
        StructField("firstStart", StringType()),
        StructField("lastStart", StringType()),
    ]
)


def summarize(index_df: DataFrame) -> DataFrame:
    """The rollup aggregate: per-(eventTypeId, start date) market stats.

    Pure function of index rows — used for the full build, the touched-
    partition recompute, and the from-scratch reference in tests. One
    hash aggregate with map-side partials; no window, no shuffle beyond
    the group-by exchange.
    """
    return index_df.groupBy(
        F.col("eventTypeId"),
        F.to_date(F.substring("marketStartTime", 1, 10)).alias("startDate"),
    ).agg(
        F.count(F.lit(1)).alias("markets"),
        F.coalesce(F.sum("bspMarket"), F.lit(0)).cast("long").alias("bspMarkets"),
        F.coalesce(F.sum("turnInPlayEnabled"), F.lit(0))
        .cast("long")
        .alias("inPlayMarkets"),
        F.count("marketSettledTime").alias("settledMarkets"),
        F.coalesce(F.sum("runners"), F.lit(0)).cast("long").alias("runnersTotal"),
        F.min("marketStartTime").alias("firstStart"),
        F.max("marketStartTime").alias("lastStart"),
    )


def rollup_path(database_dir: Path) -> Path:
    return Path(database_dir) / ROLLUP_DIRNAME


def _meta_read(path: Path) -> dict | None:
    try:
        return json.loads((path / _META_NAME).read_text())
    except (OSError, ValueError):
        return None


def _atomic_swap(db, frame: DataFrame, index_snapshot: int) -> int:
    """Write ``frame`` + meta to a sibling temp dir, then replace the live
    rollup. The rollup is group-cardinality-sized, so one part-file."""
    live = rollup_path(db.database_dir)
    tmp = live.with_suffix(".swap")
    if tmp.exists():
        shutil.rmtree(tmp)
    out = frame.select(*[f.name for f in ROLLUP_SCHEMA.fields])
    out.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    n = db.spark.read.schema(ROLLUP_SCHEMA).parquet(str(tmp)).count()
    (tmp / _META_NAME).write_text(
        json.dumps({"index_snapshot": index_snapshot, "rows": n})
    )
    if live.exists():
        shutil.rmtree(live)
    tmp.rename(live)
    return n


def rollup_build(db) -> int:
    """Full rollup (re)build from the live index. Returns row count."""
    from betfair_database_spark.database import _manifest_snapshot_no

    snap = _manifest_snapshot_no(db._index_path)
    return _atomic_swap(db, summarize(db._read_index()), snap)


def rollup_update(db, repl: DataFrame, touched: list) -> None:
    """Partition-incremental rollup maintenance, called by the index upsert
    AFTER its manifest commit. ``repl`` is the checkpointed replacement
    frame (may contain rows outside ``touched``; filtered here exactly as
    the upsert filters), ``touched`` the eventTypeId values whose index
    partitions were rewritten. No-op when no rollup is materialized.

    Reads: the previous rollup file (small) + ``repl`` (in memory).
    Never re-reads the index parquet.
    """
    from betfair_database_spark.database import _manifest_snapshot_no

    live = rollup_path(db.database_dir)
    if not live.exists() or not touched:
        return
    snap = _manifest_snapshot_no(db._index_path)
    meta = _meta_read(live)
    if meta is None or meta.get("index_snapshot") not in (snap - 1, snap):
        # Snapshot numbers are sequential, so the only safe incremental
        # bases are snap-1 (the normal post-commit call: rollup was fresh
        # at the previous snapshot) and snap itself (an idempotent re-fold:
        # touched partitions are recomputed from ``repl`` either way). Any
        # other value means a prior maintenance op crashed between its
        # index commit and rollup swap (or the index was force-rebuilt);
        # carrying those rows over and stamping ``snap`` would launder the
        # staleness past the StaleRollupError guard. Heal by a full
        # rebuild from the live index instead.
        rollup_build(db)
        return
    keep = db.spark.read.schema(ROLLUP_SCHEMA).parquet(str(live)).where(
        ~db._partition_filter(touched)
    )
    fresh = summarize(repl.where(db._partition_filter(touched)))
    _atomic_swap(db, keep.unionByName(fresh).localCheckpoint(), snap)


def rollup_read(db) -> DataFrame:
    """The committed rollup, freshness-checked against the index manifest."""
    from betfair_database_spark.database import _manifest_snapshot_no
    from betfair_database_spark.exceptions import (
        RollupMissingError,
        StaleRollupError,
    )

    live = rollup_path(db.database_dir)
    meta = _meta_read(live)
    if meta is None:
        raise RollupMissingError(db.database_dir)
    current = _manifest_snapshot_no(db._index_path)
    if meta.get("index_snapshot") != current:
        raise StaleRollupError(
            f"rollup was built at index snapshot {meta.get('index_snapshot')} "
            f"but the index is at snapshot {current} — a maintenance write "
            "crashed between the index commit and the rollup swap; call "
            "create_rollup() to rebuild"
        )
    return db.spark.read.schema(ROLLUP_SCHEMA).parquet(str(live))
