"""Python UDTFs (Spark 4 user-defined TABLE functions): one input row ->
many typed output rows, composable in SQL via LATERAL joins.

Where they fit next to the repo's other Python boundaries: a pandas UDF
maps 1→1 on Arrow batches; ``mapInPandas`` re-shapes whole partitions; a
UDTF is the row-expanding middle ground that SQL can call directly —
``SELECT ... FROM t, LATERAL parse_mcm(t.value)`` — so exploratory SQL
users get the parser without touching the DataFrame API. The executor-side
cost model is the same as any Python boundary (Arrow transfer per batch);
the hot ETL path keeps its from_json/JVM lineage, this is the ergonomic
surface."""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(
    returnType=(
        "marketId string, pt bigint, status string, version bigint,"
        " n_runner_changes int"
    )
)
class ParseMcmLine:
    """One raw mcm NDJSON line -> one row per market change in it.

    Mirrors the stream reader's extraction (sources/marketdef.py,
    streaming/mcm.py MCM_SCHEMA): op must be 'mcm'; each element of `mc`
    yields (marketId, pt, definition status/version if present, number of
    rc price ticks). Malformed JSON and non-mcm ops yield nothing — a
    poison line drops, it does not kill the task."""

    def eval(self, line: str):
        try:
            msg = json.loads(line or "")
        except (json.JSONDecodeError, TypeError):
            return
        if not isinstance(msg, dict) or msg.get("op") != "mcm":
            return
        pt = msg.get("pt")
        for chg in msg.get("mc") or []:
            if not isinstance(chg, dict) or "id" not in chg:
                continue
            defn = chg.get("marketDefinition") or {}
            rc = chg.get("rc") or []
            yield (
                str(chg["id"]),
                int(pt) if pt is not None else None,
                defn.get("status"),
                int(defn["version"]) if defn.get("version") is not None else None,
                len(rc),
            )


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use (idempotent)."""
    spark.udtf.register("parse_mcm", ParseMcmLine)
