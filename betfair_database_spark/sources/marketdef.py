"""Latest-marketDefinition extraction from stream data files
(reference: marketdef.py:44-114 + utils.py:35-71).

The reference finds the *last* line containing ``"marketDefinition"`` via a
reverse tail-read per file. Under Spark the idiomatic equivalent is a parallel
text scan → ``filter(contains)`` → ``from_json`` → ``max_by`` on the publish
time (``pt``, tie-broken by the definition ``version``), which is the same
"latest definition wins" semantics expressed declaratively — stream files are
append-only and ``pt``/``version`` are monotone. (SURVEY §4: the tail-read
micro-optimization is an anti-pattern under a parallel columnar scan.)

Which files to read is data-dependent (only data files with no metadata
sibling), so the read is driven BY the path frame itself: an Arrow-batched
``mapInPandas`` opens each file executor-side (gz/bz2/zip/plaintext by
suffix — reference handles zip via ZipFileWrapper, marketdef.py:24-29) and
emits only token lines. No path list ever materializes on the driver.

Error taxonomy per data file (reference processor.py:276-301):
  - no line contains the token            → markets_without_metadata (E3)
  - token lines exist but none parse      → corrupt_files (E2)
  - otherwise                             → a derived definition row
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from betfair_database_spark.schema import MCM_SCHEMA

_TOKEN = "marketDefinition"


def _open_lines(path: str):
    """Byte lines of a stream data file as a LAZY iterator, decompressing by
    suffix — a multi-GB input streams line-by-line, it is never materialized
    as a list. zip archives hold one member named after the file stem (the
    Betfair archive convention); gz/bz2/plaintext open directly."""
    import bz2
    import gzip
    import io
    import zipfile

    if path.endswith(".zip"):
        stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        with zipfile.ZipFile(path) as zf:
            with zf.open(stem) as f:
                yield from f
        return
    if path.endswith(".gz"):
        opener = gzip.open
    elif path.endswith(".bz2"):
        opener = bz2.open
    else:
        opener = io.open
    with opener(path, "rb") as f:
        yield from f


def _token_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Executor-side read of the data files named by the incoming rows:
    (path) → (path, value) for lines containing the definition token.

    Only token lines are emitted, so the exchange stays tiny even for
    multi-GB inputs. Unreadable files (bad archive, vanished path) emit an
    unparseable marker line so they land in the corrupt branch downstream
    instead of killing the batch.
    """
    token = _TOKEN.encode()
    for batch in batches:
        out_paths: list[str] = []
        out_lines: list[str] = []
        for path in batch["path"]:
            try:
                for raw in _open_lines(path):
                    if token in raw:
                        out_paths.append(path)
                        out_lines.append(raw.decode("utf-8", "replace"))
            except Exception:
                out_paths.append(path)
                out_lines.append('{"corrupt -- ' + _TOKEN)
        yield pd.DataFrame({"path": out_paths, "value": out_lines})


def derive_metadata(market_data_file) -> dict:
    """Single-file accessor: parse the LAST market definition of one stream
    data file and return it as a dict with ``marketId`` injected from the
    enclosing market-change message.

    This is the interactive/driver-side twin of the distributed extraction
    below (reference: marketdef.py:55-86 ``parse_market_definition``): one
    user, one file, no Spark job. Accepts plaintext, ``.gz``, ``.bz2`` and
    ``.zip`` (member named after the file stem, like the archive convention
    the import pipeline handles).

    Raises ``MarketDefinitionMissingError`` when no line of the file carries
    a market definition (reference marketdef.py:79-82).
    """
    import json

    from betfair_database_spark.exceptions import MarketDefinitionMissingError

    # same codec dispatch as the distributed reader — one copy of the
    # suffix/zip-member convention
    raw_lines = list(_open_lines(str(market_data_file)))
    token = _TOKEN.encode()
    line = next((ln for ln in reversed(raw_lines) if token in ln), None)
    if line is None:
        raise MarketDefinitionMissingError(market_data_file)
    msg = json.loads(line.decode("utf-8"))
    mc = msg["mc"][0]
    defn = mc["marketDefinition"]
    defn["marketId"] = mc["id"]
    return defn


def definition_lines(paths: DataFrame) -> DataFrame:
    """All lines containing the definition token across the data files named
    by ``paths`` (a one-column ``path`` frame), as (path, value).

    The path frame drives an executor-side read (see ``_token_lines``): the
    file set is data-dependent (orphan data files of the pairing), so it
    never materializes on the driver; each executor opens the files of its
    own partitions. gz/bz2/zip/plaintext are all handled by suffix.
    """
    return paths.select("path").mapInPandas(
        _token_lines, schema="path string, value string"
    )


def extract_latest_definitions(lines: DataFrame) -> DataFrame:
    """(path, value) token lines → one row per file with the latest definition.

    Returns: path, defn (DEFINITION_SCHEMA struct with marketId injected),
    corrupt (bool: token lines existed but none parsed).
    """
    parsed = lines.select(
        "path", F.from_json("value", MCM_SCHEMA).alias("msg")
    ).select(
        "path",
        F.col("msg")["pt"].alias("pt"),
        F.col("msg")["mc"][0]["id"].alias("mid"),
        F.col("msg")["mc"][0]["marketDefinition"].alias("defn"),
    )
    per_file = parsed.groupBy("path").agg(
        F.max_by(
            F.struct("mid", "defn"),
            F.when(
                F.col("defn").isNotNull(),
                F.struct(F.col("pt"), F.col("defn")["version"]),
            ),
        ).alias("latest"),
        F.max(F.col("defn").isNotNull().cast("int")).alias("any_parsed"),
    )
    # Inject the market id from the enclosing mc message (marketdef.py:84-87)
    defn = F.col("latest")["defn"]
    return per_file.select(
        "path",
        F.when(
            F.col("any_parsed") == 1,
            defn.withField("marketId", F.col("latest")["mid"]),
        ).alias("defn"),
        (F.col("any_parsed") == 0).alias("corrupt"),
    )


def write_derived_metadata_files(derived: DataFrame) -> None:
    """Side-effect compat with the reference (marketdef.py:89-114): persist
    each derived definition as ``<stem>.json`` next to its data file so the
    directory remains self-describing for other tools. Runs on executors.

    ``derived`` columns: json_path (destination), defn_json (compact JSON).
    """

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        n = 0
        for batch in batches:
            for dest, payload in zip(batch["json_path"], batch["defn_json"]):
                if not os.path.exists(dest):
                    with open(dest, "w", encoding="utf-8") as f:
                        f.write(payload)
                n += 1
        yield pd.DataFrame({"n": [n]})

    derived.mapInPandas(_write, schema="n long").collect()
