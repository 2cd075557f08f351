"""Latest-marketDefinition extraction from stream data files
(reference: marketdef.py:44-114 + utils.py:35-71).

The reference finds the *last* line containing ``"marketDefinition"`` via a
reverse tail-read per file. Under Spark the idiomatic equivalent is a parallel
text scan → ``filter(contains)`` → ``from_json`` → ``max_by`` on the publish
time (``pt``, tie-broken by the definition ``version``), which is the same
"latest definition wins" semantics expressed declaratively — stream files are
append-only and ``pt``/``version`` are monotone. (SURVEY §4: the tail-read
micro-optimization is an anti-pattern under a parallel columnar scan.)

gz/bz2/plaintext decompress natively in ``spark.read.text``; zip has no Spark
codec, so zip members stream through an Arrow-batched ``mapInPandas``
(reference handles zip via ZipFileWrapper, marketdef.py:24-29).

Error taxonomy per data file (reference processor.py:276-301):
  - no line contains the token            → markets_without_metadata (E3)
  - token lines exist but none parse      → corrupt_files (E2)
  - otherwise                             → a derived definition row
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from betfair_database_spark.schema import MCM_SCHEMA

_TOKEN = "marketDefinition"


def _zip_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Executor-side zip decompression: (path, content) → (path, value) lines.

    Only lines containing the definition token are emitted, so the exchange
    stays tiny even for multi-GB archives.
    """
    import io
    import zipfile

    for batch in batches:
        out_paths: list[str] = []
        out_lines: list[str] = []
        for path, content in zip(batch["path"], batch["content"]):
            posix = path.split(":", 1)[-1] if path.startswith("file:") else path
            posix = "/" + posix.lstrip("/")
            stem = posix.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            try:
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    with zf.open(stem) as f:
                        for raw in f:
                            if _TOKEN.encode() in raw:
                                out_paths.append(posix)
                                out_lines.append(raw.decode("utf-8", "replace"))
            except Exception:
                # unreadable archive → emit an unparseable marker line so the
                # file lands in the corrupt branch downstream
                out_paths.append(posix)
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
    import bz2
    import gzip
    import json
    import zipfile
    from pathlib import Path

    from betfair_database_spark.exceptions import MarketDefinitionMissingError

    path = Path(market_data_file)
    suffix = path.suffix.lower()
    if suffix == ".zip":
        with zipfile.ZipFile(path) as zf:
            with zf.open(path.stem) as f:
                raw_lines = f.readlines()
    elif suffix == ".gz":
        with gzip.open(path, "rb") as f:
            raw_lines = f.readlines()
    elif suffix == ".bz2":
        with bz2.open(path, "rb") as f:
            raw_lines = f.readlines()
    else:
        raw_lines = path.read_bytes().splitlines()

    token = _TOKEN.encode()
    line = next((ln for ln in reversed(raw_lines) if token in ln), None)
    if line is None:
        raise MarketDefinitionMissingError(market_data_file)
    msg = json.loads(line.decode("utf-8"))
    mc = msg["mc"][0]
    defn = mc["marketDefinition"]
    defn["marketId"] = mc["id"]
    return defn


def definition_lines(
    spark: SparkSession, plain_paths: list[str], zip_paths: list[str]
) -> DataFrame:
    """All lines containing the definition token, as (path, value)."""
    frames = []
    if plain_paths:
        frames.append(
            spark.read.text(plain_paths)
            .select(
                F.regexp_replace(F.input_file_name(), "^file:/*", "/").alias("path"),
                "value",
            )
            .where(F.col("value").contains(_TOKEN))
        )
    if zip_paths:
        binary = (
            spark.read.format("binaryFile")
            .load(zip_paths)
            .select("path", "content")
        )
        frames.append(
            binary.mapInPandas(_zip_lines, schema="path string, value string")
        )
    if not frames:
        return spark.createDataFrame([], "path string, value string")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


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
