"""Error taxonomy for the Spark engine.

Four conditions are observable API contract (callers catch these types and
tests pin the message text, so both are preserved exactly): a bad database
directory, a missing index, an index that already exists, and a data file
with no extractable market definition. Everything else an import encounters
(corrupt JSON, orphan files) is *counted*, not raised — see etl.Counters.

Message templates live in module constants so the classes themselves stay
one-liners and the contract strings are greppable in one place.
"""

from __future__ import annotations

from pathlib import Path

_INDEX_MISSING_MSG = (
    "Betfair database index not found in '{}'. Index the database, then try again."
)
_INDEX_EXISTS_MSG = "Betfair database index already exists in '{}'."
_DEFINITION_MISSING_MSG = "Market definition not found in '{}'."
_CONCURRENT_WRITER_MSG = (
    "Another writer holds the index lock '{}' ({}). The crash-atomic "
    "maintenance protocol assumes a single writer — wait for it to finish, "
    "or delete the lock file if you are certain that writer is gone."
)


class BetfairDatabaseError(Exception):
    """Root of the engine's exception hierarchy; catch-all for callers."""


class DatabaseDirectoryError(BetfairDatabaseError):
    """The given database path is absent, or present but not a directory."""


class IndexMissingError(BetfairDatabaseError):
    """An operation needed the index, but the directory has none."""

    def __init__(self, target_dir: str | Path):
        super().__init__(_INDEX_MISSING_MSG.format(target_dir))


class IndexExistsError(BetfairDatabaseError):
    """index() refused to clobber an existing index (use force=True)."""

    def __init__(self, target_dir: str | Path, extra: str = ""):
        self.base_msg = _INDEX_EXISTS_MSG.format(target_dir)
        super().__init__(self.base_msg + extra)


class ConcurrentWriterError(BetfairDatabaseError):
    """A second writer tried to mutate the index while another holds the
    lock. The reference gets this exclusion free from SQLite's file
    locking (reference processor.py:365-384 runs inside one locked
    connection); the Spark engine enforces it with an O_EXCL lock file
    beside the index (database.py:_writer_lock)."""

    def __init__(self, lock_path: str | Path, holder: str):
        super().__init__(_CONCURRENT_WRITER_MSG.format(lock_path, holder))


class PairBudgetError(BetfairDatabaseError):
    """Pre-flight refusal of a blocked pair-domain operator (near-dup
    candidate join, fuzzy-match block join, entity-resolution blocking)
    whose estimated candidate-pair count exceeds the configured budget.

    Pair domains are quadratic in block size by semantics: a blocking
    key whose blocks grow with the data turns one join into a
    disk-filling shuffle at 100x scale (the round-12 sf10 sweep filled
    the disk on two uncollapsed near-dup rows). The guard prices the
    join from the block-size aggregate BEFORE the shuffle runs and
    refuses loudly with the measured estimate — the same philosophy as
    ``assert_bounded_frame`` for global windows. Raise or disable via
    the ``spark.bfdb.maxCandidatePairs`` session conf (0 disables)."""

    def __init__(
        self,
        estimated: int,
        budget: int,
        context: str = "",
        remediation: str = "",
    ):
        self.estimated = estimated
        self.budget = budget
        msg = (
            f"candidate-pair budget exceeded: ~{estimated:,} blocked "
            f"pairs estimated vs budget {budget:,}"
            + (f" ({context})" if context else "")
            + ". A pair domain this size would shuffle-spill at scale; "
            "refusing before the join runs."
            + (f" Remediation: {remediation}" if remediation else "")
            + " To override, set spark.bfdb.maxCandidatePairs higher "
            "(or 0 to disable the guard)."
        )
        super().__init__(msg)


class RollupMissingError(BetfairDatabaseError):
    """rollup() was called but no materialized rollup exists — call
    create_rollup() first (engine extension; no reference analogue)."""

    def __init__(self, target_dir: str | Path):
        super().__init__(
            f"'{target_dir}' has no materialized rollup; "
            "call create_rollup() to build one."
        )


class StaleRollupError(BetfairDatabaseError):
    """The materialized rollup lags the index (a maintenance write crashed
    between the index commit and the rollup swap). Rebuild with
    create_rollup() — the engine refuses to serve stale aggregates."""


class MarketDefinitionMissingError(BetfairDatabaseError):
    """No line of the market data file carries a market definition.

    Raised only on the single-file accessor path
    (``sources.marketdef.derive_metadata``); the bulk import pipeline counts
    the condition instead (Counters.markets_without_metadata).
    """

    def __init__(self, market_data_file: str | Path):
        super().__init__(_DEFINITION_MISSING_MSG.format(market_data_file))
