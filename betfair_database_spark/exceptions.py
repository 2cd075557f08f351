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


class MarketDefinitionMissingError(BetfairDatabaseError):
    """No line of the market data file carries a market definition.

    Raised only on the single-file accessor path
    (``sources.marketdef.derive_metadata``); the bulk import pipeline counts
    the condition instead (Counters.markets_without_metadata).
    """

    def __init__(self, market_data_file: str | Path):
        super().__init__(_DEFINITION_MISSING_MSG.format(market_data_file))
