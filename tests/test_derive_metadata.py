"""Single-file accessor: derive_metadata(path) parses the LAST definition of
one data file driver-side, raising MarketDefinitionMissingError on files with
none (reference: marketdef.py:55-86 parse_market_definition + exceptions)."""

from __future__ import annotations

import pytest

from betfair_database_spark import MarketDefinitionMissingError, derive_metadata


def test_plaintext_last_definition_wins(tmp_path):
    from tests.corpus import _defn, _mcm_line, _snapshot_line

    first = _defn("1.999000001", "Early Name", "2023-08-03T14:00:00.000Z")
    last = _defn("1.999000001", "Final Name", "2023-08-03T14:05:00.000Z")
    path = tmp_path / "1.999000001"
    path.write_text(
        "\n".join(
            [
                _mcm_line("1.999000001", 1, first),
                _snapshot_line("1.999000001", 2),
                _mcm_line("1.999000001", 3, last),
                _snapshot_line("1.999000001", 4),
            ]
        ),
        encoding="utf-8",
    )
    defn = derive_metadata(path)
    assert defn["marketId"] == "1.999000001"
    assert defn["name"] == "Final Name"


def test_bz2_and_gz_and_zip_codecs(corpus_dir):
    for name, mid in [
        ("1.222000004.bz2", "1.222000004"),
        ("1.222000005.gz", "1.222000005"),
        ("1.222000006.zip", "1.222000006"),
    ]:
        defn = derive_metadata(corpus_dir / name)
        assert defn["marketId"] == mid


def test_missing_definition_raises_with_reference_message(corpus_dir):
    path = corpus_dir / "1.222000009"
    with pytest.raises(MarketDefinitionMissingError) as ei:
        derive_metadata(path)
    assert str(ei.value) == f"Market definition not found in '{path}'."
