"""Language registry (reference supported_langs + languages.tsv data)."""

import pytest

from wikdict_gen_spark import languages as L


def test_registry_complete():
    # the reference's 26 supported languages (/root/reference/src/helper.py:9-36)
    assert len(L.SUPPORTED_LANGS) == 26
    assert set(L.LANGUAGE_CODES3) == set(L.SUPPORTED_LANGS)
    assert set(L.LANGUAGE_NAMES) == set(L.SUPPORTED_LANGS)


def test_codes3_spot_checks():
    # ISO-639-2/T values from the reference's languages.tsv
    assert L.lang3("de") == "deu"
    assert L.lang3("en") == "eng"
    assert L.lang3("sv") == "swe"
    assert L.lang3("zh") == "zho"
    # unknown codes pass through (synthetic test langs)
    assert L.lang3("l0") == "l0"


def test_display_names():
    assert L.display_name("de") == "Deutsch"
    assert L.display_name("ja").startswith("日本語")
    assert L.display_name("xx") == "xx"


def test_assert_supported():
    L.assert_supported(["de", "en"])
    with pytest.raises(ValueError, match="unsupported"):
        L.assert_supported(["de", "xx"])


def test_as_dataframe(spark):
    df = L.as_dataframe(spark)
    rows = {r["lang"]: (r["lang3"], r["name"]) for r in df.collect()}
    assert len(rows) == 26
    assert rows["fr"] == ("fra", "français")
