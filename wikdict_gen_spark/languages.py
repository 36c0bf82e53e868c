"""Language registry: the reference's 26 supported languages.

Mirrors /root/reference/src/helper.py:9-36 (supported_langs) and the
ISO-639 data the reference generates into src/languages/__init__.py from
src/languages/languages.tsv (gen_languages.py): per ISO-639-1 code, the
ISO-639-3 code used for distribution filenames (FreeDict ships
`deu-eng.tei`, not `de-en.tei`) and the native display name used in TEI
headers.

The registry is plain data — engine config, not a table — because every
consumer needs it driver-side (filenames, headers, validation) before any
job runs; anything per-row joins against a broadcast DataFrame built from
it via ``as_dataframe``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SUPPORTED_LANGS: tuple[str, ...] = (
    "bg", "ca", "cs", "de", "da", "el", "en", "es", "fi", "fr", "ga", "id",
    "it", "ja", "ku", "la", "lt", "mg", "nl", "no", "pl", "pt", "ru", "sv",
    "tr", "zh",
)

# ISO-639-1 -> ISO-639-3 (the reference's language_codes3, filename codes)
LANGUAGE_CODES3: dict[str, str] = {
    "bg": "bul", "ca": "cat", "cs": "ces", "de": "deu", "da": "dan",
    "el": "ell", "en": "eng", "es": "spa", "fi": "fin", "fr": "fra",
    "ga": "gle", "id": "ind", "it": "ita", "ja": "jpn", "ku": "kur",
    "la": "lat", "lt": "lit", "mg": "mlg", "nl": "nld", "no": "nor",
    "pl": "pol", "pt": "por", "ru": "rus", "sv": "swe", "tr": "tur",
    "zh": "zho",
}

# ISO-639-1 -> native display name (the reference's language_names)
LANGUAGE_NAMES: dict[str, str] = {
    "bg": "български език",
    "ca": "català",
    "cs": "čeština",
    "de": "Deutsch",
    "da": "dansk",
    "el": "ελληνικά",
    "en": "English",
    "es": "español",
    "fi": "suomi",
    "fr": "français",
    "ga": "Gaeilge",
    "id": "Bahasa Indonesia",
    "it": "italiano",
    "ja": "日本語 (にほんご)",
    "ku": "Kurdî",
    "la": "latine",
    "lt": "lietuvių kalba",
    "mg": "fiteny malagasy",
    "nl": "Nederlands",
    "no": "Norsk",
    "pl": "język polski",
    "pt": "português",
    "ru": "Русский",
    "sv": "Svenska",
    "tr": "Türkçe",
    "zh": "中文 (Zhōngwén)",
}


def lang3(code: str) -> str:
    """ISO-639-3 code for a 639-1 code; unknown codes pass through so
    synthetic test languages ('l0', 'aa') still produce usable filenames."""
    return LANGUAGE_CODES3.get(code, code)


def display_name(code: str) -> str:
    """Native display name; unknown codes pass through."""
    return LANGUAGE_NAMES.get(code, code)


def assert_supported(langs: list[str] | tuple[str, ...]) -> None:
    """Fail fast on a lang code outside the registry (driver-side gate the
    reference applies via supported_langs in make_for_langs)."""
    unknown = [lang for lang in langs if lang not in SUPPORTED_LANGS]
    if unknown:
        raise ValueError(
            f"unsupported language codes {unknown}; supported: {sorted(SUPPORTED_LANGS)}"
        )


def as_dataframe(spark: SparkSession) -> DataFrame:
    """The registry as a broadcastable dimension (lang, lang3, name)."""
    rows = [
        (code, LANGUAGE_CODES3[code], LANGUAGE_NAMES[code])
        for code in SUPPORTED_LANGS
    ]
    return spark.createDataFrame(rows, "lang string, lang3 string, name string")
