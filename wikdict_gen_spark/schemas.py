"""Fixed StructType schemas for every stage table.

Schema inference is banned: at 10^12 rows schema drift must be an error,
not a silent cast.  Raw-table shapes mirror the reference's raw DDL
(/root/reference/src/sql/sparql/*.sql); the `pages` shape is mandated by
BASELINE.json input_hint.
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*names: str) -> list[StructField]:
    return [StructField(n, StringType()) for n in names]


# ---- input ---------------------------------------------------------------

PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType(), False),
    ]
)

# ---- extract stage output -------------------------------------------------

EXTRACTED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("text", StringType()),
    ]
)

# ---- raw fact tables (mention/structure detection output) ------------------

RAW_ENTRY = StructType(_s("lexentry", "vocable", "written_rep") + [StructField("lang", StringType())])
RAW_POS = StructType(_s("lexentry", "part_of_speech") + [StructField("lang", StringType())])
RAW_GENDER = StructType(_s("lexentry", "gender") + [StructField("lang", StringType())])
RAW_PRONUN = StructType(_s("lexentry", "pronun") + [StructField("lang", StringType())])
RAW_FORM = StructType(
    _s(
        "lexentry",
        "other_written",
        "pos",
        "mood",
        "number",
        "person",
        "tense",
        "voice",
        "case",
        "inflection",
        "definiteness",
        "gender",
    )
    + [StructField("lang", StringType())]
)
RAW_IMPORTANCE = StructType(
    [
        StructField("vocable", StringType()),
        StructField("score", DoubleType()),
        StructField("lang", StringType()),
    ]
)
RAW_TRANSLATION = StructType(
    _s("lexentry", "sense_num", "sense", "trans_kind", "trans")
    + [StructField("from_lang", StringType()), StructField("to_lang", StringType())]
)
RAW_NYM = StructType(_s("f", "nym", "t_rep") + [StructField("lang", StringType())])

# ---- processed ------------------------------------------------------------

ALL_TRANS = StructType(
    [
        StructField("from_lang", StringType(), False),
        StructField("to_lang", StringType(), False),
        StructField("lexentry", StringType()),
        StructField("sense_num", StringType()),
        StructField("sense", StringType(), False),  # empty string, never NULL
        StructField("from_vocable", StringType(), False),
        StructField("to_vocable", StringType(), False),
        StructField("from_importance", DoubleType()),
        StructField("to_importance", DoubleType()),
    ]
)

# ---- knowledge graph -------------------------------------------------------

KG_EDGES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("from_lang", StringType()),
        StructField("to_lang", StringType()),
        StructField("sense_num", StringType()),
        StructField("sense", StringType()),
        StructField("score", DoubleType()),
        StructField("sources", ArrayType(StringType())),
        StructField("source_details", ArrayType(StringType())),
    ]
)

KG_NODES = StructType(
    [
        StructField("node_id", StringType(), False),
        StructField("lang", StringType()),
        StructField("written_rep", StringType()),
        StructField("part_of_speech", StringType()),
        StructField("gender", StringType()),
        StructField("pronun_list", ArrayType(StringType())),
        StructField("importance", DoubleType()),
        StructField("rel_importance", DoubleType()),
        StructField("canonical_id", StringType()),
    ]
)
