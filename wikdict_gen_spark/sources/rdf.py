"""S5: RDF dump bulk load — distributed N-Triples/Turtle-line reader.

The reference bulk-loads gzipped Turtle dumps into Virtuoso with
`ld_dir(...)` + `rdf_loader_run()` (/root/reference/virtuoso/
insert_single_ttl.py:14-57) and registers a fixed namespace-prefix table
so queries use compact names.  The Spark-first analog reads the dumps as
a line source and parses triples with JVM regexes:

- `spark.read.text` over a directory: plain `.nt` files split by line
  ranges (full intra-file parallelism); `.gz` members are one partition
  each, parallel across files — the same per-file parallelism
  `rdf_loader_run` gets from its loader processes.
- subject/predicate/object extraction is `regexp_extract` (whole-stage
  codegen); the only Python is literal unescaping (`\\uXXXX` needs real
  codepoint math), Arrow-batched and applied ONLY to rows that contain a
  backslash.
- the namespace table from the reference's `XML_SET_NS_DECL` block is
  mirrored in PREFIXES; `compact_uri` folds full URIs to `prefix:local`
  exactly like the SPARQL queries expect.

Line-oriented means one triple per line (N-Triples, or the line-based
Turtle subset DBnary dumps use); multi-line Turtle constructs are out of
scope and surface via `invalid_lines`.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# /root/reference/virtuoso/insert_single_ttl.py:17-33 (public namespaces)
PREFIXES: dict[str, str] = {
    "lexinfo": "http://www.lexinfo.net/ontology/2.0/lexinfo#",
    "lexvo": "http://lexvo.org/id/iso639-3/",
    "lemon": "http://lemon-model.net/lemon#",
    "dbnary": "http://kaiko.getalp.org/dbnary#",
    "olia": "http://purl.org/olia/olia.owl#",
    "ontolex": "http://www.w3.org/ns/lemon/ontolex#",
    "synsem": "http://www.w3.org/ns/lemon/synsem#",
    "decomp": "http://www.w3.org/ns/lemon/decomp#",
    "vartrans": "http://www.w3.org/ns/lemon/vartrans#",
    "lime": "http://www.w3.org/ns/lemon/lime#",
    "dct": "http://purl.org/dc/terms/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xs": "http://www.w3.org/2001/XMLSchema#",
}

# one triple line: subject (uri | bnode), predicate (uri), object (rest)
_TRIPLE_RE = r"^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$"
# literal object: "chars" with optional @lang or ^^<datatype>
_LITERAL_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$'

_ESC = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
        '"': '"', "'": "'", "\\": "\\"}
_ESC_RE = re.compile(r'\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf"\'\\])')


def _unescape_one(s: str) -> str:
    return _ESC_RE.sub(
        lambda m: chr(int(m.group(1)[1:], 16))
        if m.group(1)[0] in "uU"
        else _ESC[m.group(1)],
        s,
    )


@pandas_udf(StringType())
def _unescape_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else _unescape_one(v))


def _is_directive(line: Column) -> Column:
    t = F.trim(line)
    return (
        (t == "")
        | t.startswith("#")
        | t.startswith("@prefix")
        | t.startswith("@base")
        | t.startswith("PREFIX ")
        | t.startswith("BASE ")
    )


def _parsed(lines: DataFrame) -> DataFrame:
    return lines.select(
        F.col("value").alias("line"),
        F.input_file_name().alias("source_file"),
        F.regexp_extract("value", _TRIPLE_RE, 1).alias("subj_raw"),
        F.regexp_extract("value", _TRIPLE_RE, 2).alias("predicate"),
        F.regexp_extract("value", _TRIPLE_RE, 3).alias("obj_raw"),
    )


def read_ntriples(spark: SparkSession, path: str, graph: str | None = None) -> DataFrame:
    """Triples DataFrame: (subject, subject_kind, predicate, object_value,
    object_kind, lang_tag, datatype, graph, source_file).

    object_kind in ('uri', 'bnode', 'literal'); literal values are
    unescaped, URIs are bare (no angle brackets).  Unparseable non-comment
    lines are dropped here — audit them with invalid_lines().
    """
    lines = spark.read.text(path).where(~_is_directive(F.col("value")))
    p = _parsed(lines).where(F.col("predicate") != "")

    subj_is_uri = F.col("subj_raw").startswith("<")
    obj = F.col("obj_raw")
    obj_is_uri = obj.startswith("<")
    obj_is_bnode = obj.startswith("_:")
    lit_value = F.regexp_extract(obj, _LITERAL_RE, 1)
    # unescape only when a backslash is present — the fast path never
    # leaves the JVM
    lit_unescaped = F.when(
        lit_value.contains("\\"), _unescape_udf(lit_value)
    ).otherwise(lit_value)

    # a literal object must match the literal grammar; failures are dropped
    # here and surfaced by invalid_lines()
    lit_ok = obj_is_uri | obj_is_bnode | (
        F.regexp_extract(obj, _LITERAL_RE, 0) != ""
    )
    out = p.where(lit_ok).select(
        F.when(subj_is_uri, F.expr("substring(subj_raw, 2, length(subj_raw) - 2)"))
        .otherwise(F.col("subj_raw")).alias("subject"),
        F.when(subj_is_uri, F.lit("uri")).otherwise(F.lit("bnode")).alias("subject_kind"),
        F.col("predicate"),
        F.when(obj_is_uri, F.expr("substring(obj_raw, 2, length(obj_raw) - 2)"))
        .when(obj_is_bnode, obj)
        .otherwise(lit_unescaped).alias("object_value"),
        F.when(obj_is_uri, F.lit("uri"))
        .when(obj_is_bnode, F.lit("bnode"))
        .otherwise(F.lit("literal")).alias("object_kind"),
        F.when(obj_is_uri | obj_is_bnode, F.lit(None).cast("string"))
        .otherwise(F.nullif(F.regexp_extract(obj, _LITERAL_RE, 2), F.lit(""))).alias("lang_tag"),
        F.when(obj_is_uri | obj_is_bnode, F.lit(None).cast("string"))
        .otherwise(F.nullif(F.regexp_extract(obj, _LITERAL_RE, 3), F.lit(""))).alias("datatype"),
        F.lit(graph).cast("string").alias("graph"),
        F.col("source_file"),
    )
    return out


def invalid_lines(spark: SparkSession, path: str) -> DataFrame:
    """Audit companion: non-directive lines the triple grammar rejects
    (plus literal objects that fail the literal grammar)."""
    lines = spark.read.text(path).where(~_is_directive(F.col("value")))
    p = _parsed(lines)
    bad_shape = F.col("predicate") == ""
    obj = F.col("obj_raw")
    is_lit = ~obj.startswith("<") & ~obj.startswith("_:")
    bad_literal = is_lit & (F.regexp_extract(obj, _LITERAL_RE, 0) == "")
    return p.where(bad_shape | (~bad_shape & bad_literal)).select("line", "source_file")


def compact_uri(col: Column, prefixes: dict[str, str] | None = None) -> Column:
    """Fold full URIs to `prefix:local` using the Virtuoso-mirrored
    namespace table (longest namespace wins); unknown namespaces pass
    through unchanged.  Pure column expression — chained replaces."""
    table = prefixes or PREFIXES
    out = col
    for pfx, ns in sorted(table.items(), key=lambda kv: -len(kv[1])):
        out = F.replace(out, F.lit(ns), F.lit(pfx + ":"))
    return out
