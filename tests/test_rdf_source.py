"""S5 RDF bulk-load analog: distributed N-Triples reader + prefix folding
(reference contract: /root/reference/virtuoso/insert_single_ttl.py:14-57)."""

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.sources import rdf

NT = """\
# a comment line
@prefix lexinfo: <http://www.lexinfo.net/ontology/2.0/lexinfo#> .

<http://kaiko.getalp.org/dbnary/deu/Haus> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/ns/lemon/ontolex#LexicalEntry> .
<http://kaiko.getalp.org/dbnary/deu/Haus> <http://www.w3.org/2000/01/rdf-schema#label> "Haus"@de .
_:b0 <http://www.lexinfo.net/ontology/2.0/lexinfo#partOfSpeech> <http://www.lexinfo.net/ontology/2.0/lexinfo#noun> .
<http://x/esc> <http://x/p> "a\\"b\\\\c\\nd\\u00e9" .
<http://x/typed> <http://x/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://x/empty> <http://x/p> "" .
<http://x/bn> <http://x/p> _:b1 .
this line is garbage
<http://x/badlit> <http://x/p> "unterminated .
"""


@pytest.fixture(scope="module")
def nt_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("ttl")
    (d / "dump.nt").write_text(NT, encoding="utf-8")
    return str(d)


@pytest.fixture(scope="module")
def triples(spark, nt_path):
    return rdf.read_ntriples(spark, nt_path, graph="dbnary/deu").collect()


def test_counts_and_kinds(triples):
    # 7 valid triples; garbage + bad literal dropped; comments/directives skipped
    assert len(triples) == 7
    by_subj = {(t["subject"], t["predicate"]): t for t in triples}
    t = by_subj[("http://kaiko.getalp.org/dbnary/deu/Haus",
                 "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")]
    assert t["object_kind"] == "uri"
    assert t["object_value"] == "http://www.w3.org/ns/lemon/ontolex#LexicalEntry"
    assert t["subject_kind"] == "uri"
    assert t["graph"] == "dbnary/deu"
    assert t["source_file"].endswith("dump.nt")


def test_lang_tag_and_literal(triples):
    t = next(t for t in triples if t["predicate"].endswith("label"))
    assert t["object_kind"] == "literal"
    assert t["object_value"] == "Haus"
    assert t["lang_tag"] == "de"
    assert t["datatype"] is None


def test_bnode_subject_and_object(triples):
    t = next(t for t in triples if t["subject"] == "_:b0")
    assert t["subject_kind"] == "bnode"
    t2 = next(t for t in triples if t["object_value"] == "_:b1")
    assert t2["object_kind"] == "bnode"


def test_escapes(triples):
    t = next(t for t in triples if t["subject"] == "http://x/esc")
    assert t["object_value"] == 'a"b\\c\ndé'
    assert t["lang_tag"] is None


def test_typed_and_empty_literals(triples):
    typed = next(t for t in triples if t["subject"] == "http://x/typed")
    assert typed["object_value"] == "42"
    assert typed["datatype"] == "http://www.w3.org/2001/XMLSchema#integer"
    empty = next(t for t in triples if t["subject"] == "http://x/empty")
    assert empty["object_value"] == ""
    assert empty["object_kind"] == "literal"


def test_invalid_lines(spark, nt_path):
    bad = [r["line"] for r in rdf.invalid_lines(spark, nt_path).collect()]
    assert len(bad) == 2
    assert any("garbage" in b for b in bad)
    assert any("unterminated" in b for b in bad)


def test_compact_uri(spark):
    df = spark.createDataFrame(
        [("http://www.lexinfo.net/ontology/2.0/lexinfo#noun",),
         ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type",),
         ("http://unknown.example/x",)],
        "u string",
    )
    got = [r["c"] for r in df.select(rdf.compact_uri(F.col("u")).alias("c")).collect()]
    assert got == ["lexinfo:noun", "rdf:type", "http://unknown.example/x"]
