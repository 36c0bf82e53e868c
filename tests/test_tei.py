"""S9 TEI/XML + sitemap sinks.

Structure-level assertions via ElementTree (tags, text, attribute, order)
mirroring the reference's element construction
(/root/reference/src/tei.py:295-356), plus document assembly and the
sitemap top-k/sorted-pair contract (/root/reference/src/sitemap.py:23-41).
"""

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import tei

TG_SCHEMA = (
    "from_lang string, to_lang string, lexentry string, written_rep string, "
    "trans_list string, min_sense_num string, sense_list string, "
    "score double, importance double"
)
ENTRY_SCHEMA = (
    "lexentry string, part_of_speech string, gender string, "
    "pronun_list array<string>"
)
FORM_SCHEMA = "lexentry string, other_written string, rank int"


def _parse(entry_xml: str) -> ET.Element:
    wrapped = (
        '<root xmlns:wikdict="http://www.wikdict.com/ns/1.0">'
        + entry_xml
        + "</root>"
    )
    return list(ET.fromstring(wrapped))[0]


@pytest.fixture(scope="module")
def rendered(spark):
    tg = spark.createDataFrame(
        [
            # two translation rows collapsing into ONE entry group (same
            # headword/pos/gender/pronun), ordered by min_sense_num
            ("de", "en", "Haus-n-1", "Haus", "house | home", "01", "building", 80.0, 2.0),
            ("de", "en", "Haus-n-2", "Haus", "house", "02", "family | dynasty", 60.0, 2.0),
            # suffix entry: pos NULL + leading dash; trans loses its dash
            ("de", "en", "keit-x", "-heit", "-ness", None, None, 70.0, 0.5),
            # escaping
            ("de", "en", "amp-n", "K&uuml;", "a<b", None, None, 50.0, 0.1),
            # below the fixed gate -> dropped
            ("de", "en", "low-n", "leise", "quiet", None, None, 5.0, 0.1),
        ],
        TG_SCHEMA,
    )
    entry = spark.createDataFrame(
        [
            ("Haus-n-1", "noun", "neuter", ["haʊs"]),
            ("Haus-n-2", "noun", "neuter", ["haʊs"]),
            ("keit-x", None, None, None),
            ("amp-n", "verb", None, None),
            ("low-n", "noun", None, None),
        ],
        ENTRY_SCHEMA,
    )
    form = spark.createDataFrame(
        [
            ("Haus-n-2", "Häuser", 2),
            ("Haus-n-2", "Hause", None),
            ("Haus-n-2", "Häuser", 5),  # min(rank)=2 collapses the dup
            ("Haus-n-1", "WRONG", 1),   # forms come from the LAST row's lexentry
        ],
        FORM_SCHEMA,
    )
    rows = tei.tei_entry_rows(tg, entry, form, min_score=20.0)
    out = {
        r["written_rep"]: r["entry_xml"]
        for r in tei.tei_entry_xml(rows).collect()
    }
    return out


def test_gate_and_grouping(rendered):
    assert set(rendered) == {"Haus", "-heit", "K&uuml;"}


def test_entry_structure(rendered):
    e = _parse(rendered["Haus"])
    assert e.tag == "entry"
    form = e.find("form")
    assert form.find("orth").text == "Haus"
    assert [p.text for p in form.findall("pron")] == ["haʊs"]
    gram = e.find("gramGrp")
    assert gram.find("pos").text == "n"
    assert gram.find("gen").text == "neut"


def test_consecutive_sense_grouping(rendered):
    """Rows ordered by min_sense_num; consecutive equal trans_lists merge."""
    e = _parse(rendered["Haus"])
    senses = e.findall("sense")
    assert len(senses) == 2
    s1, s2 = senses
    assert [q.text for q in s1.find("cit").findall("quote")] == ["house", "home"]
    assert [d.find("def").text for d in s1.findall("sense")] == ["building"]
    assert [q.text for q in s2.find("cit").findall("quote")] == ["house"]
    assert [d.find("def").text for d in s2.findall("sense")] == ["family", "dynasty"]
    assert s1.find("cit").get("{http://www.w3.org/XML/1998/namespace}lang") == "en"


def test_inflected_forms_from_last_lexentry(rendered):
    e = _parse(rendered["Haus"])
    infl = e.find("form").find("form")
    assert infl.get("type") == "infl"
    orths = infl.findall("orth")
    # NULL rank sorts first (sqlite ORDER BY rank), no wikdict:show attr
    assert [o.text for o in orths] == ["Hause", "Häuser"]
    show = "{http://www.wikdict.com/ns/1.0}show"
    assert orths[0].get(show) is None
    assert orths[1].get(show) == "true"
    assert "WRONG" not in rendered["Haus"]


def test_suffix_entry(rendered):
    e = _parse(rendered["-heit"])
    assert e.find("form").find("orth").text == "heit"
    assert e.find("gramGrp").find("pos").text == "suffix"
    # suffix translations lose their leading dash too
    assert e.find("sense").find("cit").find("quote").text == "ness"


def test_escaping(rendered):
    raw = rendered["K&uuml;"]
    assert "K&amp;uuml;" in raw
    assert "a&lt;b" in raw
    e = _parse(raw)
    assert e.find("form").find("orth").text == "K&uuml;"


def test_adaptive_gate_keeps_small_dicts(spark):
    """min_score=None: tiny pair -> adaptive threshold 0 -> nothing dropped."""
    tg = spark.createDataFrame(
        [("de", "en", "x-n", "x", "y", None, None, 1.0, 0.1)], TG_SCHEMA
    )
    entry = spark.createDataFrame([("x-n", "noun", None, None)], ENTRY_SCHEMA)
    rows = tei.tei_entry_rows(tg, entry, form=None)
    assert rows.count() == 1


def test_write_tei(tmp_path, rendered, spark):
    df = spark.createDataFrame(
        [("de", "en", w, x) for w, x in rendered.items()],
        "from_lang string, to_lang string, written_rep string, entry_xml string",
    )
    counts = tei.write_tei(df, str(tmp_path), today="2026-08-16",
                           language_names={"de": "German", "en": "English"})
    assert counts == {"de-en": 3}
    # ISO-639-3 distribution filename (reference tei.py:428-431)
    out = (tmp_path / "small" / "deu-eng.tei").read_text()
    assert out.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    assert "<title>German-English FreeDict+WikDict dictionary</title>" in out
    assert "<extent>3 headwords</extent>" in out
    assert '<note type="status">too small</note>' in out
    assert "<edition>2026.08.16</edition>" in out
    # body sorted by written_rep: '-heit' < 'Haus' < 'K&uuml;' (binary order)
    assert out.index("heit") < out.index("Haus") < out.index("K&amp;uuml;")
    # entries sit on their own indented lines (the reference's inter-entry
    # tail) and never concatenate as '</entry><entry>'
    assert "</entry><entry>" not in out
    assert "</entry>\n    <entry>" in out
    # whole document parses
    ET.fromstring(out[out.index("<TEI"):])


def test_write_tei_registry_defaults(tmp_path, rendered, spark):
    """Names/codes default to the 26-language registry — a pair outside
    {de,en,sv,fr} gets real native names and iso3 filenames."""
    df = spark.createDataFrame(
        [("pt", "ru", w, x) for w, x in rendered.items()],
        "from_lang string, to_lang string, written_rep string, entry_xml string",
    )
    counts = tei.write_tei(df, str(tmp_path), today="2026-08-16")
    assert counts == {"pt-ru": 3}
    out = (tmp_path / "small" / "por-rus.tei").read_text()
    assert "<title>português-Русский FreeDict+WikDict dictionary</title>" in out
    assert '<body xml:lang="pt">' in out


def test_wikdict_show_rank_truthiness(spark):
    """rank=0 must NOT get wikdict:show (reference checks truthiness,
    tei.py:340), rank=1 must."""
    tg = spark.createDataFrame(
        [("de", "en", "z-n", "Zeit", "time", None, None, 50.0, 0.5)], TG_SCHEMA
    )
    entry = spark.createDataFrame([("z-n", "noun", None, None)], ENTRY_SCHEMA)
    form = spark.createDataFrame(
        [("z-n", "rankzero", 0), ("z-n", "rankone", 1)], FORM_SCHEMA
    )
    rows = tei.tei_entry_rows(tg, entry, form, min_score=0.0)
    xml = tei.tei_entry_xml(rows).collect()[0]["entry_xml"]
    assert '<orth>rankzero</orth>' in xml
    assert '<orth wikdict:show="true">rankone</orth>' in xml


def test_entry_indentation_bytes(spark):
    """Exact serialization parity with the reference's indent(entry, level=2)
    (tei.py:25-39): children of <entry> at 6 spaces, one 2-space level per
    depth, closing </entry> at 4 spaces, inter-entry tail '\\n    '."""
    tg = spark.createDataFrame(
        [("de", "en", "z-n", "Zeit", "time", None, None, 50.0, 0.5)], TG_SCHEMA
    )
    entry = spark.createDataFrame([("z-n", "noun", None, None)], ENTRY_SCHEMA)
    rows = tei.tei_entry_rows(tg, entry, form=None, min_score=0.0)
    xml = tei.tei_entry_xml(rows).collect()[0]["entry_xml"]
    assert xml == (
        "<entry>"
        "\n      <form>"
        "\n        <orth>Zeit</orth>"
        "\n      </form>"
        "\n      <gramGrp>"
        "\n        <pos>n</pos>"
        "\n      </gramGrp>"
        "\n      <sense>"
        '\n        <cit type="trans" xml:lang="en">'
        "\n          <quote>time</quote>"
        "\n        </cit>"
        "\n      </sense>"
        "\n    </entry>"
        "\n    "
    )


def test_full_file_byte_parity(tmp_path, spark):
    """End-to-end byte parity of one complete small dictionary file against
    the reference-template render: tests/data/tei_de_en_golden.tei was
    produced by running the reference's write_tei_dict serialization steps
    (template text extracted from /root/reference/src/tei.py:81-159, its
    indent + tostring + dummy-strip pipeline, tei.py:385-444) over the
    pinned Zeit entry.  Full header parity — respStmt, publisher,
    sourceDesc, encodingDesc tagUsage inventory, revisionDesc — plus every
    indentation quirk (re-split editionStmt, dropped comment, the blank
    line the dummy strip leaves, the first-entry splice shape)."""
    tg = spark.createDataFrame(
        [("de", "en", "z-n", "Zeit", "time", None, None, 50.0, 0.5)], TG_SCHEMA
    )
    entry = spark.createDataFrame([("z-n", "noun", None, None)], ENTRY_SCHEMA)
    rows = tei.tei_entry_rows(tg, entry, form=None, min_score=0.0)
    counts = tei.write_tei(
        tei.tei_entry_xml(rows), str(tmp_path), today="2026-08-16",
        language_names={"de": "German", "en": "English"},
    )
    assert counts == {"de-en": 1}
    got = (tmp_path / "small" / "deu-eng.tei").read_text()
    import pathlib

    golden = (
        pathlib.Path(__file__).parent / "data" / "tei_de_en_golden.tei"
    ).read_text()
    assert got == golden


def test_dict_status():
    assert tei.dict_status(10000) == "big enough to be useful"
    assert tei.dict_status(999) == "too small"
    assert tei.dict_status(5000) == "unknown"


def test_sitemap_xml(spark):
    st = spark.createDataFrame(
        [
            ("en", "de", f"w{i:02d}", 100.0 - i, 5.0 + (i % 3)) for i in range(120)
        ] + [
            ("en", "de", "lowimp", 1000.0, 1.0),   # below importance floor
            ("sv", "de", "hej", 10.0, 6.0),
        ],
        "from_lang string, to_lang string, written_rep string, "
        "max_score double, rel_importance double",
    )
    out = {
        (r["from_lang"], r["to_lang"]): r["sitemap_xml"]
        for r in tei.sitemap_xml(st, k=100).collect()
    }
    en_de = out[("en", "de")]
    root = ET.fromstring(en_de)
    locs = [
        u.find("{http://www.sitemaps.org/schemas/sitemap/0.9}loc").text
        for u in root
    ]
    assert len(locs) == 100          # top-k enforced
    assert all("/de-en/" in l for l in locs)  # sorted pair in URL
    assert not any(l.endswith("/lowimp") for l in locs)
    # ordered by importance*score desc: w02 has 7.0 * 98.0 = 686, the max
    assert locs[0] == "https://www.wikdict.com/de-en/w02"
    sv = out[("sv", "de")]
    assert "https://www.wikdict.com/de-sv/hej" in sv


def test_sitemap_index():
    idx = tei.sitemap_index_xml(["de-en", "de-sv"], today="2026-08-16")
    root = ET.fromstring(idx)
    assert len(root) == 2
    assert "sitemap/de-en.xml" in idx and "<lastmod>2026-08-16</lastmod>" in idx
