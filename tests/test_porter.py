"""Porter stemmer golden tests — full-algorithm outputs from the canonical
demo vocabulary (voc.txt -> output.txt pairs of the 1980 paper's reference
implementation, which SQLite FTS4's `porter` tokenizer implements)."""

import pandas as pd
import pytest

from wikdict_gen_spark.functions.porter import stem, stem_series

GOLDEN = {
    # step 1
    "caresses": "caress", "flies": "fli", "dies": "di", "mules": "mule",
    "denied": "deni", "died": "di", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meeting": "meet", "stating": "state",
    "siezing": "siez", "plotted": "plot", "running": "run", "hopping": "hop",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "cats": "cat", "ties": "ti", "ponies": "poni",
    "happy": "happi", "sky": "sky",
    # steps 2-4 compounds (full pipeline, not per-step)
    "itemization": "item", "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "generalizations": "gener",
    "oscillators": "oscil", "relational": "relat", "conditional": "condit",
    "rational": "ration", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "adoption": "adopt", "adjustment": "adjust",
    "communism": "commun", "effective": "effect",
    # step 5
    "probate": "probat", "rate": "rate", "controlling": "control",
    "rolling": "roll", "cease": "ceas",
    # short words pass through
    "a": "a", "is": "is", "be": "be",
}


def test_golden_pairs():
    bad = {w: (stem(w), e) for w, e in GOLDEN.items() if stem(w) != e}
    assert not bad, bad


def test_idempotent_on_stems():
    # stemming a stem must be stable for the common cases users re-query
    for s in ("run", "hous", "tradit", "refer"):
        assert stem(stem(s)) == stem(s)


def test_series_null_preserving():
    out = stem_series(pd.Series(["running", None, "shoes"]))
    assert out.tolist() == ["run", None, "shoe"]


@pytest.mark.parametrize("w", ["", "a", "by"])
def test_short_passthrough(w):
    assert stem(w) == w
