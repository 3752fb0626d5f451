"""Porter stemmer: the published algorithm's worked examples, carried to
END-TO-END outputs (the paper demonstrates each step in isolation; the
algorithm then applies the remaining steps — e.g. step 2's relational ->
relate is further reduced by steps 4/5a to relat), plus invariants."""

import pytest

from clip_as_service_ray.functions.stem import porter_stem, stem_tokens

PAPER_EXAMPLES = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    # step 1b cleanup
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"),
    ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"),
    ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    # step 5a
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    # step 5b
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PAPER_EXAMPLES)
def test_paper_examples(word, expected):
    assert porter_stem(word) == expected


def test_short_words_untouched():
    for w in ("", "a", "is", "be", "by"):
        assert porter_stem(w) == w


def test_idempotent_on_paper_set():
    # stemming a stem must be stable for the worked examples
    for _, s in PAPER_EXAMPLES:
        assert porter_stem(porter_stem(s)) == porter_stem(s)


def test_stem_tokens_passthrough():
    out = stem_tokens(["running", "42", "...", "flies"])
    assert out == ["run", "42", "...", "fli"]
