"""Porter (1980) stemmer golden table (M26 rebuild; the reference binds
snowball 'english' via libstemmer — doc/sphinx/source/stemmer.rst:1-14 —
absent from this container, so the contract here is the published Porter
rules, pinned below with examples from the original paper)."""
from mycelium_ray.functions.stemmer import porter_stem, porter_stem_many

# (word, porter_stem) — examples from Porter (1980) and the canonical
# voc.txt/output.txt sample distributed with the paper
GOLDEN = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # general words
    ("connection", "connect"), ("connections", "connect"),
    ("connected", "connect"), ("connecting", "connect"),
    ("argument", "argument"), ("arguments", "argument"),
]


def test_porter_golden():
    bad = [(w, porter_stem(w), want) for w, want in GOLDEN
           if porter_stem(w) != want]
    assert not bad, bad


def test_porter_many_memo():
    words = ["running", "runs", "running", "easily", "running"]
    assert porter_stem_many(words) == [porter_stem(w) for w in words]


def test_porter_idempotent_on_short():
    for w in ["a", "is", "be", ""]:
        assert porter_stem(w) == w
