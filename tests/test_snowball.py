"""Golden tables for the Spanish / French / German Snowball stemmers
(M26 multi-language surface; functions/snowball.py implements the
published algorithm descriptions — these tables pin that contract)."""

import pytest

from mycelium_ray.functions.snowball import (french_stem, german_stem,
                                             spanish_stem, stem, stem_many)

ES_GOLDEN = {
    "niñas": "niñ",
    "corriendo": "corr",
    "caminando": "camin",
    "rápidamente": "rapid",
    "generosidad": "gener",
    "nacionales": "nacional",
    "comieron": "com",
    "cantaba": "cant",
    "libros": "libr",
    "trabajador": "trabaj",
    "lógica": "logic",
    "grandes": "grand",
    "organización": "organiz",
    "felicidad": "felic",
    "diciéndoselo": "dic",        # step 0 pronoun + accent repair + 2b
    "importante": "import",
    "relativamente": "relat",     # amente → iv → at chain
    "jugando": "jug",
    "comunicaciones": "comun",
    "universidades": "univers",
    "tecnología": "tecnolog",
    "el": "el",                   # too short to touch
}

FR_GOLDEN = {
    "continuation": "continu",
    "majestueux": "majestu",
    "nationalité": "national",
    "heureusement": "heureux",    # ement → eus → eux (R1)
    "rapidement": "rapid",
    "mangeaient": "mang",
    "finissant": "fin",
    "chanteraient": "chant",
    "animaux": "animal",          # aux → al
    "chevaux": "cheval",
    "importante": "import",
    "conditionnel": "conditionnel",
    "relativement": "relat",
    "communication": "commun",
    "volontairement": "volontair",
    "possibilité": "possibil",
    "arrivée": "arriv",
    "parlons": "parlon",
    "jouir": "jou",               # marked U is a non-vowel: step 2a fires
    "jouissant": "jou",
    "continuité": "continu",
    "le": "le",
}

DE_GOLDEN = {
    "kinder": "kind",
    "gelaufen": "gelauf",
    "schönheit": "schonheit",     # heit not in R2 here; umlaut folded
    "freundlichkeit": "freundlich",
    "möglichkeiten": "moglich",
    "arbeitenden": "arbeit",
    "häuser": "haus",
    "universität": "universitat",
    "entwicklung": "entwickl",
    "wissenschaftliche": "wissenschaft",
    "schneller": "schnell",
    "gemeinsam": "gemeinsam",
    "bücher": "buch",
    "gründlichkeit": "grundlich",
    "tätig": "tatig",
    "großes": "gross",            # ß → ss, then es removal
    "zu": "zu",
}


@pytest.mark.parametrize("word,want", sorted(ES_GOLDEN.items()))
def test_spanish_golden(word, want):
    assert spanish_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(FR_GOLDEN.items()))
def test_french_golden(word, want):
    assert french_stem(word) == want


@pytest.mark.parametrize("word,want", sorted(DE_GOLDEN.items()))
def test_german_golden(word, want):
    assert german_stem(word) == want


def test_dispatch_and_fallback():
    assert stem("corriendo", "es") == "corr"
    assert stem("rapidement", "fr") == "rapid"
    assert stem("kinder", "de") == "kind"
    # en and unknown languages dispatch to Porter (libstemmer fallback
    # convention)
    assert stem("running", "en") == "run"
    assert stem("running", "und") == "run"


def test_stem_many_memoized_matches_scalar():
    words = list(ES_GOLDEN) * 3
    assert stem_many(words, "es") == [ES_GOLDEN[w] for w in words]
    assert stem_many(["kinder", "häuser", "kinder"], "de") == \
        ["kind", "haus", "kind"]


def test_stem_stats_stems_per_detected_language():
    """stem_stats wires lang_id → language-specific stemmer: the same
    batch mixes en/es/de/fr docs and each gets ITS language's stems."""
    import pyarrow as pa

    from mycelium_ray.pipelines.textops import stem_stats_batch
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "the cats in the house and the running dogs",
            "el niñas la corriendo de la casa y un libros",
            "der kinder und die häuser nicht ein schneller",
            "le chevaux et les animaux est une dans que",
            "zzz qqq",   # no stopword hits → und → Porter fallback
        ], pa.string()),
    })
    out = stem_stats_batch(t)
    langs = out["lang"].to_pylist()
    assert langs == ["en", "es", "de", "fr", "und"]
    # a stem only the right language's rules produce proves dispatch:
    # es: corriendo→corr; de: häuser→haus; fr: chevaux→cheval
    import pyarrow.compute as pc  # noqa: F401  (schema sanity below)
    assert out.column_names == ["doc_id", "lang", "n_tokens",
                                "n_distinct_stems", "top_stem"]
    from mycelium_ray.functions.snowball import stem_many
    for i, lang in enumerate(langs):
        ws = t["text"][i].as_py().split()
        stems = set(stem_many([w.lower() for w in ws], lang))
        assert out["n_distinct_stems"][i].as_py() == len(stems)
    # the Spanish row really used Spanish rules (Porter would keep
    # "corriendo" intact)
    es_ws = t["text"][1].as_py().split()
    assert "corr" in set(stem_many(es_ws, "es"))


def test_stemmers_total_on_junk():
    """Stemmers must be total functions over arbitrary lowercase-ish
    strings (they run inside map tasks on crawled text)."""
    junk = ["", "a", "ab", "äü", "ß", "x" * 40, "123", "ñ", "qu",
            "éèêë", "y", "uuu", "mente", "ment", "heit", "ación"]
    for w in junk:
        for fn in (spanish_stem, french_stem, german_stem):
            out = fn(w)
            assert isinstance(out, str)


@pytest.mark.parametrize("fn,words", [
    (spanish_stem, ["canto", "cantas", "canta", "cantamos", "cantan",
                    "cantaba", "cantaron", "cantado", "cantando"]),
    (spanish_stem, ["libro", "libros"]),
    (spanish_stem, ["nación", "naciones"]),
    (spanish_stem, ["rápido", "rápida", "rápidos", "rápidas"]),
    # note: French -ons forms do NOT merge with the rest of the verb
    # paradigm (no bare "ons" suffix in step 2b; step 4 only strips the
    # s) — that is genuine Snowball behavior, so "chantons" is excluded
    (french_stem, ["chante", "chantes", "chanter", "chantez",
                   "chantaient", "chanté", "chantée"]),
    (french_stem, ["national", "nationale", "nationaux", "nationales"]),
    (french_stem, ["finir", "finis", "finit", "finissons", "finissez",
                   "finissent"]),
    (german_stem, ["kind", "kinder", "kindern", "kindes"]),
    (german_stem, ["schnell", "schnelle", "schneller", "schnelles",
                   "schnellen"]),
    (german_stem, ["haus", "häuser", "häusern"]),
])
def test_inflection_families_merge(fn, words):
    """Conflation invariant: a whole inflection family maps to ONE stem
    — implementation-independent evidence the rules do their job."""
    assert len({fn(w) for w in words}) == 1, {w: fn(w) for w in words}
