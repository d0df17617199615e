"""Spanish / French / German stemmers (reference operator M26, the
multi-language half).

The reference binds Snowball libstemmer with a language parameter
(/root/reference/3rd_party/libstemmer_c, doc/sphinx/source/stemmer.rst:
1-14). No snowball library exists in this container, so these are
from-scratch implementations of the PUBLISHED Snowball algorithm
descriptions (M.F. Porter's algorithm pages at snowballstem.org for
"spanish", "french", "german" — public algorithm specifications,
reimplemented from the prose rules, not from any stemmer source).

Scope note (same contract as the English Porter module): each function
implements the published rule set; the operator contract is pinned by
the per-language golden tables in tests/test_snowball.py. Revision
nuances that cannot be validated in-sandbox (e.g. French ë/ï→He/Hi
marking, German 2015+ additions) follow the classic description and are
noted inline.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared region machinery (snowball R1/R2 definition)
# ---------------------------------------------------------------------------


def _r1_r2(word: str, vowels: str) -> tuple[int, int]:
    """R1 = region after the first non-vowel following a vowel; R2 = the
    same definition applied inside R1. Returned as start indices
    (len(word) when the region is empty)."""
    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r2 = i + 2
            break
    return r1, r2


def _in(region_start: int, word: str, suffix_len: int) -> bool:
    """A suffix 'is in' a region iff it starts at or after the region
    start."""
    return len(word) - suffix_len >= region_start


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------
_ES_VOWELS = "aeiouáéíóúü"

_ES_PRONOUNS = ["selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "me", "se", "la", "le", "lo"]
# verb endings that license pronoun removal; accented forms lose the accent
_ES_PRE_A = ["iéndo", "ándo", "ár", "ér", "ír"]
_ES_PRE_B = ["iendo", "ando", "ar", "er", "ir"]
_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")


def _rv_es(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _ES_VOWELS:
        # consonant in second position: after the next vowel
        for i in range(2, n):
            if word[i] in _ES_VOWELS:
                return i + 1
        return n
    if word[0] in _ES_VOWELS:
        # two vowels: after the next consonant
        for i in range(2, n):
            if word[i] not in _ES_VOWELS:
                return i + 1
        return n
    # consonant-vowel: after the third letter
    return 3


# step-1 actions: (suffixes, kind). kind encodes the rule applied when
# that (longest-matching) suffix is found.
_ES_STEP1 = [
    (["amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
      "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
      "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa"],
     "del_r2"),
    (["adoras", "adores", "aciones", "adora", "ación", "antes", "ancias",
      "ador", "ante", "ancia"], "del_r2_ic"),
    (["logías", "logía"], "log"),
    (["uciones", "ución"], "u"),
    (["encias", "encia"], "ente"),
    (["amente"], "amente"),
    (["mente"], "mente"),
    (["idades", "idad"], "idad"),
    (["ivas", "ivos", "iva", "ivo"], "iva"),
]

_ES_STEP2A = ["yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
              "yes", "ya", "ye", "yo", "yó"]

_ES_STEP2B_GU = ["emos", "éis", "en", "es"]
_ES_STEP2B = [
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
    "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
    "aríais", "aréis", "erían", "erías", "eréis", "irían", "irías",
    "iréis", "ieran", "iesen", "ieron", "iendo", "ieras", "ieses",
    "abais", "arais", "aseis", "íamos", "arán", "arás", "aría", "erán",
    "erás", "ería", "irán", "irás", "iría", "iera", "iese", "aste",
    "iste", "aban", "aran", "asen", "aron", "ando", "abas", "adas",
    "idas", "aras", "ases", "íais", "ados", "idos", "amos", "imos",
    "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
    "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís",
]


def spanish_stem(word: str) -> str:
    """Stem one lowercase Spanish word by the published Snowball rules."""
    w = word
    if len(w) <= 2:
        return w.translate(_ES_DEACCENT)
    rv = _rv_es(w)
    r1, r2 = _r1_r2(w, _ES_VOWELS)

    # ---- step 0: attached pronoun ----
    for pron in _ES_PRONOUNS:
        if not w.endswith(pron):
            continue
        base = w[: len(w) - len(pron)]
        hit = None
        for pre in _ES_PRE_A:
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                hit = base[: len(base) - len(pre)] + \
                    pre.translate(_ES_DEACCENT)
                break
        if hit is None:
            for pre in _ES_PRE_B:
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    hit = base
                    break
        if hit is None and base.endswith("yendo") \
                and base[-6:-5] == "u" and len(base) - 5 >= rv:
            hit = base
        if hit is not None:
            w = hit
            r1, r2 = _r1_r2(w, _ES_VOWELS)
        break  # longest matching pronoun only (snowball 'among')

    # ---- step 1: standard suffixes ----
    changed1 = False
    matched1 = False
    best = ("", None)
    for sufs, kind in _ES_STEP1:
        for s in sufs:
            if w.endswith(s) and len(s) > len(best[0]):
                best = (s, kind)
    if best[1] is not None:
        s, kind = best
        matched1 = True
        stem = w[: len(w) - len(s)]
        if kind == "del_r2" and _in(r2, w, len(s)):
            w = stem
            changed1 = True
        elif kind == "del_r2_ic" and _in(r2, w, len(s)):
            w = stem
            changed1 = True
            if w.endswith("ic") and _in(r2, w, 2):
                w = w[:-2]
        elif kind == "log" and _in(r2, w, len(s)):
            w = stem + "log"
            changed1 = True
        elif kind == "u" and _in(r2, w, len(s)):
            w = stem + "u"
            changed1 = True
        elif kind == "ente" and _in(r2, w, len(s)):
            w = stem + "ente"
            changed1 = True
        elif kind == "amente" and _in(r1, w, len(s)):
            w = stem
            changed1 = True
            if w.endswith("iv") and _in(r2, w, 2):
                w = w[:-2]
                if w.endswith("at") and _in(r2, w, 2):
                    w = w[:-2]
            elif (w.endswith("os") or w.endswith("ic")
                    or w.endswith("ad")) and _in(r2, w, 2):
                w = w[:-2]
        elif kind == "mente" and _in(r2, w, len(s)):
            w = stem
            changed1 = True
            for pre in ("ante", "able", "ible"):
                if w.endswith(pre) and _in(r2, w, len(pre)):
                    w = w[: len(w) - len(pre)]
                    break
        elif kind == "idad" and _in(r2, w, len(s)):
            w = stem
            changed1 = True
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and _in(r2, w, len(pre)):
                    w = w[: len(w) - len(pre)]
                    break
        elif kind == "iva" and _in(r2, w, len(s)):
            w = stem
            changed1 = True
            if w.endswith("at") and _in(r2, w, 2):
                w = w[:-2]

    # ---- step 2a: verb suffixes beginning y (only if step 1 removed
    # nothing) ----
    changed2a = False
    if not changed1:
        best_y = ""
        for s in _ES_STEP2A:
            if w.endswith(s) and len(s) > len(best_y):
                best_y = s
        if best_y and _in(rv, w, len(best_y)) \
                and w[len(w) - len(best_y) - 1: len(w) - len(best_y)] == "u":
            w = w[: len(w) - len(best_y)]
            changed2a = True

    # ---- step 2b: other verb suffixes ----
    if not changed1 and not changed2a:
        best_v = ("", False)
        for s in _ES_STEP2B:
            if w.endswith(s) and len(s) > len(best_v[0]):
                best_v = (s, False)
        for s in _ES_STEP2B_GU:
            if w.endswith(s) and len(s) > len(best_v[0]):
                best_v = (s, True)
        s, gu = best_v
        if s and _in(rv, w, len(s)):
            w = w[: len(w) - len(s)]
            if gu and w.endswith("gu"):
                w = w[:-1]

    # ---- step 3: residual suffix ----
    best_r = ""
    for s in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if w.endswith(s) and len(s) > len(best_r):
            best_r = s
    if best_r and _in(rv, w, len(best_r)):
        e_like = best_r in ("e", "é")
        w = w[: len(w) - len(best_r)]
        if e_like and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_DEACCENT)


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------
_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_mark(word: str) -> str:
    """Mark non-vowel u/i/y occurrences as U/I/Y so the suffix rules can
    distinguish them (the snowball prelude): u or i between vowels, y
    next to a vowel, u after q."""
    chars = list(word)
    n = len(chars)
    for i, c in enumerate(chars):
        prev_v = i > 0 and word[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and word[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and word[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _rv_fr(word: str) -> int:
    n = len(word)
    if n >= 2 and word[0] in _FR_VOWELS and word[1] in _FR_VOWELS:
        return min(3, n)
    if word[:3] in ("par", "col", "tap"):
        return 3
    # region after the first vowel not at the beginning of the word
    for i in range(1, n):
        if word[i] in _FR_VOWELS:
            return i + 1
    return n


_FR_STEP1 = [
    (["issements", "issement"], "issement"),
    (["atrices", "atrice", "ateurs", "ations", "ateur", "ation"], "at"),
    (["logies", "logie"], "log"),
    (["usions", "utions", "usion", "ution"], "u"),
    (["ences", "ence"], "ent"),
    (["ements", "ement"], "ement"),
    (["ités", "ité"], "ite"),
    (["ives", "ifs", "ive", "if"], "if"),
    (["eaux"], "eaux"),
    (["aux"], "aux"),
    (["euses", "euse"], "euse"),
    (["amment"], "amment"),
    (["emment"], "emment"),
    (["ments", "ment"], "ment"),
    (["ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
      "isme", "able", "iste", "eux"], "del_r2"),
]

_FR_STEP2A = [
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "i",
]

_FR_STEP2B_DEL_RV = [
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
]
_FR_STEP2B_E = [
    "assions", "assiez", "assent", "antes", "aIent", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
]


def french_stem(word: str) -> str:
    """Stem one lowercase French word by the published Snowball rules.

    Classic description (without the later ë→He / ï→Hi marking; ë/ï are
    rare in suffix position and the goldens pin this behavior)."""
    w = _fr_mark(word)
    if len(w) <= 2:
        return word
    rv = _rv_fr(w)
    r1, r2 = _r1_r2(w, _FR_VOWELS)

    # ---- step 1 ----
    pre1 = w
    found_ment = False
    best = ("", None)
    for sufs, kind in _FR_STEP1:
        for s in sufs:
            if w.endswith(s) and len(s) > len(best[0]):
                best = (s, kind)
    if best[1] is not None:
        s, kind = best
        stem = w[: len(w) - len(s)]
        if kind == "del_r2":
            if _in(r2, w, len(s)):
                w = stem
        elif kind == "at":
            if _in(r2, w, len(s)):
                w = stem
                if w.endswith("ic"):
                    if _in(r2, w, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif kind == "log":
            if _in(r2, w, len(s)):
                w = stem + "log"
        elif kind == "u":
            if _in(r2, w, len(s)):
                w = stem + "u"
        elif kind == "ent":
            if _in(r2, w, len(s)):
                w = stem + "ent"
        elif kind == "ement":
            if _in(rv, w, len(s)):
                w = stem
                if w.endswith("iv") and _in(r2, w, 2):
                    w = w[:-2]
                    if w.endswith("at") and _in(r2, w, 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if _in(r2, w, 3):
                        w = w[:-3]
                    elif _in(r1, w, 3):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and _in(r2, w, 3):
                    w = w[:-3]
                elif w.endswith("iqU") and _in(r2, w, 3):
                    w = w[:-3]
                elif w.endswith("ièr") and _in(rv, w, 3):
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and _in(rv, w, 3):
                    w = w[:-3] + "i"
        elif kind == "ite":
            if _in(r2, w, len(s)):
                w = stem
                if w.endswith("abil"):
                    if _in(r2, w, 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if _in(r2, w, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and _in(r2, w, 2):
                    w = w[:-2]
        elif kind == "if":
            if _in(r2, w, len(s)):
                w = stem
                if w.endswith("at") and _in(r2, w, 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if _in(r2, w, 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif kind == "eaux":
            w = stem + "eau"
        elif kind == "aux":
            if _in(r1, w, len(s)):
                w = stem + "al"
        elif kind == "euse":
            if _in(r2, w, len(s)):
                w = stem
            elif _in(r1, w, len(s)):
                w = stem + "eux"
        elif kind == "issement":
            if _in(r1, w, len(s)) and stem \
                    and stem[-1] not in _FR_VOWELS:
                w = stem
        elif kind == "amment":
            if _in(rv, w, len(s)):
                w = stem + "ant"
                found_ment = True
        elif kind == "emment":
            if _in(rv, w, len(s)):
                w = stem + "ent"
                found_ment = True
        elif kind == "ment":
            if len(stem) >= 1 and stem[-1] in _FR_VOWELS \
                    and _in(rv, w, len(s) + 1):
                w = stem
                found_ment = True

    changed1 = (w != pre1) and not found_ment
    do_2a = (w == pre1) or found_ment

    # ---- step 2a: verb suffixes beginning i ----
    changed2a = False
    did_2a = False
    if do_2a:
        did_2a = True
        best_i = ""
        for s in _FR_STEP2A:
            if w.endswith(s) and len(s) > len(best_i):
                best_i = s
        if best_i and _in(rv, w, len(best_i)):
            prev = len(w) - len(best_i) - 1
            # "preceded by a non-vowel": the prelude's U/I/Y marks are
            # uppercase and thus non-vowels by construction (that is the
            # marks' whole purpose — "joUir" → delete "ir" → "jou")
            if prev >= rv and prev >= 0 and w[prev] not in _FR_VOWELS:
                w = w[: len(w) - len(best_i)]
                changed2a = True

    # ---- step 2b: other verb suffixes ----
    changed2b = False
    if did_2a and not changed2a:
        best_v = ("", None)
        if w.endswith("ions") and len("ions") > len(best_v[0]):
            best_v = ("ions", "r2")
        for s in _FR_STEP2B_DEL_RV:
            if w.endswith(s) and len(s) > len(best_v[0]):
                best_v = (s, "rv")
        for s in _FR_STEP2B_E:
            if w.endswith(s) and len(s) > len(best_v[0]):
                best_v = (s, "e")
        s, kind = best_v
        if kind == "r2" and _in(r2, w, len(s)):
            w = w[: len(w) - len(s)]
            changed2b = True
        elif kind == "rv" and _in(rv, w, len(s)):
            w = w[: len(w) - len(s)]
            changed2b = True
        elif kind == "e" and _in(rv, w, len(s)):
            w = w[: len(w) - len(s)]
            changed2b = True
            if w.endswith("e") and len(w) - 1 >= rv:
                w = w[:-1]

    # ---- steps 3 / 4 ----
    if changed1 or changed2a or changed2b:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: ends s not preceded by a, i, ou, è or s → delete s
        if w.endswith("s") and len(w) >= 2:
            p = w[-2]
            if p not in "aiès" and not (p == "u" and len(w) >= 3
                                        and w[-3] == "o"):
                w = w[:-1]
        best4 = ("", None)
        for s, kind in (("ière", "ier"), ("Ière", "ier"), ("ier", "ier"),
                        ("Ier", "ier"), ("ion", "ion"), ("e", "e")):
            if w.endswith(s) and len(s) > len(best4[0]):
                best4 = (s, kind)
        s, kind = best4
        if kind == "ion":
            if _in(r2, w, 3) and len(w) >= 4 and w[-4] in "st":
                w = w[:-3]
        elif kind == "ier":
            if _in(rv, w, len(s)):
                w = w[: len(w) - len(s)] + "i"
        elif kind == "e":
            if _in(rv, w, 1):
                w = w[:-1]

    # ---- step 5: undouble ----
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # ---- step 6: un-accent ----
    i = len(w) - 1
    seen_cons = 0
    while i >= 0 and w[i] not in _FR_VOWELS and w[i] not in "UIY":
        seen_cons += 1
        i -= 1
    if seen_cons >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.lower()  # U/I/Y marks back to lower case (postlude)


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------
_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"
_DE_FINAL = str.maketrans("äöü", "aou")


def _de_mark(word: str) -> str:
    chars = list(word.replace("ß", "ss"))
    n = len(chars)
    w = "".join(chars)
    for i, c in enumerate(chars):
        if c in "uy" and 0 < i < n - 1 and w[i - 1] in _DE_VOWELS \
                and w[i + 1] in _DE_VOWELS:
            chars[i] = c.upper()
    return "".join(chars)


def german_stem(word: str) -> str:
    """Stem one lowercase German word by the published Snowball rules
    (classic description)."""
    w = _de_mark(word)
    if len(w) <= 2:
        return w.translate(_DE_FINAL).lower()
    r1, r2 = _r1_r2(w, _DE_VOWELS)
    r1 = max(r1, min(3, len(w)))  # R1 begins no earlier than position 3

    # ---- step 1 ----
    best = ("", None)
    for s in ("ern", "em", "er"):
        if w.endswith(s) and len(s) > len(best[0]):
            best = (s, "a")
    for s in ("en", "es", "e"):
        if w.endswith(s) and len(s) > len(best[0]):
            best = (s, "b")
    if not best[0] and w.endswith("s") and len(w) >= 2 \
            and w[-2] in _DE_S_END:
        best = ("s", "c")
    s, kind = best
    if kind and _in(r1, w, len(s)):
        w = w[: len(w) - len(s)]

    # ---- step 2 ----
    best = ("", None)
    for s in ("est", "en", "er"):
        if w.endswith(s) and len(s) > len(best[0]):
            best = (s, "a")
    if not best[0] and w.endswith("st") and len(w) >= 3 \
            and w[-3] in _DE_ST_END and len(w) >= 6:
        best = ("st", "b")
    s, kind = best
    if kind and _in(r1, w, len(s)):
        w = w[: len(w) - len(s)]

    # ---- step 3: d-suffixes ----
    best = ("", None)
    for s, kind in (("end", "endung"), ("ung", "endung"),
                    ("isch", "ig"), ("ik", "ig"), ("ig", "ig"),
                    ("lich", "lichheit"), ("heit", "lichheit"),
                    ("keit", "keit")):
        if w.endswith(s) and len(s) > len(best[0]):
            best = (s, kind)
    s, kind = best
    if kind == "endung" and _in(r2, w, len(s)):
        w = w[: len(w) - len(s)]
        if w.endswith("ig") and _in(r2, w, 2) and \
                not (len(w) >= 3 and w[-3] == "e"):
            w = w[:-2]
    elif kind == "ig" and _in(r2, w, len(s)) and \
            not (len(w) > len(s) and w[-len(s) - 1] == "e"):
        w = w[: len(w) - len(s)]
    elif kind == "lichheit" and _in(r2, w, len(s)):
        w = w[: len(w) - len(s)]
        for pre in ("er", "en"):
            if w.endswith(pre) and _in(r1, w, 2):
                w = w[:-2]
                break
    elif kind == "keit" and _in(r2, w, len(s)):
        w = w[: len(w) - len(s)]
        for pre in ("lich", "ig"):
            if w.endswith(pre) and _in(r2, w, len(pre)):
                w = w[: len(w) - len(pre)]
                break

    return w.translate(_DE_FINAL).lower()


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------
def stem(word: str, lang: str = "en") -> str:
    """Stem one lowercase word in the given language ('en' dispatches to
    the Porter module; unknown languages pass through to 'en', the
    libstemmer fallback convention)."""
    if lang == "es":
        return spanish_stem(word)
    if lang == "fr":
        return french_stem(word)
    if lang == "de":
        return german_stem(word)
    from .stemmer import porter_stem
    return porter_stem(word)


def stem_many(words, lang: str = "en") -> list[str]:
    """Vector form with a distinct-value memo (Zipfian token streams:
    each distinct word stems once)."""
    if lang == "es":
        fn = spanish_stem
    elif lang == "fr":
        fn = french_stem
    elif lang == "de":
        fn = german_stem
    else:
        from .stemmer import porter_stem
        fn = porter_stem
    memo: dict[str, str] = {}
    out = []
    for w in words:
        s = memo.get(w)
        if s is None:
            s = memo[w] = fn(w)
        out.append(s)
    return out
