"""Porter2 (Snowball English) stemmer, pure Python.

Implements the published Snowball "English" algorithm
(https://snowballstem.org/algorithms/english/stemmer.html), the same
algorithm the reference uses via ``rust-stemmers``
(``Stemmer::create(Algorithm::English)``, reference ``src/utils.rs:17``).

Written from the public spec — validated against the reference's golden
outputs (FIXTURES.md §2/§3/§6). Pure function, no Spark dependency, so it
can run inside Arrow-batched pandas UDFs on executors.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # marked consonant-y is uppercase 'Y'
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms applied before the algorithm proper.
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariants
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Words left invariant after step 1a.
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)

# Step 2 suffix map, longest-first.  Value: (replacement, condition)
# condition: None, or "l" (preceded by l), or "li" (valid li-ending).
_STEP2 = (
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", "l"),
    ("li", "", "li"),
)

_STEP3 = (
    ("ational", "ate", False),
    ("tional", "tion", False),
    ("alize", "al", False),
    ("icate", "ic", False),
    ("iciti", "ic", False),
    ("ative", "", True),  # True => additionally requires R2
    ("ical", "ic", False),
    ("ness", "", False),
    ("ful", "", False),
)

_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",  # special: requires preceding s or t
    "al",
    "er",
    "ic",
)


def _is_vowel(ch: str) -> bool:
    return ch in _VOWELS


def _compute_r1_r2(word: str) -> tuple[int, int]:
    """R1/R2 region start offsets per the spec, with the gener/commun/arsen
    prefix special case for R1."""
    n = len(word)
    r1 = n
    if word.startswith("gener") or word.startswith("arsen"):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
        for i in range(1, n):
            if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word[i]) and _is_vowel(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """word ends in a short syllable: (vowel, non-vowel≠wxY) preceded by a
    non-vowel; or (vowel, non-vowel) at the very beginning."""
    n = len(word)
    if n == 2:
        return _is_vowel(word[0]) and not _is_vowel(word[1])
    if n >= 3:
        return (
            _is_vowel(word[-2])
            and not _is_vowel(word[-1])
            and word[-1] not in "wxY"
            and not _is_vowel(word[-3])
        )
    return False


def _contains_vowel(s: str) -> bool:
    return any(_is_vowel(c) for c in s)


def stem(word: str) -> str:
    """Stem one already-lowercased token (the tokenizer lowercases first,
    mirroring reference ``utils.rs:43-50``)."""
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y as 'Y' (at start, or after a vowel).
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i - 1] != "Y":
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _compute_r1_r2(word)

    # Step 0: strip apostrophe suffixes.
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # Step 1c: y/Y -> i when preceded by a non-vowel that isn't the first letter.
    if (
        len(word) > 2
        and word[-1] in "yY"
        and not _is_vowel(word[-2])
    ):
        word = word[:-1] + "i"

    # Step 2 (longest matching suffix; act only if it lies in R1).
    for suf, repl, cond in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "l":
                    if len(word) > len(suf) and word[-len(suf) - 1] == "l":
                        word = word[: -len(suf)] + repl
                elif cond == "li":
                    if len(word) > len(suf) and word[-len(suf) - 1] in _LI_ENDING:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3
    for suf, repl, needs_r2 in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if needs_r2:
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)] + repl
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
