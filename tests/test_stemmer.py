"""Unit tests: Porter2 stemmer + tokenizer parity (SURVEY.md §5.4.1)."""

from duckdb_title_mapper_spark.functions.stemmer import stem
from duckdb_title_mapper_spark.functions.text import ascii_lower, tokenize, tokenize_and_stem

from goldens import STEM_VECTORS


def test_stem_vectors():
    for word, expected in STEM_VECTORS.items():
        assert stem(word) == expected, f"{word}: {stem(word)} != {expected}"


def test_short_words_invariant():
    for w in ("a", "as", "is", "by", ""):
        assert stem(w) == w


def test_tokenizer_parity_cases():
    # FIXTURES.md §6 tokenizer cases (regex \w+, ASCII lowercase)
    assert tokenize("Sr. Software Eng") == ["sr", "software", "eng"]
    assert tokenize("Sales Rep (B2B)") == ["sales", "rep", "b2b"]
    assert tokenize("Marketing Coordinator/Specialist") == [
        "marketing",
        "coordinator",
        "specialist",
    ]
    assert tokenize("Registered Nurse - ICU") == ["registered", "nurse", "icu"]


def test_ascii_lower_leaves_non_ascii():
    # Rust to_ascii_lowercase only folds A-Z (utils.rs:46)
    assert ascii_lower("CAFÉ") == "cafÉ"
    assert ascii_lower("ABCdef123") == "abcdef123"


def test_tokenize_and_stem():
    assert tokenize_and_stem("Robotics Engineers") == ["robot", "engin"]
    assert tokenize_and_stem("") == []
