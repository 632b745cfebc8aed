"""Tokenizer + Porter stemmer golden cases (SURVEY.md §5.2 item 1)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from informationretrieval_en_people_cn_ray.text import (
    Analyzer,
    MAX_STEM_LEN,
    TOKEN_SQL,
    porter_stem,
    tokenize,
)

# Classic examples from M.F. Porter's published 1980 paper.
PORTER_GOLDENS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # the reference's own golden fixture shows characters→charact
    # (/root/reference/searchengine/data/test/expected_index.csv)
    ("characters", "charact"), ("running", "run"), ("trump", "trump"),
]


@pytest.mark.parametrize("word,expected", PORTER_GOLDENS)
def test_porter_goldens(word, expected):
    assert porter_stem(word) == expected


def test_short_words_untouched():
    assert porter_stem("a") == "a"
    assert porter_stem("is") == "is"


def test_tokenize_basic():
    assert tokenize("Hello, World! x_1 Foo-bar") == ["hello", "world", "x", "1", "foo", "bar"]
    assert tokenize("") == []
    assert tokenize("§¸…· space") == ["space"]  # unicode punctuation dropped


def test_tokenize_matches_duckdb_sql():
    """TOKEN_SQL must produce the identical token stream for any text —
    this is the contract oracle_sql() stands on."""
    samples = [
        "Hello, World! x_1 Foo-bar",
        "the QUICK brown_fox 123abc  ",
        "tabs\tand\nnewlines §¸…· mixed CASE",
        "",
        "trailing punctuation!!!",
        "§¸…· Héllo WORLD Straße İstanbul",  # U+0130 multi-char lower() regression
        "İİ Iı fiLE ﬁle",
    ]
    con = duckdb.connect()
    for s in samples:
        sql = "select " + TOKEN_SQL.format(col="?") + " as toks"
        got = con.execute(sql, [s]).fetchone()[0]
        assert got == tokenize(s), s


def test_doc_terms_positions_count_all_tokens():
    """Positions + doc length index ALL tokens; the term dict drops stems
    with len <= 1 (reference IndexCreator.py:92-99,112; SURVEY §7.4 R6)."""
    az = Analyzer(stem=True)
    terms, n = az.doc_terms("A Tragic x events y characters")
    # token stream: a(0) tragic(1) x(2) events(3) y(4) characters(5)
    assert n == 6
    assert "a" not in terms and "x" not in terms and "y" not in terms
    assert terms["tragic"] == [1]
    assert terms["event"] == [3]
    assert terms["charact"] == [5]


def test_doc_terms_repeated_term_positions():
    az = Analyzer(stem=False)
    terms, n = az.doc_terms("dog cat dog dog")
    assert n == 4
    assert terms["dog"] == [0, 2, 3]
    assert terms["cat"] == [1]


def test_long_token_filtered():
    az = Analyzer(stem=False)
    long_tok = "z" * (MAX_STEM_LEN + 1)
    terms, n = az.doc_terms(f"ok {long_tok} fine")
    assert n == 3
    assert long_tok not in terms
    assert terms["ok"] == [0] and terms["fine"] == [2]


def test_query_terms_match_index_terms():
    az = Analyzer(stem=True)
    assert az.query_terms("Running CHARACTERS a") == ["run", "charact"]


def test_tokenize_batch_matches_python_edge_cases():
    """Arrow batch tokenizer must be byte-identical to tokenize() —
    unicode specials, ligatures, empties, long runs."""
    from informationretrieval_en_people_cn_ray.text import (
        tokenize,
        tokenize_batch,
    )

    cases = [
        "Hello, World! x9", "İstanbul İİ xİy", "aİb", "İ",
        "ﬁle ﬂow ﬀ ﬃ", "Straße xßy abẞcd", "KELVIN K sign",
        "ΣΙΣΥΦΟΣ σ ς", "ǅungla ǄǄ ǆ", "ｆｕｌｌｗｉｄｔｈ",
        "", "   ", "\n\t", "a", "9", "§¸…· x = \"quoted, string!\"",
        "q" * 300, "a b" * 1000, "ÅngströM 123abc45",
    ]
    lens, flat = tokenize_batch(cases)
    toks = flat.to_pylist()
    pos = 0
    for c, n in zip(cases, lens.tolist()):
        expect = tokenize(c)
        assert toks[pos : pos + n] == expect, repr(c)
        assert n == len(expect), repr(c)
        pos += n
    assert pos == len(toks)


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_tokenize_batch_matches_python_fuzz(texts):
    from informationretrieval_en_people_cn_ray.text import (
        tokenize,
        tokenize_batch,
    )

    lens, flat = tokenize_batch(texts)
    toks = flat.to_pylist()
    pos = 0
    for c, n in zip(texts, lens.tolist()):
        expect = tokenize(c)
        assert toks[pos : pos + n] == expect, repr(c)
        pos += n
    assert pos == len(toks)
