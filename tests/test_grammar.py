"""GBNF grammar engine + JSON-schema converter tests (models:
reference tests/test-grammar-*.cpp and test-json-schema-to-grammar.cpp)."""

import json
import os

import numpy as np
import pytest

from llm_tpu.grammar.gbnf import Grammar, GrammarError, parse_gbnf
from llm_tpu.grammar.json_schema import json_schema_to_gbnf

from conftest import REFERENCE_DIR, reference_available


def accepts(g_text: str, s: str, complete: bool = True) -> bool:
    g = Grammar.from_string(g_text)
    if not g.accept_string(s):
        return False
    return g.can_end if complete else True


def test_literal_and_alt():
    g = 'root ::= "yes" | "no"'
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")  # incomplete


def test_char_class_and_ranges():
    g = "root ::= [a-z0-9]+"
    assert accepts(g, "abc123")
    assert not accepts(g, "ABC")
    g2 = 'root ::= [^"]* "\\""'
    assert accepts(g2, 'hello"')


def test_repetition_operators():
    assert accepts('root ::= "a"? "b"', "b")
    assert accepts('root ::= "a"? "b"', "ab")
    assert accepts('root ::= "a"* "b"', "aaab")
    assert accepts('root ::= "a"+ "b"', "ab")
    assert not accepts('root ::= "a"+ "b"', "b")
    assert accepts('root ::= "a"{2,3}', "aa")
    assert accepts('root ::= "a"{2,3}', "aaa")
    assert not accepts('root ::= "a"{2,3}', "a")
    assert not accepts('root ::= "a"{2,3}', "aaaa")


def test_nested_rules_and_groups():
    g = """
    root ::= item ("," item)*
    item ::= [a-z]+
    """
    assert accepts(g, "a,bc,def")
    assert not accepts(g, "a,,b")


def test_partial_match_api():
    g = Grammar.from_string('root ::= "hello world"')
    assert g.can_accept("hello")
    assert not g.can_accept("help")
    assert g.accept_string("hello ")
    assert g.can_accept("world")
    assert not g.can_end
    assert g.accept_string("world")
    assert g.can_end


def test_undefined_rule_rejected():
    with pytest.raises(GrammarError):
        parse_gbnf("root ::= foo")
    with pytest.raises(GrammarError):
        parse_gbnf('notroot ::= "x"')


JSON_GBNF = """
root ::= value
value ::= object | array | string | number | boolean | null
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
array ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\\"" ([^"\\\\] | "\\\\" .)* "\\"" ws
number ::= "-"? [0-9]+ ("." [0-9]+)? ws
boolean ::= ("true" | "false") ws
null ::= "null" ws
ws ::= [ \\t\\n]*
"""


@pytest.mark.parametrize(
    "doc,ok",
    [
        ('{"a": 1, "b": [true, null]}', True),
        ('[1, 2, {"x": "y"}]', True),
        ('{"a": }', False),
        ("{", False),
        ('"unclosed', False),
    ],
)
def test_json_grammar(doc, ok):
    g = Grammar.from_string(JSON_GBNF)
    result = g.accept_string(doc) and g.can_end
    assert result == ok


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_parse_reference_grammar_files():
    """The reference's shipped .gbnf files must parse and accept samples."""
    gdir = os.path.join(REFERENCE_DIR, "grammars")
    parsed = 0
    for fn in sorted(os.listdir(gdir)):
        if not fn.endswith(".gbnf"):
            continue
        text = open(os.path.join(gdir, fn), encoding="utf-8").read()
        try:
            parse_gbnf(text)
            parsed += 1
        except GrammarError as e:
            pytest.fail(f"{fn}: {e}")
    assert parsed >= 5

    g = Grammar.from_string(
        open(os.path.join(gdir, "json.gbnf"), encoding="utf-8").read()
    )
    assert g.accept_string('{"name": "test", "n": [1, 2.5, -3]}')
    assert g.can_end


def test_json_schema_to_gbnf_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["name", "age"],
    }
    gbnf = json_schema_to_gbnf(schema)
    g = Grammar.from_string(gbnf)
    ok = '{"name": "bob", "age": 42, "tags": ["x", "y"]}'
    assert g.accept_string(ok) and g.can_end

    g2 = Grammar.from_string(gbnf)
    assert not (g2.accept_string('{"age": 42}') and g2.can_end)

    g3 = Grammar.from_string(gbnf)
    assert not g3.can_accept('{"name": 42')


def test_json_schema_enum_const_anyof():
    gbnf = json_schema_to_gbnf({"enum": ["red", "green", 3]})
    g = Grammar.from_string(gbnf)
    assert g.accept_string('"red"') and g.can_end
    g = Grammar.from_string(gbnf)
    assert g.accept_string("3") and g.can_end
    g = Grammar.from_string(gbnf)
    assert not g.can_accept('"blue"')

    gbnf2 = json_schema_to_gbnf(
        {"anyOf": [{"type": "integer"}, {"type": "boolean"}]}
    )
    for doc in ("42", "true"):
        g = Grammar.from_string(gbnf2)
        assert g.accept_string(doc) and g.can_end


def test_json_schema_array_bounds():
    gbnf = json_schema_to_gbnf(
        {"type": "array", "items": {"type": "integer"}, "minItems": 2, "maxItems": 3}
    )
    for doc, ok in [("[1, 2]", True), ("[1, 2, 3]", True), ("[1]", False),
                    ("[1, 2, 3, 4]", False)]:
        g = Grammar.from_string(gbnf)
        assert (g.accept_string(doc) and g.can_end) == ok, doc


def test_grammar_sampler_masks_and_resamples():
    """GrammarChain: free sample -> reject -> constrained resample."""
    from llm_tpu.grammar.sampler import GrammarChain, GrammarSampler
    from llm_tpu.samplers import Chain, Greedy

    class FakeVocab:
        def is_eog(self, tid):
            return tid == 3

    class FakeTok:
        vocab = FakeVocab()

        def piece(self, tid):
            return {0: "a", 1: "b", 2: "c", 3: ""}[tid]

    g = Grammar.from_string('root ::= "a" "c"')
    gs = GrammarSampler(g, FakeTok())
    chain = GrammarChain(Chain([Greedy()]), gs)

    logits = np.array([0.0, 5.0, 1.0, -1.0], np.float32)  # argmax = b (invalid)
    t1 = chain.sample(logits)
    assert t1 == 0  # 'a' is the only valid start
    chain.accept(t1)
    logits2 = np.array([5.0, 4.0, 1.0, -1.0], np.float32)  # argmax = a (invalid now)
    t2 = chain.sample(logits2)
    assert t2 == 2  # 'c'
    chain.accept(t2)
    assert gs.grammar.can_end
    # now EOG is valid
    logits3 = np.array([5.0, 4.0, 3.0, 0.0], np.float32)
    t3 = chain.sample(logits3)
    assert t3 == 3


# ------------------------------------------------ regex constraints

def test_regex_to_gbnf_matrix():
    """Full-match semantics of the %regex translation (the llguidance-
    analogue subset, common/llguidance.cpp) through the real PDA engine."""
    from llm_tpu.grammar.gbnf import Grammar
    from llm_tpu.grammar.regex import regex_to_gbnf

    cases = {
        r"[a-z]+@[a-z]+\.(com|org)": [
            ("ab@cd.com", True), ("ab@cd.net", False), ("a@b.org", True)],
        r"\d{3}-\d{4}": [("555-1234", True), ("55-1234", False),
                         ("555-12345", False)],
        r"yes|no|maybe": [("yes", True), ("maybe", True), ("nope", False),
                          ("no", True)],
        r"(?:ab)+c?": [("ababc", True), ("abab", True), ("aab", False)],
        r"[^0-9]{2,}": [("xy", True), ("x1", False), ("xyz", True)],
        r"-?\d+(\.\d+)?": [("-3.14", True), ("42", True), ("4.", False)],
        r".*": [("anything at all", True), ("", True)],
        r"a\x41+": [("aAA", True), ("a", False)],
        r"^start$": [("start", True), ("startx", False)],
        r"\w+\s\w+": [("two words", True), ("oneword", False)],
    }
    for pat, checks in cases.items():
        g = regex_to_gbnf(pat)
        for s, want in checks:
            gr = Grammar.from_string(g)
            got = gr.accept_string(s) and gr.can_end
            assert got == want, (pat, s, got, want, g)


def test_regex_rejects_unsupported():
    from llm_tpu.grammar.regex import RegexError, regex_to_gbnf

    for pat in [r"(?=look)", r"a^b", r"*oops", r"a{", r"(unclosed",
                r"[unclosed", r"a\q"]:
        with pytest.raises(RegexError):
            regex_to_gbnf(pat)


def test_constrained_chain_wiring():
    """constrained_chain: passthrough without a spec; %regex and
    json_schema specs produce a GrammarChain that filters sampling."""
    import numpy as np

    from llm_tpu.grammar import constrained_chain
    from llm_tpu.samplers import Chain
    from llm_tpu.samplers.chain import Greedy

    class FakeVocab:
        def is_eog(self, tid):
            return tid == 0

    class FakeTok:
        vocab = FakeVocab()

        def piece(self, tid):
            return {0: "", 1: "yes", 2: "no", 3: "zz"}[tid]

    base = Chain([Greedy()])
    assert constrained_chain(base, FakeTok()) is base

    chain = constrained_chain(Chain([Greedy()]), FakeTok(),
                              grammar="%regex yes|no")
    # "zz" (id 3) has the best logit but violates the regex
    logits = np.array([0.0, 1.0, 2.0, 9.0], np.float32)
    tid = chain.sample(logits)
    assert tid == 2  # "no": best surviving candidate
    chain.accept(tid)
    # after "no" the grammar can end: EOG valid, continuation invalid
    assert chain.gs.valid(0)
    assert not chain.gs.valid(1)

    schema_chain = constrained_chain(
        Chain([Greedy()]), FakeTok(), json_schema={"type": "integer"})
    assert hasattr(schema_chain, "gs")
