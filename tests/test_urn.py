"""urn DSL tests.

The examples in the reference's docs/lang.md:97-176 are used as the language
spec; the eight reference scene files are the parser integration corpus.
"""

import pathlib

import pytest

from plutracer_tpu.urn import EvalContext, Kind, TokenStream, Value, parse
from plutracer_tpu.urn.tokenizer import TokenType, tokenize


def ev(src: str) -> Value:
    # wrap in a block so multi-value sources evaluate as an expression
    # sequence (do-semantics), like the body of a scene's objects: block
    cx = EvalContext().create_std_funcs()
    return cx.eval(parse(f"[ {src} ]"))


# ---------- tokenizer ----------

def test_tokenize_basic():
    toks = tokenize('foo 123 1.5 "hi there" [a] (b)')
    assert [t.type for t in toks] == [
        TokenType.ID, TokenType.NUM, TokenType.NUM, TokenType.STR,
        TokenType.CTRL, TokenType.ID, TokenType.CTRL,
        TokenType.CTRL, TokenType.ID, TokenType.CTRL,
    ]
    assert toks[3].value == "hi there"


def test_tokenize_negative_and_modifiers():
    toks = tokenize("-3 -1.5 'id :val def: x")
    assert toks[0].value == "-3" and toks[0].type is TokenType.NUM
    assert toks[1].value == "-1.5"
    assert toks[2].value == "'id" and toks[2].type is TokenType.ID
    assert toks[3].value == ":val"
    assert toks[4].value == "def:"


def test_tokenize_brackets_terminate_ids():
    toks = tokenize("foo[bar]")
    assert [t.value for t in toks] == ["foo", "[", "bar", "]"]


# ---------- parser ----------

def test_parse_literals():
    assert parse("123").kind is Kind.INT
    assert parse("123").payload == 123
    assert parse("1.25").payload == 1.25
    assert parse('"hi"').payload == "hi"
    assert parse("-7").payload == -7


def test_parse_identifier_styles():
    assert parse("thing").kind is Kind.VAR
    assert parse("'thing").kind is Kind.ID
    assert parse(":thing").kind is Kind.VAL
    d = parse("thing: 3")
    assert d.kind is Kind.DEF
    assert d.payload[0] == "thing"
    assert d.payload[1].payload == 3


def test_parse_block_group_nesting():
    v = parse("[ 1 (2 3) [4] ]")
    assert v.kind is Kind.BLOCK
    assert len(v) == 3
    assert v[1].kind is Kind.GROUP
    assert v[2].kind is Kind.BLOCK


def test_parse_def_takes_next_value_only():
    v = parse("[ stuff: [ 3 4 6 ] more 7 ]")
    assert v.named_block_val("stuff").kind is Kind.BLOCK
    assert len(v) == 3


def test_named_block_val():
    v = parse("[ a: 3 b: 7 ]")
    assert v.named_block_val("a").payload == 3
    assert v.named_block_val("b").payload == 7
    assert v.named_block_val("missing").is_null
    assert v.has_block_val_named("a")
    assert not v.has_block_val_named("zz")


def test_roundtrip_str():
    assert str(parse("[ a: 3 'x :y ]")) == "[ a:3 'x :y ]"


# ---------- evaluator: docs/lang.md examples ----------

def test_plus_ints():
    assert ev("(1 + 2)").payload == 3


def test_plus_block_concat():
    v = ev('(["hi"] + ["hello" "world"])')
    assert [x.payload for x in v.items] == ["hi", "hello", "world"]


def test_do_examples():
    assert ev("do [ 1 + 2 ]").payload == 3
    assert ev("do [ 10 + 7 7 + 3]").payload == 10
    assert ev("do [ x: 8 x + 2]").payload == 10


def test_reduce_examples():
    v = ev("reduce [ 10 + 7 7 + 3 ]")
    assert [x.payload for x in v.items] == [17, 10]
    v = ev("reduce [ x: 8 x + 2]")
    assert [x.payload for x in v.items] == [8, 10]


def test_func_examples():
    assert ev("do [inc: (func [a] [a + 1]) inc 3]").payload == 4
    assert ev("do [sum3: (func [a b c] [a + b + c]) sum3 1 2 3]").payload == 6


def test_concat_all_examples():
    v = ev("concat-all [ [1] [2] [3] ]")
    assert [x.payload for x in v.items] == [1, 2, 3]
    v = ev("concat-all [ [1] [x y] [2] ]")
    assert len(v) == 4
    assert v[1].kind is Kind.VAR  # unevaluated: blocks are inert data


def test_append_examples():
    v = ev("append [1 2] (1 + 2)")
    assert [x.payload for x in v.items] == [1, 2, 3]
    v = ev('do (append [append [10 11]] "hi")')
    assert [x.payload for x in v.items] == [10, 11, "hi"]


def test_collect_range_example():
    v = ev("collect-range 'x [0 3] [x]")
    assert [x.payload for x in v.items] == [0, 1, 2]


def test_block_format_examples():
    v = ev('block-format [stuff :0 [other stuff] :1] ["hi" 7]')
    assert str(v) == '[ stuff "hi" [ other stuff ] 7 ]'
    v = ev('block-format [junk [:0 :1] "hi" :2] ["a" "b" 9]')
    assert str(v) == '[ junk [ "a" "b" ] "hi" 9 ]'


def test_block_format_evaluates_values_block():
    # values block goes through reduce: expressions inside evaluate
    v = ev("block-format [sphere :0 0.5 :1] [ reduce [3 1.2 4] 'red ]")
    assert str(v[1]) == "[ 3 1.2 4 ]"
    assert v[3].kind is Kind.ID


def test_float_int_promotion():
    assert ev("(1 + 2.5)").kind is Kind.FLOAT
    assert ev("(1 + 2.5)").payload == 3.5
    assert ev("(2.5 + 1)").payload == 3.5
    assert ev("(1 + 2)").kind is Kind.INT


def test_block_scope_is_local():
    # defs inside a do-block don't leak into the outer scope
    cx = EvalContext().create_std_funcs()
    cx.eval(parse("[ do [ q: 5 q ] ]"))
    assert cx.named_value("q").is_null


def test_group_no_new_scope():
    # groups do NOT create a new scope: a def inside a group leaks out
    assert ev("do [ (y: 2) y + 1 ]").payload == 3


def test_val_prevents_application():
    # :name yields the function value without calling it
    cx = EvalContext().create_std_funcs()
    v = cx.eval(parse("do [ inc: (func [a] [a + 1]) :inc ]"))
    assert v.kind is Kind.FUNC


def test_id_evaluates_to_itself():
    v = ev("'some-name")
    assert v.kind is Kind.ID
    assert v.payload == "some-name"


def test_missing_var_is_null():
    assert ev("nonexistent-thing").is_null


def test_nested_collect_range_grid():
    # the scenes/test1.urn acid pattern
    src = """
    (concat-all (collect-range 'x [0 2] [
        concat-all (collect-range 'y [0 2] [
            block-format [sphere :0 0.5] [ reduce [x 1.2 y] ]
        ])
    ]))
    """
    v = ev(src)
    assert len(v) == 12  # 4 cells x 3 values each
    assert str(v[1]) == "[ 0 1.2 0 ]"
    assert str(v[10]) == "[ 1 1.2 1 ]"


# ---------- scene corpus parses ----------

SCENES = sorted(pathlib.Path("/root/reference/scenes").glob("*.urn"))


@pytest.mark.parametrize("path", SCENES, ids=lambda p: p.stem)
def test_reference_scene_parses(path):
    v = parse(path.read_text())
    assert v.kind is Kind.BLOCK
    assert v.has_block_val_named("resolution")
    assert v.has_block_val_named("objects")


def test_test1_objects_evaluate():
    # test1.urn stresses the evaluator: 16x16 programmatic sphere grid
    tlv = parse(pathlib.Path("/root/reference/scenes/test1.urn").read_text())
    cx = EvalContext().create_std_funcs()
    objs = cx.eval1(tlv.named_block_val("objects"))
    assert objs.kind is Kind.BLOCK
    # header: box <c> <e> 'checkerboard point-light <p> <i> = 7 values,
    # then 256 spheres x (sphere <pos> 0.5 'red) = 4 values each
    assert len(objs) == 7 + 256 * 4
    vals = list(objs.items)
    assert vals[7].get_var() == "sphere"
    assert str(vals[8]) == "[ -8 1.2 -8 ]"
