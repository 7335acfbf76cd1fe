"""GQA question simplification vs the reference's own rule parser
(functions exec'd from myparse.py — the trailing script part is cut)."""
import numpy as np
import pytest

from cpt_tpu.data.gqa_parse import build_to_mark, gt_parse, simple_parse

REF = "/root/reference/prompt_feat/other/parse_gqa/myparse.py"


def _reference_funcs():
    src = open(REF).read()
    # the module ends with a data-loading script; keep only the functions
    cut = src.index("values = []")
    ns = {}
    exec(compile(src[:cut], REF, "exec"), ns)  # noqa: S102 — test-only
    return ns


ENTRIES = {
    "q1": {
        "question": "Is the man that is wearing a black shirt tall?",
        "annotations": {"question": {"2": "1", "7:9": "2"}},
        "semantic": [
            {"operation": "select", "argument": "shirt (2)",
             "dependencies": []},
            {"operation": "relate", "argument": "man,wearing,(0)",
             "dependencies": [0]},
        ],
    },
    "q2": {
        "question": "Are there men to the right of the backpack?",
        "annotations": {"question": {"2": "1", "8": "2"}},
        "semantic": [
            {"operation": "select", "argument": "backpack (2)",
             "dependencies": []},
            {"operation": "relate", "argument": "men,to the right of,(0)",
             "dependencies": [0]},
        ],
    },
    "q3": {
        "question": "What color is the cat?",
        "annotations": {"question": {"4": "1"}},
        "semantic": [{"operation": "select", "argument": "cat (1)",
                      "dependencies": []}],
    },
}


def test_matches_reference_parser():
    ref = _reference_funcs()
    for qid, entry in ENTRIES.items():
        assert gt_parse(entry) == ref["gt_parse"](entry), qid
        assert simple_parse(entry) == ref["simple_parse"](entry), qid


def test_simplification_behavior():
    # relational clause removed, head entity kept
    out = gt_parse(ENTRIES["q1"])
    assert out.startswith("Is the man") and "shirt" not in out
    assert out.endswith("?")
    # single entity: unchanged
    assert gt_parse(ENTRIES["q3"]) == "What color is the cat?"
    marks = build_to_mark(ENTRIES)
    assert set(marks) == {"q1", "q2", "q3"}
    marks2 = build_to_mark(ENTRIES, use_semantic=False)
    assert marks2["q3"] == "What color is the cat?"
