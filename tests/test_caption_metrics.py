"""Caption metric suite: Porter stemmer, multi-stage METEOR, corpus BLEU,
ROUGE-L, and the evaluate_on_coco_caption protocol (reference
``Oscar/oscar/utils/caption_evaluate.py:59-90``)."""
import json

import numpy as np
import pytest

from cpt_tpu.engine.caption_eval import (corpus_bleu, evaluate_on_coco_caption,
                                         rouge_l, tokenize)
from cpt_tpu.utils.meteor import FUNCTION_WORDS, PorterStemmer, meteor


def test_porter_stemmer_canonical():
    st = PorterStemmer()
    # canonical examples from Porter (1980)
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    bad = {w: (st.stem(w), want) for w, want in cases.items()
           if st.stem(w) != want}
    assert not bad, bad


def test_meteor_stem_stage_catches_inflection():
    refs = [["a", "dog", "runs", "quickly"]]
    exact = meteor(["a", "dog", "runs", "quickly"], refs)
    stemmed = meteor(["a", "dogs", "running", "quickly"], refs)
    none = meteor(["zebra", "stripes"], refs)
    assert exact > stemmed > none == 0.0


def test_meteor_synonym_stage_table_gated():
    refs = [["a", "large", "cat"]]
    without = meteor(["a", "big", "cat"], refs)
    with_syn = meteor(["a", "big", "cat"], refs,
                      synonyms={"big": {"large"}})
    assert with_syn > without


def test_meteor_function_word_weighting():
    # matching only function words is worth much less than content words
    refs = [["the", "of", "dog"]]
    func_only = meteor(["the", "of", "cat"], refs)
    content_only = meteor(["a", "an", "dog"], refs)
    assert content_only > func_only
    assert "the" in FUNCTION_WORDS and "dog" not in FUNCTION_WORDS


def test_meteor_fragmentation_penalty():
    refs = [["a", "b", "c", "d", "e", "f"]]
    contiguous = meteor(["a", "b", "c", "d", "e", "f"], refs)
    scrambled = meteor(["f", "e", "d", "c", "b", "a"], refs)
    assert contiguous > scrambled > 0


def test_meteor_empty():
    assert meteor([], [["a"]]) == 0.0
    assert meteor(["a"], []) == 0.0


def test_corpus_bleu_perfect_and_partial():
    refs = {"i1": [["the", "cat", "sat", "on", "the", "mat"]]}
    perfect = corpus_bleu({"i1": ["the", "cat", "sat", "on", "the", "mat"]},
                          refs)
    assert all(abs(b - 1.0) < 1e-9 for b in perfect)
    partial = corpus_bleu({"i1": ["the", "cat", "sat"]}, refs)
    # bleu1 precision 1.0 with brevity penalty exp(1-6/3)
    assert partial[0] == pytest.approx(np.exp(1 - 6 / 3), rel=1e-6)
    assert partial[3] < partial[0]


def test_rouge_l_values():
    refs = [["the", "cat", "sat", "on", "the", "mat"]]
    assert rouge_l(["the", "cat", "sat", "on", "the", "mat"], refs) == (
        pytest.approx(1.0))
    # lcs("the cat mat", ref) = 3; P=1, R=0.5, beta=1.2
    p, r, b = 1.0, 0.5, 1.2
    want = (1 + b * b) * p * r / (r + b * b * p)
    assert rouge_l(["the", "cat", "mat"], refs) == pytest.approx(want)
    assert rouge_l(["zebra"], refs) == 0.0


def test_evaluate_on_coco_caption_protocol(tmp_path):
    """End-to-end: predictions TSV + COCO-format gt json → metric dict in
    the reference's key set (minus SPICE, documented descope)."""
    gt = {"images": [{"id": "k1"}, {"id": "k2"}],
          "annotations": [
              {"image_id": "k1", "caption": "a dog runs in the park."},
              {"image_id": "k1", "caption": "the dog is running"},
              {"image_id": "k2", "caption": "a red car on the road"}]}
    json.dump(gt, open(tmp_path / "gt.json", "w"))
    rows = [("k1", json.dumps([{"caption": "a dog runs in the park",
                                "conf": 0.9}])),
            ("k2", json.dumps([{"caption": "a blue car on the road",
                                "conf": 0.8}]))]
    with open(tmp_path / "res.tsv", "w") as f:
        for k, p in rows:
            f.write(f"{k}\t{p}\n")
    out = evaluate_on_coco_caption(str(tmp_path / "res.tsv"),
                                   str(tmp_path / "gt.json"),
                                   str(tmp_path / "metrics.json"))
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                        "METEOR", "ROUGE_L", "CIDEr"}
    assert 0 < out["Bleu_1"] <= 1.0
    assert out["METEOR"] > 0 and out["ROUGE_L"] > 0
    assert json.load(open(tmp_path / "metrics.json"))["Bleu_1"] == (
        out["Bleu_1"])


def test_tokenize_strips_punctuation():
    assert tokenize("A dog, runs; quickly!") == ["a", "dog", "runs",
                                                 "quickly"]


def test_ptb_tokenizer_jar_parity_goldens():
    """ptb_tokenize matches the Stanford-jar+pycocoevalcap pipeline on
    hand-derived goldens: contraction splits ('s / n't / 'll), quote and
    punctuation token removal (the exact PUNCTUATIONS list), and the
    lowercased -lrb-/-rrb- tokens that the reference filter keeps."""
    from cpt_tpu.utils.ptb_tokenizer import ptb_tokenize

    assert ptb_tokenize("A man's hat, isn't it?") == [
        "a", "man", "'s", "hat", "is", "n't", "it"]
    assert ptb_tokenize("Two dogs -- big ones -- run.") == [
        "two", "dogs", "big", "ones", "run"]
    assert ptb_tokenize('He said "hello world."') == [
        "he", "said", "hello", "world"]
    assert ptb_tokenize("Cats (two of them) sleep...") == [
        "cats", "-lrb-", "two", "of", "them", "-rrb-", "sleep"]
    assert ptb_tokenize("don't stop; we'll go!") == [
        "do", "n't", "stop", "we", "'ll", "go"]
    # hyphenated words stay joined (PTB keeps intra-word hyphens); the
    # bare "-" token is removed
    assert ptb_tokenize("a black-and-white photo - old") == [
        "a", "black-and-white", "photo", "old"]


def test_ptb_tokenizer_numbers_and_idempotence():
    from cpt_tpu.utils.ptb_tokenizer import ptb_tokenize

    # decimals and times stay joined (PTB number handling)
    assert ptb_tokenize("a 1.5 meter wall at 3:30pm") == [
        "a", "1.5", "meter", "wall", "at", "3:30pm"]
    # idempotence: re-tokenizing the joined output is stable
    toks = ptb_tokenize("Two dogs, running fast!")
    assert ptb_tokenize(" ".join(toks)) == toks


class TestSpiceLite:
    """utils/spice_lite.py — the approximate SPICE stand-in (the exact
    metric is Java/Stanford-parser-bound; see module docstring)."""

    def test_parse_objects_attributes_relations(self):
        from cpt_tpu.utils.spice_lite import parse_tuples

        t = parse_tuples("a young girl is sitting on a wooden bench")
        assert ("girl",) in t and ("bench",) in t
        assert ("girl", "young") in t and ("bench", "wooden") in t
        assert ("girl", "sit_on", "bench") in t

    def test_cross_form_normalization(self):
        from cpt_tpu.utils.spice_lite import parse_tuples

        a = parse_tuples("two girls sit on a bench")
        b = parse_tuples("a girl sitting on the bench")
        assert ("girl", "sit_on", "bench") in a
        assert ("girl", "sit_on", "bench") in b
        assert ("girl",) in a  # plural lemmatized

    def test_scores(self):
        from cpt_tpu.utils.spice_lite import (spice_lite_corpus,
                                              spice_lite_score)

        assert spice_lite_score("a blue car", ["a blue car"])["f"] == 1.0
        assert spice_lite_score("qqq", ["a blue car"])["f"] == 0.0
        mid = spice_lite_score("a red car", ["a blue car parked here"])
        assert 0.0 < mid["f"] < 1.0
        corpus = spice_lite_corpus(
            {"im0": "a blue car", "im1": "a dog"},
            {"im0": ["a blue car"], "im1": ["a red cat"]})
        assert corpus == 0.5  # (1.0 + 0.0) / 2

    def test_eval_surface_opt_in(self, tmp_path):
        import json

        from cpt_tpu.engine.caption_eval import evaluate_on_coco_caption

        rows = [["1", json.dumps([{"caption": "a blue car",
                                   "conf": 1.0}])]]
        with open(tmp_path / "res.tsv", "w") as f:
            for r in rows:
                f.write("\t".join(r) + "\n")
        gt = {"images": [{"id": 1}],
              "annotations": [{"image_id": 1, "id": 10,
                               "caption": "a blue car"}]}
        json.dump(gt, open(tmp_path / "gt.json", "w"))
        out = evaluate_on_coco_caption(str(tmp_path / "res.tsv"),
                                       str(tmp_path / "gt.json"),
                                       spice_lite=True)
        assert out["SPICE_lite"] == 1.0
        base = evaluate_on_coco_caption(str(tmp_path / "res.tsv"),
                                        str(tmp_path / "gt.json"))
        assert "SPICE_lite" not in base and "SPICE" not in base


def test_convert_tsv_to_coco_format_matches_reference(tmp_path):
    """Submission-file writer vs the reference's own
    convert_tsv_to_coco_format executed directly (byte-identical json)."""
    import json
    import sys
    import types
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    import pytorch_transformers_shim as shim

    shim.install()
    for name, attrs in (
            ("coco_caption", {}),
            ("coco_caption.pycocotools", {}),
            ("coco_caption.pycocotools.coco", {"COCO": object}),
            ("coco_caption.pycocoevalcap", {}),
            ("coco_caption.pycocoevalcap.eval", {"COCOEvalCap": object})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if "/root/reference/Oscar" not in sys.path:
        sys.path.insert(0, "/root/reference/Oscar")
    from oscar.utils import caption_evaluate as ref_ce

    from cpt_tpu.engine.caption_eval import convert_tsv_to_coco_format

    rows = ["im0\t" + json.dumps([{"caption": "a blue car", "conf": 0.9}]),
            "im1\t" + json.dumps([{"caption": "", "conf": 0.1}]),
            "im2"]
    tsv = tmp_path / "res.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    ref_ce.convert_tsv_to_coco_format(str(tsv), str(tmp_path / "ref.json"))
    convert_tsv_to_coco_format(str(tsv), str(tmp_path / "ours.json"))
    assert (tmp_path / "ref.json").read_text() == (
        tmp_path / "ours.json").read_text()
