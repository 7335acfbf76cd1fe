"""Stage-1 task builders → extractor → stage-2 datasets: full-loop tests for
GQA, VCR, VG (+ plain extraction and the GQA question parser)."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpt_tpu.data.gqa import GQACPTData, GQAExample
from cpt_tpu.data.stage1_tasks import (gqa_mark_task, parse_gqa_marks,
                                       plain_task, rasterize_polygon,
                                       vcr_color_task, vg_pair_task)
from cpt_tpu.data.vcr import VCRCPTData, VCRExample
from cpt_tpu.data.vg import VGCPTData
from cpt_tpu.engine.extract import (Extractor, gqa_payload, plain_payload,
                                    vcr_payload, vg_payload)
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import tiny_detector_config
from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

CFG = tiny_detector_config()
FEAT_DIM = CFG.backbone.out_channels * 2 + 6


@pytest.fixture(scope="module")
def extractor():
    model = AttrRCNN(CFG)
    rng = np.random.RandomState(0)
    image = jnp.zeros((CFG.input.pad_h, CFG.input.pad_w, 3), jnp.uint8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), image.astype(jnp.float32),
        jnp.asarray([60, 60]), jnp.zeros((CFG.max_force_boxes, 4)),
        jnp.ones((CFG.max_force_boxes,), bool))
    labelmap = {i: n for i, n in enumerate(
        ["bg", "dog", "cat", "person", "car", "tree", "sky"])}
    return Extractor(model, params, CFG, labelmap=labelmap,
                     copies_per_chunk=2, inclusive_paint=True)


def _image(rng):
    return rng.randint(0, 256, (CFG.input.pad_h, CFG.input.pad_w, 3)
                       ).astype(np.uint8)


DETS = np.array([[4, 4, 24, 24], [30, 8, 50, 30], [10, 34, 40, 58]],
                np.float32)


def test_parse_gqa_marks():
    marks = parse_gqa_marks("what color is the dog near the car",
                            DETS.tolist(), ["dog", "car", "tree"])
    assert len(marks) == 1
    box, char_pos = marks[0]
    assert box == DETS[0].tolist()
    # "dog" ends at char 21 in the question
    assert char_pos == ["what color is the dog".index("dog") + 3]


def test_gqa_stage1_to_stage2(extractor, tmp_path, rng):
    img = _image(rng)
    marks = parse_gqa_marks("what color is the dog", DETS.tolist(),
                            ["dog", "cat", "tree"])
    tasks = [gqa_mark_task(f"q{i}", img, (60, 60), DETS, marks)
             for i in range(2)]
    color_tsv = str(tmp_path / "color_predictions.tsv")
    extractor.run(iter(tasks), color_tsv, payload_fn=gqa_payload)

    plain_tasks = [plain_task(f"im{i}", img, (60, 60), DETS)
                   for i in range(2)]
    plain_tsv = str(tmp_path / "predictions.tsv")
    extractor.run(iter(plain_tasks), plain_tsv, payload_fn=plain_payload)

    tok = BertTokenizer(toy_vocab())
    examples = [GQAExample(f"q{i}", f"im{i}", "what color is the dog", 0)
                for i in range(2)]
    data = GQACPTData(plain_tsv, color_tsv, examples, {"red": 0, "blue": 1},
                      tok, max_seq_len=16, img_seq_len=4,
                      img_feat_dim=FEAT_DIM)
    q, feats = data.features_for(examples[0])
    assert "blue" in q  # first palette color inserted at the parsed position
    assert feats.shape[1] == FEAT_DIM


def test_vcr_stage1_to_stage2(extractor, tmp_path, rng):
    img = _image(rng)
    polys = {0: [(5, 5), (20, 5), (20, 20), (5, 20)],
             1: [(30, 10), (48, 10), (48, 28), (30, 28)]}
    names = {0: "person", 1: "person"}
    task = vcr_color_task("vcr0", img, (60, 60), DETS,
                          entity_ids=[[0], [1]], entity_polygons=polys,
                          entity_names=names)
    # both entities colored with the first two palette colors
    assert task.meta["obj_colors"] == {"0": "blue", "1": "red"}
    feat_tsv = str(tmp_path / "predictions.tsv")
    extractor.run(iter([task]), feat_tsv, payload_fn=vcr_payload)

    tok = BertTokenizer(toy_vocab())
    ex = VCRExample("q0", "vcr0", ["what", "is", [0], "doing"],
                    [[[0], "is", "red"], [[1], "is", "blue"]], label=0)
    data = VCRCPTData(feat_tsv, [ex], tok, max_seq_len=24, img_seq_len=4,
                      img_feat_dim=FEAT_DIM)
    cands = data.tensorize_example(data.examples[0])
    assert len(cands) == 2
    # textization picked up the stage-1 colors ("person in blue ...")
    ids = cands[0][0].input_ids.tolist()
    assert tok.convert_tokens_to_ids("person") in ids
    assert tok.convert_tokens_to_ids("blue") in ids


def test_vcr_dedup_is_by_box_value(rng):
    """The reference dedups painted members by det BOX value
    (``d not in ret_to_mark_dets``, vcrdataset.py:226-231): a member whose
    box equals an already-painted member's box is skipped entirely — not
    painted, no color word — even though the member ids differ."""
    img = _image(rng)
    dets = np.array([[4, 4, 24, 24], [4, 4, 24, 24], [30, 8, 50, 30]],
                    np.float32)  # members 0 and 1 share one box
    polys = {0: [(5, 5), (20, 5), (20, 20), (5, 20)],
             1: [(30, 10), (48, 10), (48, 28), (30, 28)]}
    names = {0: "person", 1: "person"}
    task = vcr_color_task("vdup", img, (60, 60), dets,
                          entity_ids=[[0], [1]], entity_polygons=polys,
                          entity_names=names)
    # member 1 skipped: its polygon pixels untouched, no color word
    np.testing.assert_array_equal(task.image_rgb[10:28, 30:48],
                                  img[10:28, 30:48])
    assert "1" not in task.meta["obj_colors"]
    assert task.meta["obj_names"]["1"] == "person"
    # same-group case: the group paints member 0 only, so its members'
    # colors disagree ({color, none}) -> no group color word either
    task2 = vcr_color_task("vdup2", img, (60, 60), dets,
                           entity_ids=[[0, 1]], entity_polygons=polys,
                           entity_names=names)
    assert "0_1" not in task2.meta["obj_colors"]


def test_vcr_color_d_zero_paints_nothing(rng):
    """COLOR_D=0 (the reference's uncolored 'pt' extraction,
    cmds/vcr/pt_vcr_val_seg.sh + vcrdataset.py:127): no entity is
    painted and no group carries a color word; names still emit."""
    img = _image(rng)
    polys = {0: [(5, 5), (20, 5), (20, 20), (5, 20)]}
    task = vcr_color_task("v0", img, (60, 60), DETS,
                          entity_ids=[[0]], entity_polygons=polys,
                          entity_names={0: "person"}, color_d=0)
    np.testing.assert_array_equal(task.image_rgb, img)
    assert task.meta["obj_colors"] == {}
    assert task.meta["obj_names"] == {"0": "person"}


def test_extract_cli_refcoco_color_override(tmp_path, rng):
    """--color_name/--color_rgb/--color_d on extract_features reproduce
    the reference ValDataset's COLOR_NAME/COLOR_RGB/COLOR_D extraction
    knob (refcocodataset.py:356-360, the color-exploration pipeline):
    the TSV payload carries the custom color word and the paint uses the
    custom RGBA."""
    from PIL import Image

    from cpt_tpu.tools.extract_features import main as extract_main
    from cpt_tpu.utils.tsv import TSVFile

    root = tmp_path
    (root / "images").mkdir()
    img = _image(rng)
    Image.fromarray(img).save(root / "images" / "COCO_val2014_000000000007.jpg")
    json.dump([{"id": "q0", "caption": "the green thing",
                "file_name": "COCO_val2014_000000000007.jpg",
                "width": CFG.input.pad_w, "height": CFG.input.pad_h}],
              open(root / "ann.json", "w"))
    json.dump({"7": [{"box": [4, 4, 21, 21]}, {"box": [30, 8, 21, 23]}]},
              open(root / "det.json", "w"))
    base = ["--task", "refcoco", "--ann_file", str(root / "ann.json"),
            "--det_file", str(root / "det.json"),
            "--image_root", str(root / "images"),
            "--tiny", "--copies_per_chunk", "2"]
    extract_main(base + ["--output", str(root / "red.tsv")])
    extract_main(base + ["--output", str(root / "green.tsv"),
                         "--color_name", "green",
                         "--color_rgb", "0-255-0", "--color_d", "100"])

    def row(path):
        key, payload = TSVFile(str(root / path))[0]
        assert key == "q0"
        return json.loads(payload)["objects"]

    red_objs, _, red_colors, _ = row("red.tsv")
    grn_objs, _, grn_colors, _ = row("green.tsv")
    assert red_colors == [["red"], ["red"]]
    assert grn_colors == [["green"], ["green"]]
    # same (seed-0 random) weights both runs: the only difference is the
    # paint — features of the painted copies must move
    from cpt_tpu.utils.tsv import decode_feature

    rf = decode_feature(red_objs[0][0]["feature"])
    gf = decode_feature(grn_objs[0][0]["feature"])
    assert rf.shape == gf.shape
    assert not np.allclose(rf, gf)


def test_refcoco_mask_task_paints_mask_not_rect(rng):
    """RefCOCO SEG variant (refcocodataset.py:241-247 'rle' dets): each
    copy paints its segmentation mask; the alpha-0 rect slots are an
    exact render no-op (they exist for the payload/window routing)."""
    from cpt_tpu.engine.extract import refcoco_mask_task
    from cpt_tpu.ops.render import paste_mask, paste_rects

    img = _image(rng)
    masks = np.zeros((3,) + img.shape[:2], np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(DETS.astype(int)):
        masks[i, y1:y2, x1:x2] = 1     # block masks stand in for RLE
    task = refcoco_mask_task("q0", img, (60, 60), DETS, masks,
                             "the red thing")
    assert task.n_copies == 3
    # device-render one copy the way make_extract_fn(with_masks=True)
    # does: rect paint (alpha 0) then mask paint
    import jax.numpy as jnp
    rect_painted = np.asarray(paste_rects(
        jnp.asarray(img), jnp.asarray(task.copy_rects[1]),
        jnp.asarray(task.copy_colors_rgba[1]),
        jnp.asarray(task.copy_rect_valid[1])))
    np.testing.assert_array_equal(rect_painted, img)  # alpha-0 no-op
    painted = np.asarray(paste_mask(
        jnp.asarray(img), jnp.asarray(task.copy_masks[1]),
        jnp.asarray(task.copy_mask_colors[1])))
    x1, y1, x2, y2 = DETS[1].astype(int)
    assert not np.array_equal(painted[y1:y2, x1:x2], img[y1:y2, x1:x2])
    outside = np.ones(img.shape[:2], bool)
    outside[y1:y2, x1:x2] = False
    np.testing.assert_array_equal(painted[outside], img[outside])


def test_extract_cli_mixed_rect_and_rle_dets(tmp_path, rng):
    """The SEG decision is PER IMAGE (the reference's
    `"rle" in rawdets[0]` runs per __getitem__): a det file where only
    SOME images carry masks must mask-paint those and rect-paint the
    rest — regression for the round-5 global-first-entry detection."""
    from PIL import Image

    from cpt_tpu.tools.extract_features import main as extract_main
    from cpt_tpu.utils.rle import encode as rle_encode
    from cpt_tpu.utils.tsv import TSVFile, decode_feature

    root = tmp_path
    (root / "images").mkdir()
    anns = []
    for q in (7, 8):
        Image.fromarray(_image(rng)).save(
            root / "images" / f"COCO_val2014_{q:012d}.jpg")
        anns.append({"id": f"q{q}", "caption": "the red thing",
                     "file_name": f"COCO_val2014_{q:012d}.jpg",
                     "width": CFG.input.pad_w, "height": CFG.input.pad_h})
    json.dump(anns, open(root / "ann.json", "w"))
    m = np.zeros((CFG.input.pad_h, CFG.input.pad_w), np.uint8)
    m[6:22, 8:24] = 1
    # image 7: rect-only dets (order puts the rect image FIRST so the
    # old global detection would have chosen rect mode for both)
    json.dump({"7": [{"box": [4, 4, 21, 21]}],
               "8": [{"box": [4, 4, 21, 21],
                      "rle": dict(rle_encode(m))}]},
              open(root / "det.json", "w"))
    # rect-only control: same dets with the masks stripped
    json.dump({"7": [{"box": [4, 4, 21, 21]}],
               "8": [{"box": [4, 4, 21, 21]}]},
              open(root / "det_rect.json", "w"))

    def run(det_json, out_name):
        out = root / out_name
        extract_main(["--task", "refcoco",
                      "--ann_file", str(root / "ann.json"),
                      "--det_file", str(root / det_json),
                      "--image_root", str(root / "images"),
                      "--tiny", "--copies_per_chunk", "2",
                      "--output", str(out)])
        return {k: json.loads(v)["objects"] for k, v in
                (TSVFile(str(out))[i] for i in range(2))}

    mixed = run("det.json", "mixed.tsv")
    rect = run("det_rect.json", "rect.tsv")
    assert set(mixed) == set(rect) == {"q7", "q8"}
    for rows in (mixed, rect):
        assert rows["q7"][2] == rows["q8"][2] == [["red"]]
    f = {(mode, q): decode_feature(rows[q][0][0][0]["feature"])
         for mode, rows in (("mixed", mixed), ("rect", rect))
         for q in ("q7", "q8")}
    # the rect-only image is identical in both runs (the mixed-mode
    # compile must not change its paint) ...
    np.testing.assert_allclose(f[("mixed", "q7")], f[("rect", "q7")],
                               rtol=1e-4, atol=1e-5)
    # ... while the rle image's paint actually switched to the mask
    assert not np.allclose(f[("mixed", "q8")], f[("rect", "q8")])


def test_scale_poly_empty_first_part():
    """--resize segm scaling must use rasterize_polygon's multi-part
    detection: an empty FIRST part still marks a list-of-parts."""
    from cpt_tpu.tools.extract_features import scale_polys

    polys = {0: [[], [[2.0, 4.0], [6.0, 4.0], [6.0, 8.0]]]}
    out = scale_polys(polys, 0.5)
    assert out[0] == [[], [[1.0, 2.0], [3.0, 2.0], [3.0, 4.0]]]
    # point-list input (single part) still scales as points
    assert scale_polys({1: [[2.0, 4.0], [6.0, 8.0]]}, 0.5)[1] == \
        [[1.0, 2.0], [3.0, 4.0]]


def test_vcr_mask_painting_changes_pixels(rng):
    img = _image(rng)
    polys = {0: [(5, 5), (20, 5), (20, 20), (5, 20)]}
    task = vcr_color_task("v", img, (60, 60), DETS, [[0]], polys,
                          {0: "person"})
    assert not np.array_equal(task.image_rgb[5:20, 5:20], img[5:20, 5:20])
    # pixels outside every polygon untouched
    np.testing.assert_array_equal(task.image_rgb[40:, 40:], img[40:, 40:])


def test_vg_stage1_to_stage2(extractor, tmp_path, rng):
    img = _image(rng)
    task = vg_pair_task("im7.jpg", img, (60, 60), DETS, 0, 1, "dog", "cat",
                        "on")
    assert task.key == "im7.jpg_0_1"
    feat_tsv = str(tmp_path / "predictions.tsv")
    extractor.run(iter([task]), feat_tsv, payload_fn=vg_payload)

    tok = BertTokenizer(toy_vocab())
    data = VGCPTData(feat_tsv, tok, max_seq_len=32, img_seq_len=4,
                     img_feat_dim=FEAT_DIM)
    key, seqs, feats, labels = data.sequences(0, both_directions=True)
    assert key == "im7.jpg_0_1" and len(seqs) == 6
    assert feats.shape[1] == FEAT_DIM


def test_rasterize_polygon():
    m = rasterize_polygon([(2, 2), (8, 2), (8, 8), (2, 8)], 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0 and m[10, 10] == 0
