"""Cross-framework STAGE-1 PIPELINE parity: the reference's entire
extraction engine executed directly vs our `extract_features` CLI.

The reference side runs its OWN code end to end on a synthetic RefCOCO
fixture: `RefCoCoDataset` (per-candidate image copies with the RGBA
color paste, `refcocodataset.py:230-302`) → `RefCOCOCollator` →
`engine/inference_ref.py::inference` (64-sub-image chunked forward,
color-set re-bagging `:57-67`, the 2054-d geometry concat `:263-274`,
gather, `convert_predictions_to_tsv` with b64 features `:95-192`) →
`predictions.tsv`.

Our side runs `tools/extract_features.py --task refcoco` on the SAME
yaml/ann/det/image fixture with the SAME weights imported through the
production converter (`load_vinvl_checkpoint` on a torch.save of the
reference model).

The TSVs must agree: same keys, payload structure, captions, colors,
candidate rects; per-object identical classes and near-identical
conf/features (CPU f32; tolerances as in test_reference_parity). This
composes every individually-proven piece — painting, forward,
post-processing, geometry, serialization — into the actual production
artifact both frameworks exchange.
"""
import json
import os.path as op
import sys

import numpy as np
import pytest
import torch

import jax

import reference_stubs

reference_stubs.install()

from maskrcnn_benchmark.data.collate_batch import RefCOCOCollator  # noqa: E402
from maskrcnn_benchmark.data.datasets.refcocodataset import (  # noqa: E402
    RefCoCoDataset)
from maskrcnn_benchmark.data.transforms.build import build_transforms  # noqa: E402
from maskrcnn_benchmark.engine.inference_ref import inference  # noqa: E402

from cpt_tpu.utils.tsv import TSVFile, decode_feature  # noqa: E402

CLASSES = ["thing1", "thing2", "thing3", "thing4", "thing5", "thing6"]
H = W = 64


def _write_fixture(root, with_rle=False):
    """2 images, 3 queries, 3 candidate dets per image. The per-query
    "bbox" ground truth (xywh) sits on a distinct candidate so the
    stage-2 gt-color construction and mIoU are meaningful.
    ``with_rle``: dets additionally carry RLE segmentation masks (the
    reference's SEG painting variant, refcocodataset.py:241-247)."""
    from PIL import Image

    rng = np.random.RandomState(5)
    (root / "images").mkdir()
    for i in (1, 2):
        arr = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" /
                                  f"COCO_val2014_{i:012d}.jpg")
    anns = [
        {"id": "q0", "caption": "the left thing",
         "file_name": "COCO_val2014_000000000001.jpg",
         "width": W, "height": H, "bbox": [4, 4, 27, 25]},
        {"id": "q1", "caption": "the right thing",
         "file_name": "COCO_val2014_000000000001.jpg",
         "width": W, "height": H, "bbox": [20, 16, 39, 37]},
        {"id": "q2", "caption": "the only thing",
         "file_name": "COCO_val2014_000000000002.jpg",
         "width": W, "height": H, "bbox": [25, 20, 35, 40]},
    ]
    dets = {  # xywh, per image id
        "1": [{"box": [4, 4, 27, 25]}, {"box": [20, 16, 39, 37]},
              {"box": [8, 36, 33, 25]}],
        "2": [{"box": [10, 10, 30, 30]}, {"box": [25, 20, 35, 40]},
              {"box": [2, 40, 20, 20]}],
    }
    if with_rle:
        # irregular (non-rectangular) mask inside each det box so the
        # seg paint differs from the rect paint
        from cpt_tpu.utils.rle import encode as rle_encode

        for key, img_dets in dets.items():
            for d in img_dets:
                x, y, bw, bh = d["box"]
                m = np.zeros((H, W), np.uint8)
                m[y: y + bh, x: x + bw] = 1
                m[y: y + bh // 2, x: x + bw // 3] = 0   # notch a corner
                d["rle"] = dict(rle_encode(m))
    json.dump(anns, open(root / "ann.json", "w"))
    json.dump(dets, open(root / "det.json", "w"))
    yaml_path = root / "refcoco_test.yaml"
    yaml_path.write_text(
        f"ann_root: {root}\nann: ann.json\ndet: det.json\n"
        f"image_root: {root / 'images'}\n")
    # labelmap in VG-SGG-dicts layout — the reference reads label_to_idx
    # (load_files.py:13-16), ours idx_to_label
    labelmap = {
        "label_to_idx": {n: i + 1 for i, n in enumerate(CLASSES)},
        "idx_to_label": {str(i + 1): n for i, n in enumerate(CLASSES)},
    }
    json.dump(labelmap, open(root / "labelmap.json", "w"))
    return yaml_path, root / "labelmap.json"


def _reference_tsv(tmp_path, yaml_path, labelmap_path, overrides=None):
    from torch.utils.data import DataLoader

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=True, overrides=overrides)
    # the cfg pieces the data/engine path needs beyond the model tree
    CN = reference_stubs.CfgNode
    ref_cfg.INPUT = CN(MIN_SIZE_TEST=0, MAX_SIZE_TEST=0, TO_BGR255=True,
                       PIXEL_MEAN=[103.530, 116.280, 123.675],
                       PIXEL_STD=[1.0, 1.0, 1.0])
    ref_cfg.TEST.SAVE_RESULTS_TO_TSV = True
    ref_cfg.TEST.TSV_SAVE_SUBSET = ["rect", "class", "conf", "feature"]
    ref_cfg.TEST.GATHER_ON_CPU = False
    ref_cfg.TEST.SKIP_PERFORMANCE_EVAL = True
    ref_cfg.TEST.EXPECTED_RESULTS = ()
    ref_cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL = 4

    args_ns = CN(TOTAL_STEP=None, CUR_STEP=None, N_SHOT=None, RAND_SEED=0)
    dataset = RefCoCoDataset(str(yaml_path),
                             transforms=build_transforms(ref_cfg,
                                                         is_train=False),
                             args=args_ns)
    loader = DataLoader(dataset, batch_size=1, shuffle=False,
                        num_workers=0,
                        collate_fn=RefCOCOCollator(size_divisible=16))
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    inference(ref_model, ref_cfg, loader, "refcoco_test",
              device="cpu", output_folder=str(out_dir),
              skip_performance_eval=True,
              labelmap_file=str(labelmap_path))
    return ref_model, out_dir / "predictions.tsv"


@pytest.mark.slow
def test_stage1_pipeline_tsv_parity(tmp_path):
    _stage1_parity(tmp_path, with_rle=False)


@pytest.mark.slow
def test_stage1_pipeline_tsv_parity_rle_masks(tmp_path):
    """The SEG painting variant: dets carry RLE masks, the reference
    paints the decoded mask instead of the rect
    (refcocodataset.py:241-247, draw_rectangles mask branch) — our
    `--task refcoco` auto-detects "rle" dets and routes to
    refcoco_mask_task + the device mask channel."""
    _stage1_parity(tmp_path, with_rle=True)


def _stage1_parity(tmp_path, with_rle):
    yaml_path, labelmap_path = _write_fixture(tmp_path, with_rle=with_rle)
    ref_model, ref_tsv = _reference_tsv(tmp_path, yaml_path, labelmap_path)
    assert ref_tsv.exists()

    # our side: production converter on the reference weights, CLI run
    ckpt = tmp_path / "ref_model.pth"
    torch.save({"model": ref_model.state_dict()}, ckpt)
    our_tsv = tmp_path / "ours.tsv"
    from cpt_tpu.tools.extract_features import main as extract_main

    extract_main(["--task", "refcoco", "--yaml", str(yaml_path),
                  "--tiny", "--dtype", "float32",
                  "--checkpoint", str(ckpt),
                  "--labelmap", str(labelmap_path),
                  "--output", str(our_tsv)])

    ref_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(ref_tsv))[i] for i in range(3))}
    our_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(our_tsv))[i] for i in range(3))}
    assert set(ref_rows) == set(our_rows) == {"q0", "q1", "q2"}

    for key in sorted(ref_rows):
        ref_objs, ref_cap, ref_colors, ref_rects = ref_rows[key]["objects"]
        our_objs, our_cap, our_colors, our_rects = our_rows[key]["objects"]
        assert our_cap == ref_cap
        assert our_colors == ref_colors
        np.testing.assert_allclose(np.asarray(our_rects, np.float64),
                                   np.asarray(ref_rects, np.float64))
        assert len(our_objs) == len(ref_objs) == 3  # one copy per det
        for copy_i, (ref_copy, our_copy) in enumerate(zip(ref_objs,
                                                          our_objs)):
            assert len(our_copy) == len(ref_copy) == 3
            for ref_o, our_o in zip(ref_copy, our_copy):
                assert our_o["class"] == ref_o["class"], (key, copy_i)
                np.testing.assert_allclose(our_o["rect"], ref_o["rect"],
                                           atol=1e-3)
                np.testing.assert_allclose(our_o["conf"], ref_o["conf"],
                                           atol=2e-3, rtol=1e-2)
                rf = decode_feature(ref_o["feature"])
                of = decode_feature(our_o["feature"])
                assert rf.shape == of.shape  # 134 = 16*8 + 6 geometry
                # geometry dims must be exact; pooled features to the
                # module-parity tolerance
                np.testing.assert_allclose(of[-6:], rf[-6:], atol=1e-5)
                np.testing.assert_allclose(of, rf, atol=4e-3, rtol=2e-2)


@pytest.mark.slow
def test_two_stage_cross_framework_predictions(tmp_path, monkeypatch):
    """FULL two-stage composition across frameworks, real feature width:
    reference stage-1 (RES2_OUT=256 → true 2054-d features) → the
    reference's OWN fewshot val() (RefcocoCPTDataset, test_collate,
    ratio-scoring, mIoU — `Oscar/oscar/fewshot/refcoco_cpt.py:258-316`)
    vs our Extractor TSV → `refcoco_evaluate`, with ONE set of detector
    and Oscar weights shared through the production converters. The
    predicted box per query and the accuracy must agree."""
    import dataclasses
    import shutil

    import jax.numpy as jnp

    import pytorch_transformers_shim as shim

    shim.install()
    OSCAR_ROOT = "/root/reference/Oscar"
    if OSCAR_ROOT not in sys.path:
        sys.path.insert(0, OSCAR_ROOT)
    ref_mb = pytest.importorskip("oscar.modeling.modeling_bert")
    ref_rec = pytest.importorskip("oscar.modeling.modeling_rec")
    from oscar.fewshot import refcoco_cpt as ref_fs

    from cpt_tpu.config.bert import tiny_bert_config
    from cpt_tpu.data.refcoco import RefcocoCPTData
    from cpt_tpu.engine.extract import Extractor, refcoco_task
    from cpt_tpu.engine.scoring import refcoco_evaluate
    from cpt_tpu.models.bert.heads import REC_MLM_CPT
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.convert import load_vinvl_checkpoint
    from cpt_tpu.utils import convert as cv
    from cpt_tpu.utils.tokenization import BertTokenizer, toy_vocab

    yaml_path, labelmap_path = _write_fixture(tmp_path)

    # ---- stage 1, reference: real-width tiny (2054-d features) ----
    ref_det, ref_tsv = _reference_tsv(
        tmp_path, yaml_path, labelmap_path,
        overrides={"MODEL.RESNETS.RES2_OUT_CHANNELS": 256,
                   "MODEL.RESNETS.BACKBONE_OUT_CHANNELS": 1024})

    # ---- stage 1, ours: same weights via the production converter ----
    ckpt = tmp_path / "det.pth"
    torch.save({"model": ref_det.state_dict()}, ckpt)
    cfg = tiny_detector_config()
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone,
                                          res2_out_channels=256,
                                          out_channels=1024))
    params = {"params": load_vinvl_checkpoint(str(ckpt), cfg)}
    det = AttrRCNN(cfg, dtype=jnp.float32)
    labelmap = {i + 1: n for i, n in enumerate(CLASSES)}
    extractor = Extractor(det, params, cfg, labelmap=labelmap,
                          copies_per_chunk=4)
    anns = json.load(open(tmp_path / "ann.json"))
    det_dic = json.load(open(tmp_path / "det.json"))

    def tasks():
        from PIL import Image

        for ann in anns:
            imid = str(int(ann["file_name"].replace(".jpg", "")
                           .split("_")[-1]))
            dets = np.asarray([d["box"] for d in det_dic[imid]], np.float32)
            dets[:, 2] = dets[:, 0] + dets[:, 2] - 1
            dets[:, 3] = dets[:, 1] + dets[:, 3] - 1
            img = np.asarray(Image.open(
                tmp_path / "images" / ann["file_name"]).convert("RGB"))
            yield refcoco_task(str(ann["id"]), img, img.shape[:2], dets,
                               ann["caption"])

    our_tsv = tmp_path / "ours.tsv"
    extractor.run(tasks(), str(our_tsv))

    # ---- shared Oscar weights (2054-d image features) ----
    tok = BertTokenizer(toy_vocab())
    ocfg = tiny_bert_config(vocab_size=192, img_feature_dim=2054)
    ref_bcfg = shim.BertConfig(
        vocab_size_or_config_json_file=ocfg.vocab_size,
        hidden_size=ocfg.hidden_size,
        num_hidden_layers=ocfg.num_hidden_layers,
        num_attention_heads=ocfg.num_attention_heads,
        intermediate_size=ocfg.intermediate_size,
        max_position_embeddings=ocfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=ocfg.layer_norm_eps,
        img_feature_dim=2054, img_feature_type="faster_r-cnn",
        use_img_layernorm=False, img_layer_norm_eps=1e-12,
        num_contrast_classes=2, num_labels=2, loss_type="xe",
        classifier="linear", cls_hidden_scale=2)
    torch.manual_seed(11)
    pre = ref_mb.BertImgForPreTraining(ref_bcfg)
    rec = ref_rec.REC_MLM_CPT(ref_bcfg)
    rec.copy_from_pretraining_model(pre)
    rec.eval()

    # ---- stage 2, reference: its own dataset/val() on ITS tsv ----
    work = tmp_path / "work"
    tsv_dir = work / "output" / "refcoco_val"
    tsv_dir.mkdir(parents=True)
    shutil.copy(ref_tsv, tsv_dir / "predictions.tsv")
    shutil.copy(str(ref_tsv).replace(".tsv", ".lineidx"),
                tsv_dir / "predictions.lineidx")
    split_dir = work / "data" / "refcoco" / "split"
    split_dir.mkdir(parents=True)
    json.dump(anns, open(split_dir / "finetune_refcoco_val.json", "w"))
    det_dir = work / "data" / "refcoco" / "mydetections" / "refcoco"
    det_dir.mkdir(parents=True)
    # stage-2 det file: od-label names per QUERY id (the format
    # _load_od_labels consumes and our RefcocoCPTData mirrors)
    names = {str(a["id"]): [CLASSES[0], CLASSES[1], CLASSES[2]]
             for a in anns}
    json.dump(names, open(det_dir / "dets.json", "w"))

    from types import SimpleNamespace

    args = SimpleNamespace(device=torch.device("cpu"),
                           per_gpu_eval_batch_size=2, num_workers=0)
    captured = {}
    orig_all_gather = ref_fs.all_gather

    def spy_all_gather(obj):
        if isinstance(obj, dict) and obj and all(
                isinstance(v, (list, tuple)) for v in obj.values()):
            captured.update(obj)
        return orig_all_gather(obj)

    monkeypatch.setattr(ref_fs, "all_gather", spy_all_gather)
    # the reference module only binds `logger` inside its main()
    import logging

    monkeypatch.setattr(ref_fs, "logger",
                        logging.getLogger("ref_fs_val"), raising=False)
    monkeypatch.chdir(work / "output")
    loader = ref_fs.make_data_loader(args, "refcoco_val/predictions.tsv",
                                     tok, is_distributed=False,
                                     is_train=False)
    with torch.no_grad():
        miou_ref = ref_fs.val(args, loader, rec, tok)
    monkeypatch.chdir(tmp_path)
    assert captured, "reference val() predictions not captured"

    # ---- stage 2, ours: our evaluate on OUR tsv, converted weights ----
    sd = {k: v.detach().numpy() for k, v in pre.state_dict().items()}
    oparams = cv.convert_bert_state_dict(sd, ocfg)
    rec_params = {"params": {"bert": oparams["bert"],
                             "mlm_head": oparams["mlm_head"]}}
    data = RefcocoCPTData(str(our_tsv), str(tmp_path / "ann.json"),
                          str(det_dir / "dets.json"), tok,
                          img_feat_dim=2054)
    acc, preds = refcoco_evaluate(REC_MLM_CPT(ocfg), rec_params, data, tok,
                                  batch_size=4)

    assert set(preds) == set(captured) == {"q0", "q1", "q2"}
    for k in sorted(preds):
        np.testing.assert_allclose(np.asarray(preds[k], np.float64),
                                   np.asarray(captured[k], np.float64),
                                   err_msg=f"prediction mismatch for {k}")
    np.testing.assert_allclose(acc, miou_ref, atol=1e-9)


@pytest.mark.slow
def test_gqa_stage1_pipeline_tsv_parity(tmp_path):
    """Second engine family: the reference's GQA color-marking extraction
    executed directly (`GQAColorDataset` question-entity marking with the
    +1-inclusive paint, `gqadataset.py:128-156`; `VGCollator`;
    `engine/inference_vcr.py::inference` — per-query single boxlist,
    geometry concat `:285-296`, its own TSV writer `:83-215`) vs our
    `extract_features --task gqa` on the same fixture and weights."""
    from PIL import Image
    from torch.utils.data import DataLoader

    from maskrcnn_benchmark.data.collate_batch import VGCollator
    from maskrcnn_benchmark.data.datasets.gqadataset import GQAColorDataset
    from maskrcnn_benchmark.engine.inference_vcr import (
        inference as vcr_inference)

    rng = np.random.RandomState(9)
    (tmp_path / "images").mkdir()
    for i in (1, 2):
        arr = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "images" / f"g{i}.jpg")
    anns = [
        {"q_id": "g0", "img_id": 1, "img_path": "g1.jpg",
         "question": "what is it", "w": W, "h": H},
        {"q_id": "g1", "img_id": 2, "img_path": "g2.jpg",
         "question": "what color", "w": W, "h": H},
    ]
    dets = {  # [name, box_xyxy] — the GQA det format (gqadataset.py:135)
        "1": [["thing1", [4, 4, 30, 28]], ["thing2", [20, 16, 58, 52]],
              ["thing3", [8, 36, 40, 60]]],
        "2": [["thing2", [10, 10, 39, 39]], ["thing1", [25, 20, 59, 59]]],
    }
    # to_mark entries are [box_xyxy, [char_insert_pos]] — the reference's
    # own stage-2 indexes the position as x[0][0] (gqa_cpt.py:239)
    to_mark = {"g0": [[[20, 16, 58, 52], [8]]],
               "g1": [[[10, 10, 39, 39], [5]]]}
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    json.dump(dets, open(tmp_path / "det.json", "w"))
    json.dump(to_mark, open(tmp_path / "to_mark.json", "w"))
    yaml_path = tmp_path / "gqa_test.yaml"
    yaml_path.write_text(
        f"ann_root: {tmp_path}\nann: ann.json\ndet: det.json\n"
        f"to_mark: to_mark.json\nimage_root: {tmp_path / 'images'}\n")
    labelmap = {
        "label_to_idx": {n: i + 1 for i, n in enumerate(CLASSES)},
        "idx_to_label": {str(i + 1): n for i, n in enumerate(CLASSES)},
    }
    json.dump(labelmap, open(tmp_path / "labelmap.json", "w"))

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=True)
    CN = reference_stubs.CfgNode
    ref_cfg.INPUT = CN(MIN_SIZE_TEST=0, MAX_SIZE_TEST=0, TO_BGR255=True,
                       PIXEL_MEAN=[103.530, 116.280, 123.675],
                       PIXEL_STD=[1.0, 1.0, 1.0])
    ref_cfg.TEST.SAVE_RESULTS_TO_TSV = True
    ref_cfg.TEST.TSV_SAVE_SUBSET = ["rect", "class", "conf", "feature"]
    ref_cfg.TEST.GATHER_ON_CPU = False
    ref_cfg.TEST.SKIP_PERFORMANCE_EVAL = True

    args_ns = CN(TOTAL_STEP=None, CUR_STEP=None, N_SHOT=None, RAND_SEED=0)
    dataset = GQAColorDataset(str(yaml_path),
                              transforms=build_transforms(ref_cfg,
                                                          is_train=False),
                              args=args_ns)
    loader = DataLoader(dataset, batch_size=2, shuffle=False, num_workers=0,
                        collate_fn=VGCollator(size_divisible=16))
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    vcr_inference(ref_model, ref_cfg, loader, "gqa_test", device="cpu",
                  output_folder=str(out_dir), skip_performance_eval=True,
                  labelmap_file=str(tmp_path / "labelmap.json"))
    ref_tsv = out_dir / "predictions.tsv"
    assert ref_tsv.exists()

    ckpt = tmp_path / "ref_model.pth"
    torch.save({"model": ref_model.state_dict()}, ckpt)
    our_tsv = tmp_path / "ours.tsv"
    from cpt_tpu.tools.extract_features import main as extract_main

    extract_main(["--task", "gqa", "--yaml", str(yaml_path),
                  "--tiny", "--dtype", "float32",
                  "--checkpoint", str(ckpt),
                  "--labelmap", str(tmp_path / "labelmap.json"),
                  "--output", str(our_tsv)])

    ref_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(ref_tsv))[i] for i in range(2))}
    our_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(our_tsv))[i] for i in range(2))}
    assert set(ref_rows) == set(our_rows) == {"g0", "g1"}
    for key in sorted(ref_rows):
        ref_objs, ref_meta = ref_rows[key]["objects"]
        our_objs, our_meta = our_rows[key]["objects"]
        # reference meta = [positions_and_colors, None] (txt_names unused
        # on the GQA path); ours carries positions_and_colors only
        assert our_meta[0] == ref_meta[0]
        assert len(our_objs) == len(ref_objs)
        for ref_o, our_o in zip(ref_objs, our_objs):
            assert our_o["class"] == ref_o["class"], key
            np.testing.assert_allclose(our_o["rect"], ref_o["rect"],
                                       atol=1e-3)
            np.testing.assert_allclose(our_o["conf"], ref_o["conf"],
                                       atol=2e-3, rtol=1e-2)
            rf = decode_feature(ref_o["feature"])
            of = decode_feature(our_o["feature"])
            np.testing.assert_allclose(of[-6:], rf[-6:], atol=1e-5)
            np.testing.assert_allclose(of, rf, atol=4e-3, rtol=2e-2)


@pytest.mark.slow
def test_vg_stage1_pipeline_tsv_parity(tmp_path, monkeypatch):
    """Third engine family: the reference's VG pair extraction executed
    directly (`VGDataset` — pickle annotations, IoU>0 pair expansion
    `vgdataset.py:99-115`, subject-red/object-blue EXCLUSIVE paint
    `:153-158`; `engine/inference_vg.py::inference`) vs our
    `extract_features --task vg` reading the SAME reference-format
    pickle+vocab yaml."""
    import pickle

    from PIL import Image
    from torch.utils.data import DataLoader

    from maskrcnn_benchmark.data.collate_batch import VGCollator
    from maskrcnn_benchmark.data.datasets.vgdataset import VGDataset
    from maskrcnn_benchmark.engine.inference_vg import (
        inference as vg_inference)

    rng = np.random.RandomState(13)
    (tmp_path / "images").mkdir()
    for name in ("v1.jpg", "v2.jpg"):
        arr = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "images" / name)
    vgdata = [
        {"img_path": "v1.jpg", "width": W, "height": H,
         # boxes 0/1 overlap; box 2 is disjoint → pairs: (0,1) only
         "boxes": np.asarray([[4, 4, 30, 28], [20, 16, 58, 52],
                              [2, 40, 14, 60]], np.float32),
         "labels": np.asarray([1, 2, 3], np.int64),
         "relations": np.asarray([[0, 1, 1]], np.int32)},
        {"img_path": "v2.jpg", "width": W, "height": H,
         # all three overlap pairwise → pairs (0,1), (0,2), (1,2)
         "boxes": np.asarray([[10, 10, 39, 39], [25, 20, 59, 59],
                              [15, 25, 44, 50]], np.float32),
         "labels": np.asarray([2, 1, 4], np.int64),
         "relations": np.asarray([[0, 2, 2]], np.int32)},
    ]
    pickle.dump(vgdata, open(tmp_path / "vg_eval.pk", "wb"))
    vocab = {"idx_to_label": {str(i + 1): n for i, n in enumerate(CLASSES)},
             "idx_to_predicate": {"1": "on", "2": "near"}}
    json.dump(vocab, open(tmp_path / "vocab.json", "w"))
    yaml_path = tmp_path / "vg_test.yaml"
    yaml_path.write_text(
        f"ann_root: {tmp_path}\nann: vg_eval.pk\nvocab: vocab.json\n"
        f"image_root: {tmp_path / 'images'}\n")
    labelmap = {
        "label_to_idx": {n: i + 1 for i, n in enumerate(CLASSES)},
        "idx_to_label": {str(i + 1): n for i, n in enumerate(CLASSES)},
    }
    json.dump(labelmap, open(tmp_path / "labelmap.json", "w"))

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=True)
    CN = reference_stubs.CfgNode
    ref_cfg.INPUT = CN(MIN_SIZE_TEST=0, MAX_SIZE_TEST=0, TO_BGR255=True,
                       PIXEL_MEAN=[103.530, 116.280, 123.675],
                       PIXEL_STD=[1.0, 1.0, 1.0])
    ref_cfg.TEST.SAVE_RESULTS_TO_TSV = True
    ref_cfg.TEST.TSV_SAVE_SUBSET = ["rect", "class", "conf", "feature"]
    ref_cfg.TEST.GATHER_ON_CPU = False
    ref_cfg.TEST.SKIP_PERFORMANCE_EVAL = True

    args_ns = CN(TOTAL_STEP=None, CUR_STEP=None, N_SHOT=None, RAND_SEED=0)
    monkeypatch.chdir(tmp_path)  # the eval path dumps ./vg.pk
    dataset = VGDataset(str(yaml_path),
                        transforms=build_transforms(ref_cfg,
                                                    is_train=False),
                        args=args_ns)
    assert len(dataset) == 4  # (0,1) + three v2 pairs
    loader = DataLoader(dataset, batch_size=2, shuffle=False, num_workers=0,
                        collate_fn=VGCollator(size_divisible=16))
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    vg_inference(ref_model, ref_cfg, loader, "vg_test", device="cpu",
                 output_folder=str(out_dir), skip_performance_eval=True,
                 labelmap_file=str(tmp_path / "labelmap.json"))
    ref_tsv = out_dir / "predictions.tsv"
    assert ref_tsv.exists()

    ckpt = tmp_path / "ref_model.pth"
    torch.save({"model": ref_model.state_dict()}, ckpt)
    our_tsv = tmp_path / "ours.tsv"
    from cpt_tpu.tools.extract_features import main as extract_main

    extract_main(["--task", "vg", "--yaml", str(yaml_path),
                  "--tiny", "--dtype", "float32",
                  "--checkpoint", str(ckpt),
                  "--labelmap", str(tmp_path / "labelmap.json"),
                  "--output", str(our_tsv)])

    ref_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(ref_tsv))[i] for i in range(4))}
    our_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(our_tsv))[i] for i in range(4))}
    assert set(ref_rows) == set(our_rows)
    assert "v1.jpg_0_1" in ref_rows and "v2.jpg_1_2" in ref_rows
    for key in sorted(ref_rows):
        ref_nested, ref_colors, ref_names, ref_rel = ref_rows[key]["objects"]
        our_nested, our_colors, our_names, our_rel = our_rows[key]["objects"]
        assert our_colors == ref_colors == ["red", "blue"]
        assert our_names == ref_names
        assert our_rel == ref_rel  # None on the eval path
        ref_objs, our_objs = ref_nested[0], our_nested[0]
        assert len(our_objs) == len(ref_objs) == 3
        for ref_o, our_o in zip(ref_objs, our_objs):
            assert our_o["class"] == ref_o["class"], key
            np.testing.assert_allclose(our_o["rect"], ref_o["rect"],
                                       atol=1e-3)
            np.testing.assert_allclose(our_o["conf"], ref_o["conf"],
                                       atol=2e-3, rtol=1e-2)
            rf = decode_feature(ref_o["feature"])
            of = decode_feature(our_o["feature"])
            np.testing.assert_allclose(of[-6:], rf[-6:], atol=1e-5)
            np.testing.assert_allclose(of, rf, atol=4e-3, rtol=2e-2)


@pytest.mark.slow
def test_vcr_stage1_pipeline_tsv_parity(tmp_path):
    """Fourth engine family: the reference's VCR mask-paint extraction
    executed directly (`VCRColorDataset` — entity-group color assignment
    with member-level det dedup `vcrdataset.py:215-234`, per-image segms
    polygon overlays `:272-283`, person/people/<cls>s/objects naming
    `:237-249`; `inference_vcr` engine) vs our `extract_features --task
    vcr` on the SAME reference-format files. Sentences carry at most one
    distinct entity group each — the reference's within-sentence group
    order is a Python-set artifact (`_get_eles`, :176-179)."""
    from PIL import Image
    from torch.utils.data import DataLoader

    from maskrcnn_benchmark.data.collate_batch import VGCollator
    from maskrcnn_benchmark.data.datasets.vcrdataset import VCRColorDataset
    from maskrcnn_benchmark.engine.inference_vcr import (
        inference as vcr_inference)

    rng = np.random.RandomState(17)
    (tmp_path / "images").mkdir()
    segms = {
        "vcr1": [[[[6, 6], [28, 6], [28, 26], [6, 26]]],
                 # entity 1: TWO polygon parts
                 [[[22, 18], [40, 18], [40, 34], [22, 34]],
                  [[44, 36], [56, 36], [56, 50], [44, 50]]],
                 [[[10, 38], [38, 38], [24, 58]]]],
        "vcr2": [[[[12, 12], [36, 12], [36, 36], [12, 36]]],
                 [[[28, 22], [56, 22], [56, 56], [28, 56]]]],
    }
    for name in ("vcr1", "vcr2"):
        arr = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "images" / f"{name}.jpg")
        json.dump({"segms": segms[name]},
                  open(tmp_path / "images" / f"{name}.json", "w"))
    anns = [
        # vis groups [0] and [1]; rationale-only group [2] gets a name
        # but no color
        {"annot_id": "a0", "img_id": "i1", "img_path": "vcr1.jpg",
         "w": W, "h": H,
         "question": ["what", "is", [0], "doing", "?"],
         "answers": [["he", "holds", [1]], ["nothing", "at", "all"]],
         "rationales": [[[2], "is", "there"]]},
        # shared member: [0] then [0, 1] — member 0 keeps its first
        # paint, so group "0_1" wears MIXED colors → no color word
        {"annot_id": "a1", "img_id": "i1", "img_path": "vcr1.jpg",
         "w": W, "h": H,
         "question": ["who", "is", [0], "?"],
         "answers": [[[0, 1], "are", "together"]],
         "rationales": []},
        {"annot_id": "a2", "img_id": "i2", "img_path": "vcr2.jpg",
         "w": W, "h": H,
         "question": ["where", "is", [0], "?"],
         "answers": [["outside"]],
         "rationales": [[[1], "shows", "it"]]},
    ]
    to_mark = {
        "i1": {"boxes": [[4, 4, 30, 28], [20, 16, 58, 52], [8, 36, 40, 60]],
               "names": ["person", "person", "dog"]},
        "i2": {"boxes": [[10, 10, 39, 39], [25, 20, 59, 59]],
               "names": ["person", "dog"]},
    }
    dets = {
        "i1": [["person", [4, 4, 30, 28]], ["dog", [20, 16, 58, 52]],
               ["person", [8, 36, 40, 60]]],
        "i2": [["person", [10, 10, 39, 39]], ["dog", [25, 20, 59, 59]]],
    }
    json.dump(anns, open(tmp_path / "ann.json", "w"))
    json.dump(dets, open(tmp_path / "det.json", "w"))
    json.dump(to_mark, open(tmp_path / "to_mark.json", "w"))
    yaml_path = tmp_path / "vcr_test.yaml"
    yaml_path.write_text(
        f"ann_root: {tmp_path}\nann: ann.json\ndet: det.json\n"
        f"to_mark: to_mark.json\nimage_root: {tmp_path / 'images'}\n")
    labelmap = {
        "label_to_idx": {n: i + 1 for i, n in enumerate(CLASSES)},
        "idx_to_label": {str(i + 1): n for i, n in enumerate(CLASSES)},
    }
    json.dump(labelmap, open(tmp_path / "labelmap.json", "w"))

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=True)
    CN = reference_stubs.CfgNode
    ref_cfg.INPUT = CN(MIN_SIZE_TEST=0, MAX_SIZE_TEST=0, TO_BGR255=True,
                       PIXEL_MEAN=[103.530, 116.280, 123.675],
                       PIXEL_STD=[1.0, 1.0, 1.0])
    ref_cfg.TEST.SAVE_RESULTS_TO_TSV = True
    ref_cfg.TEST.TSV_SAVE_SUBSET = ["rect", "class", "conf", "feature"]
    ref_cfg.TEST.GATHER_ON_CPU = False
    ref_cfg.TEST.SKIP_PERFORMANCE_EVAL = True

    args_ns = CN(TOTAL_STEP=None, CUR_STEP=None, N_SHOT=None, RAND_SEED=0,
                 COLOR_D=6)
    dataset = VCRColorDataset(str(yaml_path),
                              transforms=build_transforms(ref_cfg,
                                                          is_train=False),
                              args=args_ns)
    assert len(dataset) == 3
    loader = DataLoader(dataset, batch_size=2, shuffle=False, num_workers=0,
                        collate_fn=VGCollator(size_divisible=16))
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    vcr_inference(ref_model, ref_cfg, loader, "vcr_test", device="cpu",
                  output_folder=str(out_dir), skip_performance_eval=True,
                  labelmap_file=str(tmp_path / "labelmap.json"))
    ref_tsv = out_dir / "predictions.tsv"
    assert ref_tsv.exists()

    ckpt = tmp_path / "ref_model.pth"
    torch.save({"model": ref_model.state_dict()}, ckpt)
    our_tsv = tmp_path / "ours.tsv"
    from cpt_tpu.tools.extract_features import main as extract_main

    extract_main(["--task", "vcr", "--yaml", str(yaml_path),
                  "--tiny", "--dtype", "float32",
                  "--checkpoint", str(ckpt),
                  "--labelmap", str(tmp_path / "labelmap.json"),
                  "--output", str(our_tsv)])

    ref_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(ref_tsv))[i] for i in range(3))}
    our_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(our_tsv))[i] for i in range(3))}
    assert set(ref_rows) == set(our_rows) == {"a0", "a1", "a2"}
    # semantics spot-checks: rationale-only entity named but uncolored;
    # mixed-paint group "0_1" carries no color word
    ref_colors_a0, ref_names_a0 = ref_rows["a0"]["objects"][1]
    assert "2" in ref_names_a0 and "2" not in ref_colors_a0
    ref_colors_a1, _ = ref_rows["a1"]["objects"][1]
    assert "0_1" not in ref_colors_a1 and "0" in ref_colors_a1
    for key in sorted(ref_rows):
        ref_objs, ref_meta = ref_rows[key]["objects"]
        our_objs, our_meta = our_rows[key]["objects"]
        assert our_meta == ref_meta, key  # [txt_colors, txt_names] dicts
        assert len(our_objs) == len(ref_objs)
        for ref_o, our_o in zip(ref_objs, our_objs):
            assert our_o["class"] == ref_o["class"], key
            np.testing.assert_allclose(our_o["rect"], ref_o["rect"],
                                       atol=1e-3)
            np.testing.assert_allclose(our_o["conf"], ref_o["conf"],
                                       atol=2e-3, rtol=1e-2)
            rf = decode_feature(ref_o["feature"])
            of = decode_feature(our_o["feature"])
            np.testing.assert_allclose(of[-6:], rf[-6:], atol=1e-5)
            np.testing.assert_allclose(of, rf, atol=4e-3, rtol=2e-2)


@pytest.mark.slow
def test_plain_rpn_pipeline_tsv_parity(tmp_path, monkeypatch):
    """Fifth (and last) engine family: the reference's PLAIN feature
    extraction executed directly — `ImgDataset` over an image directory
    (with its tmp/cnt.pk shard hack and ../img_info.json,
    `refcocodataset.py:21-64`) through the generic
    `engine/inference.py::inference` in RPN mode with the _ext.sh
    settings (NMS_FILTER 1 "peter", IGNORE_BOX_REGRESSION) — vs our
    `extract_features --image_dir` RPN mode on the same directory."""
    import pickle

    from PIL import Image
    from torch.utils.data import DataLoader

    from maskrcnn_benchmark.data.collate_batch import BatchCollator
    from maskrcnn_benchmark.data.datasets.refcocodataset import ImgDataset
    from maskrcnn_benchmark.engine.inference import (
        inference as generic_inference)

    rng = np.random.RandomState(23)
    images_dir = tmp_path / "images"
    images_dir.mkdir()
    info = {}
    for name in ("p1.jpg", "p2.jpg"):
        arr = rng.randint(0, 256, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(images_dir / name)
        info[name] = {"width": W, "height": H}
    json.dump(info, open(tmp_path / "img_info.json", "w"))
    # the ImgDataset 15-shard side channel: shard 14 takes files[0:]
    (tmp_path / "tmp").mkdir()
    pickle.dump(14, open(tmp_path / "tmp" / "cnt.pk", "wb"))
    labelmap = {
        "label_to_idx": {n: i + 1 for i, n in enumerate(CLASSES)},
        "idx_to_label": {str(i + 1): n for i, n in enumerate(CLASSES)},
    }
    json.dump(labelmap, open(tmp_path / "labelmap.json", "w"))

    ref_model, ref_cfg = reference_stubs.build_reference_attr_rcnn(
        force_boxes=False,
        overrides={"MODEL.ROI_HEADS.NMS_FILTER": 1})
    CN = reference_stubs.CfgNode
    ref_cfg.INPUT = CN(MIN_SIZE_TEST=0, MAX_SIZE_TEST=0, TO_BGR255=True,
                       PIXEL_MEAN=[103.530, 116.280, 123.675],
                       PIXEL_STD=[1.0, 1.0, 1.0])
    ref_cfg.TEST.SAVE_RESULTS_TO_TSV = True
    ref_cfg.TEST.TSV_SAVE_SUBSET = ["rect", "class", "conf", "feature"]
    ref_cfg.TEST.GATHER_ON_CPU = False
    ref_cfg.TEST.SKIP_PERFORMANCE_EVAL = True

    monkeypatch.chdir(tmp_path)  # tmp/cnt.pk is cwd-relative
    dataset = ImgDataset(str(images_dir),
                         transforms=build_transforms(ref_cfg,
                                                     is_train=False))
    assert len(dataset) == 2
    loader = DataLoader(dataset, batch_size=2, shuffle=False, num_workers=0,
                        collate_fn=BatchCollator(size_divisible=16))
    out_dir = tmp_path / "ref_out"
    out_dir.mkdir()
    generic_inference(ref_model, ref_cfg, loader, "img_test", device="cpu",
                      output_folder=str(out_dir),
                      skip_performance_eval=True,
                      labelmap_file=str(tmp_path / "labelmap.json"))
    ref_tsv = out_dir / "predictions.tsv"
    assert ref_tsv.exists()

    ckpt = tmp_path / "ref_model.pth"
    torch.save({"model": ref_model.state_dict()}, ckpt)
    our_tsv = tmp_path / "ours.tsv"
    from cpt_tpu.tools.extract_features import main as extract_main

    extract_main(["--image_dir", str(images_dir),
                  "--tiny", "--dtype", "float32",
                  "--nms_filter", "1", "--ignore_box_regression",
                  "--checkpoint", str(ckpt),
                  "--labelmap", str(tmp_path / "labelmap.json"),
                  "--output", str(our_tsv)])

    ref_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(ref_tsv))[i] for i in range(2))}
    our_rows = {k: json.loads(v) for k, v in
                (TSVFile(str(our_tsv))[i] for i in range(2))}
    assert set(ref_rows) == set(our_rows) == {"p1", "p2"}
    for key in sorted(ref_rows):
        ref_objs = ref_rows[key]["objects"]
        our_objs = our_rows[key]["objects"]
        assert len(our_objs) == len(ref_objs) >= 2, key  # min_detections
        for ref_o, our_o in zip(ref_objs, our_objs):
            assert our_o["class"] == ref_o["class"], key
            np.testing.assert_allclose(our_o["rect"], ref_o["rect"],
                                       atol=1e-2, rtol=1e-3)
            np.testing.assert_allclose(our_o["conf"], ref_o["conf"],
                                       atol=2e-3, rtol=1e-2)
            rf = decode_feature(ref_o["feature"])
            of = decode_feature(our_o["feature"])
            np.testing.assert_allclose(of[-6:], rf[-6:], atol=1e-4)
            np.testing.assert_allclose(of, rf, atol=4e-3, rtol=2e-2)
