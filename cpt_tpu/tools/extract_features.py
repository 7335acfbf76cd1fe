"""Stage-1 extraction driver — RefCOCO colorful-prompt feature extraction.

Mirrors the reference entry point ``prompt_feat/tools/test_refcoco_net.py``
(+ ``cmds/refcoco/cpt/refcoco_val.sh``): loads the VinVL X152-C4 detector,
renders the colored prompt per candidate region on device, extracts 2054-d
region features in force-boxes mode, and writes the interchange
``predictions.tsv``.

Sharding: ``--total_step/--cur_step`` slice the annotation list exactly like
the reference's resumable shard loop (``refcocodataset.py:186-196``), and
``--n_shot/--rand_seed`` reproduce its few-shot subset sampling
(``refcocodataset.py:199-206``).

Without real data, ``--synthetic N`` extracts N random queries (smoke/bench).
"""
from __future__ import annotations

import argparse
import json
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpt_tpu.engine.extract import Extractor, refcoco_task
from cpt_tpu.models.detector.attr_rcnn import AttrRCNN
from cpt_tpu.models.detector.config import VINVL_X152C4, tiny_detector_config
from cpt_tpu.models.detector.convert import load_vinvl_checkpoint


def build_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", default=None,
                   choices=["refcoco", "gqa", "vcr", "vg", "plain"],
                   help="stage-1 coloring scheme + TSV payload layout "
                        "(default refcoco, or DATASETS.TEST of "
                        "--config_file)")
    p.add_argument("--ann_file", default=None)
    p.add_argument("--det_file", default=None)
    p.add_argument("--to_mark", default=None,
                   help="gqa: parsed entity marks json {q_id: [[box, "
                        "positions], ...]} (auto-parsed if omitted)")
    p.add_argument("--yaml", default=None,
                   help="dataset descriptor yaml with ann/det/image_root/"
                        "to_mark keys (the reference's "
                        "prompt_feat/data/*/yamls convention)")
    p.add_argument("--image_root", default=None)
    p.add_argument("--labelmap", default=None)
    p.add_argument("--vocab_file", default=None,
                   help="idx_to_label vocab json (vg pickle annotations; "
                        "defaults to the task yaml's 'vocab' entry)")
    p.add_argument("--checkpoint", default=None, help="vinvl_vg_x152c4.pth")
    p.add_argument("--output", default=None,
                   help="predictions.tsv path (required unless "
                        "--config_file supplies OUTPUT_DIR)")
    p.add_argument("--total_step", type=int, default=None)
    p.add_argument("--cur_step", type=int, default=None)
    p.add_argument("--shard_by_process", action="store_true",
                   help="multi-host pods: shard by jax.process_index() "
                        "(output becomes <base>.shard{i}.tsv; merge with "
                        "tools/merge_shards.py)")
    p.add_argument("--overwrite", action="store_true",
                   help="re-extract even if the output TSV exists "
                        "(default skips, reference inference_ref.py:223-229)")
    p.add_argument("--n_shot", type=int, default=None)
    p.add_argument("--rand_seed", type=int, default=None)
    p.add_argument("--color_name", default=None,
                   help="refcoco paint-color override: color word written "
                        "to the TSV payload (reference COLOR_NAME, "
                        "refcocodataset.py ValDataset :356-360 — the "
                        "color-exploration extraction knob)")
    p.add_argument("--color_rgb", default=None,
                   help="refcoco paint-color override, 'R-G-B' "
                        "(reference COLOR_RGB)")
    p.add_argument("--color_d", type=int, default=None,
                   help="reference COLOR_D, per-task semantics: refcoco = "
                        "paint ALPHA of the --color_rgb override "
                        "(refcocodataset.py:359); vcr = number of palette "
                        "colors painted, 0 = uncolored 'pt' variant "
                        "(vcrdataset.py:127, cmds/vcr/*_val_seg.sh)")
    p.add_argument("--copies_per_chunk", type=int, default=None,
                   help="fixed chunk size; default auto (HBM-budget power of two)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard each chunk's copies over a dp mesh of this "
                        "many chips")
    p.add_argument("--windowed", action="store_true",
                   help="windowed-recompute reuse (~1.7x). Exact only when "
                        "the halo covers 2x the relevant receptive field; else falls "
                        "back to the exact path unless --allow-approximate")
    p.add_argument("--allow-approximate", action="store_true",
                   dest="allow_approximate",
                   help="keep --windowed even when halo < backbone RF "
                        "(approximate features; drift auto-measured and "
                        "logged on the first task)")
    p.add_argument("--windows", default="384x512,448x576,512x640",
                   help="comma-separated HxW window ladder for --windowed; "
                        "each copy routes to the smallest window its paint "
                        "fits (per-task auto window sizing)")
    p.add_argument("--resize", action="store_true",
                   help="apply the MIN/MAX_SIZE_TEST 600/1000 resize rule "
                        "(the RefCOCO reference path runs without resize)")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--precision", default="bf16",
                   help="conv-body precision: bf16 (default), int8 (W8A8 "
                        "post-training quantized inference, dynamic "
                        "activation scales), or int8:<s> (static scale s). "
                        "NOTE: on the current v5e toolchain int8 measures "
                        "SLOWER composed (PERF.md int8 study) — bf16 is "
                        "the production choice; int8 is kept for future "
                        "toolchains")
    p.add_argument("--tiny", action="store_true",
                   help="tiny detector config (smoke tests)")
    p.add_argument("--image_dir", default=None,
                   help="plain RPN-mode detection + features over a "
                        "directory of jpgs (the reference ImgDataset / "
                        "cmds/gqa/_ext.sh uncolored pass; keys = file "
                        "stems, sorted)")
    p.add_argument("--nms_filter", type=int, default=None,
                   help="override MODEL.ROI_HEADS.NMS_FILTER (0/1/2)")
    p.add_argument("--ignore_box_regression", action="store_true",
                   help="TEST.IGNORE_BOX_REGRESSION: keep raw proposals "
                        "(the reference's plain-extraction setting)")
    p.add_argument("--synthetic", type=int, default=None,
                   help="extract N synthetic queries instead of real data")
    from cpt_tpu.tools._common import add_detector_config_args

    return add_detector_config_args(p)


# reference dataset class (DATASETS.TEST in the cmds/ scripts) → our task
# name; VQAColorDataset shares the GQA color-marking pipeline
# (vqadataset.py:63-140)
_DATASET_CLASS_TO_TASK = {
    "RefCoCoDataset": "refcoco", "GQAColorDataset": "gqa",
    "VQAColorDataset": "gqa", "VCRColorDataset": "vcr", "VGDataset": "vg",
    "ImgDataset": "plain",
}


def apply_ref_to_extract_args(args, ref):
    """Map a resolved reference run config onto extraction args that were
    not set explicitly: DATASETS.TEST → --task, DATA_DIR (a task-yaml path
    in every cmds/ script) → --yaml, OUTPUT_DIR → the reference's
    ``<OUTPUT_DIR>/inference/<DATA_DIR stem>/predictions.tsv`` layout
    (``tools/test_refcoco_net.py:38-44``)."""
    if args.task is None and ref.datasets_test:
        cls = ref.datasets_test[0]
        if cls not in _DATASET_CLASS_TO_TASK:
            raise SystemExit(
                f"DATASETS.TEST class {cls!r} has no extraction task "
                f"mapping (known: {sorted(_DATASET_CLASS_TO_TASK)}); "
                "pass --task explicitly")
        args.task = _DATASET_CLASS_TO_TASK[cls]
    if args.yaml is None and str(ref.data_dir).endswith((".yaml", ".yml")):
        args.yaml = ref.data_dir
    if args.output is None and ref.output_dir:
        stem = os.path.splitext(os.path.basename(ref.data_dir or "out"))[0]
        args.output = os.path.join(ref.output_dir, "inference", stem,
                                   "predictions.tsv")
    # CPT data-load keys ride the yacs opts in every cmds/ script
    # (defaults.py:535-542, e.g. `N_SHOT $NSHOT RAND_SEED $SEED
    # COLOR_D $4` in cmds/vcr/vcr_train.sh) — map them so the
    # reference's commands translate verbatim; explicit flags win
    raw = getattr(ref, "raw", None) or {}
    for yk, attr in (("N_SHOT", "n_shot"), ("RAND_SEED", "rand_seed"),
                     ("TOTAL_STEP", "total_step"),
                     ("CUR_STEP", "cur_step"), ("COLOR_D", "color_d")):
        if getattr(args, attr) is None and raw.get(yk) is not None:
            setattr(args, attr, int(raw[yk]))
    if args.color_name is None and raw.get("COLOR_NAME") is not None:
        args.color_name = str(raw["COLOR_NAME"])
    if args.color_rgb is None and raw.get("COLOR_RGB") is not None:
        args.color_rgb = str(raw["COLOR_RGB"])
    return args


def _scale_poly(poly, sc):
    # same multi-part detection as rasterize_polygon: an empty FIRST part
    # ([[], [...]]) still marks a list-of-parts, not a point list
    if len(poly) and (not len(poly[0]) or hasattr(poly[0][0], "__len__")):
        return [_scale_poly(part, sc) for part in poly]
    return [[float(x) * sc, float(y) * sc] for x, y, *_ in poly]


def scale_polys(polys, sc):
    """--resize scales the canvas and dets; segm polygons must follow or
    the painted masks land at original-size coordinates."""
    if sc == 1.0:
        return polys
    return {k: _scale_poly(p, sc) for k, p in polys.items()}


def scale_mask(mask, sc):
    """--resize scaling of a decoded binary RLE mask (nearest — binary
    masks keep hard edges like the resized paint rects)."""
    if sc == 1.0:
        return mask
    from PIL import Image

    h, w = mask.shape
    out = Image.fromarray(mask.astype(np.uint8)).resize(
        (int(round(w * sc)), int(round(h * sc))), Image.NEAREST)
    return np.asarray(out)


def shard_and_sample(anns, args):
    if args.total_step is not None and args.cur_step is not None:
        period = len(anns) // args.total_step
        if args.cur_step == args.total_step - 1:
            anns = anns[period * args.cur_step:]
        else:
            anns = anns[period * args.cur_step: period * (args.cur_step + 1)]
    if args.n_shot is not None:
        rng = random.Random()
        rng.seed(args.rand_seed)
        anns = list(anns)
        rng.shuffle(anns)
        anns = anns[: args.n_shot]
    return anns


def load_image(path, pad_h, pad_w, resize_min=None, resize_max=None):
    """Load RGB; optional min/max-size resize (the reference's
    MIN/MAX_SIZE_TEST rule); clipped to the largest canvas. The Extractor
    pads to the smallest fitting bucket."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if resize_min:
        scale = resize_min / min(h, w)
        if resize_max and scale * max(h, w) > resize_max:
            scale = resize_max / max(h, w)
        w, h = int(round(w * scale)), int(round(h * scale))
        img = img.resize((w, h), Image.BILINEAR)
    arr = np.asarray(img)[:pad_h, :pad_w]
    return arr, arr.shape[:2]


def main(argv=None):
    from cpt_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    from cpt_tpu.tools._common import apply_reference_config

    parser = build_args()
    ref = apply_reference_config(parser, argv)
    args = parser.parse_args(argv)
    if ref is not None:
        args = apply_ref_to_extract_args(args, ref)
    if args.task is None:
        args.task = "refcoco"
    if args.output is None:
        parser.error("--output is required (or --config_file with "
                     "OUTPUT_DIR)")
    if os.path.dirname(args.output):
        os.makedirs(os.path.dirname(args.output), exist_ok=True)
    if args.yaml and args.synthetic is None:
        import yaml as _yaml

        desc = _yaml.safe_load(open(args.yaml)) or {}
        root = desc.get("ann_root", os.path.dirname(args.yaml))

        def resolve(p):
            # the reference's find_file_path_in_yaml rule
            # (load_files.py:67-76): as-is if it exists, else ann_root
            # -relative
            return p if os.path.isfile(str(p)) else os.path.join(root, p)

        if args.vocab_file is None and "vocab" in desc:
            args.vocab_file = resolve(desc["vocab"])
        for key, attr in (("ann", "ann_file"), ("det", "det_file"),
                          ("image_root", "image_root"),
                          ("to_mark", "to_mark")):
            if key in desc and getattr(args, attr) is None:
                val = desc[key]
                if key != "image_root":
                    val = resolve(val)
                setattr(args, attr, val)
    if args.shard_by_process:
        args.total_step = jax.process_count()
        args.cur_step = jax.process_index()
        # keep .tsv as the final extension: the .lineidx sidecar path is
        # derived by splitext, so a trailing .shard{i} would collide
        # across shards
        base, ext = os.path.splitext(args.output)
        args.output = f"{base}.shard{args.cur_step}{ext}"
    if os.path.exists(args.output) and not args.overwrite:
        print(f"{args.output} exists; skipping (use --overwrite to redo)")
        return
    if ref is not None:
        cfg = ref.detector
    else:
        cfg = tiny_detector_config() if args.tiny else VINVL_X152C4
    if args.precision != "bf16":
        from dataclasses import replace as _dc_replace

        cfg = _dc_replace(cfg, backbone=_dc_replace(
            cfg.backbone, precision=args.precision))
    if args.nms_filter is not None or args.ignore_box_regression:
        from dataclasses import replace as _dc_replace

        rh = cfg.roi_heads
        if args.nms_filter is not None:
            rh = _dc_replace(rh, nms_filter=args.nms_filter)
        if args.ignore_box_regression:
            rh = _dc_replace(rh, ignore_box_regression=True)
        cfg = _dc_replace(cfg, roi_heads=rh)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = AttrRCNN(cfg, dtype=dtype)

    rng = np.random.RandomState(0)
    init_img = jnp.zeros((cfg.input.pad_h, cfg.input.pad_w, 3), jnp.uint8)
    init_params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        init_img.astype(jnp.float32), jnp.asarray([64, 64]),
        jnp.zeros((cfg.max_force_boxes, 4)),
        jnp.ones((cfg.max_force_boxes,), bool))
    if args.checkpoint:
        params = {"params": load_vinvl_checkpoint(args.checkpoint, cfg)}
        print(f"loaded {args.checkpoint}")
    else:
        params = init_params
        print("WARNING: random detector weights (no --checkpoint)")

    labelmap = None
    if args.labelmap:
        lm = json.load(open(args.labelmap))
        # VG-SGG-dicts layout: {"idx_to_label": {"1": "name", ...}}
        src = lm.get("idx_to_label", lm)
        labelmap = {int(k): v for k, v in src.items()}

    mesh = None
    if args.dp > 1:
        from cpt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, devices=jax.devices()[:args.dp])
    windows = [tuple(int(v) for v in w.split("x"))
               for w in args.windows.split(",") if w]
    # per-task paint convention: the reference's GQA/VQA/VCR datasets
    # paint rects INCLUSIVELY (`Image.new('RGBA', (x2-x1+1, y2-y1+1))`,
    # gqadataset.py:153 / vqadataset.py:162 / vcrdataset.py:262) while
    # RefCOCO and VG paint exclusively (refcocodataset.py:301,
    # vgdataset.py:157) — caught by the cross-framework pipeline test
    inclusive = args.task in ("gqa", "vcr")
    det_dic_all = json.load(open(args.det_file)) if args.det_file else {}
    # RefCOCO SEG variant: dets carrying "rle" masks paint the mask, not
    # the rect (refcocodataset.py:241-247) — needs the device mask
    # channel compiled in. The decision is PER IMAGE (the reference's
    # `"rle" in rawdets[0]` runs per __getitem__); compile the mask
    # channel if ANY image uses it — rect-only images then ride the same
    # program with an all-zero mask (alpha-0 paste: exact no-op)
    refcoco_rle = (args.task == "refcoco" and any(
        v and isinstance(v[0], dict) and "rle" in v[0]
        for v in det_dic_all.values()))
    extractor = Extractor(model, params, cfg, labelmap=labelmap,
                          copies_per_chunk=args.copies_per_chunk,
                          inclusive_paint=inclusive,
                          with_masks=bool(refcoco_rle),
                          windowed=args.windowed, window=windows,
                          allow_approximate=args.allow_approximate,
                          mesh=mesh)

    from cpt_tpu.data.stage1_tasks import (gqa_mark_task, parse_gqa_marks,
                                           plain_task, vcr_color_task,
                                           vg_pair_task)
    from cpt_tpu.engine.extract import (gqa_payload, plain_payload,
                                        vcr_payload, vg_payload)

    def load_one(path, orig_h=None):
        img, hw = load_image(
            os.path.join(args.image_root, path),
            cfg.input.pad_h, cfg.input.pad_w,
            resize_min=cfg.input.min_size_test if args.resize else None,
            resize_max=cfg.input.max_size_test if args.resize else None)
        scale = (hw[0] / float(orig_h)) if (args.resize and orig_h) else 1.0
        return img, hw, scale

    def xywh_to_xyxy(dets):
        dets = np.asarray(dets, np.float32)
        dets[:, 2] = dets[:, 0] + dets[:, 2] - 1
        dets[:, 3] = dets[:, 1] + dets[:, 3] - 1
        return dets

    def tasks():
        if args.synthetic is not None:
            qs = list(range(args.synthetic))
            if args.total_step is not None and args.cur_step is not None:
                period = len(qs) // args.total_step
                qs = (qs[period * args.cur_step:]
                      if args.cur_step == args.total_step - 1 else
                      qs[period * args.cur_step:
                         period * (args.cur_step + 1)])
            for q in qs:
                # per-task seed: the fixture is identical no matter how
                # the task list is sharded across steps/hosts
                rq = np.random.RandomState(1000 + q)
                img = rq.randint(0, 256,
                                 (cfg.input.pad_h, cfg.input.pad_w, 3)
                                 ).astype(np.uint8)
                dets = np.array([[4, 4, 60, 60], [70, 10, 130, 80],
                                 [20, 90, 90, 160]], np.float32)
                yield refcoco_task(f"syn{q}", img,
                                   (cfg.input.pad_h, cfg.input.pad_w),
                                   dets, f"the red thing {q}")
            return
        if (args.task == "vg"
                and args.ann_file.endswith((".pk", ".pkl", ".pickle"))):
            # the reference's OWN VG data format (vgdataset.py:25-53): a
            # pickle of {img_path, width, height, boxes xyxy [N,4],
            # labels [N], relations [R,3]} records + an idx_to_label
            # vocab json, expanded to one task per overlapping
            # (subj < obj) pair exactly like process_vg_data
            # (vgdataset.py:99-115; inclusive +1 IoU, strict > 0)
            import pickle as _pickle

            from cpt_tpu.structures.boxes import box_iou_np

            vgdata = _pickle.load(open(args.ann_file, "rb"))
            vgdata = shard_and_sample(vgdata, args)
            if args.vocab_file is None:
                raise SystemExit(
                    "--task vg with pickle annotations needs --vocab_file "
                    "(or a task --yaml with a 'vocab' entry)")
            vocab = json.load(open(args.vocab_file))
            for d in vgdata:
                boxes = np.asarray(d["boxes"], np.float32)
                iou = box_iou_np(boxes, boxes)  # host math: no per-record
                np.fill_diagonal(iou, -1.0)     # device round trips
                labels = np.asarray(d["labels"]).astype(np.int64)
                img, hw, sc = load_one(d["img_path"], d.get("height"))
                for s, o in zip(*np.nonzero(iou > 0)):
                    if s >= o:
                        continue
                    yield vg_pair_task(
                        d["img_path"], img, hw, boxes * sc, int(s), int(o),
                        vocab["idx_to_label"][str(int(labels[s]))],
                        vocab["idx_to_label"][str(int(labels[o]))],
                        None)
            return
        anns = json.load(open(args.ann_file))
        anns = shard_and_sample(anns, args)
        det_dic = det_dic_all
        to_mark = json.load(open(args.to_mark)) if args.to_mark else {}

        def img_id(name):
            return str(int(name.replace(".jpg", "").split("_")[-1]))

        if args.task == "refcoco":
            # paint-color override (reference ValDataset COLOR_NAME/
            # COLOR_RGB/COLOR_D, refcocodataset.py:356-360): name + "R-G-B"
            # + alpha; unset pieces keep the production color
            from cpt_tpu.data.prompts import REFCOCO_COLORS

            color = REFCOCO_COLORS[0]
            if (args.color_name or args.color_rgb
                    or args.color_d is not None):
                def_name, def_rgba = REFCOCO_COLORS[0]
                if args.color_rgb:
                    rgb = tuple(int(x) for x in args.color_rgb.split("-"))
                    if len(rgb) != 3:
                        raise SystemExit(
                            f"--color_rgb expects 'R-G-B', got "
                            f"{args.color_rgb!r}")
                else:
                    rgb = def_rgba[:3]
                alpha = (args.color_d if args.color_d is not None
                         else def_rgba[3])
                color = (args.color_name or def_name, rgb + (alpha,))
            for ann in anns:
                rawdets = det_dic[img_id(ann["file_name"])]
                dets = xywh_to_xyxy([d["box"] for d in rawdets])
                img, hw, sc = load_one(ann["file_name"], ann.get("height"))
                if (refcoco_rle and rawdets
                        and isinstance(rawdets[0], dict)
                        and "rle" in rawdets[0]):
                    from cpt_tpu.engine.extract import refcoco_mask_task
                    from cpt_tpu.utils.rle import decode as rle_decode

                    masks = np.stack([
                        scale_mask(rle_decode(d["rle"]), sc)
                        for d in rawdets])
                    yield refcoco_mask_task(str(ann["id"]), img, hw,
                                            dets * sc, masks,
                                            ann["caption"], color=color)
                    continue
                yield refcoco_task(str(ann["id"]), img, hw, dets * sc,
                                   ann["caption"], color=color)
        elif args.task == "gqa":
            # also covers VQAColorDataset (reference vqadataset.py:63-140:
            # the same color-marking pipeline over VQA annotations, which
            # spell the question id "qid" instead of "q_id")
            for ann in anns:
                key = str(ann.get("img_id", ann.get("img_path")))
                q_id = ann.get("q_id", ann.get("qid"))
                dets = np.asarray([d[1] if isinstance(d, list) else d["box"]
                                   for d in det_dic[key]], np.float32)
                img, hw, sc = load_one(ann["img_path"], ann.get("h"))
                marks = to_mark.get(str(q_id))
                if marks is None:
                    names = [d[0] if isinstance(d, list) else d["class"]
                             for d in det_dic[key]]
                    marks = parse_gqa_marks(ann["question"], dets.tolist(),
                                            names)
                if not marks:
                    continue
                yield gqa_mark_task(q_id, img, hw, dets * sc, marks)
        elif args.task == "vcr":
            from cpt_tpu.data.stage1_tasks import vcr_entity_groups

            # reference COLOR_D on the vcr cmds = how many palette colors
            # are painted; 0 = the uncolored "pt" baseline extraction
            # (vcrdataset.py:127, cmds/vcr/{cpt,pt}_vcr_val_seg.sh).
            # Clamped to the palette size: the reference IndexErrors past
            # it (self.colors[color_cnt], vcrdataset.py:231)
            from cpt_tpu.data.prompts import CROSS_TASK_COLORS

            vcr_color_d = min(
                args.color_d if args.color_d is not None else 6,
                len(CROSS_TASK_COLORS))
            for ann in anns:
                if "annot_id" in ann:
                    # the reference's OWN VCR layout (vcrdataset.py:
                    # 139-172): mixed-token sentences, to_mark
                    # {img_id: {boxes, names}}, [name, xyxy] dets, and
                    # per-image <img>.json segms files
                    img_id = ann["img_id"]
                    tm = to_mark[img_id]
                    names = dict(enumerate(tm["names"]))
                    segms = json.load(open(os.path.join(
                        args.image_root,
                        ann["img_path"].replace(".jpg", ".json"))))["segms"]
                    polys = dict(enumerate(segms))
                    vis, txt = vcr_entity_groups(ann)
                    dets = np.asarray([d[1] for d in det_dic[img_id]],
                                      np.float32)
                    img, hw, sc = load_one(ann["img_path"], ann.get("h"))
                    yield vcr_color_task(ann["annot_id"], img, hw,
                                         dets * sc, vis,
                                         scale_polys(polys, sc), names,
                                         color_d=vcr_color_d,
                                         txt_entity_ids=txt)
                    continue
                dets = xywh_to_xyxy([d["box"] for d in det_dic[ann["img_key"]]])
                img, hw, sc = load_one(ann["img_path"], ann.get("h"))
                polys = {int(k): v for k, v in ann["entity_polygons"].items()}
                names = {int(k): v for k, v in ann["entity_names"].items()}
                yield vcr_color_task(ann["img_key"], img, hw, dets * sc,
                                     ann["entity_ids"],
                                     scale_polys(polys, sc), names,
                                     color_d=vcr_color_d)
        elif args.task == "vg":
            for ann in anns:
                dets = xywh_to_xyxy([d["box"] for d in det_dic[ann["img"]]])
                img, hw, sc = load_one(ann["img_path"], ann.get("h"))
                yield vg_pair_task(ann["img"], img, hw, dets * sc,
                                   ann["subj_idx"], ann["obj_idx"],
                                   ann["subj_name"], ann["obj_name"],
                                   ann["rel"])
        else:  # plain
            for ann in anns:
                key = str(ann.get("img_id", ann.get("img_path")))
                dets = xywh_to_xyxy([d["box"] for d in det_dic[key]])
                img, hw, sc = load_one(ann["img_path"], ann.get("h"))
                yield plain_task(key, img, hw, dets * sc)

    if args.image_dir:
        # plain RPN-mode detection + features over an image directory —
        # the reference's ImgDataset pass (refcocodataset.py:21-64 +
        # generic engine/inference.py through the NMS filters): one TSV
        # row per image, per-det rect/class/conf/b64 2054-d feature
        import glob as _glob

        from cpt_tpu.engine.extract import make_detect_fn
        from cpt_tpu.models.detector.rpn import grid_anchors
        from cpt_tpu.utils.tsv import encode_feature

        files = sorted(_glob.glob(os.path.join(args.image_dir, "*.jpg")))
        files = shard_and_sample(files, args)
        h0, w0 = cfg.input.pad_h, cfg.input.pad_w
        anchors = jnp.asarray(grid_anchors(cfg.rpn, h0 // 16, w0 // 16))
        fn = make_detect_fn(model, cfg, with_attributes=False)

        def rpn_rows():
            for path in files:
                img, hw = load_image(
                    path, h0, w0,
                    resize_min=cfg.input.min_size_test if args.resize
                    else None,
                    resize_max=cfg.input.max_size_test if args.resize
                    else None)
                canvas = np.zeros((h0, w0, 3), np.uint8)
                canvas[: hw[0], : hw[1]] = img
                feats, boxes, labels, scores, valid, _ = fn(
                    params, jnp.asarray(canvas), anchors,
                    jnp.asarray(hw, jnp.int32))
                n = int(np.asarray(valid).sum())
                feats, boxes = np.asarray(feats)[:n], np.asarray(boxes)[:n]
                labels, scores = np.asarray(labels)[:n], np.asarray(scores)[:n]
                objects = []
                for i in range(n):
                    objects.append({
                        "rect": [float(v) for v in boxes[i]], "bbox_id": i,
                        "class": (labelmap or {}).get(int(labels[i]),
                                                      str(int(labels[i]))),
                        "conf": float(scores[i]),
                        "feature": encode_feature(feats[i]),
                    })
                key = os.path.splitext(os.path.basename(path))[0]
                yield key, json.dumps({"objects": objects,
                                       "relations": None})

        from cpt_tpu.utils.tsv import tsv_writer

        t0 = time.time()
        tsv_writer(rpn_rows(), args.output)  # stream: rows hold b64 feats
        print(f"wrote {args.output}: {len(files)} images "
              f"(RPN mode) in {time.time() - t0:.1f}s")
        return

    payload = {"refcoco": None, "gqa": gqa_payload, "vcr": vcr_payload,
               "vg": vg_payload, "plain": plain_payload}[args.task]
    t0 = time.time()
    extractor.run(tasks(), args.output, payload_fn=payload)
    dt = time.time() - t0
    print(f"wrote {args.output}: {extractor.n_copies} copies in {dt:.1f}s "
          f"({extractor.n_copies / max(extractor.infer_seconds, 1e-9):.2f} "
          f"copies/s device, {extractor.n_copies / dt:.2f} copies/s e2e)")


if __name__ == "__main__":
    main()
