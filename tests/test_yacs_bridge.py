"""yacs bridge: drive our detector tools from the reference's own yaml
configs (``prompt_feat/{configs,sgg_configs}``) with zero conversion.

Resolution order reproduces the reference exactly — yacs defaults
(``maskrcnn_benchmark/config/defaults.py`` ⊕
``scene_graph_benchmark/config/sg_defaults.py``) ← yaml ← ``--opts``
(``tools/test_sg_net.py:43-47`` → ``cfg.merge_from_list``)."""
import argparse
import os

import pytest

from cpt_tpu.models.detector.config import VINVL_X152C4
from cpt_tpu.models.detector.yacs_bridge import (_parse_conv_body,
                                                 load_reference_yaml)

REF = "/root/reference/prompt_feat"
VINVL_YAML = os.path.join(REF, "sgg_configs/vgattr/vinvl_x152c4.yaml")

# the opts every cmds/refcoco/cpt/*.sh passes (refcoco_val.sh:5-18)
REFCOCO_OPTS = [
    "TEST.IMS_PER_BATCH", "8",
    "MODEL.RPN.FORCE_BOXES", "True",
    "MODEL.ROI_BOX_HEAD.FORCE_BOXES", "True",
    "MODEL.WEIGHT", "models/vinvl/vinvl_vg_x152c4.pth",
    "MODEL.ROI_HEADS.NMS_FILTER", "2",
    "MODEL.ROI_HEADS.SCORE_THRESH", "0.2",
    "DATASETS.TEST", '("RefCoCoDataset",)',
    "DATA_DIR", "data/refcoco/yamls/refcoco_val.yaml",
    "MODEL.CLS_AGNOSTIC_BBOX_REG", "False",
    "MODEL.ATTRIBUTE_ON", "True",
    "TEST.OUTPUT_FEATURE", "True",
    "OUTPUT_DIR", "./output/refcoco/cpt",
]

needs_ref = pytest.mark.skipif(not os.path.isfile(VINVL_YAML),
                               reason="reference tree absent")


@needs_ref
def test_refcoco_cmd_resolves_to_builtin_vinvl():
    """The exact refcoco_val.sh invocation (yaml + opts) must resolve to
    our hand-built VINVL_X152C4 — field for field."""
    ref = load_reference_yaml(VINVL_YAML, opts=REFCOCO_OPTS)
    d, v = ref.detector, VINVL_X152C4
    assert d.backbone == v.backbone
    assert d.rpn == v.rpn
    assert d.roi_heads == v.roi_heads
    assert d.attributes == v.attributes
    assert d.input == v.input
    assert d.force_boxes and d.output_feature
    assert ref.attribute_on and not ref.relation_on
    assert ref.conv_body == "R-152-C4"
    assert ref.datasets_test == ("RefCoCoDataset",)
    assert ref.data_dir == "data/refcoco/yamls/refcoco_val.yaml"


@needs_ref
def test_yaml_alone_keeps_yacs_defaults():
    """Without opts, keys the yaml leaves unset take the reference
    defaults.py values (NMS_FILTER=0, defaults.py:223), NOT our
    VinVL-tuned dataclass defaults."""
    ref = load_reference_yaml(VINVL_YAML)
    assert ref.detector.roi_heads.nms_filter == 0
    assert not ref.detector.force_boxes
    # yaml-set solver keys (vinvl_x152c4.yaml SOLVER block)
    assert ref.solver.base_lr == pytest.approx(0.01)
    assert ref.solver.steps == (49000, 65000)
    assert ref.solver.max_iter == 90000


@needs_ref
def test_generic_maskrcnn_configs_load():
    """Plain maskrcnn-benchmark zoo yamls resolve without error and parse
    their conv bodies."""
    ref = load_reference_yaml(
        os.path.join(REF, "configs/e2e_faster_rcnn_R_50_C4_1x.yaml"))
    assert ref.detector.backbone.stage_blocks == (3, 4, 6)
    ref = load_reference_yaml(
        os.path.join(REF, "configs/e2e_faster_rcnn_X_101_32x8d_FPN_1x.yaml"))
    assert ref.detector.backbone.stage_blocks == (3, 4, 23)
    assert ref.detector.backbone.num_groups == 32
    assert ref.detector.backbone.width_per_group == 8


def test_parse_conv_body():
    assert _parse_conv_body("R-152-C4")["stage_blocks"] == (3, 8, 36)
    assert _parse_conv_body("R-50-C4")["stage_blocks"] == (3, 4, 6)
    x = _parse_conv_body("X-101-32x8d-FPN")
    assert (x["stage_blocks"], x["num_groups"], x["width_per_group"],
            x["fpn"]) == ((3, 4, 23), 32, 8, True)


def test_opts_literal_decode(tmp_path):
    """opts values decode like yacs ``_decode_cfg_value`` — python
    literals for tuples/bools, verbatim strings otherwise."""
    y = tmp_path / "c.yaml"
    y.write_text("MODEL:\n  ATTRIBUTE_ON: True\n")
    ref = load_reference_yaml(str(y), opts=[
        "SOLVER.STEPS", "(30000, 40000)",
        "MODEL.RELATION_ON", "True",
        "MODEL.ROI_RELATION_HEAD.ALGORITHM", "sg_imp"])
    assert ref.solver.steps == (30000, 40000)
    assert ref.relation_on and ref.relation_algorithm == "sg_imp"
    with pytest.raises(ValueError):
        load_reference_yaml(str(y), opts=["ODD"])


def test_apply_reference_config_sets_parser_defaults(tmp_path):
    """--config_file installs yaml values as argparse DEFAULTS so explicit
    CLI flags still win — the reference's defaults←yaml←opts←CLI chain."""
    from cpt_tpu.tools._common import apply_reference_config
    from cpt_tpu.tools.train_detector import build_args

    y = tmp_path / "c.yaml"
    y.write_text("SOLVER:\n  BASE_LR: 0.02\n  MAX_ITER: 123\n"
                 "  STEPS: \"(50, 100)\"\n  CHECKPOINT_PERIOD: 7\n"
                 "OUTPUT_DIR: /tmp/refout\n")
    argv = ["--config_file", str(y), "--max_iter", "999"]
    parser = build_args()
    ref = apply_reference_config(parser, argv)
    args = parser.parse_args(argv)
    assert ref is not None
    assert args.base_lr == pytest.approx(0.02)     # from yaml
    assert args.steps == [50, 100] or tuple(args.steps) == (50, 100)
    assert args.checkpoint_period == 7
    assert args.output_dir == "/tmp/refout"
    assert args.max_iter == 999                    # explicit CLI flag wins

    # without --config_file: no-op, parser defaults intact
    parser2 = build_args()
    assert apply_reference_config(parser2, []) is None
    assert parser2.parse_args([]).base_lr == pytest.approx(0.01)


def test_relation_yaml_turns_on_sg(tmp_path):
    from cpt_tpu.tools._common import apply_reference_config
    from cpt_tpu.tools.train_detector import build_args

    y = tmp_path / "rel.yaml"
    y.write_text("MODEL:\n  RELATION_ON: True\n"
                 "  ROI_RELATION_HEAD:\n    ALGORITHM: sg_grcnn\n")
    argv = ["--config_file", str(y)]
    parser = build_args()
    apply_reference_config(parser, argv)
    args = parser.parse_args(argv)
    assert args.sg and args.rel_algorithm == "sg_grcnn"


def test_extract_args_mapping(tmp_path):
    """DATASETS.TEST → --task, DATA_DIR → --yaml, OUTPUT_DIR → the
    reference's inference/<stem>/predictions.tsv layout."""
    from cpt_tpu.tools.extract_features import (apply_ref_to_extract_args,
                                                build_args)

    y = tmp_path / "c.yaml"
    y.write_text("OUTPUT_DIR: /tmp/o\n")
    ref = load_reference_yaml(str(y), opts=[
        "DATASETS.TEST", '("GQAColorDataset",)',
        "DATA_DIR", "data/gqa/yamls/gqa_val.yaml"])
    args = build_args().parse_args(["--config_file", str(y)])
    args = apply_ref_to_extract_args(args, ref)
    assert args.task == "gqa"
    assert args.yaml == "data/gqa/yamls/gqa_val.yaml"
    assert args.output == "/tmp/o/inference/gqa_val/predictions.tsv"

    # explicit flags untouched
    args2 = build_args().parse_args(
        ["--config_file", str(y), "--task", "plain", "--output", "x.tsv"])
    args2 = apply_ref_to_extract_args(args2, ref)
    assert args2.task == "plain" and args2.output == "x.tsv"


def test_extract_args_cpt_keys_from_opts(tmp_path):
    """The CPT data-load yacs keys in every cmds/ script — N_SHOT,
    RAND_SEED, COLOR_D (cmds/vcr/vcr_train.sh), TOTAL_STEP/CUR_STEP
    (gqa ext.sh), COLOR_NAME/COLOR_RGB (ValDataset) — map onto the
    extraction flags so reference commands translate verbatim."""
    from cpt_tpu.tools.extract_features import (apply_ref_to_extract_args,
                                                build_args)

    y = tmp_path / "c.yaml"
    y.write_text("OUTPUT_DIR: /tmp/o\n")
    ref = load_reference_yaml(str(y), opts=[
        "N_SHOT", "4", "RAND_SEED", "7", "COLOR_D", "3",
        "TOTAL_STEP", "15", "CUR_STEP", "2",
        "COLOR_NAME", "green", "COLOR_RGB", "0-255-0"])
    args = build_args().parse_args(
        ["--config_file", str(y), "--task", "vcr", "--output", "x.tsv"])
    args = apply_ref_to_extract_args(args, ref)
    assert (args.n_shot, args.rand_seed, args.color_d) == (4, 7, 3)
    assert (args.total_step, args.cur_step) == (15, 2)
    assert (args.color_name, args.color_rgb) == ("green", "0-255-0")
    # explicit flags win over the yacs opts
    args2 = build_args().parse_args(
        ["--config_file", str(y), "--task", "vcr", "--output", "x.tsv",
         "--n_shot", "9", "--color_d", "0"])
    args2 = apply_ref_to_extract_args(args2, ref)
    assert args2.n_shot == 9 and args2.color_d == 0


def test_checkpoint_resolved_next_to_yaml(tmp_path):
    """MODEL.WEIGHT is tried relative to cwd AND the yaml's directory so a
    checked-out reference tree works in place."""
    from cpt_tpu.tools._common import apply_reference_config
    from cpt_tpu.tools.test_detector import build_args

    (tmp_path / "w.pth").write_bytes(b"x")
    y = tmp_path / "c.yaml"
    y.write_text("MODEL:\n  WEIGHT: w.pth\n")
    argv = ["--config_file", str(y)]
    parser = build_args()
    apply_reference_config(parser, argv)
    args = parser.parse_args(argv)
    assert args.checkpoint == str(tmp_path / "w.pth")
