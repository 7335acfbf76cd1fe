"""Import harness for running the REFERENCE's torch modules on CPU.

The reference (/root/reference, read-only) needs yacs, torchvision, and its
compiled ``maskrcnn_benchmark._C`` CUDA extension — none present here. This
module installs in-memory stubs:

  * ``yacs.config.CfgNode`` — attribute-dict
  * ``torchvision.ops.nms`` — torch-native greedy NMS (exclusive IoU,
    strict-greater suppression: torchvision semantics)
  * ``torchvision.ops.roi_align`` — wraps the scalar golden
    (``golden_ops.roi_align_ref``), incl. the adaptive sampling_ratio=0 grid
  * ``maskrcnn_benchmark._C`` — attribute stub (unused once torchvision
    resolves)

so reference modules import and execute, enabling true end-to-end parity
tests of our JAX detector against the reference's own forward pass.
"""
import sys
import types

import numpy as np
import torch

REF_ROOT = "/root/reference/prompt_feat"


class CfgNode(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def freeze(self):
        pass

    def set_new_allowed(self, *_):
        pass


def _tv_nms(boxes, scores, iou_threshold):
    from golden_ops import nms_ref

    keep = nms_ref(boxes.detach().numpy(), scores.detach().numpy(),
                   float(iou_threshold))
    return torch.as_tensor(keep, dtype=torch.long)


def _tv_roi_align(input, rois, output_size, spatial_scale=1.0,
                  sampling_ratio=-1, aligned=False):
    from golden_ops import roi_align_ref

    assert not aligned, "reference path uses legacy aligned=False"
    if isinstance(output_size, (tuple, list)):
        output_size = output_size[0]
    if isinstance(rois, list):
        rois = torch.cat(rois, dim=0)
    feats = input.detach().numpy()                  # [B, C, H, W]
    r = rois.detach().numpy()
    out = np.zeros((r.shape[0], feats.shape[1], output_size, output_size),
                   np.float32)
    sampling = max(int(sampling_ratio), 0)
    for i, row in enumerate(r):
        b = int(row[0])
        f_hwc = np.transpose(feats[b], (1, 2, 0))
        pooled = roi_align_ref(f_hwc, row[None, 1:5], spatial_scale,
                               output_size, sampling)
        out[i] = np.transpose(pooled[0], (2, 0, 1))
    return torch.as_tensor(out, dtype=input.dtype)


def install():
    if "maskrcnn_benchmark" in sys.modules:
        return  # already installed
    # the reference predates numpy 1.24's alias removal
    for alias, typ in (("float", float), ("int", int), ("bool", bool),
                       ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    # ...and torch 1.x's _six module
    if not hasattr(torch, "_six"):
        six = types.ModuleType("torch._six")
        six.string_classes = str
        six.int_classes = int
        six.inf = float("inf")
        six.PY3 = True
        torch._six = six
        sys.modules["torch._six"] = six
    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    # timm stub (only the msvit backbone variant needs it)
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class _DropPath(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    timm_layers.DropPath = _DropPath
    timm_layers.trunc_normal_ = lambda t, *a, **k: t
    timm_layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = _tv_nms
    tv_ops.roi_align = _tv_roi_align
    tv.ops = tv_ops
    tv.__version__ = "0.0-stub"
    tv_datasets = types.ModuleType("torchvision.datasets")

    class _CocoDetection:
        def __init__(self, *a, **k):
            pass

    tv_datasets.CocoDetection = _CocoDetection
    tv_datasets.coco = types.SimpleNamespace(CocoDetection=_CocoDetection)
    tv.datasets = tv_datasets
    def _tv_to_tensor(pic):
        arr = np.asarray(pic, np.uint8).copy()
        return torch.from_numpy(arr).permute(2, 0, 1).float().div(255.0)

    def _tv_normalize(tensor, mean, std, inplace=False):
        mean_t = torch.as_tensor(mean, dtype=tensor.dtype)[:, None, None]
        std_t = torch.as_tensor(std, dtype=tensor.dtype)[:, None, None]
        return (tensor - mean_t) / std_t

    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.functional = types.SimpleNamespace(
        to_tensor=_tv_to_tensor, normalize=_tv_normalize)
    tv_transforms.Compose = lambda ts: ts

    class _ColorJitter:
        # constructed by the reference's transforms.py:94 even on the
        # eval path (it is excluded from the eval Compose)
        def __init__(self, brightness=None, contrast=None, saturation=None,
                     hue=None):
            pass

        def __call__(self, img):
            return img

    tv_transforms.ColorJitter = _ColorJitter
    tv.transforms = tv_transforms
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv_ops)
    sys.modules.setdefault("torchvision.datasets", tv_datasets)
    sys.modules.setdefault("torchvision.transforms", tv_transforms)

    # python 3.12 removed the deprecated `imp` module the reference's
    # engine files still import (unused at runtime)
    if "imp" not in sys.modules:
        sys.modules["imp"] = types.ModuleType("imp")

    # cityscapesscripts helper stub (eval_instances.py imports four
    # trivial helpers from it)
    if "cityscapesscripts" not in sys.modules:
        cs = types.ModuleType("cityscapesscripts")
        cs_helpers = types.ModuleType("cityscapesscripts.helpers")
        cs_h = types.ModuleType("cityscapesscripts.helpers.csHelpers")
        cs_h.writeDict2JSON = lambda d, p: None
        cs_h.ensurePath = lambda p: None
        cs_h.colors = types.SimpleNamespace(ENDC="", BOLD="", RED="",
                                            GREEN="")
        cs_h.getColorEntry = lambda val, args: ""
        cs_helpers.csHelpers = cs_h
        cs.helpers = cs_helpers
        sys.modules["cityscapesscripts"] = cs
        sys.modules["cityscapesscripts.helpers"] = cs_helpers
        sys.modules["cityscapesscripts.helpers.csHelpers"] = cs_h

    # pycocotools stub backed by our own parity-tested RLE codec
    # (utils/rle.py) — segmentation_mask.py imports it at module scope;
    # the binary-mask paths our tests exercise only need decode/merge.
    if "pycocotools" not in sys.modules:
        from cpt_tpu.utils import rle as _rle

        def _pyc_decode(rles):
            if isinstance(rles, dict):
                return _rle.decode(rles)
            return np.stack([_rle.decode(r) for r in rles], axis=-1)

        def _pyc_encode(mask):
            if mask.ndim == 3:
                return [_rle.encode(mask[..., i])
                        for i in range(mask.shape[-1])]
            return _rle.encode(mask)

        def _unsupported(*a, **k):
            raise NotImplementedError(
                "pycocotools stub: polygon RLE conversion not supported")

        pyc = types.ModuleType("pycocotools")
        pyc_mask = types.ModuleType("pycocotools.mask")
        pyc_mask.decode = _pyc_decode
        pyc_mask.encode = _pyc_encode
        pyc_mask.area = _rle.area
        pyc_mask.toBbox = _rle.to_bbox
        pyc_mask.merge = _rle.merge
        pyc_mask.frPyObjects = _unsupported
        pyc.mask = pyc_mask
        sys.modules["pycocotools"] = pyc
        sys.modules["pycocotools.mask"] = pyc_mask

    # _C stub: present so `from maskrcnn_benchmark import _C` succeeds;
    # torchvision resolves first for nms/roi_align
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import maskrcnn_benchmark

    _c = types.ModuleType("maskrcnn_benchmark._C")
    for name in ("nms", "roi_align_forward", "roi_align_backward",
                 "roi_pool_forward", "roi_pool_backward",
                 "sigmoid_focalloss_forward", "sigmoid_focalloss_backward"):
        setattr(_c, name, None)
    maskrcnn_benchmark._C = _c
    sys.modules["maskrcnn_benchmark._C"] = _c

    # stub modules need a real __spec__: transformers'
    # _is_package_available probes importlib.util.find_spec("timm") etc.,
    # which raises ValueError on spec-less sys.modules entries
    import importlib.machinery as _machinery

    for name, mod in list(sys.modules.items()):
        if mod is not None and getattr(mod, "__spec__", None) is None \
                and getattr(mod, "__loader__", None) is None \
                and name.split(".")[0] in (
                    "timm", "torchvision", "yacs", "pycocotools",
                    "cityscapesscripts", "imp"):
            mod.__spec__ = _machinery.ModuleSpec(name, loader=None)


def tiny_resnet_cfg():
    """cfg namespace for the reference ResNet matching our
    tiny_detector_config backbone (stages (1,1,1) via a registered spec)."""
    install()
    from maskrcnn_benchmark.modeling.backbone import resnet as ref_resnet

    spec = tuple(
        ref_resnet.StageSpec(index=i, block_count=c, return_features=r)
        for (i, c, r) in ((1, 1, False), (2, 1, False), (3, 1, True)))
    ref_resnet._STAGE_SPECS["R-TINY-C4"] = spec

    cfg = CfgNode()
    cfg.MODEL = CfgNode()
    cfg.MODEL.RESNETS = CfgNode(
        STEM_FUNC="StemWithFixedBatchNorm",
        TRANS_FUNC="BottleneckWithFixedBatchNorm",
        NUM_GROUPS=2, WIDTH_PER_GROUP=4,
        STEM_OUT_CHANNELS=8, RES2_OUT_CHANNELS=16,
        STRIDE_IN_1X1=False, RES5_DILATION=1,
        STAGE_WITH_DCN=(False, False, False, False),
        WITH_MODULATED_DCN=False, DEFORMABLE_GROUPS=1,
        BACKBONE_OUT_CHANNELS=64,
    )
    cfg.MODEL.BACKBONE = CfgNode(CONV_BODY="R-TINY-C4",
                                 FREEZE_CONV_BODY_AT=2)
    return cfg


def full_attr_rcnn_cfg():
    """Complete cfg tree for building the reference AttrRCNN (tiny sizes
    matching cpt_tpu.models.detector.config.tiny_detector_config)."""
    cfg = tiny_resnet_cfg()
    m = cfg.MODEL
    m.DEVICE = "cpu"
    m.ATTRIBUTE_ON = True
    m.RELATION_ON = False
    m.KEYPOINT_ON = False
    m.MASK_ON = False
    m.CLS_AGNOSTIC_BBOX_REG = False
    m.META_ARCHITECTURE = "AttrRCNN"
    m.RPN = CfgNode(
        USE_FPN=False, ANCHOR_SIZES=(16, 32), ANCHOR_STRIDE=(16,),
        ASPECT_RATIOS=(0.5, 1.0, 2.0), STRADDLE_THRESH=0,
        PRE_NMS_TOP_N_TEST=64, POST_NMS_TOP_N_TEST=16,
        PRE_NMS_TOP_N_TRAIN=64, POST_NMS_TOP_N_TRAIN=32,
        NMS_THRESH=0.7, MIN_SIZE=0, RPN_HEAD="SingleConvRPNHead",
        FORCE_BOXES=True, FPN_POST_NMS_TOP_N_TRAIN=2000,
        FPN_POST_NMS_TOP_N_TEST=2000, FPN_POST_NMS_PER_BATCH=True,
        FG_IOU_THRESHOLD=0.7, BG_IOU_THRESHOLD=0.3,
        BATCH_SIZE_PER_IMAGE=256, POSITIVE_FRACTION=0.5,
        RPN_MID_CHANNEL=64,
    )
    m.ROI_HEADS = CfgNode(
        USE_FPN=False, SCORE_THRESH=0.2, NMS=0.5, NMS_FILTER=2,
        DETECTIONS_PER_IMG=8, MIN_DETECTIONS_PER_IMG=2,
        BATCH_SIZE_PER_IMAGE=8, POSITIVE_FRACTION=0.5,
        FG_IOU_THRESHOLD=0.5, BG_IOU_THRESHOLD=0.5,
        BBOX_REG_WEIGHTS=(10.0, 10.0, 5.0, 5.0),
        SCORE_THRESH_TEST=0.2,
    )
    m.ROI_BOX_HEAD = CfgNode(
        NUM_CLASSES=7, POOLER_RESOLUTION=4, POOLER_SCALES=(1.0 / 16,),
        POOLER_SAMPLING_RATIO=0,
        FEATURE_EXTRACTOR="ResNet50Conv5ROIFeatureExtractor",
        PREDICTOR="FastRCNNPredictor",
    )
    m.ROI_ATTRIBUTE_HEAD = CfgNode(
        SHARE_BOX_FEATURE_EXTRACTOR=False,
        FEATURE_EXTRACTOR="ResNet50Conv5ROIFeatureExtractor",
        PREDICTOR="AttributeRCNNPredictor",
        NUM_ATTRIBUTES=5, CLS_EMD_DIM=4, ATTR_EMD_DIM=8,
        POSTPROCESS_ATTRIBUTES_THRESHOLD=0.05,
        MAX_NUM_ATTR_PER_OBJ=4, MAX_NUM_ATTR_PER_IMG=100,
        POOLER_RESOLUTION=4, POOLER_SCALES=(1.0 / 16,),
        POOLER_SAMPLING_RATIO=0, LOSS_WEIGHT=1.0,
        ATTRIBUTE_LOSS_TYPE="softmax", ATTRIBUTE_BGFG_SAMPLE=True,
        ATTRIBUTE_BGFG_RATIO=3,
    )
    cfg.TEST = CfgNode(
        OUTPUT_FEATURE=True, IGNORE_BOX_REGRESSION=True,
        BBOX_AUG=CfgNode(ENABLED=False),
        OUTPUT_RELATION_FEATURE=False, OUTPUT_SCORES_ALL=True,
    )
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.2
    return cfg


def build_reference_attr_rcnn(force_boxes: bool = True, overrides=None):
    """Build the reference AttrRCNN (tiny cfg), eval mode, randomized
    frozen-BN buffers, trans_conv removed (absent in the real VinVL shape).

    ``overrides``: {dotted.cfg.key: value} applied before the build (e.g.
    RES2_OUT_CHANNELS=256 for real-width 2054-d features)."""
    install()
    cfg = full_attr_rcnn_cfg()
    for key, val in (overrides or {}).items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = val
    cfg.MODEL.RETINANET_ON = False
    cfg.MODEL.FCOS_ON = False
    cfg.MODEL.RPN_ONLY = False
    cfg.MODEL.ROI_BOX_HEAD.FORCE_BOXES = force_boxes
    cfg.MODEL.RPN.FORCE_BOXES = force_boxes
    cfg.TEST.OUTPUT_ATTRIBUTE_FEATURE = False

    from maskrcnn_benchmark.modeling import registry
    from maskrcnn_benchmark.modeling.backbone.backbone import (
        build_resnet_backbone)

    if "R-TINY-C4" not in registry.BACKBONES:
        registry.BACKBONES.register("R-TINY-C4", build_resnet_backbone)
    from scene_graph_benchmark.AttrRCNN import AttrRCNN

    torch.manual_seed(0)
    model = AttrRCNN(cfg)
    model.eval()
    # the 64-channel tiny backbone triggers the FPN-compat trans_conv the
    # real 1024-channel VinVL config never builds — drop it
    if getattr(model.roi_heads.box.feature_extractor, "trans_conv",
               None) is not None:
        model.roi_heads.box.feature_extractor.trans_conv = None
    if getattr(model.attribute.feature_extractor, "trans_conv",
               None) is not None:
        model.attribute.feature_extractor.trans_conv = None

    rng = np.random.RandomState(3)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if "running_var" in name:
                buf.copy_(torch.tensor(
                    rng.rand(*buf.shape).astype(np.float32) + 0.5))
            elif "running_mean" in name:
                buf.copy_(torch.tensor(
                    rng.randn(*buf.shape).astype(np.float32) * 0.1))
    return model, cfg
